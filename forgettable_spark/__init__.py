"""forgettable_spark — a PySpark-native forget-table analytics engine.

A from-scratch re-expression of the query semantics of bitly/forgettable
(non-stationary categorical distributions with responsible forgetting) on
Apache Spark, designed for 100 TB scale:

- **Event-sourced.** The reference mutates Redis aggregates in place
  (``goforget/redis_utils.go:222-233``); this engine stores an append-only
  increment log (``forget_events``) and derives every aggregate lazily, so
  the reference's asynchronous read-repair machinery
  (``goforget/forget.go:247-256``) dissolves into pure column expressions.
- **Decay-at-read.** Poisson decay (``goforget/decay.go:12-56``) becomes a
  Catalyst column expression in deterministic ``expected`` mode, or a
  seeded vectorized pandas UDF in faithful ``poisson`` mode.
- **Everything declarative.** Snapshots, normalization, top-N, expiry are
  groupBy/window/filter plans that Catalyst optimizes (partial aggregation,
  predicate pushdown, partition pruning, AQE).

Public surface::

    from forgettable_spark import session, sources, operators
    spark = session.get_spark()
    events = sources.load_forget_events(spark, sf_dir)
    snap = operators.snapshot(events)
    top = operators.n_most_probable(snap, n=10, now=..., rate=0.5)
"""

from forgettable_spark import session, sources, operators, functions

__version__ = "0.1.0"

__all__ = ["session", "sources", "operators", "functions", "__version__"]
