"""Normalization / probability projection (reference op D2).

``Z := Σ counts`` over a distribution; ``p_i := count_i / Z`` with 0.0 when
``Z == 0`` (``goforget/distribution.go:132-151``). ``Z`` and ``p`` are always
derived, never stored — the engine inherits the reference's intended
invariant ``Z = Σ counts`` by construction (SURVEY.md §2.3 item 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_z_and_p(
    df: DataFrame,
    count_col: str = "count",
    dist_col: str = "distribution",
    strategy: str = "window",
) -> DataFrame:
    """Add ``Z`` (BIGINT, per-distribution sum) and ``p`` (DOUBLE) columns.

    Two physically different, result-identical strategies:

    - ``window`` (default): one hash-shuffle of the snapshot (unique
      (distribution, bin) pairs). Simple, and fine when no distribution
      dominates — but a window funnels *all* rows of a distribution into
      one task, so a single million-bin hot distribution becomes a
      straggler.
    - ``join``: aggregate per-distribution totals (partial aggregation
      handles hot keys), then join them back. The totals table is one row
      per distribution; AQE broadcasts it when small, and even as a
      shuffle join the fact side distributes the hot distribution across
      tasks instead of collapsing it into one. This is the skew-safe
      plan for 100 TB with power-law distribution sizes.
    """
    if strategy == "window":
        w = Window.partitionBy(dist_col)
        df = df.withColumn("Z", F.sum(F.col(count_col)).over(w).alias("Z"))
    elif strategy == "join":
        totals = df.groupBy(dist_col).agg(F.sum(F.col(count_col)).alias("Z"))
        df = df.join(totals, dist_col)
    else:
        raise ValueError(f"unknown normalize strategy: {strategy!r} (want 'window' or 'join')")
    p = (
        F.when(F.col("Z") == 0, F.lit(0.0))
        .otherwise(F.col(count_col).cast("double") / F.col("Z").cast("double"))
        .alias("p")
    )
    return df.withColumn("p", p)
