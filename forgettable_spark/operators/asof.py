"""Generic as-of join: each left row paired with the MOST RECENT right
row at-or-before its timestamp within the same key.

The time-series join Spark's relational operators don't natively express
(DuckDB grew a dedicated ``ASOF JOIN`` for it; the oracle twin uses
exactly that, so the engine's composition is cross-checked against a
native implementation). The classic instances: trade-to-quote matching,
and marketing attribution — each conversion credited to the user's
latest preceding touch — which is the registered demo
(``asof_attribution``).

Scale shape: a range join written naively is a per-key cross product.
This implementation is the union-interleave form: tag right rows 0 and
left rows 1, union on (key, ts, tag), and take a running
``last(right_payload, ignorenulls)`` over one window ordered by
(ts, tag) — a single shuffle on the key, linear scan per key, no
cross product ever materialized. At equal timestamps the right row
sorts first (tag 0 < 1), giving the inclusive ``right_ts <= left_ts``
semantics DuckDB's ASOF ``>=`` join uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the newest ``right`` row
    with ``right[right_ts] <= left[left_ts]`` on the same ``on`` key
    (NULL-filled when no such row exists — LEFT semantics).

    Right columns (except the key) come back prefixed with
    ``right_prefix``. Rows with NULL timestamps never match and (on the
    left) pass through unmatched.
    """
    r_payload = [c for c in right.columns if c not in on]
    l_struct = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    r_struct = F.struct(*[F.col(c) for c in r_payload]).alias("_r")

    l2 = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        l_struct,
        F.lit(None).cast(right.select(r_struct).schema["_r"].dataType).alias("_r"),
    )
    # A right row with a NULL timestamp can never legitimately be "the
    # most recent at-or-before" anything — and left in the union it would
    # sort nulls-first and ride the running last() into every match.
    r2 = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(left.select(l_struct).schema["_l"].dataType).alias("_l"),
        r_struct,
    )
    # _r as the final sort key: two right rows sharing (key, ts) would
    # otherwise match whichever one Spark happened to sort last —
    # partitioning-dependent output. Struct ordering is lexicographic by
    # payload fields, so ties resolve deterministically to the largest
    # payload (left rows carry NULL _r and are unaffected; last() reads
    # only right rows, which all sort before equal-ts left rows via _tag).
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("_ts").asc_nulls_first(),
            F.col("_tag"),
            F.col("_r").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        # NULL left ts sorts first (before any right row) -> no match,
        # preserving "NULL never matches" without a separate branch
        .filter(F.col("_tag") == 1)
    )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"_m.{c}").alias(f"{right_prefix}{c}") for c in r_payload
    ]
    return matched.select(*out_cols)
