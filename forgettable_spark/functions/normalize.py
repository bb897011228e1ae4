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
) -> DataFrame:
    """Add ``Z`` (BIGINT, per-distribution sum) and ``p`` (DOUBLE) columns.

    A window over ``distribution`` is one hash-shuffle of the *snapshot*
    (unique (distribution, bin) pairs — already partially aggregated), not
    of the raw event log; at 100 TB the snapshot is the small derivative.
    When upstream already clustered by ``distribution`` (snapshot() output
    falls out of a (distribution, bin) hash), AQE keeps this cheap.
    """
    w = Window.partitionBy(dist_col)
    z = F.sum(F.col(count_col)).over(w).alias("Z")
    df = df.withColumn("Z", z)
    p = (
        F.when(F.col("Z") == 0, F.lit(0.0))
        .otherwise(F.col(count_col).cast("double") / F.col("Z").cast("double"))
        .alias("p")
    )
    return df.withColumn("p", p)
