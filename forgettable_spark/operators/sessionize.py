"""Sessionization: gap-based session assignment over the raw event stream.

A staple of event-pipeline processing the reference has no counterpart
for: order a user's events by time, start a new session whenever the gap
exceeds a threshold, number sessions with a running sum of session-start
flags, and aggregate per session.

Plan shape: one hash exchange on ``user_id`` carries both window passes
(lag + running sum — same partitioning, consecutive sorts) and the final
per-session aggregation (user_id ⊂ grouping keys). Skewed power users
are bounded by their own event counts; the session aggregation is
partially aggregated as always. The streaming twin is a session window
(``F.session_window``) — the batch form here is the oracle-checkable one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_SEC = 1800


def sessionize(
    events: DataFrame,
    gap_sec: int = DEFAULT_GAP_SEC,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign gap-based sessions; returns one row per session:
    (user_id, session_id, n_events, start_us, end_us, duration_us).

    ``session_id`` numbers a user's sessions from 1 in time order. The
    (ts, tiebreak) ordering is total, so results are deterministic and
    hash-match the SQL oracle exactly (all outputs are integers).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    ts_us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > gap_sec * 1_000_000), 1
    ).otherwise(0)
    numbered = events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        numbered.groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_us).alias("start_us"),
            F.max(ts_us).alias("end_us"),
        )
        .withColumn("duration_us", F.col("end_us") - F.col("start_us"))
    )
