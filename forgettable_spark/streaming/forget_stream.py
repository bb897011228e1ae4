"""Structured Streaming forget-table (reference parity-plus, SURVEY.md §7 M4).

The reference system *is* a stream processor in disguise: a continuous
``/incr`` stream mutates keyed state (per-distribution counts), reads decay
that state against elapsed time, and a TTL evicts idle keys
(``goforget/forget.go:28,68,247-256``; ``redis_utils.go:124-196``). The
Structured Streaming mapping:

- ``/incr`` stream            → ``readStream`` of forget_events rows
- Redis keyed state           → ``applyInPandasWithState`` per-distribution
                                 state (bins, counts, T)
- decay at write-back         → decay applied per micro-batch as event time
                                 advances (same expected-mode law as batch)
- ``(σ+η)·η`` TTL             → event-time state timeout at T + horizon
- late ``/incr``              → just adds to current counts, exactly the
                                 reference semantics (SETNX ``_T`` means
                                 writes never rewind T — SURVEY.md §2.2)

Two tiers: :func:`streaming_snapshot` is the pure-builtin path (update-mode
keyed aggregation — Spark maintains (distribution, bin) sums incrementally;
decay stays a read-time projection over the sink). :func:`streaming_forget_
table` is the custom stateful operator for when decayed state itself must
live in the stream (the reference's write-back made durable).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from forgettable_spark.functions.decay import GOFORGET_DEFAULT_RATE
from forgettable_spark.functions.expiry import DEFAULT_SIGMA
from forgettable_spark.operators.snapshot import FORGET_EVENTS_SCHEMA

#: Per-distribution state: parallel bin/count arrays + last-decay instant.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("bins", T.ArrayType(T.StringType()), False),
        T.StructField("counts", T.ArrayType(T.LongType()), False),
        T.StructField("t_us", T.LongType(), False),
    ]
)

#: Emitted rows: the distribution's full post-update state each batch.
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("distribution", T.StringType(), False),
        T.StructField("bin", T.StringType(), False),
        T.StructField("count", T.LongType(), False),
        T.StructField("t_us", T.LongType(), False),
    ]
)


def read_increment_stream(spark, path: str, format: str = "parquet") -> DataFrame:
    """File-based increment stream (one file ≈ one micro-batch in tests
    via ``maxFilesPerTrigger=1``; swap for Kafka etc. in production).

    ``format``: ``parquet``/``orc`` read the typed events schema
    directly; ``csv``/``json`` read the wire schema (ts as ISO-8601
    string) and normalize through the same malformed-row-tolerant parse
    as the batch connectors (`sources/formats`) — one bad row yields a
    NULL ts, never a dead stream.
    """
    if format in ("csv", "json"):
        from forgettable_spark.sources.formats import _WIRE_SCHEMA, _normalize

        reader = spark.readStream.schema(_WIRE_SCHEMA).option("maxFilesPerTrigger", 1)
        if format == "csv":
            raw = reader.option("header", True).csv(path)
        else:
            raw = reader.json(path)
        return _normalize(raw)
    return (
        spark.readStream.schema(FORGET_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format(format)
        .load(path)
    )


def streaming_snapshot(events: DataFrame, watermark: str = "10 seconds") -> DataFrame:
    """Built-in path: incrementally-maintained snapshot aggregation.

    Update-mode ``groupBy(distribution, bin)`` running sums — Spark's state
    store does the heavy lifting (RocksDB-backed at scale); decay remains a
    read-time column expression over the sink, identical to batch. The
    watermark bounds state for the companion windowed variants; plain keyed
    aggregation keeps all keys (like the reference until TTL).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("distribution", "bin")
        .agg(
            F.sum("n").alias("count"),
            F.unix_micros(F.max("ts")).alias("t_us"),
        )
    )


def _decay_counts(counts: list[int], dt_sec: float, rate: float, prune: bool, law: str) -> list[int]:
    """Expected-mode decay, pure-Python twin of functions.decay (same law,
    applied inside the state update where no Column exists)."""
    out = []
    for c in counts:
        lam = rate * dt_sec if law == "linear" else c * rate * dt_sec
        k = math.floor(lam)
        floor_at = 0 if prune else 1
        out.append(max(c - k, floor_at))
    return out


def streaming_forget_table(
    events: DataFrame,
    rate: float = GOFORGET_DEFAULT_RATE,
    sigma: float = DEFAULT_SIGMA,
    prune: bool = True,
    law: str = "linear",
    watermark: str = "1 hour",
    n_shards: int | None = None,
) -> DataFrame:
    """Custom stateful operator: per-distribution decaying counts with
    TTL eviction, emitted in update mode.

    ``watermark`` is the allowed lateness: the reference accepts
    arbitrarily late increments (they simply add to current counts —
    SURVEY.md §2.2), so the default is generous; the cost is that TTL
    timeouts fire one watermark-delay later in event time. Set it to
    ``"0 seconds"`` for strict watermark semantics with prompt eviction.

    Per micro-batch and distribution: decay existing state forward to the
    batch's max event time (write-back analogue), fold in the new
    increments, prune zeros, then arm an event-time timeout at
    ``T + (σ+η)·η`` — when the watermark passes it the distribution's
    state is dropped, exactly the Redis ``EXPIRE`` horizon
    (``goforget/redis_utils.go:184-189``).

    Scale: state is keyed by distribution and lives in Spark's state store
    (RocksDB provider on real clusters); a micro-batch shuffles only its
    increments, partially pre-aggregated.

    ``n_shards`` bounds the per-key state row for *wide* distributions
    (millions of hot bins): state keys become ``(distribution,
    xxhash64(bin) % n_shards)``, each holding only its slice of the bins;
    the per-bin output rows are unchanged, so readers merge shards for
    free (distribution ``T`` = max ``t_us`` across its rows). Honest
    semantic notes: each shard's ``T`` advances with the events *it*
    receives, so per-bin decay follows the shard's update path — the same
    decay-at-update path dependence the unsharded stream (and the
    reference's write-back) already has, just per shard; and TTL eviction
    fires per shard, which can reap a cold slice of an otherwise-hot
    distribution (strictly finer-grained than the reference's whole-key
    ``EXPIRE``; a bin reappearing later is just a first-increment again).
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        distribution = key[0]
        if state.hasTimedOut:
            # TTL horizon passed with no traffic: drop the key group.
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in OUTPUT_SCHEMA.fields])
            return

        incr: dict[str, int] = {}
        batch_t_us = 0
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["ts"])
            if getattr(ts.dt, "tz", None) is not None:
                ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
            us = ts.astype("datetime64[us]").astype("int64")
            if len(us):
                batch_t_us = max(batch_t_us, int(us.max()))
            for b, n in zip(pdf["bin"], pdf["n"]):
                incr[b] = incr.get(b, 0) + int(n)

        if state.exists:
            bins, counts, t_us = state.get
            bins, counts = list(bins), list(counts)
        else:
            bins, counts, t_us = [], [], batch_t_us

        new_t_us = max(t_us, batch_t_us)
        # decay existing mass forward to the new instant (write-back analogue)
        if new_t_us > t_us and counts:
            counts = _decay_counts(counts, (new_t_us - t_us) / 1e6, rate, prune, law)
        # fold in increments (late events simply add — reference semantics)
        index = {b: i for i, b in enumerate(bins)}
        for b, n in incr.items():
            if b in index:
                counts[index[b]] += n
            else:
                bins.append(b)
                counts.append(n)
        if prune:
            kept = [(b, c) for b, c in zip(bins, counts) if c > 0]
            bins, counts = [b for b, _ in kept], [c for _, c in kept]

        if not bins:
            # whole distribution decayed away: discard (redis_utils.go:158-161)
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in OUTPUT_SCHEMA.fields])
            return

        state.update((bins, counts, new_t_us))
        horizon_sec = (sigma + math.sqrt(max(counts) / rate)) * math.sqrt(max(counts) / rate)
        state.setTimeoutTimestamp(new_t_us // 1000 + int(horizon_sec * 1000))
        yield pd.DataFrame(
            {
                "distribution": distribution,
                "bin": bins,
                "count": counts,
                "t_us": new_t_us,
            }
        )

    keyed = events.withWatermark("ts", watermark)
    if n_shards:
        keyed = keyed.withColumn(
            "_shard", F.pmod(F.xxhash64("bin"), F.lit(n_shards)).cast("int")
        )
        grouped = keyed.groupBy("distribution", "_shard")
    else:
        grouped = keyed.groupBy("distribution")
    return grouped.applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "10 seconds",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Tumbling-window increment volumes with bounded lateness.

    Append-mode windowed aggregation: each (window, distribution) row is
    emitted exactly once, when the event-time watermark passes the
    window's end; events arriving later than ``watermark`` behind the
    stream's max event time are dropped before the aggregation (the
    standard Structured Streaming late-data contract). This is the
    volume-monitoring companion to the keyed forget-table state — the
    reference has no analogue (its only notion of time is the decay
    clock), but any production ingest wants per-window write rates.

    State is bounded: closed windows are evicted once the watermark
    passes, so state size is O(active windows × hot distributions)
    regardless of stream length.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window_duration).alias("win"),
            "distribution",
        )
        .agg(F.sum("n").alias("n_events"))
        .select(
            "distribution",
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_events",
        )
    )


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: emit only the first occurrence of each
    content hash, with state bounded by the watermark.

    ``dropDuplicatesWithinWatermark`` keeps one state row per distinct
    md5 and evicts it once the watermark passes — so the dedup window
    is "no duplicate within ``watermark`` of event time" and state stays
    O(distinct hashes per window) no matter how long the stream runs.
    The batch twin (:func:`forgettable_spark.extensions.dedup.
    exact_dedup`) dedups globally; at ingest time the bounded window is
    the scalable contract (a re-crawl a month later is a *new* document
    for retention purposes — global dedup runs as the batch pass over
    the compacted corpus).
    """
    hashed = docs.withColumn("fp_md5", F.md5(F.col(text_col)))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["fp_md5"]
    )


def streaming_chunk_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    width: int = 20,
) -> DataFrame:
    """Streaming sub-document dedup: explode each document into
    fixed-``width`` token chunks and emit only the FIRST occurrence of
    each chunk hash within the watermark window.

    The ingest-time twin of the batch :func:`forgettable_spark.
    extensions.dedup.chunk_dedup`: boilerplate blocks repeated across a
    crawl are suppressed as they arrive, while the batch pass over the
    compacted corpus computes the global copy counts and canonical
    occupants. Both sides chunk through the SAME expression
    (:func:`~forgettable_spark.extensions.dedup.chunk_array`), so they
    can never disagree on chunk boundaries. Output is chunk-granular —
    ``(doc_id, ts, chunk_idx, chunk_md5)`` — a kept-span list the
    ingest sink joins back against its documents. NULL-text documents
    emit nothing (the batch contract: NULL matches nothing). State: one
    row per distinct chunk hash in the window, evicted by the
    watermark.
    """
    from forgettable_spark.extensions.dedup import chunk_array

    exploded = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.col(ts_col),
        F.posexplode(chunk_array(F.col(text_col), width)).alias(
            "chunk_idx", "_chunk"
        ),
    )
    hashed = exploded.select(
        id_col,
        ts_col,
        F.col("chunk_idx").cast("bigint"),
        F.md5(F.col("_chunk")).alias("chunk_md5"),
    )
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["chunk_md5"]
    )


def streaming_simhash_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sketch-level near-dup: emit only the first document per
    60-bit SimHash value within the watermark window.

    The near-dup tier between exact content dedup and the batch pairwise
    pass: token-order changes, whitespace noise, and small substitutions
    that leave the sketch unchanged are suppressed at ingest, while the
    batch byte-pigeonhole join (hamming 1-3) remains the thorough pass
    over the compacted corpus. The sketch is the ROW-LOCAL
    :func:`forgettable_spark.extensions.dedup.simhash_column` — a stream
    can't run the batch explode+aggregation before a stateful dedup
    (chained stateful operators), and bit-identity between the two
    sketch shapes is test-asserted, so ingest-time and batch decisions
    can never disagree about a sketch value. State: one row per distinct
    sketch in the window, evicted by the watermark.

    NULL-text documents pass through UNSKETCHED (``simhash`` NULL) and
    never participate in dedup — the batch contract (``simhash_pairs``
    filters ``isNotNull`` before sketching: NULL matches nothing).
    Without the split, ``simhash_column(NULL)`` yields a NULL sketch and
    ``dropDuplicatesWithinWatermark`` groups NULL keys as EQUAL, so every
    NULL-text doc after the first in a window would be silently dropped
    at ingest while the batch pass kept it.
    """
    from forgettable_spark.extensions.dedup import simhash_column

    sketched = docs.filter(F.col(text_col).isNotNull()).withColumn(
        "simhash", simhash_column(F.col(text_col))
    )
    deduped = sketched.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["simhash"]
    )
    passthrough = docs.filter(F.col(text_col).isNull()).withColumn(
        "simhash", F.lit(None).cast("bigint")
    )
    return deduped.unionByName(passthrough)
