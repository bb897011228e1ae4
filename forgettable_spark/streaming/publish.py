"""Streaming → transactional publish: the closed production write path.

ingest (``readStream``) → keyed decaying state
(:func:`~forgettable_spark.streaming.forget_stream.streaming_forget_table`)
→ per-batch transactional baseline publish
(:class:`~forgettable_spark.sources.txn.ManifestTable`).

This is the reference's full lifecycle — ``/incr`` → write-back → state
readable by ``/dist`` (``goforget/forget.go:31-69``, ``redis_utils.go:
124-196``) — made durable: every micro-batch ends with an atomically
published, versioned, EVENTS-SHAPED baseline that batch readers consume
like any increment log (``ops.snapshot`` → ``get_dist``) and that
``compact_to_table`` can re-compact. Readers never see a partial state
(manifest visibility is atomic) and old versions stay time-travelable
until vacuum.

Deletions: a distribution whose state decays away entirely (or TTL-times
out) emits no rows, so its last-published baseline rows persist until a
compaction pass or the read-side expiry predicate
(``functions/expiry.py``) retires them — the same contract as the
reference, whose ``/dist`` also filters dead keys at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from forgettable_spark.functions.cache import _persistent_rdd_ids
from forgettable_spark.sources.txn import CommitConflictError, ManifestTable

#: Read-modify-write attempts per micro-batch before surfacing the
#: conflict to the streaming query (a persistent conflict means another
#: writer owns the table — fail loudly, don't livelock).
MAX_COMMIT_ATTEMPTS = 3


def publish_batch(
    batch_df: DataFrame, table: ManifestTable, n_shards: int | None = None
) -> int | None:
    """``foreachBatch`` body: merge one micro-batch of updated
    distribution state into the current baseline and commit the next
    version; returns the committed version (None for an empty batch).

    The state operator emits a state group's FULL post-update bins each
    batch, so the merge replaces whole state groups: baseline rows of
    untouched groups carry over, updated ones are rewritten. Published
    rows are events-shaped (distribution, bin, n, ts), keeping the table
    a valid increment log.

    ``n_shards`` MUST match the ``streaming_forget_table(n_shards=…)``
    that produced the stream. A sharded stream's micro-batch carries only
    the updated SHARDS' bins for a distribution; replacing the whole
    distribution would silently drop the untouched shards' bins from the
    new version. The shard id is deterministic from the bin
    (``pmod(xxhash64(bin), n_shards)`` — same formula as the state
    operator), so the merge recomputes it on the baseline side and
    replaces exactly the (distribution, shard) groups present in the
    batch.

    The read-modify-write cycle is pinned: ``read_pinned`` →
    ``commit(base_version=...)``, so a concurrent writer (a scheduled
    compactor racing the stream) surfaces as CommitConflictError and the
    merge retries against the freshly published version instead of
    silently overwriting it.
    """
    if batch_df.isEmpty():
        return None
    spark = batch_df.sparkSession
    updated = batch_df.select(
        "distribution",
        "bin",
        F.col("count").alias("n"),
        F.timestamp_micros(F.col("t_us")).alias("ts"),
    )
    # The micro-batch df is recomputed per action; the merge below reads it
    # twice (distinct dists + union) and a conflict retry reads it again.
    # Snapshot persisted RDD ids FIRST: `updated.rdd.unpersist()` would
    # not release the checkpoint blocks (DataFrame.rdd is a fresh derived
    # RDD, never the persisted internal one), so without the id sweep a
    # long-running stream leaks one checkpoint per micro-batch until JVM
    # GC — unbounded storage creep.
    rdd_ids_before = _persistent_rdd_ids(spark)
    updated = updated.localCheckpoint(eager=True)

    def shard(col: str = "bin"):
        return F.pmod(F.xxhash64(col), F.lit(n_shards)).cast("int")

    try:
        for _ in range(MAX_COMMIT_ATTEMPTS):
            try:
                base, pinned = table.read_pinned(spark)
            except FileNotFoundError:
                base, pinned = None, None
            if base is None:
                merged = updated
            elif n_shards:
                touched = (
                    updated.select("distribution", shard().alias("_shard")).distinct()
                )
                kept = (
                    base.withColumn("_shard", shard())
                    .join(touched, ["distribution", "_shard"], "left_anti")
                    .drop("_shard")
                )
                merged = kept.unionByName(updated)
            else:
                touched = updated.select("distribution").distinct()
                merged = base.join(touched, "distribution", "left_anti").unionByName(
                    updated
                )
            try:
                return table.commit(merged, base_version=pinned)
            except CommitConflictError:
                continue
        raise CommitConflictError(
            f"micro-batch publish to {table.root} lost {MAX_COMMIT_ATTEMPTS} "
            "consecutive commit races — another writer owns this table"
        )
    finally:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for key in jmap.keySet().toArray():
            if int(key) not in rdd_ids_before:
                jmap.get(key).unpersist(False)


def publish_stream_to_table(
    state_stream: DataFrame,
    table: ManifestTable,
    checkpoint_dir: str,
    query_name: str = "forget_publish",
    available_now: bool = False,
    n_shards: int | None = None,
) -> StreamingQuery:
    """Wire a ``streaming_forget_table`` output stream into per-batch
    transactional publishes. Pass the SAME ``n_shards`` the state
    operator uses (see :func:`publish_batch`). Returns the started
    query; exactly-once is anchored by the checkpoint (re-run batches
    re-merge idempotently: replacing a state group with the same state
    is a no-op in content, though it does claim a new version)."""
    writer = (
        state_stream.writeStream.outputMode("update")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda df, _epoch: publish_batch(df, table, n_shards=n_shards))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
