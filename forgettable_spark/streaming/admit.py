"""Streaming admission dedup: the ingest-time closed loop over the
incremental LSH admit operator.

Batch dedup answers "which documents in this corpus duplicate each
other"; ingest answers a different question per arriving micro-batch:
"which of THESE documents may enter the corpus?" — against everything
already admitted, without ever re-comparing admitted documents with
each other. This module maintains the two tables that make that
question O(batch):

- **sketch index** — narrow (doc_id, mh) MinHash signatures of every
  admitted document (``dedup.minhash_sketch_narrow``: k BIGINTs per
  doc, the storable shape);
- **admitted corpus** — the admitted documents themselves (the ingest
  OUTPUT; also supplies candidate text for the exact-Jaccard verify).

Each micro-batch runs two passes:

1. **within-batch** — ``dedup.minhash_lsh_pairs`` over the batch alone;
   a document matching a LOWER-id batch document is flagged
   (``match_kind='within_batch'``). Greedy, not transitive: the match
   may itself be a duplicate whose own match chains onward — the
   verdict log preserves the chain. The micro-batch is small, so the
   batch self-join (and its second sketch pass) is O(batch²-bounded-
   by-LSH), never O(corpus).
2. **against the index** — survivors run
   ``dedup.incremental_admit_from_sketches`` against the stored index:
   the band join is batch×index only, verify re-shingles candidate
   documents from the admitted corpus, and nothing old×old ever forms
   (``match_kind='corpus'``).

Survivors of both passes are ADMITTED: their documents append to the
corpus and their sketches to the index.

Exactly-once: every write (verdicts, admitted docs, admitted sketches)
lands under a ``batch-<id>`` subdirectory in OVERWRITE mode, so a
replayed micro-batch (checkpoint recovery) rewrites its own partition
byte-identically instead of appending twice — the same
deterministic-republish contract as ``streaming/publish.py``, with the
partition directory playing the role of the versioned segment. One
writer per table set, serialized by the streaming engine (foreachBatch
batches never overlap within a query).

At 100 TB: the index is O(admitted · k) BIGINTs — a fixed-width table
a band join can digest; per-batch cost is sketching the batch plus the
band join against index buckets (cap via ``max_bucket_size``), plus
candidate-only verify. Nothing in the loop scales with corpus text
except the bounded candidate join-back.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from forgettable_spark.extensions import dedup

#: Verdict match_kind values.
KIND_NONE = "none"
KIND_WITHIN_BATCH = "within_batch"
KIND_CORPUS = "corpus"

_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mh", T.ArrayType(T.LongType())),
    ]
)


def _read_or_empty(
    spark: SparkSession, path: str, schema: T.StructType, exclude_batch: int
) -> DataFrame:
    """Read a batch-subdir parquet table, or an empty frame before the
    first commit (exists-check, not try/except: a corrupt table must
    raise, only a missing one is 'empty'). Subdirs are plain
    ``batch-<id>`` names (NOT hive ``batch=`` partitions — the batch id
    is a write-idempotency address, not a query dimension).

    ``exclude_batch`` skips the CURRENT batch's own subdir: on replay
    after checkpoint recovery, the previous attempt's output is already
    on disk, and reading it back would make every replayed document a
    perfect duplicate OF ITSELF — admitting nothing and overwriting the
    partition with an empty verdict set. Excluding the own partition
    makes replay read exactly the state the first attempt saw."""
    own = f"batch-{exclude_batch}"
    if os.path.isdir(path):
        parts = [
            os.path.join(path, e)
            for e in sorted(os.listdir(path))
            if e.startswith("batch-") and e != own
        ]
        if parts:
            return spark.read.schema(schema).parquet(*parts)
    return spark.createDataFrame([], schema)


def admit_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    index_dir: str,
    corpus_dir: str,
    verdict_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 12,
    bands: int = 4,
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
) -> None:
    """Process one micro-batch (module docstring): write verdicts, and
    append admitted documents + sketches, all under ``batch-<id>``
    subdirs (idempotent overwrite). ``batch`` must have at least
    (id_col, text_col); extra columns ride into the admitted corpus."""
    from forgettable_spark.functions.cache import run_released

    corpus_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(text_col, T.StringType()),
        ]
    )
    # The batch feeds several consumers (within-batch pairs, survivor
    # filter, index admit, corpus append) — pin it once. The checkpoint
    # blocks are swept by OWN id (before/after snapshot) in the finally:
    # DataFrame.unpersist on the derived frame would not free them, and
    # a blanket sweep would evict a co-resident session user's caches
    # (same discipline as publish_batch).
    before_ids = {
        int(x) for x in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    batch = batch.localCheckpoint(eager=True)
    own_ids = {
        int(x) for x in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    } - before_ids
    try:

        def build() -> DataFrame:
            # Pass 1: within-batch near-dups (earlier id wins).
            from pyspark.sql import Window

            pairs = dedup.minhash_lsh_pairs(
                batch,
                text_col=text_col,
                id_col=id_col,
                k=k,
                bands=bands,
                threshold=threshold,
                persist=False,  # micro-batch scale; nothing to cache
                max_bucket_size=max_bucket_size,
            )
            w = Window.partitionBy("doc_b").orderBy(F.desc("jaccard"), F.asc("doc_a"))
            within = (
                pairs.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select(
                    F.col("doc_b").alias(id_col),
                    F.col("doc_a").alias("match_id"),
                    "jaccard",
                )
                # two consumers (verdict union + survivor anti-join);
                # the block is swept by run_released's own-ids pass
                .localCheckpoint(eager=True)
            )
            survivors = batch.join(within.select(id_col), id_col, "left_anti")

            # Pass 2: survivors vs the stored index; verify text comes
            # from the admitted corpus (existing) and the batch (new).
            old_sigs = _read_or_empty(spark, index_dir, _INDEX_SCHEMA, batch_id)
            existing = _read_or_empty(spark, corpus_dir, corpus_schema, batch_id)
            new_sigs = dedup.minhash_sketch_narrow(survivors, text_col, id_col, k)
            corpus_verdicts = dedup.incremental_admit_from_sketches(
                old_sigs.withColumnRenamed("doc_id", id_col),
                new_sigs,
                existing,
                survivors,
                text_col=text_col,
                id_col=id_col,
                k=k,
                bands=bands,
                threshold=threshold,
                max_bucket_size=max_bucket_size,
            )
            return (
                within.select(
                    F.col(id_col).alias("doc_id"),
                    F.lit(True).alias("is_dup"),
                    "match_id",
                    "jaccard",
                    F.lit(KIND_WITHIN_BATCH).alias("match_kind"),
                )
                .unionByName(
                    corpus_verdicts.select(
                        F.col("doc_id"),
                        "is_dup",
                        "match_id",
                        "jaccard",
                        F.when(F.col("is_dup"), F.lit(KIND_CORPUS))
                        .otherwise(F.lit(KIND_NONE))
                        .alias("match_kind"),
                    )
                )
                .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
            )

        # run_released: verdicts are O(batch) rows; every cache the admit
        # machinery registered (candidate table, candidate shingles) and
        # every localCheckpoint inside the build is released before the
        # writes below — per-micro-batch storage hygiene on a loop that
        # runs indefinitely.
        verdicts = run_released(spark, build)

        admitted_ids = verdicts.filter(~F.col("is_dup")).select(
            F.col("doc_id").alias(id_col)
        )
        admitted = batch.join(admitted_ids, id_col)
        admitted_sigs = dedup.minhash_sketch_narrow(admitted, text_col, id_col, k)

        verdicts.write.mode("overwrite").parquet(f"{verdict_dir}/batch-{batch_id}")
        # Full batch schema rides into the corpus (ts, source, ...);
        # the admit loop reads back only (id, text) via its pruned schema.
        admitted.write.mode("overwrite").parquet(f"{corpus_dir}/batch-{batch_id}")
        admitted_sigs.withColumnRenamed(id_col, "doc_id").write.mode(
            "overwrite"
        ).parquet(f"{index_dir}/batch-{batch_id}")
    finally:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for key in jmap.keySet().toArray():
            if int(key) in own_ids:
                jmap.get(key).unpersist(False)


def admission_stream(
    doc_stream: DataFrame,
    index_dir: str,
    corpus_dir: str,
    verdict_dir: str,
    checkpoint_dir: str,
    query_name: str = "forget_admit",
    available_now: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 12,
    bands: int = 4,
    threshold: float = 0.8,
    max_bucket_size: int | None = None,
) -> StreamingQuery:
    """Wire a document stream into the per-batch admission loop. Returns
    the started query; exactly-once anchored by the checkpoint + the
    idempotent ``batch=<id>`` overwrites."""

    def _on_batch(batch: DataFrame, batch_id: int) -> None:
        admit_batch(
            batch.sparkSession,
            batch,
            batch_id,
            index_dir,
            corpus_dir,
            verdict_dir,
            text_col=text_col,
            id_col=id_col,
            k=k,
            bands=bands,
            threshold=threshold,
            max_bucket_size=max_bucket_size,
        )

    writer = (
        doc_stream.writeStream.foreachBatch(_on_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
