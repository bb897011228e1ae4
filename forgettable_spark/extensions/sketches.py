"""One sketch spine for the document-dedup family.

``dedup_minhash_lsh``, ``dedup_ngram_jaccard``, ``dedup_simhash_pairs``
(+ its capped twin), ``dedup_components``, ``dedup_lsh_recall`` and
``dedup_incremental`` each need the corpus re-expressed as per-document
sketches, and before this module each re-shingled and re-hashed the
corpus independently — the md5-per-token / md5-per-shingle hashing is
the family's dominant redundant cost (it is ~half the SimHash sketch
stage at sf1 — dedup.simhash_sketch docstring). This module
materializes the shared sketches ONCE per (session, corpus):

- ``shingled`` — (doc_id, lang, shd, nsh, mh): the sorted-distinct
  word-3-gram shingle set, its size, and the k-element MinHash
  signature. One row per non-NULL-text document. Serves the LSH
  banding (mh), the PPJoin prefix index (shd sorted + nsh), the exact
  Jaccard verify (shd), and the admission split (mh narrow).
- ``simhash``  — (doc_id, simhash): the 60-bit SimHash sketch. SimHash
  consumers verify with ``bit_count(xor)`` only, so they run entirely
  off this fixed-width table — corpus text is never touched.

Since r7 both sketch tables derive from the COMBINED corpus spine's one
persisted token projection (``postings.materialized_corpus_spine``):
shingles are a token-window transform (``text.shingles_from_tokens``)
and SimHash explodes the same token arrays, so the whole five-table
spine — this family's two plus the token family's three — costs ONE
corpus-text scan per (session, corpus) instead of the previous three
(VERDICT r6 #1). Every value is bit-identical to the standalone
consumer paths (test-asserted per consumer in tests/test_sketches.py),
so the family's DuckDB oracles are untouched.

Production posture: this is a TABLE maintained incrementally by the
admission loop, not a per-session cache —
``streaming/admit.py::admit_batch(sketch_dir=...)`` appends each
admitted batch's shingled/simhash delta off the batch's one
checkpointed token-carrying sketch frame (nothing re-reads or re-splits
the batch text — O(batch)), the same fold/vacuum cycle compacts the
chains, and ``streaming.admit.read_sketches`` reassembles tables
row-identical to a from-scratch rebuild (test-asserted:
tests/test_streaming_admit.py::test_incremental_sketches_match_rebuild).
``shd`` is the spine's one corpus-sized column — the analog of the
postings spine's term fan-out: storing it buys every exact-verify
consumer a text-free plan; a deployment that prefers not to store
shingles drops the column and re-shingles candidate documents only,
exactly as ``dedup.incremental_admit_from_sketches`` already does.

Determinism: the spine PRE-COMPUTES the same values each consumer
previously derived inline — ``shd`` is sorted here, but the MinHash
min-fold and intersect-based Jaccard counts are order-independent
(dedup.ngram_jaccard_pairs_from_shingled contract), so every
downstream result is bit-identical with or without the spine
(test-asserted per consumer in tests/test_sketches.py) and the family's
DuckDB oracles are untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from forgettable_spark.extensions.dedup import simhash_sketch
from forgettable_spark.extensions.postings import _full_base, materialized_corpus_spine
from forgettable_spark.extensions.text import (
    minhash_signature_from_base,
    shingle_hash,
    shingles_from_tokens,
)

_TABLES = ("shingled", "simhash")


def _sketch_tables_from_base(base: DataFrame, k: int = 12) -> dict[str, DataFrame]:
    """The two sketch tables as LAZY DataFrames off the combined spine's
    token projection (``postings._full_base``: doc_id, _lang, _w, _t).
    Shingles re-use the token arrays via a window transform; SimHash
    explodes the same arrays — neither touches the corpus text again.
    Expression-identical to the pre-r7 standalone forms, so every value
    is unchanged."""
    shingled = (
        base.select(
            "doc_id",
            F.col("_lang").alias("lang"),
            shingles_from_tokens(F.col("_w"), F.col("_t")).alias("_sh"),
        )
        .withColumn("shd", F.array_sort(F.array_distinct(F.col("_sh"))))
        .withColumn("nsh", F.size("shd").cast("bigint"))
        .withColumn("mh", minhash_signature_from_base(F.transform(F.col("shd"), shingle_hash), k))
        .select("doc_id", "lang", "shd", "nsh", "mh")
    )
    sim = simhash_sketch(base, id_col="doc_id", tokens_col="_w").select(
        "doc_id", "simhash"
    )
    return {"shingled": shingled, "simhash": sim}


def sketch_tables(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "lang",
    k: int = 12,
) -> dict[str, DataFrame]:
    """The two spine tables as LAZY DataFrames (module docstring).
    NULL-text documents appear in neither — the family-wide contract
    (NULL shingle sets would Jaccard-match each other, NULL simhashes
    would collide at hamming 0). ``block_col`` rides along for PPJoin
    blocking; pass None for corpora without one."""
    return _sketch_tables_from_base(
        _full_base(docs, text_col, id_col, block_col), k
    )


def materialized_sketches(
    spark: SparkSession,
    docs: DataFrame,
    corpus_key: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "lang",
    k: int = 12,
) -> dict[str, DataFrame]:
    """Session-memoized sketch spine — the dedup family's view of the
    COMBINED corpus spine (``postings.materialized_corpus_spine``):
    whichever family first touches the corpus pays the one-scan
    five-table build, and every later consumer in either family reads
    the parquet back without re-hashing the corpus. Memoization,
    stale-corpus fingerprinting, and atexit cleanup are the shared
    machinery of ``postings.materialize_table_set``."""
    t = materialized_corpus_spine(
        spark, docs, corpus_key, text_col, id_col, block_col, k
    )
    return {name: t[name] for name in _TABLES}
