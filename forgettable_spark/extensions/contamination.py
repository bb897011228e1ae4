"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation/benchmark set.

The standard training-data hygiene pass: before training, every corpus
document is checked for n-gram overlap against the benchmark suites the
model will be evaluated on; contaminated documents are dropped or
reported. The overlap metric is *containment* — the fraction of an eval
document's distinct n-grams that also appear in the corpus document —
plus the raw shared-gram count.

Scale posture (the part that matters at 100 TB): benchmark suites are
tiny relative to the corpus (thousands of documents vs billions), so the
eval n-gram set is **broadcast** — the corpus side streams through a
scan-stage hash probe and never shuffles. The plan is:

    corpus -> project distinct gram hashes (row-local, codegen)
           -> explode -> BroadcastHashJoin(eval grams)
           -> partial/final count per (doc, eval_doc)

asserted broadcast in tests/test_plans.py. Gram hashes are the engine's
31-bit md5-derived shingle hash (:func:`forgettable_spark.extensions.
text.shingle_hash`), shared bit-for-bit with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from forgettable_spark.extensions.text import shingle_hash, shingles


def _distinct_gram_hashes(text_col: Column, n: int) -> Column:
    """Per-document distinct n-gram hash array (row-local)."""
    return F.array_distinct(F.transform(shingles(text_col, n), shingle_hash))


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_shared: int = 4,
) -> DataFrame:
    """(doc_id, eval_doc_id, n_shared, containment) for every corpus
    document sharing >= ``min_shared`` distinct word n-grams with an eval
    document.

    ``containment = n_shared / |distinct n-grams of the eval doc|`` — the
    asymmetric overlap used for decontamination (a short eval question
    fully contained in a long document scores 1.0 regardless of the
    document's length). Self-pairs (same id on both sides) are excluded
    so an eval set drawn from the corpus doesn't flag itself.

    Both sides reduce to distinct gram *hashes* before the join: counts
    are over hashes, identically in the DuckDB oracle, so the result is
    hash-collision-deterministic across engines.
    """
    corpus_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_distinct_gram_hashes(F.col(text_col), n)).alias("h"),
    )
    eval_grams = eval_docs.select(
        F.col(id_col).alias("eval_doc_id"),
        F.explode(_distinct_gram_hashes(F.col(text_col), n)).alias("h"),
    )
    # Grams are distinct per document by construction (array_distinct
    # before the explode), so (doc_id, h) and (eval_doc_id, h) are unique
    # and plain counts equal distinct counts — skipping countDistinct's
    # two-phase expand/dedup aggregation.
    eval_sizes = eval_grams.groupBy("eval_doc_id").agg(
        F.count(F.lit(1)).alias("n_eval")
    )
    shared = (
        corpus_grams.join(F.broadcast(eval_grams), "h")
        .filter(F.col("doc_id") != F.col("eval_doc_id"))
        .groupBy("doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return shared.join(F.broadcast(eval_sizes), "eval_doc_id").select(
        "doc_id",
        "eval_doc_id",
        "n_shared",
        (F.col("n_shared").cast("double") / F.col("n_eval").cast("double")).alias(
            "containment"
        ),
    )


def fuzzy_decontaminate_from_sketches(
    corpus_sigs: DataFrame,
    eval_sigs: DataFrame,
    id_col: str = "doc_id",
    k: int = 12,
    bands: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate eval contamination: (doc_id, eval_doc_id, jaccard)
    for corpus documents whose whole-document shingle-set Jaccard with an
    eval/benchmark document reaches ``threshold``, with candidates from
    banded MinHash collision — the fuzzy complement of
    :func:`decontaminate`'s exact n-gram containment (an eval document
    that leaked into the corpus with light edits shares few exact
    3-grams per edit but keeps high set Jaccard).

    Both inputs are sketch-spine-shaped frames (id, shd, mh —
    :func:`forgettable_spark.extensions.dedup._minhash_sketches`): the
    corpus side reads the materialized sketch spine (text-free), the
    eval side is tiny by construction (benchmark suites vs a 100 TB
    corpus) so its banded keys AND its shingle sets are **broadcast** —
    the corpus streams through two scan-stage hash probes and the only
    shuffle is the candidate-pair distinct, O(collisions). Same banding
    (:func:`~forgettable_spark.extensions.dedup._band_keys`) and exact
    verify as ``dedup_minhash_lsh``, reproduced by the DuckDB oracle, so
    recall-by-banding is part of the checked contract, not a caveat.

    Self-pairs (eval drawn from the corpus) are excluded by id, as in
    :func:`decontaminate`.
    """
    from forgettable_spark.extensions.dedup import _band_keys, _jaccard_distinct

    rows_per_band = k // bands

    def banded(sigs: DataFrame, out_id: str) -> DataFrame:
        return sigs.select(
            F.col(id_col).alias(out_id),
            F.posexplode(_band_keys(F.col("mh"), bands, rows_per_band)).alias(
                "band", "key"
            ),
        )

    cand = (
        banded(corpus_sigs, "doc_id")
        .join(F.broadcast(banded(eval_sigs, "eval_doc_id")), ["band", "key"])
        .filter(F.col("doc_id") != F.col("eval_doc_id"))
        .select("doc_id", "eval_doc_id")
        .distinct()
    )
    # Join on the FIXED aliases ("doc_id"/"eval_doc_id") that banded()
    # minted, not on the caller's id_col — cand no longer carries the
    # original name, so joining on id_col raised for any id_col other
    # than "doc_id" (ADVICE r6).
    corpus_sh = corpus_sigs.select(
        F.col(id_col).alias("doc_id"),
        F.col("shd").alias("sh_c"),
        F.size("shd").cast("bigint").alias("nc"),
    )
    eval_sh = eval_sigs.select(
        F.col(id_col).alias("eval_doc_id"),
        F.col("shd").alias("sh_e"),
        F.size("shd").cast("bigint").alias("ne"),
    )
    return (
        cand.join(corpus_sh, "doc_id")
        .join(F.broadcast(eval_sh), "eval_doc_id")
        .withColumn(
            "jaccard",
            _jaccard_distinct(F.col("sh_c"), F.col("sh_e"), F.col("nc"), F.col("ne")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id", "eval_doc_id", "jaccard")
    )


def keep_list_after_decontamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_shared: int = 4,
) -> DataFrame:
    """The actionable form: corpus ids with no flagged overlap — a left
    anti join against the flag table (NULL-safe by construction)."""
    flagged = decontaminate(docs, eval_docs, text_col, id_col, n, min_shared)
    return docs.select(F.col(id_col).alias("doc_id")).join(
        flagged.select("doc_id").distinct(), "doc_id", "left_anti"
    )
