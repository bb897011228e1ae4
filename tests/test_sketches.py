"""The shared sketch spine (extensions/sketches.py): one corpus
shingle/hash pass feeding the dedup family.

The load-bearing claim is EQUIVALENCE: every consumer must produce
bit-identical rows with and without the spine (the DuckDB oracles only
check the spine path once the registered queries use it — these tests
pin the standalone path to the same values). The spine stores ``shd``
SORTED; the MinHash min-fold and intersect-based Jaccard counts are
order-independent, so that cannot change any value — asserted here per
consumer rather than argued."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from forgettable_spark.extensions import dedup, postings, sketches
from forgettable_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _rows(df):
    cols = sorted(df.columns)
    return sorted([tuple(repr(r[c]) for c in cols) for r in df.collect()])


def _spine(spark, key):
    docs = load_table(spark, SF_SMOKE, "documents")
    return docs, sketches.materialized_sketches(spark, docs, corpus_key=key)


def test_minhash_lsh_spine_equivalence(spark):
    docs, sp = _spine(spark, "eq-mh-lsh")
    a = dedup.minhash_lsh_pairs(docs, k=12, bands=4, threshold=0.8, persist=False)
    b = dedup.minhash_lsh_pairs_from_sketches(
        sp["shingled"], k=12, bands=4, threshold=0.8
    )
    assert _rows(a) == _rows(b)


def test_ngram_jaccard_spine_equivalence(spark):
    docs, sp = _spine(spark, "eq-ngram")
    a = dedup.ngram_jaccard_pairs(docs, threshold=0.8, persist=False)
    b = dedup.ngram_jaccard_pairs_from_shingled(
        sp["shingled"].select("doc_id", F.col("lang").alias("_block"), "shd", "nsh"),
        threshold=0.8,
    )
    assert _rows(a) == _rows(b)


def test_simhash_pairs_spine_equivalence(spark):
    docs, sp = _spine(spark, "eq-simhash")
    a = dedup.simhash_pairs(docs, max_hamming=3)
    b = dedup.simhash_pairs_from_sketch(sp["simhash"], max_hamming=3)
    assert _rows(a) == _rows(b)
    # the capped twin must agree under the same cap (the spine changes
    # where the sketch comes from, never which buckets survive)
    a2 = dedup.simhash_pairs(docs, max_hamming=3, max_bucket_size=5, log_dropped=False)
    b2 = dedup.simhash_pairs_from_sketch(
        sp["simhash"], max_hamming=3, max_bucket_size=5, log_dropped=False
    )
    assert _rows(a2) == _rows(b2)


def test_incremental_narrow_sigs_spine_equivalence(spark):
    """The spine's (doc_id, mh) projection must equal
    minhash_sketch_narrow exactly — it feeds the admission split."""
    docs, sp = _spine(spark, "eq-incr")
    a = dedup.minhash_sketch_narrow(docs, k=12)
    b = sp["shingled"].select("doc_id", "mh")
    assert _rows(a) == _rows(b)


def test_both_families_share_one_combined_build(spark, monkeypatch):
    """The r7 contract: postings and sketches are two VIEWS of one
    combined five-table spine — same corpus_key resolves to the SAME
    root, and whichever family touches the corpus first pays the only
    build (the second family's call must not re-enter any build path)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    key = "eq-coexist"
    t_post = postings.materialized_postings(spark, docs, corpus_key=key)
    # poison BOTH table constructors: the sketch call below must be a
    # pure memo hit off the postings-triggered build
    monkeypatch.setattr(
        postings, "_tables_from_base", lambda *a, **k: (_ for _ in ()).throw(AssertionError)
    )
    monkeypatch.setattr(
        sketches,
        "_sketch_tables_from_base",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError),
    )
    t_sk = sketches.materialized_sketches(spark, docs, corpus_key=key)
    root_post = os.path.dirname(os.path.dirname(t_post["postings"].inputFiles()[0]))
    root_sk = os.path.dirname(os.path.dirname(t_sk["simhash"].inputFiles()[0]))
    assert root_post == root_sk
    assert t_sk["shingled"].count() > 0


def test_materialized_sketches_build_once(spark, monkeypatch):
    docs = load_table(spark, SF_SMOKE, "documents")
    key = "eq-build-once"
    t1 = sketches.materialized_sketches(spark, docs, corpus_key=key)
    n1 = t1["shingled"].count()
    # poison the build path to prove the second call reads the memo
    monkeypatch.setattr(
        sketches,
        "_sketch_tables_from_base",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError),
    )
    t2 = sketches.materialized_sketches(spark, docs, corpus_key=key)
    assert t2["shingled"].count() == n1
