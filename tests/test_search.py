"""BM25 retrieval: semantics beyond the registered oracle parity
(tests/test_oracle_parity.py covers bm25_search end-to-end at two SFs)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from forgettable_spark.extensions.search import BM25_B, BM25_K1, bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_basic_ranking_prefers_higher_tf_and_rarer_terms(spark):
    docs = _docs(
        spark,
        [
            (1, "cat cat cat dog"),
            (2, "cat dog dog dog"),
            (3, "dog dog dog dog"),
            (4, "bird bird bird bird"),
        ],
    )
    out = bm25_topk(docs, {"q": ["cat"]}, k=10).collect()
    got = [(r["doc_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])]
    # Only docs containing 'cat'; higher tf ranks first.
    assert got == [(1, 1), (2, 2)]


def test_single_term_ranking_matches_classic_bm25(spark):
    """The rational idf is a monotone transform of ln(1 + idf_r), so for
    a single-term query the ranking must equal classic (log) BM25's."""
    rows = [(i, " ".join(["term"] * (i + 1) + ["pad"] * (10 - i))) for i in range(8)]
    docs = _docs(spark, rows)
    out = bm25_topk(docs, {"q": ["term"]}, k=8).collect()
    ours = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]

    # classic BM25 reference, computed directly
    n = len(rows)
    dls = {i: len(t.split(" ")) for i, t in rows}
    avgdl = sum(dls.values()) / n
    tfs = {i: t.split(" ").count("term") for i, t in rows}
    df = sum(1 for v in tfs.values() if v > 0)
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))

    def classic(i):
        tf = tfs[i]
        return idf * tf * (BM25_K1 + 1) / (
            tf + BM25_K1 * (1 - BM25_B + BM25_B * dls[i] / avgdl)
        )

    expected = sorted(tfs, key=lambda i: (-classic(i), i))
    assert ours == expected


def test_null_text_and_unmatched_queries(spark):
    docs = _docs(spark, [(1, "alpha beta"), (2, None), (3, "beta gamma")])
    out = bm25_topk(docs, {"a": ["alpha"], "z": ["zebra"]}, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    assert by_q == {"a": [1]}  # NULL text never matches; no-hit query absent


def test_duplicate_query_terms_dedupe(spark):
    docs = _docs(spark, [(1, "x y"), (2, "x x y")])
    once = bm25_topk(docs, {"q": ["x"]}, k=5).collect()
    twice = bm25_topk(docs, {"q": ["x", "x"]}, k=5).collect()
    key = lambda rs: sorted((r["doc_id"], r["score"], r["rank"]) for r in rs)
    assert key(once) == key(twice)


def test_multi_term_scores_are_sum_of_single_terms(spark):
    """The sorted-fold sum must equal adding the per-term scores (same
    doubles, pinned order) — guards the fold against dropping or
    double-counting a term."""
    docs = _docs(
        spark,
        [(1, "red blue red green"), (2, "blue blue green"), (3, "red red red")],
    )
    both = {
        (r["doc_id"]): r["score"]
        for r in bm25_topk(docs, {"q": ["blue", "red"]}, k=10).collect()
    }
    red = {
        r["doc_id"]: r["score"] for r in bm25_topk(docs, {"q": ["red"]}, k=10).collect()
    }
    blue = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, {"q": ["blue"]}, k=10).collect()
    }
    for d in both:
        # 'blue' < 'red' in the sorted fold: blue adds first
        expected = blue.get(d, 0.0) + red.get(d, 0.0)
        assert both[d] == expected, (d, both[d], expected)


def test_empty_query_terms_raise(spark):
    docs = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        bm25_topk(docs, {}, k=5)


def test_no_python_in_plan(spark):
    docs = _docs(spark, [(1, "a b"), (2, "b c")])
    plan = bm25_topk(docs, {"q": ["b"]}, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
