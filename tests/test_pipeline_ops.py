"""Sequence packing, bigram-LM scoring, and incremental admission:
semantics beyond the registered oracle parity (tests/test_oracle_parity.py
covers pack_sequences / lm_score / dedup_incremental end-to-end at two
SFs against their DuckDB twins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from forgettable_spark.extensions.dedup import incremental_lsh_admit
from forgettable_spark.extensions.lm import bigram_lm_score
from forgettable_spark.extensions.packing import pack_concat


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# Sequence packing ------------------------------------------------------------


def _layout(spark, rows, **kw):
    return {r["doc_id"]: r.asDict() for r in pack_concat(_docs(spark, rows), **kw).collect()}


def test_pack_stream_identity(spark):
    """Within each shard, the layout is a partition of a contiguous token
    stream: offsets and bins reconstruct exactly the running total."""
    rows = [(i, " ".join(["w"] * (3 + i % 7))) for i in range(40)]
    out = pack_concat(_docs(spark, rows), budget=10, n_shards=3).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(out) == 40
    for shard_rows in by_shard.values():
        # reconstruct cum_before from (start_bin, offset) and check the
        # stream has no gaps under SOME ordering (sort by position).
        pos = sorted(shard_rows, key=lambda r: r["start_bin"] * 10 + r["offset_in_bin"])
        cum = 0
        for r in pos:
            assert r["start_bin"] * 10 + r["offset_in_bin"] == cum
            assert r["end_bin"] == (cum + r["n_tokens"] - 1) // 10
            assert 0 <= r["offset_in_bin"] < 10
            cum += r["n_tokens"]


def test_pack_partitioning_independence(spark):
    rows = [(i, " ".join(["tok"] * (1 + i % 11))) for i in range(60)]
    a = _layout(spark, rows, budget=16, n_shards=4)
    b = {
        r["doc_id"]: r.asDict()
        for r in pack_concat(
            _docs(spark, rows).repartition(13), budget=16, n_shards=4
        ).collect()
    }
    assert a == b


def test_pack_null_text_excluded_and_budget_one(spark):
    rows = [(1, "a b c"), (2, None), (3, "d")]
    out = _layout(spark, rows, budget=1, n_shards=1)
    assert set(out) == {1, 3}
    # budget=1: every token its own bin; doc of 3 tokens spans 3 bins
    r = out[1]
    assert r["end_bin"] - r["start_bin"] == 2 and r["offset_in_bin"] == 0


def test_pack_rejects_bad_params(spark):
    d = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        pack_concat(d, budget=0)
    with pytest.raises(ValueError):
        pack_concat(d, n_shards=0)


# Bigram LM scoring -----------------------------------------------------------


def test_lm_score_hand_computed(spark):
    """Tiny corpus, model computed by hand.

    Docs: "a b", "a b", "a c" → bigrams: (a b)×2, (a c)×1.
    c(a·)=3; discounted p(b|a)=2/4, p(c|a)=1/4.
    Doc 1/2 score = 1/2; doc 3 score = 1/4.
    """
    docs = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    out = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    assert out[1]["n_bigrams"] == 1 and out[1]["lm_score"] == pytest.approx(1 / 2)
    assert out[2]["lm_score"] == pytest.approx(1 / 2)
    assert out[3]["lm_score"] == pytest.approx(1 / 4)


def test_lm_score_repeated_text_scores_higher_than_noise(spark):
    """The filter's purpose: text made of common transitions outranks a
    document whose transitions are unique in the corpus."""
    common = [(i, "the cat sat on the mat") for i in range(5)]
    noise = [(100, "zq xv qp mw lk jh")]
    out = {r["doc_id"]: r["lm_score"] for r in bigram_lm_score(_docs(spark, common + noise)).collect()}
    assert out[0] > out[100]


def test_lm_score_bounds_and_short_docs(spark):
    """Scores stay in (0, 1) — the rule-of-succession discount caps even
    a deterministic transition below 1; 1-token docs fall back to the
    whole-text gram (self-prefix)."""
    docs = _docs(spark, [(1, "solo"), (2, "a b a b"), (3, None)])
    rows = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    assert 3 not in rows  # NULL text: no score row
    assert rows[1]["lm_score"] == pytest.approx(1 / 2)  # once-seen: capped at 1/2
    for r in rows.values():
        assert 0.0 < r["lm_score"] < 1.0


# Incremental admission -------------------------------------------------------


def _corpus(i, seed):
    return f"{seed} common prefix tokens shared across this synthetic document number {i}"


def test_incremental_admit_flags_only_new_vs_old(spark):
    """A batch doc near-identical to an existing doc is flagged with that
    match; a novel batch doc is admitted; existing-existing duplicates
    are never compared (no old ids in the output)."""
    existing = _docs(
        spark,
        [(i, _corpus(i, f"unique{i} body")) for i in range(10)]
        # two existing near-dups of each other: must NOT appear in output
        + [(20, _corpus(0, "twin body text")), (21, _corpus(0, "twin body text"))],
    )
    batch = _docs(
        spark,
        [
            (100, _corpus(3, "unique3 body")),  # near-dup of existing 3
            (101, "completely different novel content with no overlap at all here"),
            (102, None),  # NULL text: admitted unmatched
        ],
    )
    out = {r["doc_id"]: r for r in incremental_lsh_admit(existing, batch, threshold=0.5).collect()}
    assert set(out) == {100, 101, 102}
    assert out[100]["is_dup"] and out[100]["match_id"] == 3 and out[100]["jaccard"] >= 0.5
    assert not out[101]["is_dup"] and out[101]["match_id"] == -1 and out[101]["jaccard"] == 0.0
    assert not out[102]["is_dup"]


def test_incremental_admit_best_match_ties(spark):
    """Two equally good existing matches: the lower existing id wins."""
    text = "identical content repeated verbatim for the admission tie test case"
    existing = _docs(spark, [(7, text), (3, text)])
    batch = _docs(spark, [(50, text)])
    out = incremental_lsh_admit(existing, batch).collect()
    assert len(out) == 1
    r = out[0]
    assert r["is_dup"] and r["match_id"] == 3 and r["jaccard"] == 1.0
