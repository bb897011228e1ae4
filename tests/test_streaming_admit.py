"""Streaming admission dedup: the ingest loop over the incremental LSH
admit operator (streaming/admit.py) — within-batch + cross-batch
verdicts, index/corpus growth, replay idempotency, storage hygiene."""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from forgettable_spark.streaming.admit import admission_stream, admit_batch

T0 = datetime(2024, 6, 1, 12, 0, 0, tzinfo=timezone.utc)


def _ts(offset_sec: float) -> datetime:
    return datetime.fromtimestamp(T0.timestamp() + offset_sec, tz=timezone.utc)


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="forget_admit_")
    yield {
        "index": f"{d}/index",
        "corpus": f"{d}/corpus",
        "verdicts": f"{d}/verdicts",
        "ckpt": f"{d}/ckpt",
        "src": f"{d}/src",
        "root": d,
    }
    shutil.rmtree(d, ignore_errors=True)


def _write_docs(path: str, name: str, rows, mtime_offset: float = 0.0) -> None:
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "ts": pa.array(
                [r[2].replace(tzinfo=None) for r in rows], pa.timestamp("us")
            ),
        }
    )
    fp = os.path.join(path, name)
    pq.write_table(table, fp)
    mt = time.time() + mtime_offset
    os.utime(fp, (mt, mt))


DOC_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
DOC_B = "one two three four five six seven eight nine ten eleven twelve"
DOC_E = "completely different novel content nothing shared with any other document here"


def _verdicts(spark, dirs):
    return {
        r["doc_id"]: r.asDict()
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dirs["verdicts"])
        .collect()
    }


def test_admission_stream_two_batches(spark, dirs):
    """Batch 1: A and B admitted, C (≈A, higher id) flagged within-batch.
    Batch 2: D (≈B) flagged against the corpus index, E admitted. Index
    and corpus end with exactly the admitted docs."""
    _write_docs(dirs["src"], "b1.parquet", [
        (1, DOC_A, _ts(0)),
        (2, DOC_B, _ts(1)),
        (3, DOC_A + " kappa", _ts(2)),  # near-dup of 1, same batch
    ])
    _write_docs(dirs["src"], "b2.parquet", [
        (10, DOC_B + " twelve", _ts(10)),  # near-dup of 2, earlier batch
        (11, DOC_E, _ts(11)),
    ], mtime_offset=5)
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["src"])
    )
    q = admission_stream(
        stream,
        dirs["index"],
        dirs["corpus"],
        dirs["verdicts"],
        dirs["ckpt"],
        available_now=True,
        threshold=0.5,
    )
    q.awaitTermination(180)

    v = _verdicts(spark, dirs)
    assert set(v) == {1, 2, 3, 10, 11}
    assert not v[1]["is_dup"] and not v[2]["is_dup"] and not v[11]["is_dup"]
    assert v[3]["is_dup"] and v[3]["match_kind"] == "within_batch" and v[3]["match_id"] == 1
    assert v[10]["is_dup"] and v[10]["match_kind"] == "corpus" and v[10]["match_id"] == 2
    assert v[11]["match_kind"] == "none" and v[11]["match_id"] == -1

    corpus_ids = sorted(
        r["doc_id"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dirs["corpus"])
        .collect()
    )
    index_ids = sorted(
        r["doc_id"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dirs["index"])
        .collect()
    )
    assert corpus_ids == [1, 2, 11]
    assert index_ids == [1, 2, 11]


def test_admit_batch_replay_is_idempotent(spark, dirs):
    """Re-running a batch id (checkpoint recovery) must leave the same
    verdicts/corpus/index — not doubled rows."""
    batch = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B)], ["doc_id", "text"]
    )

    def run():
        admit_batch(
            spark, batch, 0, dirs["index"], dirs["corpus"], dirs["verdicts"],
            threshold=0.5,
        )

    run()
    first = sorted(
        tuple(r) for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dirs["corpus"]).collect()
    )
    run()  # replay of the SAME batch id
    second = sorted(
        tuple(r) for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dirs["corpus"]).collect()
    )
    assert first == second and len(first) == 2
    n_verd = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(dirs["verdicts"]).count()
    )
    assert n_verd == 2


def test_admit_batch_null_text_admitted_unmatched(spark, dirs):
    batch = spark.createDataFrame([(1, DOC_A), (2, None)], ["doc_id", "text"])
    admit_batch(
        spark, batch, 0, dirs["index"], dirs["corpus"], dirs["verdicts"],
        threshold=0.5,
    )
    v = _verdicts(spark, dirs)
    assert not v[2]["is_dup"] and v[2]["match_kind"] == "none"
    # NULL-text doc is in the corpus but has no sketch row
    index_ids = [
        r["doc_id"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dirs["index"]).collect()
    ]
    corpus_ids = sorted(
        r["doc_id"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dirs["corpus"]).collect()
    )
    assert corpus_ids == [1, 2] and index_ids == [1]


def test_admit_batch_leaves_no_storage(spark, dirs):
    """The loop runs indefinitely: each batch must release every cache
    and checkpoint block it pinned — including the spine delta's
    tokenized-base checkpoint."""
    batch = spark.createDataFrame([(1, DOC_A), (2, DOC_B)], ["doc_id", "text"])
    before = {
        int(x)
        for x in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    admit_batch(
        spark, batch, 0, dirs["index"], dirs["corpus"], dirs["verdicts"],
        threshold=0.5, spine_dir=os.path.join(dirs["root"], "spine"),
    )
    after = {
        int(x)
        for x in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    assert after <= before, f"leaked RDD blocks: {sorted(after - before)}"


def test_admit_large_narrow_batch_leaves_no_storage(spark, dirs):
    """A >=20k-doc batch arriving NARROW (1 partition) takes the r8
    re-spread path — repartition(8) + a SECOND localCheckpoint created
    after the first own_ids snapshot. ADVICE r8: that replacement
    checkpoint must be re-tracked or it leaks its (doc_id, text) blocks
    for the stream session's lifetime; the 2-row test above never
    reaches the branch."""
    docs = (
        spark.range(20_000)
        .coalesce(1)  # force the narrow-arrival shape the branch guards
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[F.concat(F.lit(f"w{j}x"), F.col("id")) for j in range(12)],
            ).alias("text"),
        )
    )
    assert docs.rdd.getNumPartitions() < 8
    before = {
        int(x)
        for x in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    admit_batch(
        spark, docs, 0, dirs["index"], dirs["corpus"], dirs["verdicts"],
        threshold=0.5,
    )
    after = {
        int(x)
        for x in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    assert after <= before, f"leaked RDD blocks: {sorted(after - before)}"


def test_admission_matches_batch_operator(spark, dirs):
    """One-batch admission verdicts against a pre-seeded corpus must
    agree with the batch incremental_lsh_admit operator run on the same
    split (the streaming loop is the same math, plus persistence)."""
    from forgettable_spark.extensions.dedup import incremental_lsh_admit

    # existing docs share NO shingles with each other (every token is
    # i-tagged) so the seeding batch admits all of them
    existing_rows = [
        (i, " ".join(f"w{j}x{i}" for j in range(12))) for i in range(5)
    ]
    batch_rows = [(100, existing_rows[3][1]), (101, DOC_E)]
    existing = spark.createDataFrame(existing_rows, ["doc_id", "text"])
    # seed: admit the existing corpus as batch 0 (empty index: all admitted)
    admit_batch(
        spark, existing, 0, dirs["index"], dirs["corpus"], dirs["verdicts"],
        threshold=0.5,
    )
    batch = spark.createDataFrame(batch_rows, ["doc_id", "text"])
    admit_batch(
        spark, batch, 1, dirs["index"], dirs["corpus"], dirs["verdicts"],
        threshold=0.5,
    )
    got = {
        k: (v["is_dup"], v["match_id"])
        for k, v in _verdicts(spark, dirs).items()
        if k >= 100
    }
    want = {
        r["doc_id"]: (r["is_dup"], r["match_id"])
        for r in incremental_lsh_admit(existing, batch, threshold=0.5).collect()
    }
    assert got == want


def test_fold_bounds_directory_growth(spark, dirs):
    """With fold_every=2, the index/corpus subdir chains consolidate:
    after three disjoint batches only one fold dir + the latest batch
    dir remain, the reader still sees every admitted doc, and replaying
    the folding batch is idempotent."""
    def batch_df(ids):
        return spark.createDataFrame(
            [(i, " ".join(f"tok{j}b{i}" for j in range(12))) for i in ids],
            ["doc_id", "text"],
        )

    def run(bid, ids):
        admit_batch(
            spark, batch_df(ids), bid, dirs["index"], dirs["corpus"],
            dirs["verdicts"], threshold=0.5, fold_every=2,
        )

    run(0, [1, 2])
    run(1, [3, 4])
    run(2, [5, 6])

    entries = sorted(os.listdir(dirs["index"]))
    assert entries == ["batch-2", "fold-2"], entries
    corpus_ids = sorted(
        r["doc_id"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dirs["corpus"]).collect()
    )
    assert corpus_ids == [1, 2, 3, 4, 5, 6]

    run(2, [5, 6])  # replay of the folding batch
    entries2 = sorted(os.listdir(dirs["index"]))
    assert entries2 == ["batch-2", "fold-2"], entries2
    corpus_ids2 = sorted(
        r["doc_id"]
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dirs["corpus"]).collect()
    )
    assert corpus_ids2 == corpus_ids
    # verdicts across the three batches: everything admitted
    v = _verdicts(spark, dirs)
    assert len(v) == 6 and not any(r["is_dup"] for r in v.values())


def test_cross_batch_dedup_after_fold(spark, dirs):
    """A near-dup arriving AFTER its match was folded must still be
    flagged — the fold preserves index and corpus content."""
    text = "stable shared content tokens alpha beta gamma delta epsilon zeta"
    def run(bid, rows):
        admit_batch(
            spark, spark.createDataFrame(rows, ["doc_id", "text"]), bid,
            dirs["index"], dirs["corpus"], dirs["verdicts"],
            threshold=0.5, fold_every=2,
        )

    run(0, [(1, text)])
    run(1, [(2, "unrelated filler one two three four five six seven eight")])
    run(2, [(3, "another distinct document nine ten eleven twelve thirteen fourteen")])
    # doc 1 now lives only inside a fold dir
    assert any(e.startswith("fold-") for e in os.listdir(dirs["index"]))
    run(3, [(10, text + " zeta")])
    v = _verdicts(spark, dirs)
    assert v[10]["is_dup"] and v[10]["match_kind"] == "corpus" and v[10]["match_id"] == 1


def test_partial_fold_without_success_is_ignored_and_rebuilt(spark, dirs):
    """Crash mid-fold leaves a fold dir without _SUCCESS: readers must
    ignore it (falling back to the unvacuumed originals) and the next
    fold attempt must rebuild it rather than trust partial data."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from forgettable_spark.streaming.admit import _fold, _table_parts

    def run(bid, ids):
        admit_batch(
            spark,
            spark.createDataFrame(
                [(i, " ".join(f"tok{j}b{i}" for j in range(12))) for i in ids],
                ["doc_id", "text"],
            ),
            bid, dirs["index"], dirs["corpus"], dirs["verdicts"],
            threshold=0.5, fold_every=None,  # no auto-fold; we drive it
        )

    run(0, [1, 2])
    run(1, [3, 4])
    # simulate a crashed fold: partial parquet, NO _SUCCESS marker
    partial = os.path.join(dirs["index"], "fold-2")
    os.makedirs(partial)
    pq.write_table(
        pa.table({"doc_id": pa.array([999], pa.int64()),
                  "mh": pa.array([[1, 2]], pa.list_(pa.int64()))}),
        os.path.join(partial, "part-poison.parquet"),
    )
    # readers ignore the partial fold: parts are the two batch dirs
    parts = _table_parts(dirs["index"], exclude_batch=-1)
    assert sorted(os.path.basename(p) for p in parts) == ["batch-0", "batch-1"]
    # the rebuilt fold contains the real rows, not the poison row
    _fold(spark, dirs["index"], 2)
    folded = spark.read.parquet(os.path.join(dirs["index"], "fold-2"))
    assert sorted(r["doc_id"] for r in folded.collect()) == [1, 2, 3, 4]
    assert sorted(os.listdir(dirs["index"])) == ["fold-2"]


def test_incremental_spine_matches_rebuild(spark, dirs):
    """The promised production maintenance of the postings spine
    (extensions/postings.py): admitted batches append postings/doc_stats/
    bigrams deltas, folds compact them, and the reassembled tables are
    row-identical to a from-scratch postings_tables rebuild over the
    admitted corpus. Three batches with a rejected dup, a NULL-text doc,
    and fold_every=2 so the spine chains fold mid-run."""
    from forgettable_spark.extensions.postings import postings_tables
    from forgettable_spark.streaming.admit import read_spine

    spine_dir = os.path.join(dirs["root"], "spine")

    def run(bid, rows):
        admit_batch(
            spark, spark.createDataFrame(rows, ["doc_id", "text"]), bid,
            dirs["index"], dirs["corpus"], dirs["verdicts"],
            threshold=0.5, fold_every=2, spine_dir=spine_dir,
        )

    run(0, [(1, DOC_A), (2, DOC_B)])
    run(1, [(10, DOC_A + " kappa"), (11, DOC_E), (12, None)])  # 10 rejected
    run(2, [(20, "twenty tokens of fresh text alpha20 beta20 gamma20 delta20")])

    # the fold fired on every spine table directory
    for t in ("postings", "doc_stats", "bigrams"):
        entries = sorted(
            e for e in os.listdir(os.path.join(spine_dir, t))
            if not e.startswith("_")
        )
        assert entries == ["batch-2", "fold-2"], (t, entries)

    admitted = spark.read.option("recursiveFileLookup", "true").parquet(
        dirs["corpus"]
    ).select("doc_id", "text")
    assert sorted(r["doc_id"] for r in admitted.collect()) == [1, 2, 11, 12, 20]
    rebuilt = postings_tables(admitted)
    live = read_spine(spark, spine_dir)
    for t in ("postings", "doc_stats", "bigrams"):
        got = sorted(tuple(r) for r in live[t].collect())
        want = sorted(tuple(r) for r in rebuilt[t].collect())
        assert got == want, f"spine table {t} diverges from rebuild"
    # NULL-text doc 12 is admitted but (per the spine contract) absent
    assert 12 not in {r["doc_id"] for r in live["doc_stats"].collect()}


def test_spine_delta_replay_is_idempotent(spark, dirs):
    """Replaying a batch id must leave the spine byte-identical —
    the batch-<id> overwrite covers the spine directories too."""
    from forgettable_spark.streaming.admit import read_spine

    spine_dir = os.path.join(dirs["root"], "spine")
    batch = spark.createDataFrame([(1, DOC_A), (2, DOC_B)], ["doc_id", "text"])

    def run():
        admit_batch(
            spark, batch, 0, dirs["index"], dirs["corpus"], dirs["verdicts"],
            threshold=0.5, spine_dir=spine_dir,
        )

    run()
    first = sorted(tuple(r) for r in read_spine(spark, spine_dir)["postings"].collect())
    run()
    second = sorted(tuple(r) for r in read_spine(spark, spine_dir)["postings"].collect())
    assert first == second and len(first) > 0


def test_stream_conf_isolated_from_parent(spark, dirs, monkeypatch):
    """admit_batch pins AQE off + 8 shuffle partitions for the batch;
    via admission_stream that mutation lands on the STREAM'S session —
    Structured Streaming runs foreachBatch on a cloneSession() with its
    own SQLConf — so a concurrent query on the parent session observes
    its conf unchanged MID-BATCH. Sampled from inside admit_batch (after
    the pin, before the restore) by wrapping the first operator it
    calls."""
    from forgettable_spark.extensions import dedup as _dedup
    from forgettable_spark.streaming import admit as admit_mod

    observed = {}
    real = _dedup._minhash_sketches

    def probe(batch, *a, **kw):
        observed["batch_is_parent_session"] = batch.sparkSession is spark
        observed["parent_aqe_mid_batch"] = spark.conf.get(
            "spark.sql.adaptive.enabled"
        )
        observed["parent_parts_mid_batch"] = spark.conf.get(
            "spark.sql.shuffle.partitions"
        )
        observed["stream_aqe_mid_batch"] = batch.sparkSession.conf.get(
            "spark.sql.adaptive.enabled"
        )
        return real(batch, *a, **kw)

    monkeypatch.setattr(admit_mod.dedup, "_minhash_sketches", probe)

    parent_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    parent_parts = spark.conf.get("spark.sql.shuffle.partitions")
    _write_docs(dirs["src"], "b1.parquet", [(1, DOC_A, _ts(0)), (2, DOC_B, _ts(1))])
    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING, ts TIMESTAMP")
        .parquet(dirs["src"])
    )
    q = admission_stream(
        stream, dirs["index"], dirs["corpus"], dirs["verdicts"], dirs["ckpt"],
        available_now=True, threshold=0.5,
    )
    q.awaitTermination(180)

    assert observed["batch_is_parent_session"] is False
    assert observed["stream_aqe_mid_batch"] == "false"
    assert observed["parent_aqe_mid_batch"] == parent_aqe
    assert observed["parent_parts_mid_batch"] == parent_parts
    assert spark.conf.get("spark.sql.adaptive.enabled") == parent_aqe
    assert spark.conf.get("spark.sql.shuffle.partitions") == parent_parts


def test_consumers_query_live_spine(spark, dirs):
    """The closed production loop end-to-end: documents stream through
    admission (spine maintained incrementally), then the token-family
    consumers query the LIVE corpus through read_spine — results must be
    row-identical to the same consumers over a from-scratch spine of the
    admitted corpus. BM25 retrieval and LM scoring never touch corpus
    text beyond what admission already scanned."""
    from forgettable_spark.extensions import lm, search
    from forgettable_spark.extensions.postings import postings_tables
    from forgettable_spark.streaming.admit import read_spine

    spine_dir = os.path.join(dirs["root"], "spine")

    def run(bid, rows):
        admit_batch(
            spark, spark.createDataFrame(rows, ["doc_id", "text"]), bid,
            dirs["index"], dirs["corpus"], dirs["verdicts"],
            threshold=0.5, spine_dir=spine_dir,
        )

    run(0, [(1, DOC_A), (2, DOC_B)])
    run(1, [(10, DOC_A + " kappa"), (11, DOC_E)])  # 10 rejected as dup

    admitted = spark.read.option("recursiveFileLookup", "true").parquet(
        dirs["corpus"]
    ).select("doc_id", "text")
    live = read_spine(spark, spine_dir)
    rebuilt = postings_tables(admitted)

    queries = {"q1": ["alpha", "gamma"], "q2": ["novel", "ten"]}
    got_bm = sorted(
        tuple(r) for r in search.bm25_topk(admitted, queries, k=5, spine=live).collect()
    )
    want_bm = sorted(
        tuple(r)
        for r in search.bm25_topk(admitted, queries, k=5, spine=rebuilt).collect()
    )
    assert got_bm == want_bm and len(got_bm) > 0
    # the rejected doc 10 is invisible to retrieval
    assert not any(r[1] == 10 for r in got_bm)

    got_lm = sorted(
        tuple(r) for r in lm.bigram_lm_score(admitted, spine=live).collect()
    )
    want_lm = sorted(
        tuple(r) for r in lm.bigram_lm_score(admitted, spine=rebuilt).collect()
    )
    assert got_lm == want_lm and {r[0] for r in got_lm} == {1, 2, 11}


def test_incremental_sketches_match_rebuild(spark, dirs):
    """The sketch-spine maintenance (extensions/sketches.py): admitted
    batches append shingled/simhash deltas off the one-sketch-per-batch
    frame, folds compact them, and the reassembled tables are
    row-identical to a from-scratch sketch_tables over the admitted
    corpus. Same scenario shape as the postings-spine twin: a rejected
    dup, a NULL-text doc, fold_every=2 so the chains fold mid-run."""
    from forgettable_spark.extensions.sketches import sketch_tables
    from forgettable_spark.streaming.admit import read_sketches

    sketch_dir = os.path.join(dirs["root"], "sketches")

    def run(bid, rows):
        admit_batch(
            spark, spark.createDataFrame(rows, ["doc_id", "text"]), bid,
            dirs["index"], dirs["corpus"], dirs["verdicts"],
            threshold=0.5, fold_every=2, sketch_dir=sketch_dir,
        )

    run(0, [(1, DOC_A), (2, DOC_B)])
    run(1, [(10, DOC_A + " kappa"), (11, DOC_E), (12, None)])  # 10 rejected
    run(2, [(20, "twenty tokens of fresh text alpha20 beta20 gamma20 delta20")])

    for t in ("shingled", "simhash"):
        entries = sorted(
            e for e in os.listdir(os.path.join(sketch_dir, t))
            if not e.startswith("_")
        )
        assert entries == ["batch-2", "fold-2"], (t, entries)

    admitted = spark.read.option("recursiveFileLookup", "true").parquet(
        dirs["corpus"]
    ).select("doc_id", "text")
    assert sorted(r["doc_id"] for r in admitted.collect()) == [1, 2, 11, 12, 20]
    # the admitted corpus has no lang column -> block_col=None; the
    # delta side wrote NULL lang for the same reason (batch had none)
    rebuilt = sketch_tables(admitted, block_col=None)
    live = read_sketches(spark, sketch_dir)
    for t in ("shingled", "simhash"):
        got = sorted(tuple(repr(v) for v in r) for r in live[t].collect())
        want = sorted(tuple(repr(v) for v in r) for r in rebuilt[t].collect())
        assert got == want, f"sketch table {t} diverges from rebuild"
    # NULL-text doc 12 is admitted but (per the family contract) sketchless
    assert 12 not in {r["doc_id"] for r in live["simhash"].collect()}


def test_sketch_delta_replay_is_idempotent(spark, dirs):
    """Replaying a batch id must leave the sketch spine byte-identical —
    the batch-<id> overwrite covers the sketch directories too."""
    from forgettable_spark.streaming.admit import read_sketches

    sketch_dir = os.path.join(dirs["root"], "sketches")
    batch = spark.createDataFrame([(1, DOC_A), (2, DOC_B)], ["doc_id", "text"])

    def run():
        admit_batch(
            spark, batch, 0, dirs["index"], dirs["corpus"], dirs["verdicts"],
            threshold=0.5, sketch_dir=sketch_dir,
        )

    run()
    first = sorted(
        tuple(repr(v) for v in r)
        for r in read_sketches(spark, sketch_dir)["shingled"].collect()
    )
    run()
    second = sorted(
        tuple(repr(v) for v in r)
        for r in read_sketches(spark, sketch_dir)["shingled"].collect()
    )
    assert first == second and len(first) > 0


def test_spines_enabled_mid_stream_backfill_previous_batches(spark, dirs):
    """ADVICE r6: restarting a stream with spine_dir/sketch_dir NEWLY set
    must not yield spines missing every previously admitted batch — the
    first maintained batch backfills a fold-<id> from the admitted
    corpus, and the reassembled tables are row-identical to a
    from-scratch rebuild over the WHOLE admitted corpus."""
    from forgettable_spark.extensions.postings import postings_tables
    from forgettable_spark.extensions.sketches import sketch_tables
    from forgettable_spark.streaming.admit import read_sketches, read_spine

    spine_dir = os.path.join(dirs["root"], "spine")
    sketch_dir = os.path.join(dirs["root"], "sketches")

    def run(bid, rows, maintain):
        admit_batch(
            spark, spark.createDataFrame(rows, ["doc_id", "text"]), bid,
            dirs["index"], dirs["corpus"], dirs["verdicts"],
            threshold=0.5, fold_every=None,
            spine_dir=spine_dir if maintain else None,
            sketch_dir=sketch_dir if maintain else None,
        )

    # two batches BEFORE maintenance exists, one after enabling it
    run(0, [(1, DOC_A), (2, DOC_B)], maintain=False)
    run(1, [(11, DOC_E), (12, None)], maintain=False)
    run(2, [(20, "twenty tokens of fresh text alpha20 beta20 gamma20")],
        maintain=True)

    # the backfill landed as fold-2 next to batch-2's own delta (plus
    # the r8 _last_maintained watermark, which is not a part)
    for base, t in ((spine_dir, "postings"), (sketch_dir, "shingled")):
        entries = sorted(
            e for e in os.listdir(os.path.join(base, t)) if not e.startswith("_")
        )
        assert entries == ["batch-2", "fold-2"], (t, entries)

    admitted = spark.read.option("recursiveFileLookup", "true").parquet(
        dirs["corpus"]
    ).select("doc_id", "text")
    assert sorted(r["doc_id"] for r in admitted.collect()) == [1, 2, 11, 12, 20]

    def _rows(df):
        return sorted(tuple(repr(v) for v in r) for r in df.collect())

    live_sp = read_spine(spark, spine_dir)
    want_sp = postings_tables(admitted)
    for t in ("postings", "doc_stats", "bigrams"):
        assert _rows(live_sp[t]) == _rows(want_sp[t]), f"{t} missing backfill"
    live_sk = read_sketches(spark, sketch_dir)
    want_sk = sketch_tables(admitted, block_col=None)
    for t in ("shingled", "simhash"):
        assert _rows(live_sk[t]) == _rows(want_sk[t]), f"{t} missing backfill"


def test_spine_reenabled_after_gap_backfills(spark, dirs):
    """ADVICE r7: a spine maintained for batch 0, DISABLED for batch 1,
    then re-enabled at batch 2 previously missed batch 1 forever — the
    zero-live-parts bootstrap couldn't see a table that exists but is
    incomplete. The _last_maintained watermark detects the gap and the
    table is rebuilt from the prior corpus, restoring the read_spine /
    read_sketches row-identity contract."""
    from forgettable_spark.extensions.postings import postings_tables
    from forgettable_spark.extensions.sketches import sketch_tables
    from forgettable_spark.streaming.admit import read_sketches, read_spine

    spine_dir = os.path.join(dirs["root"], "spine")
    sketch_dir = os.path.join(dirs["root"], "sketches")

    def run(bid, rows, maintain):
        admit_batch(
            spark, spark.createDataFrame(rows, ["doc_id", "text"]), bid,
            dirs["index"], dirs["corpus"], dirs["verdicts"],
            threshold=0.5, fold_every=None,
            spine_dir=spine_dir if maintain else None,
            sketch_dir=sketch_dir if maintain else None,
        )

    run(0, [(1, DOC_A), (2, DOC_B)], maintain=True)
    run(1, [(11, DOC_E)], maintain=False)  # the gap batch
    run(2, [(20, "twenty tokens of fresh text alpha20 beta20 gamma20")],
        maintain=True)

    admitted = spark.read.option("recursiveFileLookup", "true").parquet(
        dirs["corpus"]
    ).select("doc_id", "text")
    assert sorted(r["doc_id"] for r in admitted.collect()) == [1, 2, 11, 20]

    def _rows(df):
        return sorted(tuple(repr(v) for v in r) for r in df.collect())

    live_sp = read_spine(spark, spine_dir)
    want_sp = postings_tables(admitted)
    for t in ("postings", "doc_stats", "bigrams"):
        assert _rows(live_sp[t]) == _rows(want_sp[t]), f"{t} missing gap batch"
    live_sk = read_sketches(spark, sketch_dir)
    want_sk = sketch_tables(admitted, block_col=None)
    for t in ("shingled", "simhash"):
        assert _rows(live_sk[t]) == _rows(want_sk[t]), f"{t} missing gap batch"
    # watermark advanced to the rebuilding batch
    from forgettable_spark.streaming.admit import _read_last_maintained

    assert _read_last_maintained(os.path.join(spine_dir, "postings")) == 2


def test_admit_fails_loudly_without_success_markers(spark, dirs):
    """ADVICE r7: on deployments where the committer writes no _SUCCESS
    (marksuccessfuljobs=false), every delta would be invisible to
    _table_parts and the loop would silently re-admit duplicates — the
    FIRST batch must fail with the remediation instead. The committer
    conf is context-level, so the test flips the shared context's
    hadoopConfiguration and restores it."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    prev = hconf.get(key)
    hconf.set(key, "false")
    try:
        with pytest.raises(RuntimeError, match="marksuccessfuljobs"):
            admit_batch(
                spark,
                spark.createDataFrame([(1, DOC_A)], ["doc_id", "text"]),
                0, dirs["index"], dirs["corpus"], dirs["verdicts"],
                threshold=0.5, fold_every=None,
            )
    finally:
        if prev is None:
            hconf.unset(key)
        else:
            hconf.set(key, prev)


def test_write_pool_released_when_planning_raises(spark, dirs, monkeypatch):
    """ADVICE r7: an exception between write-pool creation and the drain
    (here: a failing spine bootstrap) must not leak the pool's 8
    non-daemon workers — a stream retrying a failing batch would
    accumulate them without bound."""
    import threading
    import time

    from forgettable_spark.streaming import admit as adm

    def boom(*a, **k):
        raise OSError("bootstrap read failed")

    monkeypatch.setattr(adm, "_bootstrap_missing_tables", boom)
    before = {t.ident for t in threading.enumerate()}
    with pytest.raises(OSError, match="bootstrap read failed"):
        admit_batch(
            spark,
            spark.createDataFrame([(1, DOC_A)], ["doc_id", "text"]),
            0, dirs["index"], dirs["corpus"], dirs["verdicts"],
            threshold=0.5, fold_every=None,
            spine_dir=os.path.join(dirs["root"], "spine"),
        )
    # pool workers exit once shutdown is called and their task (if any)
    # finishes; poll briefly rather than assuming instant teardown
    for _ in range(100):
        leaked = [
            t for t in threading.enumerate()
            if t.ident not in before and t.name.startswith("ThreadPoolExecutor")
        ]
        if not leaked:
            break
        time.sleep(0.1)
    assert not leaked, f"leaked pool workers: {leaked}"


def test_spine_double_gap_and_fold_interaction(spark, dirs):
    """Two separate maintenance gaps, with a corpus FOLD between them:
    the watermark must catch the second gap even though the gap
    batches' corpus dirs were folded away (the fold's coverage bound
    stands in as the evidence), and the rebuilt tables stay
    row-identical to a from-scratch rebuild."""
    from forgettable_spark.extensions.sketches import sketch_tables
    from forgettable_spark.streaming.admit import (
        _read_last_maintained,
        read_sketches,
    )

    sketch_dir = os.path.join(dirs["root"], "sketches")

    def run(bid, rows, maintain, fold_every=None):
        admit_batch(
            spark, spark.createDataFrame(rows, ["doc_id", "text"]), bid,
            dirs["index"], dirs["corpus"], dirs["verdicts"],
            threshold=0.5, fold_every=fold_every,
            sketch_dir=sketch_dir if maintain else None,
        )

    run(0, [(1, DOC_A)], maintain=True)
    run(1, [(2, DOC_B)], maintain=False)          # gap 1
    run(2, [(3, DOC_E)], maintain=True)           # rebuild covers gap 1
    assert _read_last_maintained(os.path.join(sketch_dir, "shingled")) == 2
    # fold the corpus so batch dirs 0-2 collapse into fold-3
    run(3, [(4, "fresh words four alpha4 beta4 gamma4 delta4")],
        maintain=False, fold_every=1)             # gap 2 (+ corpus fold)
    run(4, [(5, "fresh words five alpha5 beta5 gamma5 delta5")],
        maintain=True)                            # must detect gap 2

    admitted = spark.read.option("recursiveFileLookup", "true").parquet(
        dirs["corpus"]
    ).select("doc_id", "text")
    assert sorted(r["doc_id"] for r in admitted.collect()) == [1, 2, 3, 4, 5]

    def _rows(df):
        return sorted(tuple(repr(v) for v in r) for r in df.collect())

    live = read_sketches(spark, sketch_dir)
    want = sketch_tables(admitted, block_col=None)
    for t in ("shingled", "simhash"):
        assert _rows(live[t]) == _rows(want[t]), f"{t} missing a gap batch"
    assert _read_last_maintained(os.path.join(sketch_dir, "shingled")) == 4


def test_large_batch_replay_idempotent_through_respread(spark, dirs):
    """r8's narrow-batch re-spread (repartition(8) + re-checkpoint for
    batches ≥20k docs) must not break replay idempotency or verdict
    correctness: partition assignment is nondeterministic across
    replays, but every write is an overwrite of its own batch-<id>
    dir, so the row SETS must be identical. Runs exactly at the
    threshold so the re-spread path is exercised."""
    sketch_dir = os.path.join(dirs["root"], "sketches")
    rows = [(i, f"document number {i} with tokens t{i}a t{i}b t{i}c") for i in range(20_000)]
    rows[19_999] = (19_999, rows[0][1])  # one within-batch near-dup
    batch = spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(1)
    assert batch.rdd.getNumPartitions() == 1  # arrives narrow on purpose

    def run():
        admit_batch(
            spark, batch, 0, dirs["index"], dirs["corpus"], dirs["verdicts"],
            threshold=0.5, fold_every=None, sketch_dir=sketch_dir,
        )

    run()
    first = sorted(
        tuple(r) for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dirs["verdicts"]).collect()
    )
    run()  # replay
    second = sorted(
        tuple(r) for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dirs["verdicts"]).collect()
    )
    assert first == second and len(first) == 20_000
    dups = [r for r in first if r[1]]
    assert len(dups) == 1 and dups[0][0] == 19_999 and dups[0][2] == 0
    # the delta fan-in scaled: exactly ceil(20000/20000)=1 data file is
    # wrong to assert (threshold edge) — assert the shingled delta has
    # at most 8 and at least 1 parquet part and covers every doc
    parts = [
        f for f in os.listdir(os.path.join(sketch_dir, "shingled", "batch-0"))
        if f.endswith(".parquet")
    ]
    assert 1 <= len(parts) <= 8
    n_sketch = spark.read.parquet(
        os.path.join(sketch_dir, "shingled", "batch-0")
    ).count()
    assert n_sketch == 19_999  # admitted docs only (the dup is excluded)
