"""Streaming embedding admission (`streaming/semantic_admit.py`): the
text admission loop's guarantees restated for vectors — two-batch flow,
replay idempotency, batch-operator parity, fold consolidation, storage
hygiene."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from forgettable_spark.streaming.semantic_admit import (
    ASSIGNER_MARKER,
    INDEX_SCHEMA,
    assigner_fingerprint,
    semantic_admission_stream,
    semantic_admit_batch,
)

#: Two unit centroids in 4-d: cell 0 = x-axis, cell 1 = y-axis (the
#: test_mixture_canonical_semantic device, one dimension wider so the
#: sub-threshold vector has somewhere to point).
CENTS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]

VX = (1.0, 0.0, 0.0, 0.0)  # cell 0
VY = (0.0, 1.0, 0.0, 0.0)  # cell 1
VZ = (0.6, 0.0, 0.8, 0.0)  # cell 0, cosine 0.6 vs VX — sub-threshold


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="forget_semadmit_")
    yield {
        "index": f"{d}/index",
        "verdicts": f"{d}/verdicts",
        "ckpt": f"{d}/ckpt",
        "src": f"{d}/src",
        "root": d,
    }
    shutil.rmtree(d, ignore_errors=True)


def _write_vecs(path: str, name: str, rows, mtime_offset: float = 0.0) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [list(r[1]) for r in rows], pa.list_(pa.float32())
            ),
        }
    )
    fp = os.path.join(path, name)
    pq.write_table(table, fp)
    mt = time.time() + mtime_offset
    os.utime(fp, (mt, mt))


def _vec_df(spark, rows):
    return spark.createDataFrame(
        [(i, list(map(float, v))) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _verdicts(spark, dirs):
    return {
        r["vec_id"]: r.asDict()
        for r in spark.read.option("recursiveFileLookup", "true")
        .parquet(dirs["verdicts"])
        .collect()
    }


def _index_ids(spark, dirs):
    return sorted(
        r["vec_id"]
        for r in spark.read.schema(INDEX_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(dirs["index"])
        .collect()
    )


def test_semantic_admission_stream_two_batches(spark, dirs):
    """Batch 1: 1 and 2 admitted, 3 (≈1, higher id) flagged within-batch.
    Batch 2: 10 (≈2, earlier batch) flagged against the index, 11
    (sub-threshold same-cell) admitted. Index ends with the admitted."""
    _write_vecs(dirs["src"], "b1.parquet", [(1, VX), (2, VY), (3, VX)])
    _write_vecs(dirs["src"], "b2.parquet", [(10, VY), (11, VZ)], mtime_offset=5)
    stream = (
        spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["src"])
    )
    q = semantic_admission_stream(
        stream,
        dirs["index"],
        dirs["verdicts"],
        dirs["ckpt"],
        CENTS,
        threshold=0.95,
        available_now=True,
    )
    q.awaitTermination(180)

    v = _verdicts(spark, dirs)
    assert set(v) == {1, 2, 3, 10, 11}
    assert not v[1]["is_dup"] and not v[2]["is_dup"] and not v[11]["is_dup"]
    assert v[3]["is_dup"] and v[3]["match_id"] == 1  # within-batch, lower id
    assert v[10]["is_dup"] and v[10]["match_id"] == 2  # against the index
    assert v[11]["match_id"] == -1 and v[11]["cosine"] == 0.0
    assert _index_ids(spark, dirs) == [1, 2, 11]


def test_semantic_admit_batch_replay_is_idempotent(spark, dirs):
    """Re-running a batch id rewrites its own partitions to the same
    rows: the replay reads exclude the first attempt's output, so the
    verdicts (and the admitted set) cannot change."""
    semantic_admit_batch(
        spark, _vec_df(spark, [(1, VX), (2, VY)]), 0,
        dirs["index"], dirs["verdicts"], CENTS, threshold=0.95,
    )

    def run():
        semantic_admit_batch(
            spark, _vec_df(spark, [(10, VX), (11, VZ)]), 1,
            dirs["index"], dirs["verdicts"], CENTS, threshold=0.95,
        )
        return (_verdicts(spark, dirs), _index_ids(spark, dirs))

    first = run()
    replay = run()
    assert first == replay
    v, idx = first
    assert v[10]["is_dup"] and v[10]["match_id"] == 1
    assert not v[11]["is_dup"]
    assert idx == [1, 2, 11]


def test_semantic_admission_matches_batch_operator(spark, dirs):
    """Two streamed batches verdict-identically to running the batch
    `semantic_admit` operator sequentially over the same splits."""
    from forgettable_spark.extensions.codebook import semantic_admit

    b1 = [(1, VX), (2, VY), (3, VX)]
    b2 = [(10, VY), (11, VZ)]
    semantic_admit_batch(
        spark, _vec_df(spark, b1), 0, dirs["index"], dirs["verdicts"],
        CENTS, threshold=0.95,
    )
    semantic_admit_batch(
        spark, _vec_df(spark, b2), 1, dirs["index"], dirs["verdicts"],
        CENTS, threshold=0.95,
    )
    streamed = {
        k: (r["is_dup"], r["match_id"], r["cosine"])
        for k, r in _verdicts(spark, dirs).items()
    }

    empty = spark.createDataFrame([], INDEX_SCHEMA)
    v1 = semantic_admit(empty, _vec_df(spark, b1), CENTS, 0.95).collect()
    admitted1 = _vec_df(spark, [r for r in b1 if not streamed[r[0]][0]])
    v2 = semantic_admit(admitted1, _vec_df(spark, b2), CENTS, 0.95).collect()
    batch_mode = {
        r["vec_id"]: (r["is_dup"], r["match_id"], r["cosine"]) for r in v1 + v2
    }
    assert streamed == batch_mode


def test_semantic_fold_bounds_directories_and_keeps_dedup(spark, dirs):
    """With fold_every=2 the index consolidates, and a later batch still
    deduplicates against pre-fold admissions."""
    for bid, rows in enumerate([[(1, VX)], [(2, VY)], [(3, VZ)]]):
        semantic_admit_batch(
            spark, _vec_df(spark, rows), bid, dirs["index"], dirs["verdicts"],
            CENTS, threshold=0.95, fold_every=2,
        )
    entries = sorted(os.listdir(dirs["index"]))
    assert any(e.startswith("fold-") for e in entries)
    assert sum(e.startswith("batch-") for e in entries) <= 2
    # batch 3: dup of the FOLDED batch-0 admission
    semantic_admit_batch(
        spark, _vec_df(spark, [(30, VX)]), 3, dirs["index"], dirs["verdicts"],
        CENTS, threshold=0.95, fold_every=2,
    )
    v = _verdicts(spark, dirs)
    assert v[30]["is_dup"] and v[30]["match_id"] == 1
    assert sorted(_index_ids(spark, dirs)) == [1, 2, 3]


def test_semantic_admit_custom_assigner_matches_batch_operator(spark, dirs):
    """r10 cells-∝-trigger lever: a partitioned assigner plugged into the
    loop must (1) verdict-match the batch operator run over the SAME
    assignment, and (2) persist the assigner's composite cell ids in the
    stored index (the index is assignment-agnostic)."""
    from pyspark.sql import functions as F

    from forgettable_spark.extensions import codebook as cb

    coarse = [list(c) for c in CENTS]
    fines = [[list(CENTS[0])], [list(CENTS[1])]]
    bits = 2
    assigner = lambda df: cb.assign_cells_partitioned(  # noqa: E731
        df, coarse, fines, bits
    )
    b1 = [(1, VX), (2, VY), (3, VX)]
    b2 = [(10, VY), (11, VZ)]
    # exactly-one validation: centroids beside an assigner must raise
    # (a silent quantizer mismatch trap), as must neither.
    for bad in ({"centroids": CENTS, "assigner": assigner}, {"centroids": None}):
        with pytest.raises(ValueError, match="exactly ONE"):
            semantic_admit_batch(
                spark, _vec_df(spark, b1), 0, dirs["index"], dirs["verdicts"],
                bad.get("centroids"), threshold=0.95,
                assigner=bad.get("assigner"),
            )
    # a custom assigner without a fingerprint must raise (VERDICT r10
    # #2: the loop cannot derive one from a callable).
    with pytest.raises(ValueError, match="fingerprint"):
        semantic_admit_batch(
            spark, _vec_df(spark, b1), 0, dirs["index"], dirs["verdicts"],
            None, threshold=0.95, assigner=assigner,
        )
    fp = assigner_fingerprint("partitioned", coarse, fines, bits)
    for bid, rows in enumerate([b1, b2]):
        semantic_admit_batch(
            spark, _vec_df(spark, rows), bid, dirs["index"], dirs["verdicts"],
            None, threshold=0.95, assigner=assigner, fingerprint=fp,
        )
    streamed = {
        k: (r["is_dup"], r["match_id"], r["cosine"])
        for k, r in _verdicts(spark, dirs).items()
    }
    empty = spark.createDataFrame([], INDEX_SCHEMA).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("_v"), "cell", "n"
    )
    # batch-mode replay: same assigner on both sides, sequential batches
    v1 = cb.semantic_admit_assigned(
        empty, assigner(_vec_df(spark, b1)), threshold=0.95
    ).collect()
    admitted1 = assigner(
        _vec_df(spark, [r for r in b1 if not streamed[r[0]][0]])
    )
    v2 = cb.semantic_admit_assigned(
        admitted1, assigner(_vec_df(spark, b2)), threshold=0.95
    ).collect()
    batch_mode = {
        r["vec_id"]: (r["is_dup"], r["match_id"], r["cosine"]) for r in v1 + v2
    }
    assert streamed == batch_mode
    # stored index carries the COMPOSITE ids the assigner minted
    idx = spark.read.schema(INDEX_SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(dirs["index"]).collect()
    want = {
        r["vec_id"]: r["cell"]
        for r in assigner(_vec_df(spark, b1 + b2)).collect()
    }
    assert len(idx) > 0
    assert all(r["cell"] == want[r["vec_id"]] for r in idx)


def test_assigner_swap_on_existing_index_raises(spark, dirs):
    """VERDICT r10 #2 (fails without the fix): the stored index persists
    raw cell ids, so a restart that wires a retrained codebook or a
    different signature width onto it would mint incomparable ids and
    silently admit every duplicate. The persisted fingerprint must make
    that restart fail loudly at the first trigger."""
    semantic_admit_batch(
        spark, _vec_df(spark, [(1, VX)]), 0,
        dirs["index"], dirs["verdicts"], CENTS, threshold=0.95,
    )
    assert os.path.isfile(os.path.join(dirs["index"], ASSIGNER_MARKER))
    # same codebook re-attaches fine (replay/restart path)
    semantic_admit_batch(
        spark, _vec_df(spark, [(2, VY)]), 1,
        dirs["index"], dirs["verdicts"], CENTS, threshold=0.95,
    )
    # a "retrained" codebook (perturbed centroid) must be refused —
    # including on an EMPTY trigger: mis-wire fails at attach, before
    # any verdict work.
    retrained = [[0.9, 0.1, 0.0, 0.0], list(CENTS[1])]
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(RuntimeError, match="DIFFERENT assigner"):
        semantic_admit_batch(
            spark, empty, 2, dirs["index"], dirs["verdicts"],
            retrained, threshold=0.95,
        )
    with pytest.raises(RuntimeError, match="DIFFERENT assigner"):
        semantic_admit_batch(
            spark, _vec_df(spark, [(3, VX)]), 2,
            dirs["index"], dirs["verdicts"], retrained, threshold=0.95,
        )
    # a custom assigner whose fingerprint differs is refused the same way
    # (e.g. changed n_sig_bits: same callable family, different cell space)
    assigner = lambda df: df  # noqa: E731 — never reached
    with pytest.raises(RuntimeError, match="DIFFERENT assigner"):
        semantic_admit_batch(
            spark, _vec_df(spark, [(3, VX)]), 2,
            dirs["index"], dirs["verdicts"], None, threshold=0.95,
            assigner=assigner,
            fingerprint=assigner_fingerprint("partitioned", CENTS, 3),
        )
    # the refused attempts wrote nothing
    assert not os.path.exists(os.path.join(dirs["index"], "batch-2"))
    assert _index_ids(spark, dirs) == [1, 2]


def test_assigner_marker_survives_fold(spark, dirs):
    """Fold consolidation rewrites the index's batch dirs; the assigner
    marker sits beside them and must survive, still validating."""
    for bid, rows in enumerate([[(1, VX)], [(2, VY)], [(4, VZ)]]):
        semantic_admit_batch(
            spark, _vec_df(spark, rows), bid,
            dirs["index"], dirs["verdicts"], CENTS,
            threshold=0.95, fold_every=2,
        )
    assert any(
        p.startswith("fold-") for p in os.listdir(dirs["index"])
    ), "fold_every=2 over 3 batches should have consolidated"
    marker = os.path.join(dirs["index"], ASSIGNER_MARKER)
    assert os.path.isfile(marker)
    with open(marker) as fh:
        assert fh.read().strip() == assigner_fingerprint("flat", CENTS)


def test_require_success_probes_both_sides():
    """ADVICE r10: the liveness probe must also cover the index-side
    batch dir — a marker lost there alone silently shrinks the stored
    index. Unit-level: the shared probe raises on a markerless dir."""
    import tempfile as _tf

    from forgettable_spark.streaming.semantic_admit import _require_success

    with _tf.TemporaryDirectory() as d:
        bad = os.path.join(d, "batch-0")
        os.makedirs(bad)
        with pytest.raises(RuntimeError, match="marksuccessfuljobs"):
            _require_success(bad)
        with open(os.path.join(bad, "_SUCCESS"), "w"):
            pass
        _require_success(bad)  # no raise
    # and the batch path calls it on BOTH written partitions
    import inspect

    from forgettable_spark.streaming import semantic_admit as mod

    src = inspect.getsource(mod.semantic_admit_batch)
    assert src.count("_require_success(") == 2
    assert "index_dir" in src.split("_require_success(")[2]


def _cross_bit_pair():
    """A near-duplicate pair (cosine ~0.995) straddling signature bit 0
    ONLY, crafted against the REAL hyperplane family (u, v = x +- eps*w0_hat
    with x perpendicular to w0 and mostly x-axis so both land in coarse cell 0).
    The properties are re-validated here against hyperplane_weights_py so
    a future family change fails loudly instead of silently invalidating
    the fixture (the r12 family fix caught exactly that hazard)."""
    from forgettable_spark.extensions.similarity import hyperplane_weights_py

    u = (0.699333, -0.292868, -0.280761, -0.264347)
    v = (0.744147, -0.249217, -0.238914, -0.224946)
    w0 = hyperplane_weights_py(0, 4)
    w1 = hyperplane_weights_py(1, 4)
    dot = lambda a, b: sum(x * y for x, y in zip(a, b))  # noqa: E731
    assert dot(u, w0) > 0 > dot(v, w0), "bit 0 must flip"
    assert (dot(u, w1) > 0) == (dot(v, w1) > 0), "bit 1 must agree"
    assert u[0] > abs(u[1]) and v[0] > abs(v[1]), "must share coarse cell 0"
    c = dot(u, v) / (dot(u, u) ** 0.5 * dot(v, v) ** 0.5)
    assert c > 0.95, c
    return u, v


def test_loop_probe_flips_catch_cross_bit_duplicate(spark, dirs):
    """r11 multi-probe admission through the LOOP: a near-duplicate pair
    straddling one signature bit (``_cross_bit_pair`` — property-locked
    against the real hyperplane family) is silently ADMITTED by the
    unprobed partitioned loop and caught with probe_flips set. Also:
    probe_flips without probe_n_fine must raise."""
    from forgettable_spark.extensions import codebook as cb

    coarse = [list(c) for c in CENTS]
    fines = [[list(CENTS[0])], [list(CENTS[1])]]
    bits, n_fine = 2, 2
    assigner = lambda df: cb.assign_cells_partitioned(  # noqa: E731
        df, coarse, fines, bits
    )
    fp = assigner_fingerprint("partitioned", coarse, fines, bits)
    u, v = _cross_bit_pair()

    with pytest.raises(ValueError, match="probe_n_fine"):
        semantic_admit_batch(
            spark, _vec_df(spark, [(1, u)]), 0, dirs["index"], dirs["verdicts"],
            None, threshold=0.95, assigner=assigner, fingerprint=fp,
            probe_flips=2,
        )
    # and probing over the FLAT path must raise too (review r11): flat
    # cell ids carry no signature bits to flip
    with pytest.raises(ValueError, match="composite assigner"):
        semantic_admit_batch(
            spark, _vec_df(spark, [(1, u)]), 0, dirs["index"], dirs["verdicts"],
            CENTS, threshold=0.95, probe_n_fine=2, probe_flips=2,
        )

    def run(workdir: str, flips: int) -> dict:
        idx, ver = f"{workdir}/index", f"{workdir}/verdicts"
        for bid, rows in enumerate([[(1, u)], [(10, v)]]):
            semantic_admit_batch(
                spark, _vec_df(spark, rows), bid, idx, ver,
                None, threshold=0.95, assigner=assigner, fingerprint=fp,
                probe_n_fine=n_fine, probe_flips=flips,
            )
        return {
            r["vec_id"]: r.asDict()
            for r in spark.read.option("recursiveFileLookup", "true")
            .parquet(ver).collect()
        }

    unprobed = run(os.path.join(dirs["root"], "noprobe"), 0)
    probed = run(os.path.join(dirs["root"], "probe"), 2)
    # same pair, same index: the only difference is the probe
    assert not unprobed[10]["is_dup"], "cross-bit dup silently admitted"
    assert probed[10]["is_dup"] and probed[10]["match_id"] == 1
    assert probed[10]["cosine"] > 0.95


def test_semantic_empty_trigger_writes_nothing(spark, dirs):
    """ADVICE r9: an empty micro-batch must not run the verdict job or
    mint empty batch-<id> directories that every later trigger would
    list and read (the text loop's n_batch == 0 gate)."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    semantic_admit_batch(
        spark, empty, 0, dirs["index"], dirs["verdicts"], CENTS, threshold=0.95,
    )
    assert not os.path.exists(os.path.join(dirs["index"], "batch-0"))
    assert not os.path.exists(os.path.join(dirs["verdicts"], "batch-0"))
    # And a nonempty follow-up batch still works against the clean layout.
    semantic_admit_batch(
        spark, _vec_df(spark, [(1, VX)]), 1,
        dirs["index"], dirs["verdicts"], CENTS, threshold=0.95,
    )
    assert _index_ids(spark, dirs) == [1]


def test_semantic_admit_fails_loudly_without_success_markers(spark, dirs):
    """ADVICE r9 (the text loop's ADVICE-r7 device): with the committer's
    marksuccessfuljobs=false every batch dir is invisible to the
    _SUCCESS-gated reads — the stored index would always read empty and
    the loop would silently admit every duplicate forever. The FIRST
    batch must fail with the remediation instead."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    prev = hconf.get(key)
    hconf.set(key, "false")
    try:
        with pytest.raises(RuntimeError, match="marksuccessfuljobs"):
            semantic_admit_batch(
                spark, _vec_df(spark, [(1, VX)]), 0,
                dirs["index"], dirs["verdicts"], CENTS, threshold=0.95,
            )
    finally:
        if prev is None:
            hconf.unset(key)
        else:
            hconf.set(key, prev)


def test_semantic_admit_batch_restores_conf(spark, dirs):
    """ADVICE r9: the batch pins AQE off + a narrow shuffle width for its
    queries (the micro-trigger is job-scheduling-bound) and must restore
    both on exit — including the early empty-trigger return."""
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    semantic_admit_batch(
        spark, _vec_df(spark, [(1, VX), (2, VY)]), 0,
        dirs["index"], dirs["verdicts"], CENTS, threshold=0.95,
    )
    assert spark.conf.get("spark.sql.adaptive.enabled") == prev_aqe
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_parts
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    semantic_admit_batch(
        spark, empty, 1, dirs["index"], dirs["verdicts"], CENTS, threshold=0.95,
    )
    assert spark.conf.get("spark.sql.adaptive.enabled") == prev_aqe
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_parts


def test_semantic_admit_batch_leaves_no_storage(spark, dirs):
    """The batch and verdict checkpoints are swept at scope exit — the
    admission loop's storage-hygiene invariant."""
    spark.catalog.clearCache()
    before = {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    semantic_admit_batch(
        spark, _vec_df(spark, [(1, VX), (2, VY)]), 0,
        dirs["index"], dirs["verdicts"], CENTS, threshold=0.95,
    )
    after = {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }
    assert after == before


def test_structured_assigner_defaults_probes_on(spark, dirs):
    """VERDICT r11 #1b: with a structured ``codebook.PartitionedAssigner``
    the loop derives fingerprint and probe modulus from the object that
    DEFINES the cell space and defaults to FULL 1-flip probes — the
    crafted cross-bit pair is caught with no probe_*/fingerprint
    arguments at all (the measured-correct default: −4.4% throughput for
    +65% duplicates caught, SCALING.md r11). Guards: a contradicting
    probe_n_fine raises; a stale explicit fingerprint beside the
    structured assigner raises; a fingerprint on the FLAT path raises
    (ADVICE r11); and probe_flips=0 still opts out (the pair is silently
    admitted, bit-equal to the unprobed loop)."""
    from forgettable_spark.extensions import codebook as cb

    coarse = [list(c) for c in CENTS]
    fines = [[list(CENTS[0])], [list(CENTS[1])]]
    assigner = cb.PartitionedAssigner(coarse, fines, 2)
    assert assigner.n_fine == 2  # ragged-aware: sum(len(f)), never k1*k2
    u, v = _cross_bit_pair()

    with pytest.raises(ValueError, match="contradicts"):
        semantic_admit_batch(
            spark, _vec_df(spark, [(1, u)]), 0, dirs["index"], dirs["verdicts"],
            None, threshold=0.95, assigner=assigner, probe_n_fine=4,
        )
    with pytest.raises(ValueError, match="does not match the structured"):
        semantic_admit_batch(
            spark, _vec_df(spark, [(1, u)]), 0, dirs["index"], dirs["verdicts"],
            None, threshold=0.95, assigner=assigner, fingerprint="stale",
        )
    with pytest.raises(ValueError, match="only accepted alongside"):
        semantic_admit_batch(
            spark, _vec_df(spark, [(1, u)]), 0, dirs["index"], dirs["verdicts"],
            CENTS, threshold=0.95,
            fingerprint=assigner_fingerprint("flat", CENTS),
        )

    def run(workdir: str, **kw):
        idx, ver = f"{workdir}/index", f"{workdir}/verdicts"
        for bid, rows in enumerate([[(1, u)], [(10, v)]]):
            semantic_admit_batch(
                spark, _vec_df(spark, rows), bid, idx, ver,
                None, threshold=0.95, assigner=assigner, **kw,
            )
        return idx, {
            r["vec_id"]: r.asDict()
            for r in spark.read.option("recursiveFileLookup", "true")
            .parquet(ver).collect()
        }

    idx_dir, auto = run(os.path.join(dirs["root"], "auto"))
    assert auto[10]["is_dup"] and auto[10]["match_id"] == 1  # probes ON
    assert auto[10]["cosine"] > 0.95
    with open(os.path.join(idx_dir, ASSIGNER_MARKER)) as fh:
        stored = fh.read().strip()
    assert stored == assigner.fingerprint()
    assert stored == assigner_fingerprint("partitioned", coarse, fines, 2)
    _, optout = run(os.path.join(dirs["root"], "optout"), probe_flips=0)
    assert not optout[10]["is_dup"]  # explicit 0 opts out of probing


def test_cell_pruned_layout_writes_buckets_and_reads_legacy(spark, dirs):
    """VERDICT r11 #3: index batches are hive-partitioned by
    cb = pmod(cell, CELL_BUCKETS) so a trigger reads only the buckets
    its batch touches. (1) a new batch dir carries cb= partitions;
    (2) a LEGACY unpartitioned index batch (pre-r12 layout) is still
    read — the cross-batch duplicate against it is caught, not silently
    admitted; (3) the fold migrates legacy + bucketed parts into ONE
    bucketed fold dir and dedup still works against it."""
    from forgettable_spark.streaming.semantic_admit import (
        CELL_BUCKETS,
        _read_index,
    )

    # Legacy batch-0: written the pre-r12 way (plain parquet, no cb=),
    # holding VY's assigned row (cell 1 under CENTS).
    legacy = spark.createDataFrame(
        [(2, list(map(float, VY)), 1, 1.0)],
        "vec_id long, embedding array<float>, cell long, n double",
    )
    legacy.write.mode("overwrite").parquet(
        os.path.join(dirs["index"], "batch-0")
    )
    # claim the marker as the flat assigner would, so batch 1 attaches
    from forgettable_spark.streaming.semantic_admit import (
        _claim_or_validate_assigner,
    )

    _claim_or_validate_assigner(
        dirs["index"], assigner_fingerprint("flat", CENTS)
    )

    # Batch 1 through the loop: 10 ≈ VY (dup vs the LEGACY index row),
    # 11 sub-threshold (admitted).
    semantic_admit_batch(
        spark, _vec_df(spark, [(10, VY), (11, VZ)]), 1,
        dirs["index"], dirs["verdicts"], CENTS, threshold=0.95,
    )
    v = _verdicts(spark, dirs)
    assert v[10]["is_dup"] and v[10]["match_id"] == 2, "legacy index unread"
    assert not v[11]["is_dup"]
    b1 = os.path.join(dirs["index"], "batch-1")
    assert any(e.startswith("cb=") for e in os.listdir(b1)), "not bucketed"

    # Pruned read: only bucket pmod(1, CELL_BUCKETS) → sees the legacy
    # row (legacy parts are never pruned) + batch-1's cell-0 row is
    # excluded from the BUCKETED part when pruning to cell 1's bucket.
    pruned = _read_index(spark, dirs["index"], exclude_batch=-1,
                         buckets=[1 % CELL_BUCKETS])
    ids = {r["vec_id"] for r in pruned.collect()}
    assert 2 in ids  # legacy row survives unpruned
    assert 11 not in ids  # bucketed cell-0 row pruned away

    # Fold migrates both layouts into one bucketed fold dir.
    from forgettable_spark.streaming.semantic_admit import _fold_index

    _fold_index(spark, dirs["index"], 2)
    fold = os.path.join(dirs["index"], "fold-2")
    assert os.path.isfile(os.path.join(fold, "_SUCCESS"))
    assert any(e.startswith("cb=") for e in os.listdir(fold)), "fold unbucketed"
    assert not os.path.isdir(os.path.join(dirs["index"], "batch-0"))
    # and the folded index still serves verdicts: replay a near-dup of
    # the legacy row — caught against the migrated fold.
    semantic_admit_batch(
        spark, _vec_df(spark, [(20, VY)]), 3,
        dirs["index"], dirs["verdicts"], CENTS, threshold=0.95,
    )
    v = _verdicts(spark, dirs)
    assert v[20]["is_dup"] and v[20]["match_id"] == 2
    # full unpruned read sees exactly the admitted set
    all_ids = {
        r["vec_id"]
        for r in _read_index(spark, dirs["index"], exclude_batch=-1).collect()
    }
    assert all_ids == {2, 11}


def test_layout_marker_pins_bucket_count_and_pruning_is_exact(spark, dirs):
    """The bucket count is a LAYOUT property of the index (pmod under a
    different modulus would prune away live witnesses): first contact
    persists it, a contradicting loop config raises, and verdicts under
    real pruning (cell_buckets=64) are identical to the unpruned
    control (cell_buckets=1 — same machinery, every row in one
    bucket)."""
    from forgettable_spark.streaming.semantic_admit import LAYOUT_MARKER

    def run(workdir: str, buckets: int) -> dict:
        idx, ver = f"{workdir}/index", f"{workdir}/verdicts"
        batches = [
            [(1, VX), (2, VY)],
            [(10, (0.999, 0.0, 0.04, 0.0)), (11, (0.0, 1.0, 0.01, 0.0)),
             (12, VZ)],
        ]
        for bid, rows in enumerate(batches):
            semantic_admit_batch(
                spark, _vec_df(spark, rows), bid, idx, ver,
                CENTS, threshold=0.95, cell_buckets=buckets,
            )
        with open(os.path.join(idx, LAYOUT_MARKER)) as fh:
            assert int(fh.read().strip()) == buckets
        return {
            r["vec_id"]: (r["is_dup"], r["match_id"], round(r["cosine"], 9))
            for r in spark.read.option("recursiveFileLookup", "true")
            .parquet(ver).collect()
        }

    pruned = run(os.path.join(dirs["root"], "p64"), 64)
    control = run(os.path.join(dirs["root"], "p1"), 1)
    assert pruned == control, "bucket pruning changed a verdict"
    assert pruned[10][0] and pruned[10][1] == 1  # cross-batch dup caught
    assert pruned[11][0] and pruned[11][1] == 2
    assert not pruned[12][0]

    # A mis-configured restart must fail at attach, before any work.
    with pytest.raises(RuntimeError, match="cell_buckets=64"):
        semantic_admit_batch(
            spark, _vec_df(spark, [(20, VX)]), 2,
            os.path.join(dirs["root"], "p64", "index"),
            os.path.join(dirs["root"], "p64", "verdicts"),
            CENTS, threshold=0.95, cell_buckets=8,
        )


def test_banded_assigner_loop_matches_batch_operator(spark, dirs):
    """r12 BandedAssigner in the loop: (1) verdicts match batch-mode
    replay of `semantic_admit_assigned_banded` over the same exploded
    assignment, (2) the stored index persists r rows per admitted
    vector (the banded shape), (3) an explicit probe_flips > 0 beside a
    banded assigner raises, (4) a band-count swap on the existing index
    raises at attach (the one-index-one-assigner law)."""
    from pyspark.sql import functions as F

    from forgettable_spark.extensions import codebook as cb

    coarse = [list(c) for c in CENTS]
    fines = [[list(CENTS[0])], [list(CENTS[1])]]
    assigner = cb.BandedAssigner(coarse, fines, n_bands=3, band_bits=2)
    b1 = [(1, VX), (2, VY), (3, VX)]
    b2 = [(10, VY), (11, VZ)]
    with pytest.raises(ValueError, match="banded"):
        semantic_admit_batch(
            spark, _vec_df(spark, b1), 0, dirs["index"], dirs["verdicts"],
            None, threshold=0.95, assigner=assigner, probe_flips=1,
        )
    for bid, rows in enumerate([b1, b2]):
        semantic_admit_batch(
            spark, _vec_df(spark, rows), bid, dirs["index"], dirs["verdicts"],
            None, threshold=0.95, assigner=assigner,
        )
    streamed = {
        k: (r["is_dup"], r["match_id"], round(r["cosine"], 9))
        for k, r in _verdicts(spark, dirs).items()
    }
    empty = spark.createDataFrame([], INDEX_SCHEMA).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("_v"), "cell", "n"
    )
    v1 = cb.semantic_admit_assigned_banded(
        empty, assigner(_vec_df(spark, b1)), threshold=0.95
    ).collect()
    admitted1 = assigner(
        _vec_df(spark, [r for r in b1 if not streamed[r[0]][0]])
    )
    v2 = cb.semantic_admit_assigned_banded(
        admitted1, assigner(_vec_df(spark, b2)), threshold=0.95
    ).collect()
    batch_mode = {
        r["vec_id"]: (r["is_dup"], r["match_id"], round(r["cosine"], 9))
        for r in v1 + v2
    }
    assert streamed == batch_mode
    # one verdict row per batch VECTOR (the distinct spine), not per band
    assert sorted(streamed) == [1, 2, 3, 10, 11]
    # stored index: 3 rows per admitted vector, cells exactly the
    # assigner's banded mint
    idx = spark.read.schema(INDEX_SCHEMA).option(
        "recursiveFileLookup", "true"
    ).parquet(dirs["index"]).collect()
    admitted_ids = {k for k, v in streamed.items() if not v[0]}
    from collections import Counter

    per_vec = Counter(r["vec_id"] for r in idx)
    assert set(per_vec) == admitted_ids
    assert all(c == 3 for c in per_vec.values())
    want = {
        (r["vec_id"], r["cell"])
        for r in assigner(_vec_df(spark, b1 + b2)).collect()
    }
    assert all((r["vec_id"], r["cell"]) in want for r in idx)
    # band-count swap on the stored index fails at attach
    with pytest.raises(RuntimeError, match="assigner"):
        semantic_admit_batch(
            spark, _vec_df(spark, [(20, VX)]), 2, dirs["index"],
            dirs["verdicts"], None, threshold=0.95,
            assigner=cb.BandedAssigner(coarse, fines, n_bands=2, band_bits=2),
        )


def test_banded_assigner_loop_catches_cross_bit_duplicate(spark, dirs):
    """The banded loop's reason to exist: a near-duplicate pair whose
    FULL signatures differ (so the partitioned loop without probes
    would admit it) is still caught when ANY band agrees — band
    signatures over disjoint hyperplane slices make agreement a
    per-band event. Built from the real hyperplane weights (the
    test_mixture_canonical_semantic crafting device): find two
    near-identical vectors whose band-0 sigs agree; with 3 bands the
    OR catches what the single full signature may split."""
    import numpy as np

    from forgettable_spark.extensions import codebook as cb
    from forgettable_spark.extensions.similarity import hyperplane_weights_py

    dim = 8
    rng = np.random.default_rng(7)
    base = rng.normal(size=dim)
    base /= np.linalg.norm(base)
    # near-duplicate: tiny perturbation, cosine ~0.999
    near = base + 0.02 * rng.normal(size=dim)
    near /= np.linalg.norm(near)
    coarse = [list(base)]
    fines = [[list(base)]]
    assigner = cb.BandedAssigner(coarse, fines, n_bands=3, band_bits=2)
    a1 = assigner(_vec_df(spark, [(1, tuple(base))])).collect()
    a2 = assigner(_vec_df(spark, [(2, tuple(near))])).collect()
    agree = {r["cell"] for r in a1} & {r["cell"] for r in a2}
    assert agree, "fixture degenerate: no band agrees for a near-dup pair"
    semantic_admit_batch(
        spark, _vec_df(spark, [(1, tuple(base))]), 0, dirs["index"],
        dirs["verdicts"], None, threshold=0.9, assigner=assigner,
    )
    semantic_admit_batch(
        spark, _vec_df(spark, [(2, tuple(near))]), 1, dirs["index"],
        dirs["verdicts"], None, threshold=0.9, assigner=assigner,
    )
    v = _verdicts(spark, dirs)
    assert v[2]["is_dup"] and v[2]["match_id"] == 1
