"""Versioned-manifest transactional table: atomic visibility, optimistic
concurrency, retained-version reads, vacuum, and the compaction cycle."""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from forgettable_spark import operators as ops
from forgettable_spark.operators.snapshot import FORGET_EVENTS_SCHEMA
from forgettable_spark.sources.txn import (
    CommitConflictError,
    ManifestTable,
    compact_to_table,
)

T0 = datetime(2024, 6, 1, 12, 0, 0, tzinfo=timezone.utc)
NOW_US = int(T0.timestamp() * 1e6) + 10_000_000


def _events(spark, n=60, base=0):
    rows = [(f"d{i % 3}", f"b{i % 5}", 1 + base, T0) for i in range(n)]
    return spark.createDataFrame(rows, FORGET_EVENTS_SCHEMA)


def test_commit_read_roundtrip(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    assert t.current_version() is None
    v = t.commit(_events(spark))
    assert v == 1 and t.current_version() == 1
    assert t.read(spark).count() == 60


def test_new_commit_never_blanks_the_table(spark, tmp_path):
    """The rename-swap flaw this replaces: at every instant between and
    during commits, a fresh reader sees a complete version."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(_events(spark, base=0))
    old = t.read(spark)  # resolved against v1
    t.commit(_events(spark, n=30, base=7))
    # old reader still works (v1 data is immutable and un-vacuumed)...
    assert old.count() == 60
    # ...and a fresh read sees v2
    assert t.read(spark).count() == 30
    # both versions remain explicitly addressable (time travel)
    assert t.read(spark, version=1).count() == 60


def test_commit_conflict_raises_and_cleans_up(spark, tmp_path, monkeypatch):
    """Two writers race for the same version: the loser's os.link fails,
    its staged data is reclaimed, and the error is loud (not the
    reference's silently-swallowed WatchError)."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(_events(spark))  # v1
    winner = ManifestTable(t.root)
    winner.commit(_events(spark, n=10))  # v2
    # loser read the table before the winner committed: stale view of v1
    monkeypatch.setattr(t, "current_version", lambda: 1)
    with pytest.raises(CommitConflictError):
        t.commit(_events(spark, n=5))
    # losing write's data directory reclaimed; v1+v2 data intact
    assert len(os.listdir(os.path.join(t.root, "data"))) == 2
    fresh = ManifestTable(t.root)
    assert fresh.current_version() == 2 and fresh.read(spark).count() == 10


def test_stale_base_version_conflicts_before_write(spark, tmp_path):
    """The ADVICE defect: reader pins v1, a concurrent writer publishes v2,
    then the reader commits its derived result. Old behavior silently
    published v3 (dropping v2's increments); with base_version the stale
    claim loses loudly, before paying for the parquet write."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(_events(spark))  # v1
    df, pinned = t.read_pinned(spark)
    assert pinned == 1
    ManifestTable(t.root).commit(_events(spark, n=10))  # concurrent v2
    with pytest.raises(CommitConflictError, match="stale read"):
        t.commit(df, base_version=pinned)
    # no stale data directory was staged (fast-fail happened pre-write)
    assert len(os.listdir(os.path.join(t.root, "data"))) == 2
    # v2 (the concurrent writer's increments) survives
    assert t.read(spark).count() == 10


def test_base_version_none_means_observed_empty(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    # observed empty, nobody raced: commits v1
    assert t.commit(_events(spark), base_version=None) == 1
    # observed empty but the table isn't: conflict
    with pytest.raises(CommitConflictError):
        ManifestTable(t.root).commit(_events(spark, n=5), base_version=None)


def test_conflict_retry_cycle_converges(spark, tmp_path):
    """The documented recovery path: catch, re-read pinned, retry."""
    t = ManifestTable(str(tmp_path / "tbl"))
    t.commit(_events(spark))  # v1
    df, pinned = t.read_pinned(spark)
    ManifestTable(t.root).commit(_events(spark, n=10))  # concurrent v2
    with pytest.raises(CommitConflictError):
        t.commit(df, base_version=pinned)
    df2, pinned2 = t.read_pinned(spark)
    assert pinned2 == 2
    assert t.commit(df2.limit(4), base_version=pinned2) == 3
    assert t.read(spark).count() == 4


def test_compact_to_table_threads_base_version(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "baseline"))
    compact_to_table(_events(spark), t, NOW_US, rate=1e-6)  # v1
    baseline, pinned = t.read_pinned(spark)
    ManifestTable(t.root).commit(_events(spark, n=10))  # concurrent v2
    with pytest.raises(CommitConflictError):
        compact_to_table(baseline, t, NOW_US + 1, base_version=pinned, rate=1e-6)


def test_vacuum_drops_old_versions(spark, tmp_path):
    t = ManifestTable(str(tmp_path / "tbl"))
    for i in range(4):
        t.commit(_events(spark, n=10 + i))
    assert t.versions() == [1, 2, 3, 4]
    dropped = t.vacuum(keep=2)
    assert dropped == [1, 2] and t.versions() == [3, 4]
    assert t.read(spark).count() == 13
    with pytest.raises(FileNotFoundError):
        t.manifest(1)


def test_compaction_cycle_through_table(spark, tmp_path):
    """compact -> commit -> (baseline union new increments) -> compact:
    the closed loop write_compacted provided, now without the visibility
    window."""
    t = ManifestTable(str(tmp_path / "baseline"))
    ev = _events(spark)
    v1 = compact_to_table(ev, t, NOW_US, rate=1e-6)
    baseline = t.read(spark)
    # baseline is a valid event log: snapshot over it matches direct
    direct = {
        (r["distribution"], r["bin"]): r["count"]
        for r in ops.decayed_state(ops.snapshot(ev), NOW_US, rate=1e-6).collect()
    }
    via_table = {
        (r["distribution"], r["bin"]): r["count"]
        for r in ops.snapshot(baseline).collect()
    }
    assert direct == via_table
    # append new increments and compact again -> version advances
    inc = spark.createDataFrame(
        [("d0", "b0", 5, datetime.fromtimestamp(NOW_US / 1e6 + 1, tz=timezone.utc))],
        FORGET_EVENTS_SCHEMA,
    )
    v2 = compact_to_table(baseline.unionByName(inc), t, NOW_US + 2_000_000, rate=1e-6)
    assert (v1, v2) == (1, 2)
    snap2 = ops.snapshot(t.read(spark))
    d0b0 = {(r["distribution"], r["bin"]): r["count"] for r in snap2.collect()}[("d0", "b0")]
    assert d0b0 == direct[("d0", "b0")] + 5


# -- delta segments (r4) ------------------------------------------------------


def _dir_bytes(path):
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "distribution STRING, bin STRING, n BIGINT, ts TIMESTAMP"
    )


def test_commit_delta_writes_o_batch_not_o_table(spark, tmp_path):
    """The r3 scale fix: a delta commit's written bytes scale with the
    BATCH, not the baseline. A wide baseline plus a one-group delta must
    write far less for the delta than for the base."""
    from datetime import datetime

    import hashlib

    t = datetime(2024, 6, 1)
    table = ManifestTable(str(tmp_path / "t"))
    # high-entropy bins so the baseline's size reflects its row count
    # instead of dictionary compression collapsing it to the format floor
    base_rows = [
        (f"d{i:03d}", hashlib.md5(f"{i}/{j}".encode()).hexdigest(), 10 + i + j, t)
        for i in range(200)
        for j in range(20)
    ]
    table.commit(_events_df(spark, base_rows), base_version=None)
    base_bytes = _dir_bytes(table.manifest(1)["data_path"])

    v2 = table.commit_delta(
        _events_df(spark, [("d000", "b0", 99, t)]), [("d000",)], base_version=1
    )
    delta_bytes = _dir_bytes(table.manifest(v2)["data_path"])
    # the old full-rewrite path wrote ~base_bytes per batch; the delta
    # writes a fixed small fraction regardless of baseline size
    assert delta_bytes < base_bytes / 20

    # resolution: the touched group is served from the delta (latest
    # wins, INCLUDING rows the delta dropped from the group), everything
    # else from the base
    got = {
        (r["distribution"], r["bin"]): r["n"]
        for r in table.read(spark).collect()
    }
    assert got[("d000", "b0")] == 99
    assert sum(1 for (d, _b) in got if d == "d000") == 1  # group fully replaced
    assert sum(1 for (d, _b) in got if d == "d199") == 20  # base served intact
    assert len(got) == 199 * 20 + 1


def test_delta_chain_three_versions_latest_wins(spark, tmp_path):
    from datetime import datetime

    t = datetime(2024, 6, 1)
    table = ManifestTable(str(tmp_path / "t"))
    table.commit(
        _events_df(spark, [("a", "x", 1, t), ("b", "y", 2, t), ("c", "z", 3, t)]),
        base_version=None,
    )
    table.commit_delta(_events_df(spark, [("a", "x", 10, t)]), [("a",)], base_version=1)
    table.commit_delta(
        _events_df(spark, [("a", "x", 100, t), ("b", "y", 20, t)]),
        [("a",), ("b",)],
        base_version=2,
    )
    # all three versions stay readable with per-version resolution
    v = lambda n: {
        (r["distribution"], r["bin"]): r["n"]
        for r in table.read(spark, version=n).collect()
    }
    assert v(1) == {("a", "x"): 1, ("b", "y"): 2, ("c", "z"): 3}
    assert v(2) == {("a", "x"): 10, ("b", "y"): 2, ("c", "z"): 3}
    assert v(3) == {("a", "x"): 100, ("b", "y"): 20, ("c", "z"): 3}
    assert table.segment_count(3) == 3


def test_sharded_delta_masks_at_shard_granularity(spark, tmp_path):
    """With n_shards, a delta claims (key, shard) groups: bins of the
    SAME distribution in other shards keep being served from the base."""
    from datetime import datetime

    from pyspark.sql import functions as F

    t = datetime(2024, 6, 1)
    n_shards = 4
    bins = [f"b{i:02d}" for i in range(16)]
    table = ManifestTable(str(tmp_path / "t"))
    table.commit(
        _events_df(spark, [("wide", b, 10, t) for b in bins]), base_version=None
    )
    shard_of = {
        r["bin"]: r["s"]
        for r in spark.createDataFrame([(b,) for b in bins], "bin STRING")
        .select("bin", F.pmod(F.xxhash64("bin"), F.lit(n_shards)).cast("int").alias("s"))
        .collect()
    }
    target = bins[0]
    same_shard = [b for b in bins if shard_of[b] == shard_of[target]]
    table.commit_delta(
        _events_df(spark, [(("wide"), target, 11, t)]),
        [("wide", shard_of[target])],
        base_version=1,
        n_shards=n_shards,
    )
    got = {r["bin"]: r["n"] for r in table.read(spark).collect()}
    assert got[target] == 11
    # bins in the SAME shard were replaced by the delta (dropped there)
    for b in same_shard:
        if b != target:
            assert b not in got
    # bins in other shards survive from the base
    for b in bins:
        if shard_of[b] != shard_of[target]:
            assert got[b] == 10


def test_fold_segments_compacts_chain(spark, tmp_path):
    from datetime import datetime

    t = datetime(2024, 6, 1)
    table = ManifestTable(str(tmp_path / "t"))
    table.commit(_events_df(spark, [("a", "x", 1, t), ("b", "y", 2, t)]), base_version=None)
    table.commit_delta(_events_df(spark, [("a", "x", 10, t)]), [("a",)], base_version=1)
    before = {
        (r["distribution"], r["bin"]): r["n"] for r in table.read(spark).collect()
    }
    v = table.fold_segments(spark)
    assert v == 3 and table.segment_count(3) == 1
    after = {
        (r["distribution"], r["bin"]): r["n"] for r in table.read(spark).collect()
    }
    assert before == after
    assert table.fold_segments(spark) is None  # already one segment


def test_delta_grouping_mismatch_raises(spark, tmp_path):
    from datetime import datetime

    t = datetime(2024, 6, 1)
    table = ManifestTable(str(tmp_path / "t"))
    table.commit(_events_df(spark, [("a", "x", 1, t)]), base_version=None)
    table.commit_delta(
        _events_df(spark, [("a", "x", 2, t)]), [("a", 0)], base_version=1, n_shards=4
    )
    with pytest.raises(ValueError, match="grouping mismatch"):
        table.commit_delta(
            _events_df(spark, [("a", "x", 3, t)]), [("a",)], base_version=2
        )


def test_vacuum_keeps_segments_shared_with_retained_versions(spark, tmp_path):
    import os
    from datetime import datetime

    t = datetime(2024, 6, 1)
    table = ManifestTable(str(tmp_path / "t"))
    table.commit(_events_df(spark, [("a", "x", 1, t), ("b", "y", 2, t)]), base_version=None)
    table.commit_delta(_events_df(spark, [("a", "x", 10, t)]), [("a",)], base_version=1)
    table.commit_delta(_events_df(spark, [("b", "y", 20, t)]), [("b",)], base_version=2)
    base_path = table.manifest(1)["data_path"]
    # dropping v1 must NOT delete its data dir: v2 and v3 still resolve
    # their untouched groups from that base segment
    assert table.vacuum(keep=2) == [1]
    assert os.path.isdir(base_path)
    got = {
        (r["distribution"], r["bin"]): r["n"] for r in table.read(spark).collect()
    }
    assert got == {("a", "x"): 10, ("b", "y"): 20}
    # after folding, nothing retained references the old segments
    table.fold_segments(spark)
    table.vacuum(keep=1)
    assert not os.path.isdir(base_path)


def test_commit_delta_with_integer_key_col(spark, tmp_path):
    """commit_delta is key-agnostic: a BIGINT key column must remain
    readable through the segmented resolver (the claim map joins on a
    string-cast shadow key, not a hardcoded STRING schema)."""
    table = ManifestTable(str(tmp_path / "int_key"))
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "uid BIGINT, bin STRING, n BIGINT"
    )
    v1 = table.commit(base, base_version=None, partition_col=None)
    delta = spark.createDataFrame([(2, "b", 99)], "uid BIGINT, bin STRING, n BIGINT")
    v2 = table.commit_delta(
        delta, [(2,)], base_version=v1, key_col="uid", partition_col=None
    )
    got = {(r["uid"], r["bin"]): r["n"] for r in table.read(spark, version=v2).collect()}
    assert got == {(1, "a"): 10, (2, "b"): 99}
