"""Structured Streaming forget-table: multi-batch state evolution, decay on
update, pruning, and TTL eviction — driven through real streaming queries
over a file source (1 parquet file = 1 micro-batch).
"""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from forgettable_spark.operators.snapshot import FORGET_EVENTS_SCHEMA
from forgettable_spark.streaming import (
    read_increment_stream,
    streaming_forget_table,
    streaming_snapshot,
)

T0 = datetime(2024, 6, 1, 12, 0, 0, tzinfo=timezone.utc)


def _ts(offset_sec: float) -> datetime:
    return datetime.fromtimestamp(T0.timestamp() + offset_sec, tz=timezone.utc)


@pytest.fixture()
def stream_dir(spark):
    d = tempfile.mkdtemp(prefix="forget_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


_BATCH_SEQ = [0]


def _write_batch(spark, path: str, name: str, rows) -> None:
    """One real parquet file per micro-batch (the Spark writer would emit a
    directory, which the file-stream source treats differently); mtimes are
    staggered so the source processes batches in write order."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "distribution": [r[0] for r in rows],
            "bin": [r[1] for r in rows],
            "n": pa.array([r[2] for r in rows], pa.int64()),
            "ts": pa.array([r[3].replace(tzinfo=None) for r in rows], pa.timestamp("us")),
        }
    )
    fp = f"{path}/{name}"
    pq.write_table(table, fp)
    _BATCH_SEQ[0] += 1
    t = 1_700_000_000 + _BATCH_SEQ[0] * 60
    os.utime(fp, (t, t))


def _latest_sql(table: str) -> str:
    """Latest emitted row per (distribution, bin) — update-mode memory sinks
    append each batch's emissions."""
    return (
        f"SELECT * FROM (SELECT *, ROW_NUMBER() OVER"
        f" (PARTITION BY distribution, bin ORDER BY t_us DESC) AS _rn FROM {table})"
        f" WHERE _rn = 1"
    )


def _run_to_completion(stream_df, query_name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_snapshot_accumulates(spark, stream_dir):
    _write_batch(
        spark,
        stream_dir,
        "b1.parquet",
        [("colors", "red", 3, _ts(0)), ("colors", "blue", 1, _ts(0))],
    )
    _write_batch(
        spark,
        stream_dir,
        "b2.parquet",
        [("colors", "red", 2, _ts(5)), ("animals", "cat", 1, _ts(5))],
    )
    stream = read_increment_stream(spark, stream_dir)
    _run_to_completion(streaming_snapshot(stream), "snap_test")
    rows = {
        (r["distribution"], r["bin"]): r["count"]
        for r in spark.sql("SELECT * FROM snap_test").collect()
    }
    # update mode emits per-batch rows; the latest value for a key wins
    assert rows[("colors", "red")] == 5
    assert rows[("colors", "blue")] == 1
    assert rows[("animals", "cat")] == 1


def test_streaming_snapshot_from_json_wire(spark, stream_dir):
    """The wire-format stream source: JSON increments (ts as ISO-8601
    string) normalize through the same tolerant parse as the batch
    connector — totals equal the parquet-stream result, and one
    malformed ts yields a NULL-ts row, not a dead stream."""
    import json as _json
    import os

    rows = [
        {"distribution": "colors", "bin": "red", "n": 3, "ts": "2024-06-01T12:00:00"},
        {"distribution": "colors", "bin": "red", "n": 2, "ts": "2024-06-01T12:00:05"},
        {"distribution": "animals", "bin": "cat", "n": 1, "ts": "not-a-timestamp"},
    ]
    with open(os.path.join(stream_dir, "b1.json"), "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    stream = read_increment_stream(spark, stream_dir, format="json")
    _run_to_completion(streaming_snapshot(stream), "json_wire_test")
    got = {
        (r["distribution"], r["bin"]): (r["count"], r["t_us"])
        for r in spark.sql("SELECT * FROM json_wire_test").collect()
    }
    assert got[("colors", "red")][0] == 5
    # malformed ts row still counted; its max-ts aggregate is NULL
    assert got[("animals", "cat")][0] == 1
    assert got[("animals", "cat")][1] is None


def test_streaming_forget_table_decays_between_batches(spark, stream_dir):
    """batch1: red=10 at t=0; batch2: red+=1 at t=10s, rate=0.5 →
    state decays floor(0.5·10)=5 before the increment: 10-5+1=6."""
    _write_batch(spark, stream_dir, "b1.parquet", [("colors", "red", 10, _ts(0))])
    _write_batch(spark, stream_dir, "b2.parquet", [("colors", "red", 1, _ts(10))])
    stream = read_increment_stream(spark, stream_dir)
    _run_to_completion(
        streaming_forget_table(stream, rate=0.5), "forget_decay_test"
    )
    latest = (
        spark.sql(_latest_sql("forget_decay_test")).collect()
    )
    rows = {(r["distribution"], r["bin"]): r["count"] for r in latest}
    assert rows[("colors", "red")] == 6


def test_streaming_forget_table_prunes_and_discards(spark, stream_dir):
    """A bin decayed to zero vanishes; a whole distribution decayed to zero
    is discarded from state (empty-write discard analogue)."""
    _write_batch(
        spark,
        stream_dir,
        "b1.parquet",
        [("colors", "red", 10, _ts(0)), ("colors", "green", 2, _ts(0)),
         ("stale", "old", 2, _ts(0))],
    )
    _write_batch(
        spark,
        stream_dir,
        "b2.parquet",
        # t=+8s: k=4 → green 2-4→0 pruned, red 10-4+1=7; stale gets no
        # traffic so its state is untouched this batch (decay-at-update)
        [("colors", "red", 1, _ts(8))],
    )
    stream = read_increment_stream(spark, stream_dir)
    _run_to_completion(streaming_forget_table(stream, rate=0.5), "forget_prune_test")
    latest = spark.sql(_latest_sql("forget_prune_test")).collect()
    per_key = {(r["distribution"], r["bin"]): r["count"] for r in latest}
    assert per_key[("colors", "red")] == 7
    # green emitted in batch1 (count 2) but pruned from batch2's emission
    batch2_bins = {
        r["bin"]
        for r in latest
        if r["distribution"] == "colors" and r["t_us"] > int(T0.timestamp() * 1e6)
    }
    assert "green" not in batch2_bins


class _FakeState:
    """Duck-typed GroupState for exercising the update closure's timeout
    and empty-discard branches, which a memory sink cannot observe."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


def _update_closure(**kwargs):
    """Extract the stateful update function without starting a query."""
    from forgettable_spark.streaming import forget_stream as fs

    captured = {}

    class _Probe:
        def withWatermark(self, *a):
            return self

        def groupBy(self, *a):
            return self

        def applyInPandasWithState(self, fn, **kw):
            captured["fn"] = fn
            return None

    fs.streaming_forget_table(_Probe(), **kwargs)
    return captured["fn"]


def test_timeout_branch_removes_state():
    fn = _update_closure(rate=0.5)
    state = _FakeState(value=(["red"], [5], 1_000_000), timed_out=True)
    out = list(fn(("colors",), iter([]), state))
    assert state.removed
    assert sum(len(df) for df in out) == 0


def test_whole_distribution_decay_discards_state():
    """All bins decay to zero within one update → state removed (the
    empty-write discard, goforget/redis_utils.go:158-161)."""
    import pandas as pd

    fn = _update_closure(rate=0.5)
    t0_us = int(T0.timestamp() * 1e6)
    state = _FakeState(value=(["red"], [2], t0_us))
    batch = pd.DataFrame(
        {
            "distribution": ["colors"],
            "bin": ["green"],
            "n": [0],
            "ts": [pd.Timestamp(T0.replace(tzinfo=None)) + pd.Timedelta(seconds=100)],
        }
    )
    out = list(fn(("colors",), iter([batch]), state))
    assert state.removed
    assert sum(len(df) for df in out) == 0


def test_timeout_armed_at_expiry_horizon():
    """After an update the event-time timeout must sit at T + (σ+η)·η ms."""
    import math

    import pandas as pd

    fn = _update_closure(rate=0.5, sigma=2.0)
    t0_us = int(T0.timestamp() * 1e6)
    state = _FakeState()
    batch = pd.DataFrame(
        {
            "distribution": ["colors"],
            "bin": ["red"],
            "n": [8],
            "ts": [pd.Timestamp(T0.replace(tzinfo=None))],
        }
    )
    list(fn(("colors",), iter([batch]), state))
    eta = math.sqrt(8 / 0.5)
    expected_ms = t0_us // 1000 + int((2.0 + eta) * eta * 1000)
    assert state.timeout_ms == expected_ms


def test_streaming_forget_table_late_events_add(spark, stream_dir):
    """A late event (older ts than state T) adds mass without rewinding T
    — the reference's SETNX _T semantics."""
    _write_batch(spark, stream_dir, "b1.parquet", [("colors", "red", 5, _ts(20))])
    _write_batch(spark, stream_dir, "b2.parquet", [("colors", "red", 3, _ts(1))])
    stream = read_increment_stream(spark, stream_dir)
    _run_to_completion(streaming_forget_table(stream, rate=0.5), "forget_late_test")
    emissions = spark.sql("SELECT * FROM forget_late_test").collect()
    # both emissions carry the same t_us (T never rewinds nor advances on a
    # late event), so assert on the emission set: batch1 → 5, batch2 → 5+3
    counts = sorted(r["count"] for r in emissions)
    assert counts == [5, 8]
    assert all(r["t_us"] == int(_ts(20).timestamp() * 1e6) for r in emissions)


def test_streaming_forget_table_sharded_matches_unsharded(spark, stream_dir):
    """Key-sharding a wide distribution (n_shards) must not change the
    computed counts when every shard sees the same update instants — it
    only bounds the per-key state row."""
    bins = [f"b{i:03d}" for i in range(40)]
    _write_batch(
        spark, stream_dir, "b1.parquet", [("wide", b, 10, _ts(0)) for b in bins]
    )
    _write_batch(
        spark, stream_dir, "b2.parquet", [("wide", b, 1, _ts(10)) for b in bins]
    )
    stream = read_increment_stream(spark, stream_dir)
    _run_to_completion(
        streaming_forget_table(stream, rate=0.5, n_shards=8), "forget_sharded"
    )
    latest = spark.sql(_latest_sql("forget_sharded")).collect()
    rows = {r["bin"]: r["count"] for r in latest}
    # same law as the unsharded decay test: 10 - floor(0.5*10) + 1 = 6
    assert len(rows) == 40
    assert all(v == 6 for v in rows.values())
    # distribution T = max t_us across rows (reader-side merge)
    assert max(r["t_us"] for r in latest) == int(_ts(10).timestamp() * 1e6)


def test_streaming_forget_table_shard_ttl_is_per_shard(spark, stream_dir):
    """A shard with no live mass is discarded independently: bins decayed
    to zero vanish even when other shards of the distribution stay hot."""
    _write_batch(
        spark,
        stream_dir,
        "b1.parquet",
        [("mixed", f"cold{i}", 1, _ts(0)) for i in range(8)]
        + [("mixed", "hot", 100, _ts(0))],
    )
    _write_batch(
        spark,
        stream_dir,
        "b2.parquet",
        [("mixed", "hot", 1, _ts(30))],  # 30s at rate 0.5 wipes count-1 bins
    )
    stream = read_increment_stream(spark, stream_dir)
    _run_to_completion(
        streaming_forget_table(stream, rate=0.5, n_shards=4), "forget_shard_ttl"
    )
    latest = spark.sql(_latest_sql("forget_shard_ttl")).collect()
    rows = {r["bin"]: r["count"] for r in latest}
    # hot shard decayed forward and keeps mass; cold bins that shared its
    # shard were pruned at its update. Cold-only shards were never updated
    # in batch2, so their (stale) emissions from batch1 remain count=1 —
    # the state itself is reaped by the armed TTL, not re-emitted.
    assert rows["hot"] == 100 - 15 + 1


def test_windowed_counts_drop_late_events(spark, stream_dir):
    """Append-mode tumbling windows: the [0,10) window is emitted once
    (when the watermark passes its end) and an event arriving after that
    is dropped, not retroactively merged — the Structured Streaming
    late-data contract the reference never had to define."""
    from forgettable_spark.streaming import windowed_event_counts

    _write_batch(
        spark,
        stream_dir,
        "b1.parquet",
        [("colors", "red", 3, _ts(1)), ("colors", "blue", 2, _ts(8))],
    )
    # advances max event time to 25 -> watermark 15 > 10 closes [0,10)
    _write_batch(spark, stream_dir, "b2.parquet", [("colors", "red", 1, _ts(25))])
    # one more batch so the eviction of [0,10) lands before the late row
    # (a row arriving in the very batch where the watermark first passes
    # the window end races merge-vs-evict — that boundary is Spark's,
    # not contract; one batch later the drop is guaranteed)
    _write_batch(spark, stream_dir, "b3.parquet", [("colors", "red", 1, _ts(26))])
    # LATE: event time 3 is far behind the 16 s watermark -> dropped
    _write_batch(spark, stream_dir, "b4.parquet", [("colors", "red", 100, _ts(3))])
    # flush batch so emissions for [20,30) definitely land
    _write_batch(spark, stream_dir, "b5.parquet", [("colors", "red", 1, _ts(40))])

    stream = read_increment_stream(spark, stream_dir)
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM win_test WHERE distribution = 'colors'"
    ).collect()
    by_window = {}
    for r in rows:
        # collected timestamps are naive in the session tz (UTC)
        key = r["win_start"].replace(tzinfo=timezone.utc).isoformat()
        assert key not in by_window, "window emitted more than once"
        by_window[key] = r["n_events"]
    w0 = _ts(0).isoformat()
    # b1's 3+2 only — the late 100-increment was dropped
    assert by_window[w0] == 5


def test_streaming_exact_dedup(spark, stream_dir):
    """First occurrence of a content hash is emitted; a duplicate in a
    later batch (within the watermark) is suppressed; distinct content
    passes through."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    from forgettable_spark.streaming import streaming_exact_dedup

    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("ts", pa.timestamp("us", tz="UTC")),
        ]
    )

    def write_docs(name, rows):
        t = pa.Table.from_pylist(
            [{"doc_id": i, "text": tx, "ts": ts} for i, tx, ts in rows], schema=schema
        )
        fp = os.path.join(stream_dir, name)
        pq.write_table(t, fp)
        _BATCH_SEQ[0] += 1
        mt = 1_700_000_000 + _BATCH_SEQ[0]
        os.utime(fp, (mt, mt))

    write_docs("d1.parquet", [(1, "alpha content", _ts(0)), (2, "beta content", _ts(1))])
    write_docs("d2.parquet", [(3, "alpha content", _ts(5)), (4, "gamma content", _ts(6))])

    stream = (
        spark.readStream.schema(
            "doc_id BIGINT, text STRING, ts TIMESTAMP"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id, text FROM dedup_stream_test").collect()
    kept = sorted(r["doc_id"] for r in rows)
    assert kept == [1, 2, 4]  # doc 3 is a duplicate of doc 1's content


def test_streaming_simhash_dedup(spark, stream_dir):
    """Sketch-level near-dup at ingest: a token-reordered document (same
    SimHash — the sketch is order-insensitive by construction) is
    suppressed; genuinely different content passes."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from forgettable_spark.streaming import streaming_simhash_dedup

    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()), ("ts", pa.timestamp("us", tz="UTC"))]
    )

    def write_docs(name, rows):
        t = pa.Table.from_pylist(
            [{"doc_id": i, "text": tx, "ts": ts} for i, tx, ts in rows], schema=schema
        )
        fp = os.path.join(stream_dir, name)
        pq.write_table(t, fp)
        _BATCH_SEQ[0] += 1
        mt = 1_700_000_000 + _BATCH_SEQ[0]
        os.utime(fp, (mt, mt))

    write_docs("d1.parquet", [(1, "alpha beta gamma delta", _ts(0))])
    # doc 2: same token multiset, different order -> identical sketch
    # doc 3: different tokens -> different sketch
    write_docs("d2.parquet", [(2, "delta gamma beta alpha", _ts(5)),
                              (3, "epsilon zeta eta theta", _ts(6))])

    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        streaming_simhash_dedup(stream)
        .writeStream.format("memory")
        .queryName("simhash_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = sorted(
        r["doc_id"] for r in spark.sql("SELECT doc_id FROM simhash_stream_test").collect()
    )
    assert kept == [1, 3]


def test_streaming_chunk_dedup(spark, stream_dir):
    """Sub-document dedup at ingest: a 20-token block repeated verbatim
    in a later document is suppressed (only its first occurrence's chunk
    row is emitted); unique chunks pass. Chunk boundaries come from the
    same chunk_array expression the batch pass uses."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from forgettable_spark.streaming import streaming_chunk_dedup

    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()), ("ts", pa.timestamp("us", tz="UTC"))]
    )

    def write_docs(name, rows):
        t = pa.Table.from_pylist(
            [{"doc_id": i, "text": tx, "ts": ts} for i, tx, ts in rows], schema=schema
        )
        fp = os.path.join(stream_dir, name)
        pq.write_table(t, fp)
        _BATCH_SEQ[0] += 1
        mt = 1_700_000_000 + _BATCH_SEQ[0]
        os.utime(fp, (mt, mt))

    block = " ".join(f"w{i}" for i in range(20))
    write_docs("c1.parquet", [(1, block + " tail one two", _ts(0))])
    # doc 2 repeats the block (chunk 0 suppressed) but adds a new tail
    # (its chunk 1 passes); doc 3 is NULL text (emits nothing)
    write_docs("c2.parquet", [(2, block + " other tail here", _ts(5)),
                              (3, None, _ts(6))])

    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        streaming_chunk_dedup(stream)
        .writeStream.format("memory")
        .queryName("chunk_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["chunk_idx"])
        for r in spark.sql("SELECT doc_id, chunk_idx FROM chunk_stream_test").collect()
    }
    assert got == {(1, 0), (1, 1), (2, 1)}


def test_streaming_simhash_dedup_null_text_passes_through(spark, stream_dir):
    """NULL-text docs never participate in sketch dedup (batch contract:
    simhash_pairs filters isNotNull — NULL matches nothing). Both NULL
    docs in the same watermark window must be emitted, with a NULL
    sketch; real near-dups still dedup."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from forgettable_spark.streaming import streaming_simhash_dedup

    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()), ("ts", pa.timestamp("us", tz="UTC"))]
    )

    def write_docs(name, rows):
        t = pa.Table.from_pylist(
            [{"doc_id": i, "text": tx, "ts": ts} for i, tx, ts in rows], schema=schema
        )
        fp = os.path.join(stream_dir, name)
        pq.write_table(t, fp)
        _BATCH_SEQ[0] += 1
        mt = 1_700_000_000 + _BATCH_SEQ[0]
        os.utime(fp, (mt, mt))

    write_docs("d1.parquet", [(1, "alpha beta gamma delta", _ts(0)), (2, None, _ts(1))])
    # doc 3: second NULL-text doc in the same window -> must NOT be
    # deduped against doc 2; doc 4: near-dup of doc 1 -> suppressed.
    write_docs("d2.parquet", [(3, None, _ts(5)), (4, "delta gamma beta alpha", _ts(6))])

    stream = (
        spark.readStream.schema("doc_id BIGINT, text STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        streaming_simhash_dedup(stream)
        .writeStream.format("memory")
        .queryName("simhash_null_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT doc_id, simhash FROM simhash_null_stream_test"
    ).collect()
    kept = sorted(r["doc_id"] for r in rows)
    assert kept == [1, 2, 3]
    by_id = {r["doc_id"]: r["simhash"] for r in rows}
    assert by_id[2] is None and by_id[3] is None
    assert by_id[1] is not None


def test_simhash_column_matches_batch_sketch(spark):
    """The row-local streaming sketch and the batch explode+aggregation
    sketch must be bit-identical — ingest-time and batch dedup decisions
    can never disagree about a sketch value."""
    from pyspark.sql import functions as F

    from forgettable_spark.extensions import dedup
    from forgettable_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    batch = {r["doc_id"]: r["simhash"] for r in dedup.simhash_sketch(docs).collect()}
    col = {
        r["doc_id"]: r["simhash"]
        for r in docs.select(
            "doc_id", dedup.simhash_column(F.col("text")).alias("simhash")
        ).collect()
    }
    assert batch == col
