"""bench.py's driver-facing output contract (VERDICT r8 #1).

The driver captures only the last ~2 KB of bench stdout and parses the
FINAL line; r8's line carried the per-query dict + retries + stale_floors
and outgrew the window, so the round's driver bench record came back
``parsed: null``. These tests pin the fix: the final line stays a compact
summary bounded well under the capture window no matter how many queries,
retries, or stale floors a pass accumulates, and the diagnostics survive
on an earlier line plus the sidecar file.
"""

from __future__ import annotations

import json

import bench


def _fat_pass(n: int = 80):
    """A worst-case pass: more (and longer-named) entries than the real
    registry will ever hold, every one retried and floor-stale."""
    names = [f"extremely_long_benchmark_query_name_number_{i:03d}" for i in range(n)]
    timings = {name: 123.4567 + i for i, name in enumerate(names)}
    retries = {name: [999.1234, 123.4567] for name in names}
    stale = {name: {"floor": 500.0, "ran": 123.4567} for name in names}
    return timings, retries, stale


def test_final_line_bounded_and_parseable(capsys, tmp_path):
    timings, retries, stale = _fat_pass()
    sidecar = tmp_path / "BENCH_DETAIL.json"
    final = bench.emit_report(timings, retries, stale, sf=0.1, detail_path=str(sidecar))

    assert len(final.encode()) <= bench.FINAL_LINE_MAX_BYTES

    lines = capsys.readouterr().out.strip().splitlines()
    # The final stdout line IS the returned summary and parses standalone.
    assert lines[-1] == final
    parsed = json.loads(lines[-1])
    assert parsed["metric"] == "forget_table_ops_runtime"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["n_queries"] == len(timings)
    assert parsed["value"] == round(sum(timings.values()), 4)
    # No unbounded fields may creep back onto the driver line.
    assert set(parsed) == {"metric", "value", "unit", "sf", "n_queries"}


def test_diagnostics_on_earlier_line_and_sidecar(capsys, tmp_path):
    timings, retries, stale = _fat_pass(n=12)
    sidecar = tmp_path / "BENCH_DETAIL.json"
    bench.emit_report(timings, retries, stale, sf=3.0, detail_path=str(sidecar))

    lines = capsys.readouterr().out.strip().splitlines()
    detail_line = json.loads(lines[0])["bench_detail"]
    on_disk = json.loads(sidecar.read_text())
    for detail in (detail_line, on_disk):
        assert detail["queries"] == timings
        assert detail["retries"] == retries
        assert detail["stale_floors"] == stale
        assert detail["sf"] == 3.0
        assert detail["total"] == round(sum(timings.values()), 4)


def test_detail_path_list_writes_every_sidecar(capsys, tmp_path):
    """VERDICT r12 #2: main() passes BOTH the compatibility sidecar name
    and a per-cpus name so a c8+c32 driver pair keeps both details."""
    timings, retries, stale = _fat_pass(n=3)
    paths = [tmp_path / "BENCH_DETAIL.json", tmp_path / "BENCH_DETAIL_c32.json"]
    final = bench.emit_report(
        timings, retries, stale, sf=0.1, detail_path=[str(p) for p in paths]
    )
    assert len(final.encode()) <= bench.FINAL_LINE_MAX_BYTES
    for p in paths:
        on_disk = json.loads(p.read_text())
        assert on_disk["queries"] == timings
        assert on_disk["retries"] == retries


def test_no_stale_floors_key_when_clean(capsys):
    timings = {"q": 1.0}
    final = bench.emit_report(timings, {}, {}, sf=0.1)
    lines = capsys.readouterr().out.strip().splitlines()
    detail = json.loads(lines[0])["bench_detail"]
    assert "stale_floors" not in detail
    assert json.loads(final)["n_queries"] == 1
