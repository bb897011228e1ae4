#!/usr/bin/env python3
"""Refresh BENCH_FLOORS.json from observed runs (VERDICT r7 #7).

Floors are each registered bench entry's best known isolated seconds at
sf0.1 on this box — bench.py re-runs any entry reading >1.5x its floor
and keeps the min (host-noise defense). A floor above a better observed
run is STALE: it lets a genuine regression up to the stale floor pass
unretried. This script lowers every floor to the minimum across the
sources given (BENCH_r*.json driver records, BENCH_DETAIL.json
sidecars — since r9 the per-query dict lives there, not on the
driver-facing final line — and/or raw bench payloads saved to files),
adds floors for newly rotated-in entries, and drops floors for entries
no longer timed.

    python scripts/update_floors.py BENCH_r07.json my_run.json ...

With no arguments it sweeps every BENCH_r*.json in the repo root.
"""

from __future__ import annotations

import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOORS = os.path.join(ROOT, "BENCH_FLOORS.json")


def _timings(path: str) -> dict[str, float]:
    """Accept either a driver BENCH_r{N}.json record or a raw bench.py
    output line saved to a file; only sf0.1 runs contribute."""
    with open(path) as fh:
        rec = json.load(fh)
    rec = rec.get("bench_detail", rec)  # a saved raw detail stdout line
    parsed = rec.get("parsed", rec)
    if parsed is None:  # a driver record whose final line failed to parse (r8)
        return {}
    if parsed.get("sf") != 0.1:
        return {}
    return parsed.get("queries", {})


def _registered_entries() -> set[str]:
    """The names bench.py currently times: the primary registry plus
    its three bench-only lines. Restricting floors to this set keeps a
    sweep over historical BENCH_r*.json from resurrecting floors for
    rotated-out queries."""
    sys.path.insert(0, ROOT)
    from forgettable_spark import entrypoints as ep

    return set(ep.queries()) | {"spine_build", "codebook_train", "layout_bucketed_get_dist"}


def main() -> None:
    sources = sys.argv[1:] or sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    with open(FLOORS) as fh:
        rec = json.load(fh)
    floors: dict[str, float] = dict(rec.get("floors", {}))
    registered = _registered_entries()

    observed: dict[str, float] = {}
    for src in sources:
        for name, sec in _timings(src).items():
            if name not in registered:
                continue
            if name not in observed or sec < observed[name]:
                observed[name] = sec

    lowered, added = [], []
    for name, sec in sorted(observed.items()):
        if name not in floors:
            floors[name] = round(sec, 3)
            added.append(name)
        elif sec < floors[name]:
            floors[name] = round(sec, 3)
            lowered.append(name)

    # entries no longer registered (rotated out) keep no floor — a
    # dangling floor would silently re-apply if the query rotates back
    # with different semantics. Registered-but-unobserved entries keep
    # theirs (a partial source list must not erase good floors).
    dropped = [n for n in floors if n not in registered]
    for n in dropped:
        del floors[n]

    rec["floors"] = dict(sorted(floors.items()))
    with open(FLOORS, "w") as fh:
        json.dump(rec, fh, indent=1)
        fh.write("\n")
    print(
        f"floors: {len(floors)} entries | lowered {len(lowered)} {lowered} | "
        f"added {len(added)} {added} | dropped {len(dropped)} {dropped}"
    )


if __name__ == "__main__":
    main()
