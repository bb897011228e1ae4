"""Minimal transactional table: versioned manifests with atomic commits.

``write_compacted``'s directory-rename swap has a documented flaw: POSIX
cannot exchange two directories atomically, so a reader can observe a
brief window where the path is absent. The reference solved the analogous
race with optimistic concurrency (``WATCH name._Z … MULTI … EXEC``,
``goforget/redis_utils.go:143-191``); the table-format world solves it
with a commit log (Delta/Iceberg). Neither ships in this environment, so
this module implements the minimal honest version of the same protocol:

- Data for version N lives in its own immutable directory
  (``<root>/data/v{N:08d}-<token>/``). Files are never modified or
  renamed after the write completes.
- A version becomes visible by creating ``<root>/_versions/v{N:08d}.json``
  — a single *file*, created atomically via ``os.link`` from a staged
  temp file. ``link`` fails with EEXIST if another writer claimed the
  same version first: that IS the optimistic-concurrency check (the
  filesystem analogue of a conditional PUT / Delta's commit protocol).
- Readers list ``_versions``, take the highest manifest, and read the
  data directory it names. Every manifest they can see is complete, and
  committed data directories are immutable — there is **no moment where
  the table is unreadable**, the property the rename swap lacked.
- Old versions stay readable (time travel over the retained window)
  until ``vacuum`` reclaims them.

On an object store, replace the ``os.link`` publish with the store's
conditional-put; nothing else changes.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_RE = re.compile(r"^v(\d{8})\.json$")

#: Sentinel for "blind append — no read-modify-write dependency". Distinct
#: from ``None``, which means "I read the table and it was empty".
_BLIND = object()


class CommitConflictError(RuntimeError):
    """Another writer committed this version first — re-read and retry
    (last-writer-wins is NOT silently applied, unlike the reference's
    swallowed WatchError, ``pyforget/distribution.py:64-74``)."""


class ManifestTable:
    """A parquet table whose visible state is an atomically-published
    manifest pointer. See module docstring for the protocol."""

    def __init__(self, root: str) -> None:
        self.root = root
        self._versions_dir = os.path.join(root, "_versions")
        self._data_dir = os.path.join(root, "data")

    # -- read side ---------------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self._versions_dir):
            return []
        out = []
        for name in os.listdir(self._versions_dir):
            m = _MANIFEST_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def manifest(self, version: int) -> dict:
        with open(os.path.join(self._versions_dir, f"v{version:08d}.json")) as f:
            return json.load(f)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read the table at the current (or an explicit retained) version."""
        if version is None:
            version = self.current_version()
        if version is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        return spark.read.parquet(self.manifest(version)["data_path"])

    def read_pinned(self, spark: SparkSession) -> tuple[DataFrame, int]:
        """Read the current version and return ``(df, version)`` so the
        version can be passed back as ``commit(base_version=...)`` — the
        read half of a read-modify-write cycle (WATCH analogue,
        ``goforget/redis_utils.go:143-191``). An empty table raises
        FileNotFoundError like :meth:`read`; callers compacting a
        possibly-empty table should catch it and commit with
        ``base_version=None`` ("I observed the table empty")."""
        version = self.current_version()
        if version is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        return spark.read.parquet(self.manifest(version)["data_path"]), version

    # -- write side --------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        partition_col: str | None = "distribution",
        base_version: int | None | object = _BLIND,
    ) -> int:
        """Write ``df`` as the next version; returns the version number.

        ``base_version`` closes the read-modify-write race (the WATCH half
        of the reference's ``WATCH … MULTI … EXEC``,
        ``goforget/redis_utils.go:143-191``):

        - an ``int`` — "my df was derived from version N" (from
          :meth:`read_pinned`). The commit claims exactly ``N + 1``; if any
          other writer published since, the claim loses and the increments
          are NOT silently dropped.
        - ``None`` — "I observed the table empty". Claims version 1.
        - omitted (``_BLIND``) — blind append with no read dependency
          (e.g. the very first publish of independently-built data). Claims
          ``current + 1``; only an exact same-number race conflicts.

        Raises :class:`CommitConflictError` if a concurrent writer claimed
        the version first (the staged data directory is cleaned up; the
        caller re-reads via :meth:`read_pinned` and retries — optimistic
        concurrency). The atomic arbiter is the ``os.link`` on the claimed
        manifest name; the pre-write check below only fast-fails before
        paying for the parquet write.
        """
        if base_version is _BLIND:
            version = (self.current_version() or 0) + 1
        else:
            if base_version is not None and not isinstance(base_version, int):
                raise TypeError(f"base_version must be int or None, got {base_version!r}")
            version = (base_version or 0) + 1
            current = self.current_version()
            if current != base_version:
                raise CommitConflictError(
                    f"stale read of {self.root}: expected version "
                    f"{base_version}, table is now at {current} — re-read and retry"
                )
        token = uuid.uuid4().hex[:8]
        data_path = os.path.join(self._data_dir, f"v{version:08d}-{token}")
        out = df.repartition(partition_col) if partition_col else df
        out.write.mode("overwrite").parquet(data_path)

        os.makedirs(self._versions_dir, exist_ok=True)
        staged = os.path.join(self._versions_dir, f".staged-{token}.json")
        with open(staged, "w") as f:
            json.dump(
                {
                    "version": version,
                    "data_path": data_path,
                    "committed_at_unix": int(time.time()),
                },
                f,
            )
        final = os.path.join(self._versions_dir, f"v{version:08d}.json")
        try:
            os.link(staged, final)  # atomic create-if-absent: the commit point
        except FileExistsError:
            shutil.rmtree(data_path, ignore_errors=True)
            raise CommitConflictError(
                f"version {version} of {self.root} was committed concurrently"
            ) from None
        finally:
            os.unlink(staged)
        return version

    def vacuum(self, keep: int = 2) -> list[int]:
        """Drop all but the newest ``keep`` versions (manifest first, so a
        reader never holds a manifest whose data is gone mid-read *after*
        it resolved the path — matching table-format vacuum semantics:
        only versions older than the retention window are reclaimed)."""
        vs = self.versions()
        dropped = []
        for v in vs[:-keep] if keep else vs:
            manifest = self.manifest(v)
            os.unlink(os.path.join(self._versions_dir, f"v{v:08d}.json"))
            shutil.rmtree(manifest["data_path"], ignore_errors=True)
            dropped.append(v)
        return dropped


def compact_to_table(
    events: DataFrame,
    table: ManifestTable,
    now_us: int,
    base_version: int | None | object = _BLIND,
    **compact_kwargs,
) -> int:
    """Compact an increment log and publish it as the next table version —
    the transactional replacement for ``write_compacted``'s rename swap.
    Accepts every :func:`forgettable_spark.operators.compact.compact`
    parameter (rate/prune/law/sigma/mode/seed).

    When ``events`` includes the table's own prior baseline (the
    read-modify-write compact cycle: ``df, v = table.read_pinned(spark)``
    → union increments → compact), pass that ``v`` as ``base_version`` so
    a concurrent publish can't be silently overwritten."""
    from forgettable_spark.operators.compact import compact

    return table.commit(compact(events, now_us, **compact_kwargs), base_version=base_version)
