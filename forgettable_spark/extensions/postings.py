"""One postings spine for the token-level family.

``bm25_search``, ``quality_distill``, ``tfidf_keywords`` and ``lm_score``
each need the corpus re-expressed as token-level rows, and before this
module each re-tokenized the corpus independently — at 100 TB the
repeated text scan is the family's dominant redundant cost (their sf1
times are all token-scan-floor-bound). This module materializes the
shared spine ONCE per (session, corpus) from a single text scan:

- ``postings``  — (doc_id, dl, n_distinct, term, tf): unigram counts
  with the two per-document stats DENORMALIZED onto every row (they are
  functionally dependent on doc_id, two int64s next to a term string),
  so every consumer reads fixed-width rows join-free: BM25 takes ``dl``
  directly, the quality distiller re-derives its rule label row-locally
  from (dl, n_distinct) at ANY threshold, tf·idf ignores the extras.
- ``doc_stats`` — (doc_id, dl, n_distinct): one narrow row per
  non-NULL-text document, for corpus-level aggregates (BM25's
  n_docs/avgdl) without touching the postings fan-out.
- ``bigrams``   — (doc_id, gram, tf): the bigram-LM spine, including
  the short-document whole-text fallback gram (text.shingles contract).

Production posture: this is a TABLE, not a cache — maintained
incrementally by the admission loop exactly like the MinHash sketch
index: ``streaming/admit.py`` (``admit_batch(spine_dir=...)``) appends
each admitted batch's postings/doc_stats/bigrams delta off the batch's
already-checkpointed text, the same fold/vacuum cycle compacts the
chains, and ``streaming.admit.read_spine`` reassembles tables
row-identical to a from-scratch rebuild (test-asserted:
tests/test_streaming_admit.py::test_incremental_spine_matches_rebuild).
In-suite the same contract is scoped to the session: built lazily on
first use, written to session-local parquet, reread by every later
consumer. Consumers keep their standalone tokenize path when no spine
is passed (library callers, one-shot queries).

Determinism: the spine only PRE-COMPUTES the exact integer rows each
consumer previously derived inline (same split contract, same counts),
so every downstream result is bit-identical with or without it — the
equivalence is test-asserted per consumer (tests/test_postings.py) and
the four DuckDB oracles are untouched.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from forgettable_spark.extensions.text import shingles_from_tokens, tokens

#: session-local materialization registry: (applicationId, corpus key,
#: spine kind, corpus fingerprint) -> parquet root holding that kind's
#: tables. The fingerprint (input file list + sizes + mtimes) makes a
#: regenerated corpus under the same path a MISS — the memo must never
#: serve a stale spine to its family queries after the files under
#: ``corpus_key`` change mid-session. ``kind`` keeps independent spines
#: over the same corpus (postings for the token family, sketches for the
#: dedup family — extensions/sketches.py) from colliding.
_MATERIALIZED: dict[tuple[str, str, str, str], str] = {}

#: Lazy reader-DataFrame memo over _MATERIALIZED roots (same key) —
#: see materialize_table_set.
_MATERIALIZED_DFS: dict[tuple[str, str, str, str], dict[str, DataFrame]] = {}

#: Spark schemas of the tables each build wrote (same key): the build
#: KNOWS every table's schema, so the readers are created with it
#: explicitly — a schema-less spark.read.parquet runs a one-task
#: footer-inference job per table (5 × ~70 ms incl. scheduling on the
#: 5-table spine, r13). The memo root is session-scoped tempdir, so a
#: root always comes from a build in THIS session; absent entry (never
#: happens today) degrades to inference.
_MATERIALIZED_SCHEMAS: dict[tuple[str, str, str, str], dict] = {}

_TABLES = ("postings", "doc_stats", "bigrams")

#: Docs per partition for the spine build's cached-base spread (r12,
#: guide §2.5): sized so one partition's tokenize-derived work (shingle
#: windows + md5 folds, ~0.5-1 ms/doc) is a sub-second task. Small
#: corpora get min(cores, n/1000)-way builds; large corpora arrive
#: pre-split and the spread gate never fires.
_DOCS_PER_BUILD_PARTITION = 1000


#: (applicationId, corpus_key) -> (directory signature, fingerprint).
#: The full fingerprint stats EVERY corpus input file — at 100 TB that
#: is a per-query driver-side metadata sweep over millions of object
#: paths, so it is computed once per (session, corpus) and revalidated
#: with one stat per DIRECTORY. The signature covers the input files'
#: parent dirs AND every ancestor up to their common root (ADVICE r7:
#: parent dirs alone missed growth via a NEW directory — e.g. a fresh
#: Hive partition dir bumps only the mtime of the directory it is
#: created IN, which is an ancestor, never an existing leaf parent).
#: Any writer that adds, removes, or renames files or partition dirs
#: therefore bumps a signed mtime and forces a fresh sweep. When any
#: input is NON-statable (object stores), nothing is cached at all —
#: a stale -1 signature would otherwise "match" forever — and the
#: fingerprint degrades to hashing the path list per call (correct,
#: costs one inputFiles() listing). The one change still missed is an
#: in-place same-filename rewrite on a statable FS — writers doing
#: that call :func:`invalidate_corpus` (the test fixture's contract in
#: tests/test_postings.py).
_FP_CACHE: dict[tuple[str, str], tuple[tuple, str]] = {}


def invalidate_corpus(corpus_key: str | None = None) -> None:
    """Drop cached corpus fingerprints — all of them, or one
    ``corpus_key`` across sessions — so the next spine access re-stats
    the corpus files. Needed only by writers that rewrite corpus files
    IN PLACE under the same names (a directory-mtime check catches
    added/removed/renamed files automatically)."""
    if corpus_key is None:
        _FP_CACHE.clear()
    else:
        for k in [k for k in _FP_CACHE if k[1] == corpus_key]:
            del _FP_CACHE[k]


def _input_footer_rows(docs: DataFrame) -> int | None:
    """Total row count of ``docs``'s parquet input files from their
    footers (no data read), or None when it can't be known that way —
    non-parquet input, non-statable paths (object stores), no pyarrow,
    in-memory frames. Used only to SIZE the spine build's partition
    spread, so the degraded path just falls back to counting."""
    try:
        import pyarrow.dataset as pads

        files = [
            u[len("file:"):] if u.startswith("file:") else u
            for u in docs.inputFiles()
        ]
        if not files or not all(f.endswith(".parquet") for f in files):
            return None
        return int(pads.dataset(files).count_rows())
    except Exception:  # noqa: BLE001 — sizing heuristic, never a failure
        return None


def _dir_sig(dirs) -> tuple:
    sig = []
    for d in sorted(dirs):
        try:
            sig.append((d, os.stat(d).st_mtime_ns))
        except OSError:
            sig.append((d, -1))
    return tuple(sig)


def _ancestor_dirs(parents: set[str]) -> set[str]:
    """The input files' parent dirs plus every ancestor up to (and
    including) their common root — the set of directories whose mtime
    can change when a file OR a new partition directory is added
    anywhere inside the corpus. Bounded by #parents × depth, i.e.
    directory-scale, never file-scale."""
    if not parents:
        return set()
    try:
        common = os.path.commonpath(list(parents))
    except ValueError:  # mixed drives/schemes: no common root to watch
        return set(parents)
    out = set(parents)
    out.add(common)
    for p in parents:
        d = p
        while len(d) > len(common):
            d = os.path.dirname(d)
            out.add(d)
    return out


def _corpus_fingerprint(spark: SparkSession, docs: DataFrame, corpus_key: str) -> str:
    """Stable digest of the corpus' physical inputs: sorted (path, size,
    mtime_ns) of every input file. Non-local or non-statable inputs
    (object stores, in-memory frames) contribute path-only rows; for
    in-memory frames (no input files) the caller's ``corpus_key``
    remains the identity. Memoized per (session, ``corpus_key``) with
    directory-mtime revalidation over parents AND ancestors; when any
    input is non-statable the memo is skipped entirely so the
    fingerprint tracks the path list per call (``_FP_CACHE`` note)."""
    import hashlib

    cache_key = (spark.sparkContext.applicationId, corpus_key)
    hit = _FP_CACHE.get(cache_key)
    if hit is not None and _dir_sig([d for d, _ in hit[0]]) == hit[0]:
        return hit[1]
    rows = []
    parents = set()
    statable = True
    for uri in sorted(docs.inputFiles()):
        path = uri[len("file:"):] if uri.startswith("file:") else uri
        parents.add(os.path.dirname(path))
        try:
            st = os.stat(path)
            rows.append(f"{uri}|{st.st_size}|{st.st_mtime_ns}")
        except OSError:
            rows.append(uri)
            statable = False
    fp = hashlib.md5("\n".join(rows).encode()).hexdigest()
    sig = _dir_sig(_ancestor_dirs(parents))
    if statable and all(m != -1 for _, m in sig):
        _FP_CACHE[cache_key] = (sig, fp)
    else:
        # a cached -1 signature would "match" forever; recompute the
        # (path-list) fingerprint on every call instead (ADVICE r7)
        _FP_CACHE.pop(cache_key, None)
    return fp


def _cleanup_materialized() -> None:
    """Remove every spine root this process created (atexit): the roots
    are session-scoped scratch, not published tables — leaking one
    tempdir per (session, corpus) adds up across long-lived drivers."""
    for root in _MATERIALIZED.values():
        shutil.rmtree(root, ignore_errors=True)
    _MATERIALIZED.clear()


atexit.register(_cleanup_materialized)


def postings_tables(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> dict[str, DataFrame]:
    """The three spine tables as LAZY DataFrames off one tokenization
    (module docstring). NULL-text documents appear in none of them —
    every consumer filters them out anyway."""
    return _tables_from_base(_base(docs, text_col, id_col))


def _base(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return _full_base(docs, text_col, id_col, block_col=None)


def _full_base(
    docs: DataFrame, text_col: str, id_col: str, block_col: str | None
) -> DataFrame:
    """The ONE corpus-text projection every spine table derives from:
    (doc_id, _lang, _w = tokens(text), _t = text). ``block_col`` rides
    along for the sketch tables' PPJoin blocking (NULL when absent from
    the corpus or not requested); the postings tables ignore it and
    column pruning drops it from their plans."""
    lang = (
        F.col(block_col)
        if block_col is not None and block_col in docs.columns
        else F.lit(None).cast("string")
    ).alias("_lang")
    return docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        lang,
        tokens(F.col(text_col)).alias("_w"),
        F.col(text_col).alias("_t"),
    )


def materialize_table_set(
    spark: SparkSession,
    docs: DataFrame,
    corpus_key: str,
    kind: str,
    table_names: tuple[str, ...],
    write_tables,
) -> dict[str, DataFrame]:
    """Session-memoized spine materialization, shared by every spine
    kind: first call per (session, ``corpus_key``, ``kind``) invokes
    ``write_tables(root)`` — which must write one parquet directory per
    name in ``table_names`` under ``root``, and may return a
    {name: StructType} dict so the read-back skips per-table schema
    inference jobs (r13) — and every later call (and every later
    consumer in the same session) reads the parquet back without
    recomputing. ``kind`` must encode every build parameter
    that changes table VALUES (the combined spine folds text/id/block
    cols and k into it) — the memo otherwise serves one caller's build
    to a differently-parameterized one. Stale-corpus protection and
    atexit cleanup as documented on ``_MATERIALIZED``."""
    app = spark.sparkContext.applicationId
    key = (
        app,
        corpus_key,
        kind,
        _corpus_fingerprint(spark, docs, corpus_key),
    )
    root = _MATERIALIZED.get(key)
    if root is None or not os.path.exists(os.path.join(root, "_SPINE_COMPLETE")):
        # Evict every superseded entry for the same (corpus, kind) —
        # stale-fingerprint rebuilds and incomplete roots — and remove
        # their tempdirs NOW, not at exit: replacing the memo entry
        # without the rmtree orphans one directory per regeneration for
        # the session's lifetime (ADVICE r6).
        for stale in [
            k for k in _MATERIALIZED if k[0] == app and k[1] == corpus_key and k[2] == kind
        ]:
            shutil.rmtree(_MATERIALIZED.pop(stale), ignore_errors=True)
            _MATERIALIZED_SCHEMAS.pop(stale, None)
        # kind may carry a |-separated param suffix; only its family name
        # belongs in the path (plan tests grep the scan location)
        root = tempfile.mkdtemp(prefix=f"forgettable-{kind.split('|')[0]}-")
        schemas = write_tables(root)
        with open(os.path.join(root, "_SPINE_COMPLETE"), "w") as fh:
            fh.write(corpus_key)
        _MATERIALIZED[key] = root
        if schemas:
            _MATERIALIZED_SCHEMAS[key] = schemas
        _MATERIALIZED_DFS.pop(key, None)
    # r12 OPTIMIZATION: memoize the reader DataFrames too — they are
    # lazy, immutable handles onto the parquet files, but creating them
    # costs a py4j round-trip + file listing per table per call
    # (~0.45 s for the 5-table spine), paid by every spine-fed query.
    # The memo key already pins (app, corpus, kind, fingerprint), so a
    # rebuilt spine gets fresh readers. r13: the readers take the
    # build's recorded schema (see _MATERIALIZED_SCHEMAS) so no
    # inference job runs per table.
    dfs = _MATERIALIZED_DFS.get(key)
    if dfs is None:
        schemas = _MATERIALIZED_SCHEMAS.get(key, {})
        dfs = {}
        for name in table_names:
            path = os.path.join(root, name)
            if name in schemas:
                dfs[name] = spark.read.schema(schemas[name]).parquet(path)
            else:
                dfs[name] = spark.read.parquet(path)
        _MATERIALIZED_DFS[key] = dfs
    return dict(dfs)


#: Every table the combined corpus-spine build materializes: the token
#: family's three plus the dedup family's two (extensions/sketches.py).
ALL_SPINE_TABLES = _TABLES + ("shingled", "simhash")


def materialized_corpus_spine(
    spark: SparkSession,
    docs: DataFrame,
    corpus_key: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = "lang",
    k: int = 12,
) -> dict[str, DataFrame]:
    """ALL FIVE spine tables (postings / doc_stats / bigrams / shingled /
    simhash) materialized from ONE corpus-text scan, session-memoized
    per (session, ``corpus_key``).

    Before r7 the two spines were independent builds: postings shared
    one tokenize across its three tables, but the sketch build paid two
    MORE full text scans (shingled + simhash each re-read and re-split
    the corpus). At 100 TB the scan IS the cost, not the hashing — so
    all five tables now derive from the single persisted
    ``_full_base`` projection (doc_id, _lang, tokens(text), text): the
    sketch tables take shingles as a token-window transform
    (``shingles_from_tokens``) and SimHash explodes the same token
    arrays (``simhash_sketch(tokens_col=...)``). Every table's
    expression tree is value-identical to its standalone form, so all
    downstream results — and every DuckDB oracle — are unchanged
    (test-asserted in tests/test_postings.py and tests/test_sketches.py).

    Whichever family touches the corpus first pays the one build; the
    other family's first call is a memo hit reading parquet back. The
    incremental-maintenance story is unchanged: the admission loop
    appends per-table deltas under ``spine_dir``/``sketch_dir``
    (streaming/admit.py) and never calls this builder.

    The five table writes run CONCURRENTLY over the eagerly-populated
    cache: each write's post-cache pipeline (explode, shingle windows,
    md5 folds, bit votes) is a narrow per-table job whose map tails and
    shuffle barriers leave most cores idle when run back-to-back —
    overlapping them is where the consolidation's wall-clock win
    actually lives. Measured at sf1 (isolated, min-of-2): 17.5 s for
    all five tables vs 24.6 s for the r6 postings-only build and 42.2 s
    for r6's two sequential builds (SCALING.md r7); sf0.1 in-suite
    4.1-4.2 s replaces r6's 4.84 + 5.29 s pair of build lines."""
    from concurrent.futures import ThreadPoolExecutor

    from forgettable_spark.extensions.sketches import _sketch_tables_from_base

    def write_tables(root: str) -> dict:
        # One text scan for all five writes: persist the tokenized
        # projection for the duration of the build only (a plain
        # .persist(), NOT scoped_cache — the spine's *files* outlive the
        # run_released scope of whichever query triggered the build; the
        # cache itself is released right here). The count() populates
        # the cache BEFORE the concurrent writes so no two jobs race to
        # compute the same partition.
        #
        # r12 OPTIMIZATION (guide §2.5 input parallelism): a small corpus
        # arrives as ONE scan split (single file, single row group), so
        # every downstream table build — explode, shingle windows, md5
        # folds, bit votes — inherits a single partition and the thread
        # pool tops out at 5-way (one core per table). Spread the
        # tokenized base by doc_id (~docs_per_partition docs per task;
        # keyed, so no sort-before-repartition) and all five builds
        # parallelize. Gated on the spread RAISING parallelism: a
        # production corpus arrives pre-split in many files and the gate
        # never fires — which is also why repartitioning the RAW text
        # pre-tokenize (the r12 first attempt, reverted) is the wrong
        # layer. Higher local counts regress on per-file write overhead
        # (P=32 read 8.6 s at sf0.1).
        #
        # r13: ONE persist pass — the r12 form persisted + counted the
        # unspread base just to learn n_docs, then repartitioned and
        # persisted AGAIN (two cache fills, ~0.3 s of the build). The
        # doc count now comes from the corpus parquet footers (no data
        # read; includes NULL-text rows, which only nudges the partition
        # TARGET — value-neutral), the repartition is applied lazily,
        # and the single count() fills the one cache the writes share.
        # No footer (non-parquet/non-statable input) degrades to the
        # two-pass r12 shape.
        base = _full_base(docs, text_col, id_col, block_col)
        n_docs = _input_footer_rows(docs)
        if n_docs is not None:
            target = min(
                spark.sparkContext.defaultParallelism,
                max(1, n_docs // _DOCS_PER_BUILD_PARTITION),
            )
            if target > base.rdd.getNumPartitions():
                base = base.repartition(target, F.col("doc_id"))
            base = base.persist()
            base.count()
        else:
            base = base.persist()
            n = base.count()
            target = min(
                spark.sparkContext.defaultParallelism,
                max(1, n // _DOCS_PER_BUILD_PARTITION),
            )
            if target > base.rdd.getNumPartitions():
                spread = base.repartition(target, F.col("doc_id")).persist()
                spread.count()
                base.unpersist()
                base = spread
        try:
            tables = {
                **_tables_from_base(base),
                **_sketch_tables_from_base(base, k),
            }

            def _write(name: str) -> None:
                tables[name].write.mode("overwrite").parquet(
                    os.path.join(root, name)
                )

            with ThreadPoolExecutor(len(ALL_SPINE_TABLES)) as pool:
                # list() drains the iterator so any write error raises
                # here, aborting the build before _SPINE_COMPLETE lands
                list(pool.map(_write, ALL_SPINE_TABLES))
            return {name: tables[name].schema for name in ALL_SPINE_TABLES}
        finally:
            base.unpersist()

    # Build params are part of the memo identity: a default-k build must
    # never be served to a k=16 caller over the same corpus_key.
    kind = f"spine|{text_col}|{id_col}|{block_col}|{k}"
    return materialize_table_set(
        spark, docs, corpus_key, kind, ALL_SPINE_TABLES, write_tables
    )


def materialized_postings(
    spark: SparkSession,
    docs: DataFrame,
    corpus_key: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """Session-memoized postings spine — the token family's view of the
    COMBINED corpus spine (:func:`materialized_corpus_spine`): first
    call per (session, ``corpus_key``) scans the corpus text exactly
    once and writes all five spine tables; every later call — from this
    family or the dedup family — reads the fixed-width parquet back
    without touching the corpus text."""
    t = materialized_corpus_spine(spark, docs, corpus_key, text_col, id_col)
    return {name: t[name] for name in _TABLES}


def _tables_from_base(base: DataFrame) -> dict[str, DataFrame]:
    stats = base.select(
        "doc_id",
        F.size("_w").cast("bigint").alias("dl"),
        F.size(F.array_distinct("_w")).cast("bigint").alias("n_distinct"),
    )
    # Two-step select, deliberately: with the per-doc stats and the
    # explode in ONE select, the planner evaluates the non-generator
    # expressions in the Project ABOVE the Generate — size(array_distinct)
    # then runs once per emitted TOKEN, O(doc_len²) per document
    # (measured at sf30: the postings write cost 7.6× the
    # identically-shaped bigrams write in the same pass; splitting the
    # select put it at parity). Computing them in a child Project pins
    # one evaluation per document; the Generate merely replicates the
    # computed values.
    postings = (
        base.select(
            "doc_id",
            F.size("_w").cast("bigint").alias("dl"),
            F.size(F.array_distinct("_w")).cast("bigint").alias("n_distinct"),
            "_w",
        )
        .select("doc_id", "dl", "n_distinct", F.explode("_w").alias("term"))
        .groupBy("doc_id", "dl", "n_distinct", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    bigrams = (
        base.select(
            "doc_id",
            F.explode(
                shingles_from_tokens(F.col("_w"), F.col("_t"), n=2)
            ).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return {"postings": postings, "doc_stats": stats, "bigrams": bigrams}
