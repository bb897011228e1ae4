"""Streaming embedding-admission throughput (SCALING.md rungs).

Stages a corpus' embeddings as B single-file micro-batches and drives
them through the production loop (`streaming/semantic_admit.py`:
per-trigger assign → verdict vs the persistent cell-capped index →
idempotent batch writes → live-count-gated folds), reporting end-to-end
vectors/second — the batch-size decade the text loop's
`stream_admission_throughput` line measures for documents.

    SPARK_GRAFT_SF_DIR     source dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS       local[] parallelism (default 32)
    SPARK_GRAFT_BATCHES    number of micro-batch files (default 10)
    SPARK_GRAFT_SIG_BITS   signature pre-partition bits (default 0 =
                           flat k=8 codebook). The within-batch verdict
                           term is O(batch²/cells): at k=8 a 20k-vector
                           trigger scores ~50M pairs and the loop
                           crawls (measured r10) — large triggers need
                           cells ∝ batch, which only the composite
                           assignment reaches (8×8 two-level × 2^b
                           signature partitions, zero extra literals).
    SPARK_GRAFT_PROBE_FLIPS  batch-side 1-flip probes (default "auto" =
                           the library default: full 1-flip recovery
                           whenever SIG_BITS > 0, VERDICT r11 #1b; set
                           "0" to pin the unprobed A/B arm — the r11
                           recall-recovery arm is
                           semantic_admit_assigned_probed).

Prints ONE JSON line:
    {"metric": "semantic_admission_throughput", "vecs": N, "batches": B,
     "value": vecs_per_sec, "unit": "vecs/sec",
                    "sig_bits": sig_bits, "n_admitted": A,
     "n_dup": D, "sf_dir": ...}

Timing covers the stream start through the last trigger (availableNow);
codebook training and file staging are untimed setup, mirroring the
text bench. Keep the box idle (bench.py's caveat).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

THRESHOLD = 0.38
CAP = 64
K = 8
FOLD_EVERY = 4


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_batches = int(os.environ.get("SPARK_GRAFT_BATCHES", "10"))
    # "auto" (the default) defers to the library default: full 1-flip
    # probes whenever the assigner is structured (VERDICT r11 #1b);
    # "0" pins the unprobed arm for A/B runs.
    _pf = os.environ.get("SPARK_GRAFT_PROBE_FLIPS", "auto")
    probe_flips = None if _pf == "auto" else int(_pf)
    # Index-layout bucket count (r12 cell-pruned layout). cell_buckets=1
    # is the honest unpruned CONTROL arm: identical layout machinery
    # (partitioned write, marker, per-part reads), zero pruning.
    from forgettable_spark.streaming.semantic_admit import CELL_BUCKETS

    cell_buckets = int(
        os.environ.get("SPARK_GRAFT_CELL_BUCKETS", str(CELL_BUCKETS))
    )

    from forgettable_spark.extensions import codebook as cb
    from forgettable_spark.session import get_spark
    from forgettable_spark.sources import load_table
    from forgettable_spark.streaming import semantic_admit as sa
    from forgettable_spark.streaming.semantic_admit import semantic_admission_stream

    spark = get_spark(
        app_name="forgettable-semantic-stream-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="semantic_stream_bench_")
    src, ckpt = f"{work}/src", f"{work}/ckpt"
    index_dir, verdict_dir = f"{work}/index", f"{work}/verdicts"
    try:
        emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
        n_vecs = emb.count()
        sig_bits = int(os.environ.get("SPARK_GRAFT_SIG_BITS", "0"))
        # SPARK_GRAFT_BANDS > 0 (with SIG_BITS as the band width) runs
        # the BANDED arm (r12): r independent sig_bits-wide band
        # signatures ORed — the loop switches to the banded verdict and
        # probes stay structurally 0 (BandedAssigner docstring).
        n_bands = int(os.environ.get("SPARK_GRAFT_BANDS", "0"))
        if sig_bits:
            coarse, fines = cb.train_two_level_codebook(emb, k1=K, k2=K)
            centroids = None  # the assigner drives assignment
            # Structured assigner (r12): carries its own fingerprint and
            # the RAGGED-fines probe modulus, so the loop derives both —
            # restating k1·k2 here was exactly the ADVICE r11 bug.
            if n_bands:
                assigner = cb.BandedAssigner(
                    coarse, fines, n_bands=n_bands, band_bits=sig_bits
                )
            else:
                assigner = cb.PartitionedAssigner(coarse, fines, sig_bits)
        else:
            centroids = cb.train_codebook(emb, k=K)  # untimed model setup
            assigner = None
        emb.repartition(n_batches).write.mode("overwrite").parquet(src)

        # Per-trigger + fold instrumentation (VERDICT r10 #5: the
        # stream-age study must NAME per-trigger and fold cost, not just
        # the aggregate wall): wrap the module-level entrypoints the
        # loop resolves at call time. Negligible overhead (two
        # perf_counter reads per trigger).
        trigger_s: list[float] = []
        fold_s: list[float] = []
        _real_batch, _real_fold = sa.semantic_admit_batch, sa._fold_index

        def _timed_batch(*a, **kw):
            t = time.perf_counter()
            _real_batch(*a, **kw)
            trigger_s.append(round(time.perf_counter() - t, 3))

        def _timed_fold(*a, **kw):
            t = time.perf_counter()
            _real_fold(*a, **kw)
            fold_s.append(round(time.perf_counter() - t, 3))

        sa.semantic_admit_batch, sa._fold_index = _timed_batch, _timed_fold

        stream = (
            spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.perf_counter()
        q = semantic_admission_stream(
            stream,
            index_dir,
            verdict_dir,
            ckpt,
            centroids,
            threshold=THRESHOLD,
            available_now=True,
            max_cell_size=CAP,
            fold_every=FOLD_EVERY,
            assigner=assigner,
            # probe modulus + fingerprint derive from the structured
            # assigner (restating k1·k2 here was the ADVICE r11 bug —
            # Lloyd's fines are RAGGED); probe_flips stays explicit so
            # the A/B arms are env-selectable ("auto" = library default:
            # full 1-flip when the assigner is structured).
            probe_flips=probe_flips,
            cell_buckets=cell_buckets,
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0

        sa.semantic_admit_batch, sa._fold_index = _real_batch, _real_fold
        if trigger_s:
            import statistics as st

            half = len(trigger_s) // 2
            print(
                json.dumps(
                    {
                        "per_trigger_s": trigger_s,
                        "trigger_median_s": round(st.median(trigger_s), 3),
                        "trigger_median_first_half_s": round(
                            st.median(trigger_s[:half] or trigger_s), 3
                        ),
                        "trigger_median_second_half_s": round(
                            st.median(trigger_s[half:] or trigger_s), 3
                        ),
                        "n_folds": len(fold_s),
                        "fold_s": fold_s,
                        "note": "fold time is included in its trigger's entry",
                    }
                ),
                flush=True,
            )
        verdicts = spark.read.option("recursiveFileLookup", "true").parquet(
            verdict_dir
        )
        n_dup = verdicts.filter("is_dup").count()
        n_admitted = verdicts.filter("NOT is_dup").count()
        print(
            json.dumps(
                {
                    "metric": "semantic_admission_throughput",
                    "vecs": n_vecs,
                    "batches": n_batches,
                    "value": round(n_vecs / wall, 1),
                    "unit": "vecs/sec",
                    "sig_bits": sig_bits,
                    "n_bands": n_bands,
                    # resolved value: "auto" → full 1-flip recovery when
                    # the assigner is structured (0 for banded: recovery
                    # lives in the bands), else 0
                    "probe_flips": (
                        sig_bits
                        if probe_flips is None and sig_bits and not n_bands
                        else (probe_flips or 0)
                    ),
                    "wall_s": round(wall, 2),
                    "cell_buckets": cell_buckets,
                    "n_admitted": n_admitted,
                    "n_dup": n_dup,
                    "sf_dir": sf_dir,
                }
            ),
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
