#!/usr/bin/env python3
"""Isolated scale measurement for media_near_dup (VERDICT r5 #1: the
operator debuted at toy scale only). Prints one JSON line per rung:

    {"metric": "media_near_dup_scale", "n": N, "sec": S, "pairs": P,
     "exact": E}

Corpus design — the part that makes the measurement meaningful: the
suite's `synthetic_media` content (sha256 hex repeated) gives EVERY
document a near-uniform nibble histogram, so at large n a constant
FRACTION of all pairs is genuinely within the L1 radius — the output
itself is quadratic and no candidate generator can be sub-quadratic on
it (measured: n=64 → 9 pairs, n=6400 → 54,665 pairs, same ~0.3%% of all
pairs). Real media corpora are near-dup-SPARSE: diverse images spread
out in histogram space. This script emulates that the same way
make_scaled_sf decorrelates document copies: each doc's content is a
16-char composition with md5-derived per-(doc, char) repeat counts —
random points in the histogram simplex whose typical pairwise L1 far
exceeds the radius — plus planted dup classes (ids ≡21 mod 24 copy
id-12's bytes exactly; ids ≡15 mod 24 repeat id-12's composition twice:
different bytes, identical NORMALIZED histogram). Pair count is linear
in n by construction, so wall-clock ratio between rungs is the scale
verdict for the operator itself.

The operator runs in its PRODUCTION configuration: the library-default
hot-bucket cap (2000) stays ON (the registered suite query disables it
only so its tiny-corpus oracle stays cap-free by construction), the L1
radius is 0.12 — small relative to the corpus spread, the regime real
perceptual dedup runs in — and ``bits_per_band`` GROWS with the corpus
exactly as the operator docstring prescribes (band collision
probability halves per bit): at 16 histogram buckets a 4-bit band has
only 16 values, so beyond n ≈ 16·cap per band every bucket exceeds the
cap and is dropped (measured: 0 candidates at n=64k/bpb=4 — the
designed skew trade, logged); widening to 8-bit bands restores
256-value selectivity. Rungs 20000 and 64000 share bpb=8, so their
ratio is the same-config scale verdict.

    SPARK_GRAFT_CPUS    local[] parallelism (default 32)
    SPARK_GRAFT_NS      comma-separated n[:bits_per_band] rungs
                        (default 6400:4,20000:8,64000:8)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rungs = []
    for item in os.environ.get("SPARK_GRAFT_NS", "6400:4,20000:8,64000:8").split(","):
        n, _, bpb = item.partition(":")
        rungs.append((int(n), int(bpb or "4")))

    from forgettable_spark.session import get_spark

    spark = get_spark(
        app_name="media-scale-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from forgettable_spark.extensions.multimodal import media_near_dup_pairs
    from forgettable_spark.functions.cache import run_released

    def composition(idc):
        """Deterministic 16-char composition: per-(id, char) repeat count
        1..16 off an md5 lattice — a pseudo-random point in the nibble
        simplex, spread >> the 0.35 L1 radius."""
        parts = []
        for c in "0123456789abcdef":
            seed = F.md5(F.concat(F.lit("m"), idc.cast("string"), F.lit("-" + c)))
            reps = (F.conv(F.substring(seed, 1, 6), 16, 10).cast("bigint") % 16 + 1)
            parts.append(F.repeat(F.lit(c), reps.cast("int")))
        return F.concat(*parts)

    def corpus(n):
        df = spark.range(n).withColumnRenamed("id", "media_id")
        mid = F.col("media_id")
        src = mid - 12
        base = composition(mid)
        exact = composition(src)                      # byte-identical copy
        scaled = F.repeat(composition(src), 2)        # 2x bytes, same histogram
        content = (
            F.when(mid % 24 == 21, exact)
            .when(mid % 24 == 15, scaled)
            .otherwise(base)
        )
        return df.select(
            "media_id",
            content.cast("binary").alias("content"),
            F.struct(F.lit("image/png").alias("mime")).alias("meta"),
            F.lit("image").alias("kind"),
        ).repartition(max(1, min(int(cpus), (n + 1023) // 1024)))

    # untimed warmup: Arrow featurize + join/window JIT on a small rung
    run_released(spark, lambda: media_near_dup_pairs(corpus(256), l1_max=0.12))
    spark.catalog.clearCache()

    for n, bpb in rungs:
        t0 = time.perf_counter()
        out = run_released(
            spark,
            lambda: media_near_dup_pairs(corpus(n), bits_per_band=bpb, l1_max=0.12),
        )
        pairs = out.count()
        exact = out.filter(F.col("is_exact")).count()
        sec = round(time.perf_counter() - t0, 2)
        print(
            json.dumps(
                {
                    "metric": "media_near_dup_scale",
                    "n": n,
                    "bits_per_band": bpb,
                    "sec": sec,
                    "pairs": pairs,
                    "exact": exact,
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
