"""SparkSession factory with the engine's canonical configuration.

Defaults are chosen for correctness-critical determinism (UTC session
timezone, nanosecond-parquet handling) and for scale (AQE on, skew-join
handling on). Local test runs pass ``master="local[N]"``; on a real
cluster the master comes from spark-submit and is left unset here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Engine-canonical Spark conf. Rationale per key:
#: - timeZone UTC: timestamp<->epoch conversions must be locale-independent
#:   so results hash-match the DuckDB oracle.
#: - nanosAsLong: the driver testdata writes parquet TIMESTAMP(NANOS) which
#:   Spark 4 otherwise refuses (PARQUET_TYPE_ILLEGAL); we read the raw int64
#:   and truncate to microseconds ourselves (see sources.tables), matching
#:   DuckDB's nanos->micros truncation.
#: - adaptive.*: runtime re-planning — partition coalescing and skew-join
#:   splitting matter at 100 TB where static planning guesses wrong.
#: - arrow: vectorized Python<->JVM transfer for the pandas-UDF decay path.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scans: keep splits big enough that sf0.1..100TB file counts
    # don't explode task counts; AQE coalesces the tail.
    "spark.sql.files.maxPartitionBytes": "256m",
    # Broadcast threshold: per-distribution total tables (one row per
    # distribution) broadcast up to this size instead of shuffling the
    # (distribution, bin) fact side.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
}


def get_spark(
    app_name: str = "forgettable-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine configuration.

    ``master=None`` leaves the master to the environment (spark-submit /
    existing session); tests pass ``local[N]``. ``shuffle_partitions``
    defaults to the CPU budget in local mode and Spark's default otherwise.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
        if shuffle_partitions is None and master.startswith("local["):
            # "local[N]" or "local[N,maxFailures]"; N may be "*".
            inner = master[len("local[") : -1].split(",")[0]
            shuffle_partitions = os.cpu_count() if inner == "*" else int(inner)
    conf = dict(ENGINE_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark
