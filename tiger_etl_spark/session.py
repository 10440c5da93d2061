"""SparkSession factory.

Reference analog: the singleton engine + connection pool at
``system/system/database_connections/pg_db.py:77-147`` (double-checked
locked engine creation). In Spark the session *is* the pooled resource:
one ``SparkSession`` per job via ``getOrCreate``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _local_dir() -> str | None:
    """Shuffle/spill scratch dir. OPT-IN ONLY: tmpfs (`/dev/shm`) is a
    measured 1.6× win on this sandbox's virtio disk (small-file churn
    burns system CPU), but tmpfs spill consumes RAM — a library user
    whose shuffle legitimately needs to spill to disk must keep Spark's
    default. The bench/test harnesses set SPARK_GRAFT_LOCAL_DIR
    explicitly; unset → Spark's default local dir."""
    override = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if not override:
        return None
    try:
        os.makedirs(override, exist_ok=True)
        return override
    except OSError:
        return None


def get_spark(
    app_name: str = "tiger_etl_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a local SparkSession tuned for the sandbox (one JVM,
    ``local[N]``); on a real cluster the same confs apply, with
    ``master``/executors supplied by spark-submit.
    """
    cores = cores or default_parallelism()
    shuffle_partitions = shuffle_partitions or cores
    # Executor Python workers must import this package (mapInPandas /
    # pandas UDF closures reference it). Local mode inherits the driver
    # env — prepend the package root to PYTHONPATH before JVM start; on
    # a cluster this is spark-submit --py-files (jobs/package.py).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(":"):
        os.environ["PYTHONPATH"] = f"{pkg_root}:{existing}" if existing else pkg_root
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        # Shuffle sized to cores locally; AQE coalesces at runtime anyway.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Timestamps are UTC end-to-end (reference stores tz-aware UTC;
        # DuckDB oracle compares UTC-naive) — SURVEY.md §2.8 F7.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # html:binary payloads through Arrow — bound batch size so large
        # binary columns don't blow the Arrow IPC buffers (SURVEY.md §7).
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"),
        )
        .config("spark.sql.parquet.compression.codec", "zstd")
        # INT96 (Spark's legacy default) carries NO parquet column
        # statistics, which blinds manifest-level time-range pruning
        # (lake/pruning.py); micros is the modern type and stats-capable
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # JVM (not ICU) case mappings for UTF8_BINARY lower()/upper():
        # the first ICU-path call pays a one-time ~200 s static init
        # (CollationAwareUTF8String builds a title-case lookup table by
        # calling UCharacter.toTitleCase for all 1,114,112 code points,
        # each allocating a BreakIterator under icu4j 77). JVM simple
        # case mapping is identical for ASCII (the web-corpus hot path)
        # and matches the DuckDB parity oracle; users needing ICU
        # full-Unicode case edge cases can flip it back via extra_conf.
        .config("spark.sql.icu.caseMappings.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # Throughput GC with a fixed heap: no concurrent-cycle overhead,
        # no heap resize/uncommit churn mid-stream (measured ~7% on the
        # CDC bench; see BENCH/BASELINE.md protocol)
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_JAVA_OPTS",
                f"-XX:+UseParallelGC -Xms{os.environ.get('SPARK_GRAFT_DRIVER_MEM', '48g')}",
            ),
        )
    )
    local_dir = _local_dir()
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
