"""SparkSession factory tuned for the crawl engine.

Local-mode defaults mirror what we would set on a real multi-executor
cluster: AQE on (runtime re-plan + skew-join handling), Arrow enabled for
pandas-UDF batches, UTC session timezone (the DuckDB oracle compares
timestamps as UTC-naive), and shuffle partitions sized to cores rather than
the 200 default (wrong at both ends).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "nightcrawler_ds_pipeline_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` may be an int (→ ``local[N]``) or a full master string. Defaults
    to ``local[$SPARK_GRAFT_CPUS]`` (env) or ``local[*]``.
    """
    # must happen before the JVM launches so streaming python runners
    # (transformWithState) inherit a usable protobuf path — no-op when the
    # env is already settled or a real protobuf is installed (compat.py)
    from nightcrawler_ds_pipeline_spark.compat import ensure_tws_python_env

    ensure_tws_python_env()
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = cpus if isinstance(cpus, str) and cpus.startswith(("local", "spark")) else f"local[{cpus}]"
    if shuffle_partitions is None:
        env_cpus = str(cpus)
        shuffle_partitions = (
            int(env_cpus) if env_cpus.isdigit() else DEFAULT_SHUFFLE_PARTITIONS
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # binary image payloads average ~20 KB/row: 2048 rows/Arrow batch
        # caps per-task batch memory at ~40 MB (10k rows → 200 MB → spills)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # vectorized parquet reader batch: the 4096-row default. Measured:
        # dropping it to 512 halves scan-bound query throughput (TPC-H Q1
        # 0.46 s → 0.75 s warm at sf0.1). Low-heap spark-submit runs that
        # scan the 20 KB-binary images table should override to 512 via
        # SPARK_GRAFT_COLUMNAR_BATCH (jobs/run_crawl_job.py does)
        .config(
            "spark.sql.parquet.columnarReaderBatchSize",
            os.environ.get("SPARK_GRAFT_COLUMNAR_BATCH", "4096"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # deterministic Python hashing inside UDF workers
        .config("spark.executorEnv.PYTHONHASHSEED", "0")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
