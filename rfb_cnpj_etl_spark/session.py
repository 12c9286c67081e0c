"""SparkSession factory.

The reference tunes its sinks with PRAGMAs / UNLOGGED tables / batch
sizes (``src/rfb_cnpj_etl/config.py:29-60``, ``db/sqlite_loader.py:29-34``);
the Spark-native equivalents are session-level knobs: AQE, Arrow, shuffle
partition count, dynamic partition overwrite (our MERGE fallback relies
on it), and a UTC session timezone so results compare bit-exactly against
the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "rfb_cnpj_etl_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. On a real
    cluster the same configs apply; only ``master`` changes (left to
    spark-submit in that case).
    """
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # MERGE fallback = overwrite only the key-buckets a batch touches
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # COUNT/MIN/MAX grouped by partition columns answered from
        # parquet footers — makes the manifest's per-bucket row metrics
        # a metadata-only job.
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    # Only pin a master when not already provided by spark-submit.
    # Under spark-submit, PythonRunner launches this driver with
    # PYSPARK_GATEWAY_PORT set (the JVM already carries --master); pinning
    # local[] here would override the submitted cluster master.
    if "PYSPARK_GATEWAY_PORT" in os.environ:
        pass  # spark-submit owns the master
    elif "SPARK_GRAFT_MASTER" in os.environ:
        builder = builder.master(os.environ["SPARK_GRAFT_MASTER"])
    else:
        builder = builder.master(f"local[{cores}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
