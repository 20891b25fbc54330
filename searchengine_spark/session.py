"""SparkSession factory tuned for the index-build / query workload.

Local-mode knobs follow the sandbox contract (single JVM, N threads);
on a real cluster the same builder is used with ``--master`` supplied
by ``spark-submit`` (the master here is only a default).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "searchengine-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``cores`` only matters in local mode; defaults to ``$SPARK_GRAFT_CPUS``
    (driver contract) or ``*``. Shuffle partitions default to 2x cores —
    small enough that sf0.1 partitions stay cache-friendly, large enough
    that AQE can coalesce rather than split.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        try:
            n = int(str(cores))
        except ValueError:
            n = os.cpu_count() or 8
        shuffle_partitions = max(8, 2 * n)

    from pyspark import SparkConf

    builder = SparkSession.builder.appName(app_name)
    # honor an externally-supplied master (spark-submit --master sets
    # spark.master as a system property); the local[] master here is
    # only the no-submit default
    if not SparkConf().contains("spark.master"):
        builder = builder.master(master)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.spill.compress", "true")
    )
    # Optional Iceberg runtime (lakehouse deployment): set
    # SPARK_GRAFT_ICEBERG=org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:<ver>
    # (any Maven coordinate resolvable on the cluster) and the session
    # registers a hadoop-type catalog `ice` at $SPARK_GRAFT_ICEBERG_WAREHOUSE.
    # The engine needs nothing Iceberg-specific beyond this —
    # load_corpus() reads `ice.db.table` through the same
    # spark.read.table seam it uses for any catalog table.  This sandbox
    # ships no Iceberg jars (and no network to fetch them), so the knob
    # stays off here; the catalog-table seam itself is exercised by
    # tests/test_corpus_distributed.py::test_load_corpus_catalog_table.
    iceberg_pkg = os.environ.get("SPARK_GRAFT_ICEBERG")
    if iceberg_pkg:
        warehouse = os.environ.get(
            "SPARK_GRAFT_ICEBERG_WAREHOUSE", "/tmp/iceberg-warehouse"
        )
        builder = (
            builder.config("spark.jars.packages", iceberg_pkg)
            .config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config(
                "spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog"
            )
            .config("spark.sql.catalog.ice.type", "hadoop")
            .config("spark.sql.catalog.ice.warehouse", warehouse)
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
