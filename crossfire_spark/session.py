"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for the 100 TB design goal (AQE, skew-join
handling, broadcast joins for dimensions) while remaining correct on
``local[N]``:

- AQE on: runtime coalescing of shuffle partitions, skew-join split,
  dynamic join-strategy switch — the knobs that keep a fixed plan
  healthy when the data is 1000x bigger than the test scale.
- Arrow on: every Pandas UDF / ``applyInPandas`` path moves columnar
  batches instead of pickled rows.
- ``spark.sql.legacy.parquet.nanosAsLong=true``: the driver's
  ``events.parquet`` stores ``timestamp[ns]`` which Spark cannot read
  natively (SURVEY §7.3); the catalog converts the resulting long to a
  microsecond timestamp.
- Session timezone pinned to UTC so timestamp semantics agree with the
  DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "crossfire-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    On a real cluster ``master`` comes from the environment; locally we
    default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- scale / optimizer ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # --- python interop ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- correctness vs oracle ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local-mode hygiene
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/crossfire-warehouse"),
        )
        # local[N] runs the whole engine in one JVM: size the heap for
        # 32 concurrent tasks + materialized intermediates (the box has
        # 128 GiB; a real cluster sizes executors instead)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
