"""Catalog: register the driver testdata parquet files as temp views.

Scan capability maps the reference's topology/storage enumeration
(``CrossAZBlockPlacementPolicy.java:615-632,600-603`` — SURVEY §2.1
S1/S2) onto Spark's vectorized Parquet source: column pruning and
predicate pushdown reach the scan for free once tables are views.

The one special case is ``events``: the driver writes its ``ts``
column as Parquet ``timestamp[ns]`` which Spark 4 refuses to read
natively. With ``spark.sql.legacy.parquet.nanosAsLong=true`` the
column surfaces as a nanosecond LONG; the view exposes
``ts = timestamp_micros(ts_ns / 1000)`` (µs truncation, invisible to
hour-granularity aggregation) so downstream queries see a plain
timestamp column, identical to what DuckDB reads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
EXTENSION_TABLES = ("events", "documents", "embeddings")
ALL_TABLES = TPCH_TABLES + EXTENSION_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing engine-specific quirks."""
    # Defensive runtime confs: the driver may hand us a session built
    # without the engine defaults. All are runtime-settable SQL confs.
    # UTC keeps timestamp rendering identical to the DuckDB oracle;
    # AQE coalesces the 200-partition default away on small inputs.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    if name == "events":
        # required to read timestamp[ns] parquet.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanosecond parquet timestamp surfaced as long; convert to µs.
            # Integer DIV, not float division — double loses integer
            # precision above 2^53 and drifts the timestamp by ±1 µs.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # µs parquet timestamp without zone (isAdjustedToUTC=false):
            # cast to TIMESTAMP so event-time ops (watermarks) accept it;
            # the UTC session timezone makes the cast value-preserving.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a scan that yields fewer partitions than
    cores — a single small parquet file (one row group) otherwise
    serializes CPU-heavy per-row work (minhash, simhash, BM25 scoring,
    matrix products) onto one task. At cluster scale the scan already
    carries >= cores partitions and this returns the input unchanged,
    so no shuffle is ever added to a 100 TB plan; it only widens the
    degenerate small-file case. Keep it out of cheap scan->agg queries
    where the exchange would cost more than it saves."""
    sc = df.sparkSession.sparkContext
    n = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def register_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, tables=ALL_TABLES
) -> dict[str, DataFrame]:
    """Register each testdata table as a temp view; return the frames."""
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
