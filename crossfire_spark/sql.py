"""SQL entry point: ``sql(spark, query, sf_dir)`` — the engine's
second face (SURVEY §3.5: ``engine.sql(q)`` → Catalyst).

Every declared query's canonical ANSI SQL runs unchanged on Spark SQL
(it is the same string the DuckDB oracle executes), so users can pick
either API; ``tests/test_sql_mirror.py`` asserts the two faces return
identical results for the whole declared surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from crossfire_spark.catalog import ALL_TABLES, register_tables


def sql(spark: SparkSession, query: str, sf_dir: str) -> DataFrame:
    """Run ANSI SQL against the testdata tables at ``sf_dir``."""
    register_tables(spark, sf_dir, ALL_TABLES)
    return spark.sql(query)
