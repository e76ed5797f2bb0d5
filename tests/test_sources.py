"""Source/sink tests: format round-trips, partitioned writes with
partition pruning, and the topology JSON report (S4/P8 analog)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from crossfire_spark.catalog import load_table
from crossfire_spark.placement.queries import load_fixture
from crossfire_spark.sources import read_table, topology_report, write_table


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_roundtrip(fmt, spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / f"nation_{fmt}")
    write_table(df, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    df = load_table(spark, sf_dir, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_part")
    write_table(
        df.repartition("status"), path, fmt="parquet", partition_by=["status"]
    )
    # physical layout: one dir per partition value
    dirs = {d for d in os.listdir(path) if d.startswith("status=")}
    assert len(dirs) >= 2
    # a filter on the partition column must prune at plan level
    back = read_table(spark, path).where(F.col("status") == "F")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "status" in plan.split("PartitionFilters")[1][:200]
    assert back.count() == df.where(F.col("o_orderstatus") == "F").count()


def test_topology_report(spark):
    dn = load_fixture(spark, "datanodes")
    rep = topology_report(dn).collect()
    assert [r.datacenter for r in rep] == ["even", "odd"]
    doc = json.loads(rep[0].report)
    assert doc["datacenter"] == "even"
    # parity fixture: even nodes land only in even racks -> 5 per DC
    assert len(doc["racks"]) == 5
    addrs = doc["racks"][0]["addresses"]
    assert addrs == sorted(addrs)
