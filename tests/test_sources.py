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
from crossfire_spark.sources.io import compact_table, upsert_table


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
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


def test_upsert_merges_by_key(spark, sf_dir, tmp_path):
    path = str(tmp_path / "nation_upsert")
    base = load_table(spark, sf_dir, "nation")
    upsert_table(spark, base, path, keys=["n_nationkey"])  # bootstrap
    updates = spark.createDataFrame(
        [(0, "RENAMED", 9), (999, "ATLANTIS", 9)], schema=base.schema
    )
    upsert_table(spark, updates, path, keys=["n_nationkey"])
    got = {r.n_nationkey: r.n_name for r in read_table(spark, path).collect()}
    assert got[0] == "RENAMED"  # replaced
    assert got[999] == "ATLANTIS"  # inserted
    assert got[1] == base.where("n_nationkey = 1").first().n_name  # untouched
    assert len(got) == base.count() + 1


def test_compact_reduces_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_shredded")
    df = load_table(spark, sf_dir, "orders")
    write_table(df.repartition(37), path)
    n_before = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert n_before == 37
    wrote = compact_table(spark, path, target_partitions=2)
    n_after = sum(f.endswith(".parquet") for f in os.listdir(path))
    assert wrote == 2 and n_after == 2
    back = read_table(spark, path)
    assert back.count() == df.count()
    assert sorted(back.columns) == sorted(df.columns)


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
