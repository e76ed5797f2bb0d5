"""Materialized-view robustness: maintenance commits must not break
incremental refresh, expired CDC ranges degrade to a rebuild, and SUM
NULL semantics survive maintenance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crossfire_spark.catalog import load_table
from crossfire_spark.sources.matview import (
    create_aggregate_view,
    refresh_aggregate_view,
)
from crossfire_spark.sources.snapshot import (
    _current_version,
    _read_manifest,
    snapshot_cluster,
    snapshot_compact,
    snapshot_expire,
    snapshot_read,
    snapshot_write,
)


@pytest.fixture()
def based(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    snapshot_write(orders.where(F.col("o_orderkey") % 2 == 0), base)
    create_aggregate_view(
        spark, base, view, keys=["o_orderstatus"], measures=["o_totalprice"]
    )
    return orders, base, view


def _check(spark, base, view):
    got = {
        r.o_orderstatus: (r._cnt, r.sum_o_totalprice)
        for r in snapshot_read(spark, view).collect()
    }
    want = {
        r.o_orderstatus: (r.c, r.s)
        for r in snapshot_read(spark, base)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("c"), F.sum("o_totalprice").alias("s"))
        .collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        if want[k][1] is None:
            assert got[k][1] is None, (k, got[k])
        else:
            assert abs(got[k][1] - want[k][1]) < 1e-6, (k, got[k], want[k])


def test_compact_preserves_refresh(spark, based):
    """snapshot_compact on the VIEW must carry the base-version stamp:
    refresh afterwards proceeds incrementally, no KeyError, right
    answer."""
    orders, base, view = based
    snapshot_compact(spark, view)
    props = _read_manifest(view, _current_version(view)).get("properties", {})
    assert "base_version" in props and "keys" in props
    snapshot_write(orders.where(F.col("o_orderkey") % 2 == 1), base)
    refresh_aggregate_view(spark, base, view)
    _check(spark, base, view)


def test_cluster_preserves_refresh(spark, based):
    orders, base, view = based
    snapshot_cluster(spark, view, cols=["_cnt"], bits=2)
    snapshot_write(orders.where(F.col("o_orderkey") % 2 == 1), base)
    refresh_aggregate_view(spark, base, view)
    _check(spark, base, view)


def test_missing_stamp_falls_back_to_rebuild(spark, based):
    """A view head with no property stamp (simulating a legacy or
    hand-maintained commit) infers keys/measures from the schema and
    rebuilds instead of raising KeyError."""
    orders, base, view = based
    snapshot_write(snapshot_read(spark, view), view, mode="overwrite")
    assert (
        _read_manifest(view, _current_version(view)).get("properties", {}) == {}
    )
    snapshot_write(orders.where(F.col("o_orderkey") % 2 == 1), base)
    refresh_aggregate_view(spark, base, view)
    _check(spark, base, view)


def test_expired_base_version_falls_back_to_rebuild(spark, based):
    """When the stamped base version is expired out of the base log,
    refresh rebuilds from the head instead of raising ValueError."""
    orders, base, view = based
    snapshot_write(orders.where(F.col("o_orderkey") % 4 == 1), base)
    snapshot_write(orders.where(F.col("o_orderkey") % 4 == 3), base)
    snapshot_expire(base, keep_last=1)
    refresh_aggregate_view(spark, base, view)
    _check(spark, base, view)


def test_all_null_measure_stays_null(spark, tmp_path):
    """A key whose measure values are all NULL must show sum NULL (SQL
    SUM semantics), not 0.0 — at create AND through refresh."""
    base = str(tmp_path / "b")
    view = str(tmp_path / "v")
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", None), (3, "b", 5.0)],
        "id long, k string, m double",
    )
    snapshot_write(df, base)
    create_aggregate_view(spark, base, view, keys=["k"], measures=["m"])
    snapshot_write(
        spark.createDataFrame([(4, "a", None)], "id long, k string, m double"),
        base,
    )
    refresh_aggregate_view(spark, base, view)
    rows = {r.k: (r._cnt, r.sum_m) for r in snapshot_read(spark, view).collect()}
    assert rows["a"] == (3, None)
    assert rows["b"] == (1, 5.0)


def test_minmax_view_survives_deleted_minimum(spark, tmp_path):
    """MIN/MAX views refresh by touched-key rescan: deleting the
    minimum row must surface the next-smallest value — the case plain
    IVM cannot maintain."""
    from crossfire_spark.sources.snapshot import snapshot_merge

    base = str(tmp_path / "b")
    view = str(tmp_path / "v")
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 5.0), (3, "a", 9.0), (4, "b", 2.0)],
        "id long, k string, m double",
    )
    snapshot_write(df, base)
    create_aggregate_view(
        spark, base, view, keys=["k"], measures=["m"], minmax=["m"]
    )
    rows = {r.k: r for r in snapshot_read(spark, view).collect()}
    assert (rows["a"].min_m, rows["a"].max_m) == (1.0, 9.0)
    # delete the key-a minimum via merge (delete_keys)
    snapshot_merge(
        spark,
        df.limit(0),
        base,
        keys=["id"],
        delete_keys=spark.createDataFrame([(1,)], "id long"),
    )
    refresh_aggregate_view(spark, base, view)
    rows = {r.k: r for r in snapshot_read(spark, view).collect()}
    assert (rows["a"]._cnt, rows["a"].min_m, rows["a"].max_m) == (2, 5.0, 9.0)
    assert (rows["b"].min_m, rows["b"].max_m) == (2.0, 2.0)  # untouched
    # delete ALL remaining key-a rows -> key leaves the view
    snapshot_merge(
        spark,
        df.limit(0),
        base,
        keys=["id"],
        delete_keys=spark.createDataFrame([(2,), (3,)], "id long"),
    )
    refresh_aggregate_view(spark, base, view)
    assert {r.k for r in snapshot_read(spark, view).collect()} == {"b"}


def test_minmax_view_append_refresh(spark, tmp_path):
    base = str(tmp_path / "b")
    view = str(tmp_path / "v")
    snapshot_write(
        spark.createDataFrame([(1, "a", 3.0)], "id long, k string, m double"),
        base,
    )
    create_aggregate_view(
        spark, base, view, keys=["k"], measures=["m"], minmax=["m"]
    )
    snapshot_write(
        spark.createDataFrame(
            [(2, "a", 1.0), (3, "c", 7.0)], "id long, k string, m double"
        ),
        base,
    )
    refresh_aggregate_view(spark, base, view)
    rows = {r.k: r for r in snapshot_read(spark, view).collect()}
    assert (rows["a"]._cnt, rows["a"].min_m, rows["a"].max_m, rows["a"].sum_m) == (
        2, 1.0, 3.0, 4.0,
    )
    assert (rows["c"]._cnt, rows["c"].min_m) == (1, 7.0)


def test_cluster_validates_column_types(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    path = str(tmp_path / "c")
    snapshot_write(docs.withColumn("arr", F.array("doc_id")), path)
    with pytest.raises(ValueError, match="numeric, string, date"):
        snapshot_cluster(spark, path, cols=["arr"])
    with pytest.raises(ValueError, match="no such column"):
        snapshot_cluster(spark, path, cols=["nope"])


def test_cluster_zorder_on_string_column(spark, sf_dir, tmp_path):
    """String Z-order: distinct-rank boundaries, no SQL literal
    interpolation; data survives, per-file min/max stats on the
    string column enable zone-map pruning."""
    from crossfire_spark.sources.snapshot import _current_version, _read_manifest

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    path = str(tmp_path / "cz")
    snapshot_write(docs, path)
    v = snapshot_cluster(spark, path, cols=["source", "doc_id"], bits=3)
    out = snapshot_read(spark, path)
    assert out.count() == docs.count()
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in docs.collect()
    )
    m = _read_manifest(path, _current_version(path))
    assert v == m["version"]
    assert "source" in m["stats_cols"]
    assert any(st.get("source") for st in m["file_stats"].values())
