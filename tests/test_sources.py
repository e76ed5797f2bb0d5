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


def test_snapshot_append_overwrite_time_travel(spark, sf_dir, tmp_path):
    from crossfire_spark.sources.snapshot import (
        snapshot_read,
        snapshot_versions,
        snapshot_write,
    )

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "snap")
    v0 = snapshot_write(nation.where(F.col("n_nationkey") < 10), path)
    v1 = snapshot_write(nation.where(F.col("n_nationkey") >= 10), path)
    assert (v0, v1) == (0, 1)
    # head sees the union of both appends
    assert snapshot_read(spark, path).count() == nation.count()
    # time travel: v0 still sees only the first batch
    assert snapshot_read(spark, path, version=0).count() == nation.where(
        F.col("n_nationkey") < 10
    ).count()
    # overwrite starts fresh but history survives
    v2 = snapshot_write(nation.limit(3), path, mode="overwrite")
    assert v2 == 2
    assert snapshot_read(spark, path).count() == 3
    assert snapshot_read(spark, path, version=1).count() == nation.count()
    assert snapshot_versions(path) == [0, 1, 2]


def test_snapshot_compact_and_expire(spark, sf_dir, tmp_path):
    from crossfire_spark.sources.snapshot import (
        _read_manifest,
        snapshot_compact,
        snapshot_expire,
        snapshot_read,
        snapshot_versions,
        snapshot_write,
    )

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "snap2")
    for _ in range(4):  # many small appends -> many small files
        snapshot_write(nation.repartition(4), path)
    head = snapshot_versions(path)[-1]
    assert len(_read_manifest(path, head)["files"]) >= 16
    rows_before = snapshot_read(spark, path).count()
    v = snapshot_compact(spark, path)
    assert len(_read_manifest(path, v)["files"]) < 16
    assert snapshot_read(spark, path).count() == rows_before
    # expire everything but the compacted head; it must still read
    deleted = snapshot_expire(path, keep_last=1)
    assert deleted > 0
    assert snapshot_versions(path) == [v]
    assert snapshot_read(spark, path).count() == rows_before


def test_snapshot_concurrent_commit_retries(spark, sf_dir, tmp_path):
    """Losing a version slot must retry against the new head, not
    clobber it: simulate by pre-claiming the slot the writer wants."""
    import json as _json
    import os as _os

    from crossfire_spark.sources.snapshot import (
        _manifest_path,
        snapshot_read,
        snapshot_write,
    )

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "snap3")
    snapshot_write(nation.where(F.col("n_nationkey") < 5), path)
    # a "concurrent writer" claims v1 directly
    m0 = _json.load(open(_manifest_path(path, 0)))
    m1 = dict(m0, version=1, parent=0, operation="append")
    _os.makedirs(_os.path.dirname(_manifest_path(path, 1)), exist_ok=True)
    with open(_manifest_path(path, 1), "w") as fh:
        _json.dump(m1, fh)
    # our writer must land at v2 with v1's files as parent
    v = snapshot_write(nation.where(F.col("n_nationkey") >= 20), path)
    assert v == 2
    # v1 (the winner) carries v0's files; our append adds its own batch
    expect = (
        nation.where(F.col("n_nationkey") < 5).count()
        + nation.where(F.col("n_nationkey") >= 20).count()
    )
    assert snapshot_read(spark, path).count() == expect


def test_snapshot_append_schema_mismatch_rejected(spark, sf_dir, tmp_path):
    from crossfire_spark.sources.snapshot import snapshot_read, snapshot_write

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "snap4")
    snapshot_write(nation, path)
    with pytest.raises(ValueError, match="schema mismatch"):
        snapshot_write(nation.select("n_nationkey"), path, mode="append")
    # overwrite restates the schema legally
    snapshot_write(nation.select("n_nationkey"), path, mode="overwrite")
    assert snapshot_read(spark, path).columns == ["n_nationkey"]


def test_swap_crash_recovery(spark, sf_dir, tmp_path):
    """A crash between _swap_into_place's two renames leaves only
    <path>.__old; the next read through the module must restore it."""
    import shutil

    from crossfire_spark.sources.io import _backup_of

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "crashy")
    write_table(nation, path)
    n = read_table(spark, path).count()
    # simulate the crash window: table moved aside, new one never landed
    os.rename(path, _backup_of(path))
    assert read_table(spark, path).count() == n
    assert not os.path.exists(_backup_of(path))
    # stale backup next to a live table is garbage-collected on upsert
    shutil.copytree(path, _backup_of(path))
    upsert_table(spark, nation.limit(1), path, keys=["n_nationkey"])
    assert not os.path.exists(_backup_of(path))
    assert read_table(spark, path).count() == n


def test_snapshot_partitioned_write_prunes_from_manifest(
    spark, sf_dir, tmp_path
):
    """Partition values live in the manifest, so a partition-filtered
    read never opens (or even lists) files of other partitions."""
    from crossfire_spark.sources.snapshot import (
        snapshot_compact,
        snapshot_read,
        snapshot_write,
    )

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "psnap")
    snapshot_write(docs.where(F.col("doc_id") < 200), path, partition_by=["lang"])
    snapshot_write(
        docs.where(F.col("doc_id") >= 200), path, partition_by=["lang"]
    )
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    lang = sorted(langs)[0]
    pruned = snapshot_read(spark, path, where={"lang": lang})
    # every scanned file path carries the chosen partition dir
    assert all(f"lang={lang}" in f for f in pruned.inputFiles())
    assert pruned.count() == docs.where(F.col("lang") == lang).count()
    # partition column is materialized back into the rows
    assert set(r.lang for r in pruned.select("lang").distinct().collect()) == {lang}
    # unknown partition key is an error, not a silent full scan
    with pytest.raises(ValueError, match="not partition columns"):
        snapshot_read(spark, path, where={"source": "src0"})
    # appends must keep the partition spec
    with pytest.raises(ValueError, match="partition spec mismatch"):
        snapshot_write(docs.limit(1), path)
    # full read still sees everything; compaction keeps the spec
    assert snapshot_read(spark, path).count() == docs.count()
    snapshot_compact(spark, path)
    still = snapshot_read(spark, path, where={"lang": lang})
    assert still.count() == docs.where(F.col("lang") == lang).count()


def test_snapshot_schema_evolution_additive(spark, sf_dir, tmp_path):
    from crossfire_spark.sources.snapshot import (
        snapshot_history,
        snapshot_read,
        snapshot_write,
    )

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "esnap")
    snapshot_write(nation.select("n_nationkey", "n_name"), path)
    evolved = nation.select(
        "n_nationkey", "n_name", F.col("n_regionkey").alias("rk")
    )
    # plain append still rejects the wider schema...
    with pytest.raises(ValueError, match="schema mismatch"):
        snapshot_write(evolved, path)
    # ...merge_schema admits it; old rows read the new column as null
    snapshot_write(evolved, path, merge_schema=True)
    head = snapshot_read(spark, path)
    assert head.columns == ["n_nationkey", "n_name", "rk"]
    assert head.count() == 2 * nation.count()
    assert head.where(F.col("rk").isNull()).count() == nation.count()
    # time travel predates the evolution
    assert snapshot_read(spark, path, version=0).columns == [
        "n_nationkey",
        "n_name",
    ]
    # type changes are restatements, never merges
    with pytest.raises(ValueError, match="cannot change column"):
        snapshot_write(
            nation.select(
                F.col("n_nationkey").cast("string"), "n_name", F.lit(1).alias("rk")
            ),
            path,
            merge_schema=True,
        )
    ops = [(h["version"], h["operation"]) for h in snapshot_history(path)]
    assert ops == [(0, "append"), (1, "append")]


def test_snapshot_merge_partition_copy_on_write(spark, sf_dir, tmp_path):
    """MERGE rewrites only partitions the update touches; all other
    files carry over into the new manifest by reference."""
    from crossfire_spark.sources.snapshot import (
        _read_manifest,
        snapshot_merge,
        snapshot_read,
        snapshot_versions,
        snapshot_write,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    path = str(tmp_path / "msnap")
    snapshot_write(docs, path, partition_by=["lang"])
    langs = sorted(r.lang for r in docs.select("lang").distinct().collect())
    hot, cold = langs[0], langs[1:]
    # update 5 existing docs + insert 2 new ones, all in one partition
    upd = (
        docs.where(F.col("lang") == hot)
        .limit(5)
        .withColumn("text", F.lit("REDACTED"))
    )
    ins = spark.createDataFrame(
        [(10_000_001, hot, "new doc a"), (10_000_002, hot, "new doc b")],
        schema=docs.schema,
    )
    v = snapshot_merge(spark, upd.unionByName(ins), path, keys=["doc_id"])
    assert snapshot_versions(path)[-1] == v
    head = snapshot_read(spark, path)
    assert head.count() == docs.count() + 2
    assert head.where(F.col("text") == "REDACTED").count() == 5
    # untouched partitions' files are byte-identical manifest entries
    m0, m1 = _read_manifest(path, 0), _read_manifest(path, v)
    for lang in cold:
        f0 = {f for f, p in m0["file_partitions"].items() if p["lang"] == lang}
        f1 = {f for f, p in m1["file_partitions"].items() if p["lang"] == lang}
        assert f0 == f1 and f0
    # the hot partition was rewritten: no shared files
    h0 = {f for f, p in m0["file_partitions"].items() if p["lang"] == hot}
    h1 = {f for f, p in m1["file_partitions"].items() if p["lang"] == hot}
    assert not (h0 & h1)
    # pre-merge version still reads the original rows
    assert snapshot_read(spark, path, version=0).where(
        F.col("text") == "REDACTED"
    ).count() == 0
    assert m1["operation"] == "merge"


def test_snapshot_merge_unpartitioned_and_schema_guard(
    spark, sf_dir, tmp_path
):
    from crossfire_spark.sources.snapshot import (
        snapshot_merge,
        snapshot_read,
        snapshot_write,
    )

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "msnap2")
    snapshot_write(nation, path)
    upd = nation.where(F.col("n_nationkey") < 3).withColumn(
        "n_name", F.lit("X")
    )
    snapshot_merge(spark, upd, path, keys=["n_nationkey"])
    head = snapshot_read(spark, path)
    assert head.count() == nation.count()
    assert head.where(F.col("n_name") == "X").count() == 3
    with pytest.raises(ValueError, match="match the table schema"):
        snapshot_merge(
            spark, nation.select("n_nationkey"), path, keys=["n_nationkey"]
        )


def test_snapshot_file_stats_prune_reads_and_merges(spark, sf_dir, tmp_path):
    """Iceberg-style per-file column stats: a key-sorted layout gets
    disjoint per-file [min,max]; range reads skip files from metadata
    alone, and a localized MERGE rewrites only the files whose key
    range the update intersects."""
    from crossfire_spark.sources.snapshot import (
        _read_manifest,
        snapshot_merge,
        snapshot_read,
        snapshot_versions,
        snapshot_write,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("tp")
    )
    path = str(tmp_path / "ssnap")
    snapshot_write(
        orders.repartitionByRange(6, "o_orderkey").sortWithinPartitions(
            "o_orderkey"
        ),
        path,
        stats_cols=["o_orderkey"],
    )
    m0 = _read_manifest(path, 0)
    assert all(
        "o_orderkey" in st for st in m0["file_stats"].values()
    ), "every file must carry key stats"
    # range read prunes: only files intersecting [0, 100] are opened
    lo_keys = snapshot_read(spark, path, ranges={"o_orderkey": (0, 100)})
    assert 0 < len(lo_keys.inputFiles()) < len(m0["files"])
    assert (
        lo_keys.where(F.col("o_orderkey") <= 100).count()
        == orders.where(F.col("o_orderkey") <= 100).count()
    )
    # localized merge: update 3 rows with small keys -> only the
    # file(s) covering that key range are rewritten
    upd = (
        orders.orderBy("o_orderkey")
        .limit(3)
        .withColumn("tp", F.lit(0.0))
    )
    v = snapshot_merge(spark, upd, path, keys=["o_orderkey"])
    m1 = _read_manifest(path, v)
    carried = set(m0["files"]) & set(m1["files"])
    assert carried, "files outside the update's key range must carry over"
    assert len(carried) >= len(m0["files"]) - 2
    head = snapshot_read(spark, path)
    assert head.count() == orders.count()
    assert head.where(F.col("tp") == 0.0).count() == 3
    # new files in the merge commit carry stats too (future merges prune)
    new_files = set(m1["files"]) - carried
    assert all("o_orderkey" in m1["file_stats"][f] for f in new_files)
    assert snapshot_versions(path) == [0, v]


def test_snapshot_changes_feed(spark, sf_dir, tmp_path):
    """CDC between versions: appends surface as inserts, a merge
    surfaces delete+insert for its rewritten files only — carried-over
    files never enter the feed (the O(changed-files) property)."""
    from crossfire_spark.sources.snapshot import (
        snapshot_changes,
        snapshot_merge,
        snapshot_write,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    path = str(tmp_path / "cdc")
    first = docs.where(F.col("doc_id") < 100)
    second = docs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    snapshot_write(first, path, partition_by=["lang"])      # v0
    snapshot_write(second, path, partition_by=["lang"])     # v1
    # changes since v0 = exactly the second append, all inserts
    ch01 = snapshot_changes(spark, path, from_version=0, to_version=1)
    assert ch01.where(F.col("_change_type") != "insert").count() == 0
    assert ch01.count() == second.count()
    assert {r._commit_version for r in ch01.select("_commit_version").distinct().collect()} == {1}
    got = {r.doc_id for r in ch01.select("doc_id").collect()}
    want = {r.doc_id for r in second.select("doc_id").collect()}
    assert got == want
    # a one-partition merge: feed contains only that partition's files
    langs = sorted(r.lang for r in first.select("lang").distinct().collect())
    hot = langs[0]
    upd = (
        first.where(F.col("lang") == hot)
        .limit(2)
        .withColumn("text", F.lit("EDITED"))
    )
    v2 = snapshot_merge(spark, upd, path, keys=["doc_id"])
    ch12 = snapshot_changes(spark, path, from_version=1, to_version=v2)
    assert ch12.where(F.col("lang") != hot).count() == 0, (
        "carried-over partitions must not appear in the change feed"
    )
    ins = ch12.where(F.col("_change_type") == "insert")
    dels = ch12.where(F.col("_change_type") == "delete")
    assert ins.where(F.col("text") == "EDITED").count() == 2
    # every deleted row is superseded by an inserted row with same key
    dk = {r.doc_id for r in dels.select("doc_id").collect()}
    ik = {r.doc_id for r in ins.select("doc_id").collect()}
    assert dk <= ik
    # full-range feed equals the concatenation of per-commit feeds
    full = snapshot_changes(spark, path, from_version=0)
    assert full.count() == ch01.count() + ch12.count()
    # empty range yields an empty frame with the metadata columns
    empty = snapshot_changes(spark, path, from_version=v2, to_version=v2)
    assert empty.count() == 0
    assert {"_change_type", "_commit_version"} <= set(empty.columns)


def test_snapshot_zorder_cluster_prunes_both_dimensions(
    spark, sf_dir, tmp_path
):
    """Z-order clustering: after OPTIMIZE-style rewrite on two
    columns, range reads prune files on EITHER column (a linear sort
    can only prune on the leading one)."""
    from crossfire_spark.sources.snapshot import (
        _current_version,
        _read_manifest,
        snapshot_cluster,
        snapshot_read,
        snapshot_write,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "zsnap")
    snapshot_write(orders.repartition(8), path)
    v = snapshot_cluster(
        spark, path, ["o_custkey", "o_totalprice"], n_files=8
    )
    m = _read_manifest(path, v)
    n_files = len(m["files"])
    assert n_files >= 4, "need multiple files for pruning to be observable"
    # stats recorded for both clustered columns on every new file
    assert all(
        {"o_custkey", "o_totalprice"} <= set(m["file_stats"][f])
        for f in m["files"]
    )
    lo_c, hi_c = 1, 50
    lo_p, hi_p = 1000.0, 20000.0
    full = snapshot_read(spark, path)
    by_cust = snapshot_read(spark, path, ranges={"o_custkey": (lo_c, hi_c)})
    by_price = snapshot_read(
        spark, path, ranges={"o_totalprice": (lo_p, hi_p)}
    )
    assert len(by_cust.inputFiles()) < n_files
    assert len(by_price.inputFiles()) < n_files
    # pruning is sound: filtered row sets equal the unpruned scan's
    want_c = full.where(F.col("o_custkey").between(lo_c, hi_c)).count()
    got_c = by_cust.where(F.col("o_custkey").between(lo_c, hi_c)).count()
    assert got_c == want_c
    want_p = full.where(F.col("o_totalprice").between(lo_p, hi_p)).count()
    got_p = by_price.where(F.col("o_totalprice").between(lo_p, hi_p)).count()
    assert got_p == want_p
    # history intact: clustering is an overwrite commit, v0 still reads
    assert snapshot_read(spark, path, version=0).count() == orders.count()


def test_incremental_matview_equals_recompute(spark, sf_dir, tmp_path):
    """Aggregate materialized view maintained from the CDC feed must
    equal a from-scratch recompute after appends, an update merge, and
    a key-deleting merge — including view-row deletion when a key's
    maintained count reaches zero."""
    from crossfire_spark.sources.matview import (
        create_aggregate_view,
        refresh_aggregate_view,
    )
    from crossfire_spark.sources.snapshot import (
        _current_version,
        _read_manifest,
        snapshot_merge,
        snapshot_read,
        snapshot_write,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = str(tmp_path / "base")
    view = str(tmp_path / "view")
    first = orders.where(F.col("o_orderkey") % 2 == 0)
    snapshot_write(first, base)
    create_aggregate_view(
        spark, base, view, keys=["o_orderstatus"], measures=["o_totalprice"]
    )

    def check():
        # no round(2) masking: counts exact, sums within float
        # reduction-order noise (different plans add in different
        # orders; DELTA_TOLERANCE bounds any incremental residue)
        got = {
            r.o_orderstatus: (r._cnt, r.sum_o_totalprice)
            for r in snapshot_read(spark, view).collect()
        }
        want = {
            r.o_orderstatus: (r.c, r.s)
            for r in snapshot_read(spark, base)
            .groupBy("o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.sum("o_totalprice").alias("s"),
            )
            .collect()
        }
        assert got.keys() == want.keys(), (sorted(got), sorted(want))
        for k in want:
            assert got[k][0] == want[k][0], (k, got[k], want[k])
            assert abs(got[k][1] - want[k][1]) < 1e-6, (k, got[k], want[k])

    # append the other half -> refresh consumes one append commit
    snapshot_write(orders.where(F.col("o_orderkey") % 2 == 1), base)
    refresh_aggregate_view(spark, base, view)
    check()
    # update merge: change some prices (same keys)
    upd = orders.limit(50).withColumn("o_totalprice", F.lit(1.0))
    snapshot_merge(spark, upd, base, keys=["o_orderkey"])
    refresh_aggregate_view(spark, base, view)
    check()
    # delete an entire group via merge: rewrite every 'P' order into 'F'
    p_rows = snapshot_read(spark, base).where(F.col("o_orderstatus") == "P")
    if p_rows.count():
        flipped = p_rows.withColumn("o_orderstatus", F.lit("F"))
        snapshot_merge(spark, flipped, base, keys=["o_orderkey"])
        refresh_aggregate_view(spark, base, view)
        check()
        assert (
            snapshot_read(spark, view)
            .where(F.col("o_orderstatus") == "P")
            .count()
            == 0
        ), "zero-count key must be deleted from the view"
    # caught-up refresh is a no-op version-wise
    v = _current_version(view)
    assert refresh_aggregate_view(spark, base, view) == v
    assert _read_manifest(view, v)["properties"]["base_version"] == (
        _current_version(base)
    )


def test_load_table_normalizes_both_events_ts_encodings(spark, tmp_path):
    """The driver regenerates testdata between rounds and has shipped
    events.ts as BOTH parquet timestamp[ns] (read as nanosecond long
    under nanosAsLong) and µs timestamp[us] NTZ. load_table must
    surface a plain TIMESTAMP either way — watermarks reject NTZ and
    long breaks event-time ops."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pd.DataFrame(
        {
            "event_id": [1, 2],
            "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 01:00:00"]),
            "user_id": [10, 11],
            "event_type": ["click", "purchase"],
            "value": [1.0, 2.0],
            "props": ["{}", "{}"],
        }
    )
    for unit in ("us", "ns"):
        d = tmp_path / f"enc_{unit}"
        d.mkdir()
        tbl = pa.Table.from_pandas(base, preserve_index=False)
        idx = tbl.schema.get_field_index("ts")
        tbl = tbl.set_column(
            idx, "ts", tbl.column("ts").cast(pa.timestamp(unit))
        )
        pq.write_table(tbl, str(d / "events.parquet"))
        df = load_table(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp", (unit, df.dtypes)
        # value-preserving under the UTC session: µs instants match
        got = sorted(r.ts.isoformat() for r in df.select("ts").collect())
        assert got == ["2024-01-01T00:00:00", "2024-01-01T01:00:00"], got
        # event-time ops accept it (this is what broke: NTZ watermark)
        df.withWatermark("ts", "1 hour")


def test_snapshot_schema_diff(spark, sf_dir, tmp_path):
    """Additive evolution and overwrite-restated types surface in the
    manifest-only schema diff."""
    from pyspark.sql import functions as F

    from crossfire_spark.sources.snapshot import (
        snapshot_schema_diff,
        snapshot_write,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    path = str(tmp_path / "sd")
    v0 = snapshot_write(docs, path)
    v1 = snapshot_write(
        docs.withColumn("score", F.lit(1.5)), path, merge_schema=True
    )
    d01 = snapshot_schema_diff(path, v0, v1)
    assert [(x["column"], x["change"]) for x in d01] == [("score", "added")]
    v2 = snapshot_write(
        docs.withColumn("lang", F.lit(1).cast("int")), path, mode="overwrite"
    )
    d12 = snapshot_schema_diff(path, v1, v2)
    changes = {(x["column"], x["change"]) for x in d12}
    assert ("score", "removed") in changes
    assert ("lang", "type_changed") in changes
    assert snapshot_schema_diff(path, v2, v2) == []


def test_bucketed_upsert_equals_plain_upsert(spark, sf_dir, tmp_path):
    """The bucketed MERGE is a pure storage-layout change: replaying
    the same update sequence through upsert_table and
    upsert_table_bucketed must yield identical state (keys, values,
    precedence semantics)."""
    from crossfire_spark.sources.io import (
        read_state_table,
        upsert_table_bucketed,
    )

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    batches = [
        events.where(F.pmod("event_id", F.lit(3)) == i) for i in range(3)
    ]
    plain, bucketed = str(tmp_path / "plain"), str(tmp_path / "bucketed")
    from pyspark.sql import Window

    for b in batches:
        # key-unique per batch (deterministic newest-per-user),
        # newest-first precedence across batches
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        latest = (
            b.withColumn("__rn", F.row_number().over(w))
            .where("__rn = 1")
            .drop("__rn")
        )
        upsert_table(
            spark, latest, plain, keys=["user_id"],
            precedence=["ts", "event_id"],
        )
        upsert_table_bucketed(
            spark, latest, bucketed, keys=["user_id"],
            precedence=["ts", "event_id"], n_buckets=8,
        )
    a = sorted(map(tuple, read_table(spark, plain).collect()))
    b = sorted(map(tuple, read_state_table(spark, bucketed).collect()))
    assert a == b and len(a) > 0


def test_bucketed_upsert_rewrites_only_touched_buckets(
    spark, sf_dir, tmp_path
):
    """The 100 TB claim itself: a merge touching one key must leave
    every other bucket's data files byte-identical on disk (same
    inodes, same mtimes) — only the touched bucket is rewritten."""
    from crossfire_spark.sources.io import (
        BUCKET_COL,
        read_state_table,
        state_bucket_expr,
        upsert_table_bucketed,
    )

    users = load_table(spark, sf_dir, "events").select(
        "user_id", "value"
    ).dropDuplicates(["user_id"])
    path = str(tmp_path / "state")
    upsert_table_bucketed(spark, users, path, keys=["user_id"], n_buckets=8)

    def files(root):
        return {
            os.path.join(r, f): os.stat(os.path.join(r, f)).st_ino
            for r, _, fs in os.walk(root)
            for f in fs
            if not f.startswith((".", "_"))
        }

    before = files(path)
    uid = users.agg(F.min("user_id")).first()[0]
    one = users.where(F.col("user_id") == uid).withColumn(
        "value", F.lit(-1.0)
    )
    touched_bucket = (
        one.select(state_bucket_expr(["user_id"], 8).alias("b")).first().b
    )
    upsert_table_bucketed(spark, one, path, keys=["user_id"], n_buckets=8)
    after = files(path)
    touched_dir = os.path.join(path, f"{BUCKET_COL}={touched_bucket}")
    for p, ino in after.items():
        if p.startswith(touched_dir):
            assert p not in before or before[p] != ino, "touched not rewritten"
        else:
            assert before.get(p) == ino, f"untouched bucket rewritten: {p}"
    got = read_state_table(spark, path)
    assert got.where(F.col("user_id") == uid).first().value == -1.0
    assert got.count() == users.count()


def test_bucketed_upsert_crash_recovery(spark, sf_dir, tmp_path):
    """A crash between the per-bucket renames leaves a dot-prefixed
    backup and no live dir; the next merge/read must restore it, and
    partition discovery must never see the backup."""
    import shutil

    from crossfire_spark.sources.io import (
        _bucket_backup,
        _bucket_dir,
        read_state_table,
        upsert_table_bucketed,
    )

    users = load_table(spark, sf_dir, "events").select(
        "user_id", "value"
    ).dropDuplicates(["user_id"])
    path = str(tmp_path / "state")
    upsert_table_bucketed(spark, users, path, keys=["user_id"], n_buckets=4)
    n = read_state_table(spark, path).count()
    lives = [b for b in range(4) if os.path.isdir(_bucket_dir(path, b))]
    victim = lives[0]
    # crash window: bucket moved aside, staged version never landed
    os.rename(_bucket_dir(path, victim), _bucket_backup(path, victim))
    assert read_state_table(spark, path).count() == n
    assert os.path.isdir(_bucket_dir(path, victim))
    # stale backup next to a live bucket is garbage
    shutil.copytree(_bucket_dir(path, victim), _bucket_backup(path, victim))
    assert read_state_table(spark, path).count() == n
    assert not os.path.exists(_bucket_backup(path, victim))


def test_bucketed_upsert_bucket_keys_prefix(spark, sf_dir, tmp_path):
    """MERGE key (user_id, event_id) with bucket_keys=[user_id]: all
    of a user's rows land in one bucket, replace-by-full-key still
    holds, and other users' rows survive."""
    from crossfire_spark.sources.io import (
        BUCKET_COL,
        read_state_table,
        read_table as _rt,
        state_bucket_expr,
        upsert_table_bucketed,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    ).dropDuplicates(["user_id", "event_id"])
    path = str(tmp_path / "versions")
    upsert_table_bucketed(
        spark, ev, path, keys=["user_id", "event_id"],
        n_buckets=8, bucket_keys=["user_id"],
    )
    # every (user, bucket) pair is consistent with the user-only hash
    placed = _rt(spark, path).select(
        "user_id", F.col(BUCKET_COL).cast("long").alias("b")
    ).distinct()
    bad = placed.where(
        F.col("b") != state_bucket_expr(["user_id"], 8)
    ).count()
    assert bad == 0
    k0 = ev.orderBy("user_id", "event_id").first()
    one = ev.where(
        (F.col("user_id") == k0.user_id) & (F.col("event_id") == k0.event_id)
    )
    upd = one.withColumn("value", F.lit(-7.0))
    upsert_table_bucketed(
        spark, upd, path, keys=["user_id", "event_id"],
        n_buckets=8, bucket_keys=["user_id"],
    )
    got = read_state_table(spark, path)
    assert got.where(
        (F.col("user_id") == k0.user_id) & (F.col("event_id") == k0.event_id)
    ).first().value == -7.0
    assert got.count() == ev.count()
