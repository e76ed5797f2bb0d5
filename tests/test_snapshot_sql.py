"""SQL front (sources.snapshot_sql) mirroring the programmatic
snapshot tests through SQL strings: MERGE INTO upsert/delete,
VERSION AS OF time travel, INSERT INTO/OVERWRITE, DESCRIBE HISTORY,
and dialect-bound error reporting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crossfire_spark.catalog import load_table
from crossfire_spark.sources.snapshot import snapshot_read, snapshot_write
from crossfire_spark.sources.snapshot_sql import snapshot_sql


@pytest.fixture()
def snap(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    path = str(tmp_path / "snap")
    snapshot_write(docs, path)
    return docs, path


def test_merge_sql_upsert(spark, snap):
    docs, path = snap
    upd = docs.limit(5).withColumn("text", F.lit("REDACTED"))
    ins = spark.createDataFrame(
        [(10_000_001, "en", "new doc a"), (10_000_002, "en", "new doc b")],
        schema=docs.schema,
    )
    upd.unionByName(ins).createOrReplaceTempView("batch")
    v = snapshot_sql(
        spark,
        """MERGE INTO t USING batch AS s ON t.doc_id = s.doc_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
        {"t": path},
    )
    assert v == 1
    head = snapshot_read(spark, path)
    assert head.count() == docs.count() + 2
    assert head.where(F.col("text") == "REDACTED").count() == 5


def test_merge_sql_update_only_and_insert_only(spark, snap):
    docs, path = snap
    n0 = docs.count()
    upd = docs.limit(3).withColumn("text", F.lit("U"))
    ins = spark.createDataFrame([(20_000_001, "en", "I")], schema=docs.schema)
    upd.unionByName(ins).createOrReplaceTempView("batch")
    # update-only: the unmatched row must NOT be inserted
    snapshot_sql(
        spark,
        "MERGE INTO t USING batch AS s ON t.doc_id = s.doc_id"
        " WHEN MATCHED THEN UPDATE SET *",
        {"t": path},
    )
    head = snapshot_read(spark, path)
    assert head.count() == n0
    assert head.where(F.col("text") == "U").count() == 3
    # insert-only: matched rows must NOT be updated
    upd2 = docs.limit(3).withColumn("text", F.lit("U2"))
    upd2.unionByName(ins).createOrReplaceTempView("batch")
    snapshot_sql(
        spark,
        "MERGE INTO t USING batch AS s ON t.doc_id = s.doc_id"
        " WHEN NOT MATCHED THEN INSERT *",
        {"t": path},
    )
    head = snapshot_read(spark, path)
    assert head.count() == n0 + 1
    assert head.where(F.col("text") == "U2").count() == 0
    assert head.where(F.col("doc_id") == 20_000_001).count() == 1


def test_merge_sql_delete_clause(spark, snap):
    docs, path = snap
    doomed = [r.doc_id for r in docs.limit(4).collect()]
    docs.where(F.col("doc_id").isin(doomed)).createOrReplaceTempView("batch")
    snapshot_sql(
        spark,
        "MERGE INTO t USING batch AS s ON t.doc_id = s.doc_id"
        " WHEN MATCHED THEN DELETE",
        {"t": path},
    )
    head = snapshot_read(spark, path)
    assert head.count() == docs.count() - 4
    assert head.where(F.col("doc_id").isin(doomed)).count() == 0


def test_merge_sql_conditional_delete_with_upsert(spark, snap):
    docs, path = snap
    batch = docs.limit(6).withColumn("text", F.lit("KEEP"))
    batch.createOrReplaceTempView("batch")
    ids = sorted(r.doc_id for r in batch.collect())
    cut = ids[2]
    snapshot_sql(
        spark,
        f"""MERGE INTO t USING batch AS s ON t.doc_id = s.doc_id
            WHEN MATCHED AND s.doc_id <= {cut} THEN DELETE
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED THEN INSERT *""",
        {"t": path},
    )
    head = snapshot_read(spark, path)
    assert head.where(F.col("doc_id").isin(ids[:3])).count() == 0
    assert head.where(F.col("text") == "KEEP").count() == 3


def test_select_version_as_of(spark, snap):
    docs, path = snap
    docs.limit(2).withColumn("text", F.lit("X")).createOrReplaceTempView("batch")
    snapshot_sql(
        spark,
        "MERGE INTO t USING batch AS s ON t.doc_id = s.doc_id"
        " WHEN MATCHED THEN UPDATE SET *",
        {"t": path},
    )
    old = snapshot_sql(
        spark,
        "SELECT COUNT(*) c FROM t VERSION AS OF 0 WHERE text = 'X'",
        {"t": path},
    ).first()["c"]
    new = snapshot_sql(
        spark, "SELECT COUNT(*) c FROM t WHERE text = 'X'", {"t": path}
    ).first()["c"]
    assert (old, new) == (0, 2)
    # mixed versions in one statement
    joined = snapshot_sql(
        spark,
        "SELECT COUNT(*) c FROM t VERSION AS OF 0 a JOIN t b USING (doc_id)",
        {"t": path},
    ).first()["c"]
    assert joined == docs.count()


def test_insert_and_history(spark, snap):
    docs, path = snap
    v = snapshot_sql(
        spark,
        "INSERT INTO t SELECT CAST(30000001 AS BIGINT) doc_id, 'en' lang, 'zzz' text",
        {"t": path},
    )
    assert v == 1
    assert snapshot_read(spark, path).count() == docs.count() + 1
    v = snapshot_sql(
        spark,
        "INSERT OVERWRITE t SELECT CAST(1 AS BIGINT) doc_id, 'en' lang, 'only' text",
        {"t": path},
    )
    assert snapshot_read(spark, path).count() == 1
    hist = snapshot_sql(spark, "DESCRIBE HISTORY t", {"t": path})
    ops = [r.operation for r in hist.orderBy("version").collect()]
    assert ops == ["append", "append", "overwrite"]


def test_dialect_bounds_raise(spark, snap):
    docs, path = snap
    docs.limit(1).createOrReplaceTempView("batch")
    with pytest.raises(ValueError, match="ON term"):
        snapshot_sql(
            spark,
            "MERGE INTO t USING batch AS s ON t.doc_id < s.doc_id"
            " WHEN MATCHED THEN UPDATE SET *",
            {"t": path},
        )
    with pytest.raises(ValueError, match="INSERT \\*"):
        snapshot_sql(
            spark,
            "MERGE INTO t USING batch AS s ON t.doc_id = s.doc_id"
            " WHEN NOT MATCHED THEN UPDATE SET *",
            {"t": path},
        )


def test_update_dml(spark, snap):
    docs, path = snap
    n0 = docs.count()
    v = snapshot_sql(
        spark,
        "UPDATE t SET text = upper(text), lang = 'xx' WHERE doc_id < 5",
        {"t": path},
    )
    assert v == 1
    head = snapshot_read(spark, path)
    assert head.count() == n0  # row-preserving
    changed = head.where(F.col("doc_id") < 5)
    assert changed.where(F.col("lang") != "xx").count() == 0
    assert changed.where(F.col("text") != F.upper(F.col("text"))).count() == 0
    untouched = head.where(F.col("doc_id") >= 5)
    assert untouched.where(F.col("lang") == "xx").count() == 0
    # history records the DML kind
    hist = snapshot_sql(spark, "DESCRIBE HISTORY t", {"t": path})
    assert hist.where(F.col("version") == 1).first().operation == "overwrite"


def test_update_set_list_with_commas_inside_exprs(spark, snap):
    docs, path = snap
    v = snapshot_sql(
        spark,
        "UPDATE t SET text = concat(lang, ':', text) WHERE doc_id = 1",
        {"t": path},
    )
    assert v == 1
    row = snapshot_read(spark, path).where(F.col("doc_id") == 1).first()
    assert row.text.startswith(row.lang + ":")


def test_delete_dml(spark, snap):
    docs, path = snap
    n0 = docs.count()
    n_en = docs.where(F.col("lang") == "en").count()
    v = snapshot_sql(spark, "DELETE FROM t WHERE lang = 'en'", {"t": path})
    assert v == 1
    head = snapshot_read(spark, path)
    assert head.count() == n0 - n_en
    assert head.where(F.col("lang") == "en").count() == 0
    # unconditional DELETE empties the table but keeps schema + history
    v2 = snapshot_sql(spark, "DELETE FROM t", {"t": path})
    assert v2 == 2
    head2 = snapshot_read(spark, path)
    assert head2.count() == 0
    assert head2.columns == docs.columns


def test_update_unknown_column_raises(spark, snap):
    docs, path = snap
    with pytest.raises(ValueError, match="unknown column"):
        snapshot_sql(spark, "UPDATE t SET nope = 1", {"t": path})


def test_optimize_and_vacuum_sql(spark, snap):
    import os

    from crossfire_spark.sources.snapshot import (
        _current_version,
        _read_manifest,
        snapshot_versions,
    )

    docs, path = snap
    n0 = docs.count()
    # a second commit so compaction has several files to merge
    snapshot_write(docs.limit(10), path)
    v = snapshot_sql(spark, "OPTIMIZE t", {"t": path})
    assert v == _current_version(path)
    head = _read_manifest(path, v)
    assert head["operation"] == "overwrite"
    assert snapshot_read(spark, path).count() == n0 + 10
    # vacuum to the head only: history collapses, data files shrink
    deleted = snapshot_sql(spark, "VACUUM t RETAIN 1 VERSIONS", {"t": path})
    assert deleted > 0
    assert snapshot_versions(path) == [v]
    assert snapshot_read(spark, path).count() == n0 + 10
    # the surviving files all exist
    for f in _read_manifest(path, v)["files"]:
        assert os.path.exists(os.path.join(path, f))


def test_optimize_zorder_sql(spark, snap):
    docs, path = snap
    v = snapshot_sql(spark, "OPTIMIZE t ZORDER BY (doc_id)", {"t": path})
    from crossfire_spark.sources.snapshot import _read_manifest

    m = _read_manifest(path, v)
    assert "doc_id" in m["stats_cols"]
    assert snapshot_read(spark, path).count() == docs.count()


def test_count_star_metadata_fast_path(spark, snap):
    docs, path = snap
    n0 = docs.count()
    out = snapshot_sql(spark, "SELECT COUNT(*) AS n FROM t", {"t": path})
    assert out.collect()[0]["n"] == n0
    snapshot_write(docs.limit(7), path)
    assert (
        snapshot_sql(spark, "SELECT COUNT(*) AS n FROM t", {"t": path})
        .collect()[0]["n"]
        == n0 + 7
    )
    # time travel still answers from the pinned manifest
    assert (
        snapshot_sql(
            spark, "SELECT COUNT(*) AS n FROM t VERSION AS OF 0", {"t": path}
        )
        .collect()[0]["n"]
        == n0
    )


def test_snapshot_count_partition_pruning(spark, snap, tmp_path):
    from crossfire_spark.sources.snapshot import snapshot_count

    docs, _ = snap
    path = str(tmp_path / "parted")
    snapshot_write(docs, path, partition_by=["lang"])
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    for lang in langs:
        assert snapshot_count(path, where={"lang": lang}) == docs.where(
            F.col("lang") == lang
        ).count()
    assert snapshot_count(path) == docs.count()


def test_check_constraints_lifecycle(spark, snap):
    import pytest as _pytest

    from crossfire_spark.sources.snapshot import (
        _current_version,
        _read_manifest,
        snapshot_merge,
    )

    docs, path = snap
    # add via SQL: validated against head data, metadata-only commit
    v = snapshot_sql(
        spark,
        "ALTER TABLE t ADD CONSTRAINT docid_nonneg CHECK (doc_id >= 0)",
        {"t": path},
    )
    m = _read_manifest(path, v)
    assert m["operation"] == "add_constraint"
    assert m["constraints"] == {"docid_nonneg": "doc_id >= 0"}
    # a conforming append carries the constraint forward
    ok = spark.createDataFrame([(30_000_001, "en", "fine")], schema=docs.schema)
    v2 = snapshot_write(ok, path)
    assert _read_manifest(path, v2)["constraints"] == {
        "docid_nonneg": "doc_id >= 0"
    }
    # a violating append must not commit anything
    bad = spark.createDataFrame([(-5, "en", "nope")], schema=docs.schema)
    with _pytest.raises(ValueError, match="docid_nonneg"):
        snapshot_write(bad, path)
    assert _current_version(path) == v2
    # a violating merge batch is rejected too
    with _pytest.raises(ValueError, match="docid_nonneg"):
        snapshot_merge(spark, bad, path, keys=["doc_id"])
    assert _current_version(path) == v2
    # NULL predicate result counts as a violation
    nullrow = spark.createDataFrame([(None, "en", "null id")], schema=docs.schema)
    with _pytest.raises(ValueError, match="docid_nonneg"):
        snapshot_write(nullrow, path)
    # adding a constraint the existing data violates must fail
    with _pytest.raises(ValueError, match="lang_en"):
        snapshot_sql(
            spark,
            "ALTER TABLE t ADD CONSTRAINT lang_en CHECK (lang = 'zz')",
            {"t": path},
        )
    # drop, then the formerly-bad append commits
    snapshot_sql(spark, "ALTER TABLE t DROP CONSTRAINT docid_nonneg", {"t": path})
    v3 = snapshot_write(bad, path)
    assert _read_manifest(path, v3)["constraints"] == {}


def test_count_fast_path_after_merge(spark, snap):
    from crossfire_spark.sources.snapshot import snapshot_count, snapshot_merge

    docs, path = snap
    n0 = docs.count()
    batch = docs.limit(3).withColumn("text", F.lit("M"))
    snapshot_merge(spark, batch, path, keys=["doc_id"])
    # merge commits now record file_rows: metadata count stays exact
    assert snapshot_count(path) == n0


def test_describe_detail(spark, snap):
    docs, path = snap
    snapshot_sql(
        spark,
        "ALTER TABLE t ADD CONSTRAINT pos CHECK (doc_id >= 0)",
        {"t": path},
    )
    row = snapshot_sql(spark, "DESCRIBE DETAIL t", {"t": path}).collect()[0]
    assert row["n_rows"] == docs.count()
    assert row["version"] >= 1
    assert "pos" in row["constraints"]


def test_constraints_survive_maintenance_and_gate_evolution(spark, snap):
    import pytest as _pytest

    from crossfire_spark.sources.snapshot import (
        _current_version,
        _read_manifest,
        snapshot_compact,
    )

    docs, path = snap
    snapshot_sql(
        spark,
        "ALTER TABLE t ADD CONSTRAINT pos CHECK (doc_id >= 0)",
        {"t": path},
    )
    # maintenance rewrites carry the constraint set forward
    snapshot_write(docs.limit(5), path)
    snapshot_compact(spark, path)
    m = _read_manifest(path, _current_version(path))
    assert m["constraints"] == {"pos": "doc_id >= 0"}
    # a violating append is still rejected after compaction
    bad = spark.createDataFrame([(-1, "en", "x")], schema=docs.schema)
    with _pytest.raises(ValueError, match="pos"):
        snapshot_write(bad, path)
    # an additive batch that drops the constrained column fails with
    # a clear message, not an opaque analysis error
    extra = spark.createDataFrame([("en", "y", 1.5)], "lang string, text string, extra double")
    with _pytest.raises(ValueError, match="constrained"):
        snapshot_write(extra, path, merge_schema=True)


def test_table_changes_sql(spark, snap):
    docs, path = snap
    snapshot_write(docs.limit(4).withColumn("text", F.lit("NEW")), path)
    out = snapshot_sql(
        spark,
        "SELECT _change_type, COUNT(*) n FROM TABLE_CHANGES(t, 0, 1) "
        "GROUP BY _change_type ORDER BY _change_type",
        {"t": path},
    ).collect()
    assert [(r["_change_type"], r["n"]) for r in out] == [("insert", 4)]
