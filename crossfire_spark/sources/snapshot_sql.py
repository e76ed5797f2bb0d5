"""SQL front for the versioned snapshot table.

The snapshot engine (``sources.snapshot``) is programmatic; this
module gives it the SQL surface users of Delta/Iceberg expect,
translated onto the existing API — no second implementation of merge
or time travel, just parsing:

- ``SELECT ... FROM t [VERSION AS OF n] ...``  → ``snapshot_read``
  views (+ any Spark SQL around them; multiple tables and mixed
  versions in one statement are fine)
- ``MERGE INTO t USING s|(subquery) ON <equi-keys> WHEN ...``
  → ``snapshot_merge`` (upsert / delete / insert-only per the WHEN
  clauses)
- ``INSERT INTO | INSERT OVERWRITE t SELECT ...`` → ``snapshot_write``
- ``UPDATE t SET c = expr[, ...] [WHERE cond]`` and
  ``DELETE FROM t [WHERE cond]`` → copy-on-write rewrite of the head
  (read → apply → overwrite-commit, operation stamped on the
  manifest) — the Delta-style row-level DML forms
- ``DESCRIBE HISTORY t`` → ``snapshot_history`` as a DataFrame
- ``DESCRIBE DETAIL t`` → one row of head metadata (version, files,
  rows, partitioning, stats columns, constraints) with zero data IO
- ``SELECT ... FROM TABLE_CHANGES(t, from, to)`` → the CDC feed
  (``snapshot_changes``) as a SQL relation, composable with any SQL
- ``OPTIMIZE t [ZORDER BY (c1, c2)]`` → ``snapshot_compact`` /
  ``snapshot_cluster`` (the Delta OPTIMIZE maintenance verbs)
- ``VACUUM t [RETAIN n VERSIONS]`` → ``snapshot_expire`` (returns the
  number of data files deleted)
- ``ALTER TABLE t ADD CONSTRAINT name CHECK (expr)`` /
  ``ALTER TABLE t DROP CONSTRAINT name`` → table CHECK constraints
  (validated against head data on add; every later write/merge batch
  is validated before committing)

Dialect bounds (documented, validated): MERGE ON must be a
conjunction of ``t.k = s.k`` equalities (the snapshot merge is keyed,
like Delta's partition-pruned fast path); actions are
``UPDATE SET *`` / ``INSERT *`` / ``DELETE [AND cond]`` — the
row-level semantics ``snapshot_merge`` implements. Anything outside
the dialect raises ``ValueError`` with the unsupported fragment.

DDL/DML statements return the committed version (int); queries return
a DataFrame.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from crossfire_spark.sources.snapshot import (
    snapshot_history,
    snapshot_merge,
    snapshot_read,
    snapshot_write,
)

_MERGE_RE = re.compile(
    r"""(?isx)^\s*MERGE\s+INTO\s+(?P<target>\w+)
    (?:\s+(?:AS\s+)?(?P<talias>\w+))?
    \s+USING\s+(?:\((?P<subq>.+?)\)|(?P<source>\w+))
    (?:\s+(?:AS\s+)?(?P<salias>\w+))?
    \s+ON\s+(?P<on>.+?)
    (?P<clauses>\s+WHEN\s+.+)$""",
)
_WHEN_RE = re.compile(
    r"""(?isx)\s+WHEN\s+(?P<notm>NOT\s+)?MATCHED
    (?:\s+AND\s+(?P<cond>.+?))?
    \s+THEN\s+(?P<action>UPDATE\s+SET\s+\*|INSERT\s+\*|DELETE)""",
)
_INSERT_RE = re.compile(
    r"(?is)^\s*INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?P<target>\w+)\s+(?P<select>SELECT\s+.+)$"
)
_HISTORY_RE = re.compile(r"(?is)^\s*DESCRIBE\s+HISTORY\s+(?P<target>\w+)\s*$")
_DETAIL_RE = re.compile(r"(?is)^\s*DESCRIBE\s+DETAIL\s+(?P<target>\w+)\s*$")
_DELETE_RE = re.compile(
    r"(?is)^\s*DELETE\s+FROM\s+(?P<target>\w+)(?:\s+WHERE\s+(?P<cond>.+))?$"
)
_UPDATE_RE = re.compile(
    r"(?is)^\s*UPDATE\s+(?P<target>\w+)\s+SET\s+(?P<sets>.+?)"
    r"(?:\s+WHERE\s+(?P<cond>.+))?$"
)
_ADD_CON_RE = re.compile(
    r"(?is)^\s*ALTER\s+TABLE\s+(?P<target>\w+)\s+ADD\s+CONSTRAINT"
    r"\s+(?P<name>\w+)\s+CHECK\s*\((?P<expr>.+)\)\s*$"
)
_DROP_CON_RE = re.compile(
    r"(?is)^\s*ALTER\s+TABLE\s+(?P<target>\w+)\s+DROP\s+CONSTRAINT"
    r"\s+(?P<name>\w+)\s*$"
)
_COUNT_RE = re.compile(
    r"(?is)^\s*SELECT\s+COUNT\(\s*\*\s*\)(?:\s+(?:AS\s+)?(?P<alias>\w+))?"
    r"\s+FROM\s+(?P<target>\w+)"
    r"(?:\s+VERSION\s+AS\s+OF\s+(?P<ver>\d+))?\s*$"
)
_OPTIMIZE_RE = re.compile(
    r"(?is)^\s*OPTIMIZE\s+(?P<target>\w+)"
    r"(?:\s+ZORDER\s+BY\s+\((?P<cols>[^)]+)\))?\s*$"
)
_VACUUM_RE = re.compile(
    r"(?is)^\s*VACUUM\s+(?P<target>\w+)"
    r"(?:\s+RETAIN\s+(?P<keep>\d+)\s+VERSIONS)?\s*$"
)


def _parse_set_list(sets: str, columns: list[str]) -> dict[str, str]:
    """Parse ``c1 = e1, c2 = e2`` — split on top-level commas only
    (expressions may contain commas inside parentheses/quotes)."""
    out: dict[str, str] = {}
    depth = 0
    in_str: str | None = None
    parts, cur = [], []
    for ch in sets:
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch in "'\"":
            in_str = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    parts.append("".join(cur))
    for part in parts:
        if "=" not in part:
            raise ValueError(f"unsupported SET fragment: {part!r}")
        col, expr = part.split("=", 1)
        col = col.strip()
        if col not in columns:
            raise ValueError(f"UPDATE SET references unknown column {col!r}")
        out[col] = expr.strip()
    return out
_ON_EQ_RE = re.compile(r"(?i)^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$")


def _strip_alias(cond: str, aliases: list[str]) -> str:
    """Remove ``alias.`` prefixes so a WHEN ... AND condition can run
    against the bare source rows."""
    out = cond
    for a in aliases:
        if a:
            out = re.sub(rf"(?i)\b{re.escape(a)}\.", "", out)
    return out


def _merge_keys(on: str, target: list[str], source: list[str]) -> list[str]:
    """ON must be a conjunction of target.k = source.k equalities with
    matching column names — the keyed-merge contract."""
    keys = []
    for term in re.split(r"(?i)\s+AND\s+", on.strip()):
        m = _ON_EQ_RE.match(term)
        if not m:
            raise ValueError(f"unsupported MERGE ON term: {term!r}")
        a, ca, b, cb = m.groups()
        sides = {a.lower(): ca, b.lower(): cb}
        t = next((sides[x] for x in sides if x in target), None)
        s = next((sides[x] for x in sides if x in source), None)
        if t is None or s is None or t.lower() != s.lower():
            raise ValueError(
                f"MERGE ON must equate the same key on target and "
                f"source: {term!r}"
            )
        keys.append(t)
    return keys


def snapshot_sql(
    spark: SparkSession, sql: str, tables: dict[str, str]
) -> DataFrame | int:
    """Run one SQL statement against snapshot tables.

    ``tables`` maps statement table names → snapshot log paths; any
    other name in a query resolves through the normal Spark catalog
    (temp views etc.), so snapshot tables and regular views mix freely
    in one SELECT."""
    s = sql.strip().rstrip(";")

    m = _HISTORY_RE.match(s)
    if m:
        return spark.createDataFrame(
            [
                (
                    h["version"],
                    h["parent"],
                    h["operation"],
                    h["n_files"],
                    ",".join(h["partition_by"]),
                )
                for h in snapshot_history(tables[m.group("target")])
            ],
            "version int, parent int, operation string, n_files int,"
            " partition_by string",
        )

    m = _DETAIL_RE.match(s)
    if m:
        # one row of head-table metadata (the Delta DESCRIBE DETAIL
        # shape): everything answers from the manifest + row counts,
        # zero data IO.
        import json as _json

        from crossfire_spark.sources.snapshot import (
            _current_version,
            _read_manifest,
            snapshot_count,
        )

        path = tables[m.group("target")]
        v = _current_version(path)
        if v is None:
            raise FileNotFoundError(f"no snapshot log at {path}")
        man = _read_manifest(path, v)
        return spark.createDataFrame(
            [
                (
                    v,
                    len(man["files"]),
                    snapshot_count(path),
                    ",".join(man.get("partition_by", [])),
                    ",".join(man.get("stats_cols", [])),
                    _json.dumps(man.get("constraints", {}), sort_keys=True),
                )
            ],
            "version int, n_files int, n_rows long, partition_by string,"
            " stats_cols string, constraints string",
        )

    m = _ADD_CON_RE.match(s)
    if m:
        from crossfire_spark.sources.snapshot import snapshot_add_constraint

        return snapshot_add_constraint(
            spark, tables[m.group("target")], m.group("name"), m.group("expr")
        )

    m = _DROP_CON_RE.match(s)
    if m:
        from crossfire_spark.sources.snapshot import snapshot_drop_constraint

        return snapshot_drop_constraint(
            tables[m.group("target")], m.group("name")
        )

    m = _COUNT_RE.match(s)
    if m and m.group("target") in tables:
        # aggregate pushdown: a bare COUNT(*) never scans data — the
        # per-file row counts recorded at commit time answer it from
        # one manifest read (snapshot_count), at any table size.
        from crossfire_spark.sources.snapshot import snapshot_count

        ver = m.group("ver")
        n = snapshot_count(
            tables[m.group("target")],
            version=int(ver) if ver is not None else None,
        )
        alias = m.group("alias") or "count(1)"
        return spark.createDataFrame([(n,)], f"`{alias}` long")

    m = _OPTIMIZE_RE.match(s)
    if m:
        from crossfire_spark.sources.snapshot import (
            snapshot_cluster,
            snapshot_compact,
        )

        path = tables[m.group("target")]
        cols = m.group("cols")
        if cols:
            return snapshot_cluster(
                spark, path, [c.strip() for c in cols.split(",")]
            )
        return snapshot_compact(spark, path)

    m = _VACUUM_RE.match(s)
    if m:
        from crossfire_spark.sources.snapshot import snapshot_expire

        keep = int(m.group("keep") or 1)
        return snapshot_expire(tables[m.group("target")], keep_last=keep)

    m = _INSERT_RE.match(s)
    if m:
        df = spark.sql(m.group("select"))
        mode = "append" if m.group("mode").upper() == "INTO" else "overwrite"
        return snapshot_write(df, tables[m.group("target")], mode=mode)

    m = _DELETE_RE.match(s)
    if m:
        path = tables[m.group("target")]
        df = snapshot_read(spark, path)
        cond = m.group("cond")
        remaining = df.where(f"NOT ({cond})") if cond else df.limit(0)
        return snapshot_write(
            remaining, path, mode="overwrite", properties={"dml": "delete"}
        )

    m = _UPDATE_RE.match(s)
    if m:
        from pyspark.sql import functions as F

        path = tables[m.group("target")]
        df = snapshot_read(spark, path)
        cond = m.group("cond")
        assigns = _parse_set_list(m.group("sets"), df.columns)
        gate = F.expr(cond) if cond else F.lit(True)
        updated = df.withColumns(
            {
                c: F.when(gate, F.expr(e).cast(df.schema[c].dataType)).otherwise(
                    F.col(c)
                )
                for c, e in assigns.items()
            }
        )
        return snapshot_write(
            updated, path, mode="overwrite", properties={"dml": "update"}
        )

    m = _MERGE_RE.match(s)
    if m:
        return _run_merge(spark, m, tables)

    # TABLE_CHANGES(t, from, to) — the CDC feed as a SQL relation
    # (Delta's table_changes): bind the change rows to a temp view and
    # substitute its name, so the feed composes with any SQL around it.
    def bind_changes(mo: re.Match) -> str:
        from crossfire_spark.sources.snapshot import snapshot_changes

        name = mo.group("target")
        lo, hi = int(mo.group("lo")), int(mo.group("hi"))
        view = f"{name}__changes_{lo}_{hi}"
        snapshot_changes(
            spark, tables[name], from_version=lo, to_version=hi
        ).createOrReplaceTempView(view)
        return view

    s = re.sub(
        r"(?i)\bTABLE_CHANGES\s*\(\s*(?P<target>\w+)\s*,\s*(?P<lo>\d+)\s*,\s*(?P<hi>\d+)\s*\)",
        bind_changes,
        s,
    )

    # SELECT path: bind each snapshot table (at its requested version)
    # to a temp view, then let Spark SQL do the rest.
    for name, path in tables.items():
        pat = re.compile(
            rf"(?i)\b{re.escape(name)}\b(\s+VERSION\s+AS\s+OF\s+(\d+))?"
        )

        def bind(mo: re.Match, _name=name, _path=path) -> str:
            ver = mo.group(2)
            if ver is None:
                snapshot_read(spark, _path).createOrReplaceTempView(_name)
                return _name
            view = f"{_name}__v{ver}"
            snapshot_read(spark, _path, version=int(ver)).createOrReplaceTempView(view)
            return view

        s = pat.sub(bind, s)
    return spark.sql(s)


def _run_merge(spark: SparkSession, m: re.Match, tables: dict[str, str]) -> int:
    target = m.group("target")
    if target not in tables:
        raise ValueError(f"unknown snapshot table {target!r}")
    path = tables[target]
    talias = (m.group("talias") or target).lower()
    salias = (m.group("salias") or m.group("source") or "").lower()
    if m.group("subq"):
        source_df = spark.sql(m.group("subq"))
    elif m.group("source") in tables:
        source_df = snapshot_read(spark, tables[m.group("source")])
    else:
        source_df = spark.table(m.group("source"))

    clauses = list(_WHEN_RE.finditer(m.group("clauses")))
    consumed = _WHEN_RE.sub("", m.group("clauses")).strip()
    if not clauses or consumed:
        raise ValueError(
            f"unsupported MERGE clause fragment: {consumed or m.group('clauses')!r}"
        )
    keys = _merge_keys(
        m.group("on"), [talias, target.lower()], [salias] if salias else []
    )

    upsert = insert_only = False
    delete_cond: str | None = None
    has_delete = False
    for c in clauses:
        action = re.sub(r"\s+", " ", c.group("action").upper())
        if c.group("notm"):
            if action != "INSERT *":
                raise ValueError("WHEN NOT MATCHED supports INSERT * only")
            if c.group("cond"):
                raise ValueError("WHEN NOT MATCHED AND <cond> is unsupported")
            insert_only = True
        elif action == "UPDATE SET *":
            if c.group("cond"):
                raise ValueError("WHEN MATCHED AND <cond> UPDATE is unsupported")
            upsert = True
        elif action == "DELETE":
            has_delete = True
            delete_cond = c.group("cond")
        else:
            raise ValueError(f"unsupported MERGE action {action!r}")

    aliases = [a for a in {salias, talias} if a]
    delete_keys = None
    batch = source_df
    if has_delete:
        cond = _strip_alias(delete_cond, aliases) if delete_cond else None
        doomed = source_df.where(cond) if cond else source_df
        delete_keys = doomed.select(*keys).distinct()
        batch = source_df.join(delete_keys, keys, "left_anti")

    if upsert and insert_only:
        pass  # full upsert: batch rows replace matches and insert the rest
    elif upsert:
        # update-only: restrict the batch to keys already present
        batch = batch.join(
            snapshot_read(spark, path).select(*keys).distinct(), keys, "left_semi"
        )
    elif insert_only:
        # insert-only: restrict the batch to keys NOT present
        batch = batch.join(
            snapshot_read(spark, path).select(*keys).distinct(), keys, "left_anti"
        )
    elif not has_delete:
        raise ValueError("MERGE needs at least one WHEN clause")

    if not upsert and not insert_only and has_delete:
        # delete-only merge: empty batch, just the delete keys
        batch = batch.limit(0)
    return snapshot_merge(spark, batch, path, keys=keys, delete_keys=delete_keys)
