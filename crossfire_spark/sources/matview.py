"""Incrementally-maintained aggregate materialized views.

``create_aggregate_view`` materializes ``SELECT keys, COUNT(*),
SUM(measure)... GROUP BY keys`` over a snapshot table into its own
snapshot table; ``refresh_aggregate_view`` advances it using only the
**CDC feed** (``snapshot_changes``) since the last processed base
version — the classic incremental view-maintenance algebra for
distributive aggregates:

- inserts contribute ``(+1, +measure)``, deletes ``(-1, -measure)``;
- the per-key delta aggregate is merged into the view (upsert), and
  keys whose maintained count reaches zero are **deleted** from it
  (``snapshot_merge(delete_keys=...)``);
- the base version each refresh has consumed is stamped on the view
  commit's manifest ``properties``, so refresh is idempotent and
  restartable — rerunning after a crash re-reads the same change
  range and converges to the same view.

Scale shape: a refresh touches O(changed rows) of the base — never
rescans it — plus O(touched keys) of the view; the copy-on-write
merge rewrites only view files containing touched keys. A 1-partition
append to a 100 TB base refreshes the view with one pass over the new
files. Copy-on-write file rewrites in the base stream survivor rows
as delete+insert pairs; their count deltas cancel exactly and their
sum deltas cancel to within float reduction-order noise, so the
refresh drops deltas under ``DELTA_TOLERANCE`` rather than
no-op-merging residue into the view.

COUNT and SUM are self-maintainable under insert+delete; MIN/MAX are
not (a deleted minimum forces a per-key rescan). Views created with
``minmax=[...]`` therefore refresh through ``_refresh_by_rescan``:
touched keys re-aggregate from the base head via one semi-joined scan
— the honest cost of the operation, paid only for the keys the change
range touched, while untouched view files carry over by reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crossfire_spark.sources.snapshot import (
    _current_version,
    _read_manifest,
    snapshot_changes,
    snapshot_merge,
    snapshot_read,
    snapshot_write,
)

_CNT = "_cnt"


def _aggregate(
    df: DataFrame,
    keys: list[str],
    measures: list[str],
    minmax: list[str] | None = None,
) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(_CNT),
        *[F.sum(c).alias(f"sum_{c}") for c in measures],
        *[g for c in (minmax or []) for g in (
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        )],
    )


def create_aggregate_view(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    keys: list[str],
    measures: list[str],
    minmax: list[str] | None = None,
) -> int:
    """Full build: one aggregation pass over the base head, stamped
    with the base version it represents.

    ``minmax`` columns maintain MIN/MAX alongside COUNT/SUM. They are
    NOT self-maintainable under deletes (a deleted minimum forces a
    rescan), so refreshes of a view with ``minmax`` recompute the
    *touched keys* from the base head — O(touched keys' rows), not a
    base rescan; the other keys' files still carry over untouched
    (see ``refresh_aggregate_view``)."""
    base_v = _current_version(base_path)
    if base_v is None:
        raise FileNotFoundError(f"no snapshot log at {base_path}")
    minmax = list(minmax or [])
    full = _aggregate(snapshot_read(spark, base_path), keys, measures, minmax)
    return snapshot_write(
        full,
        view_path,
        mode="overwrite",
        properties={
            "base_version": base_v,
            "keys": keys,
            "measures": measures,
            "minmax": minmax,
        },
    )


def _view_spec(
    view_path: str, view_v: int
) -> tuple[object, list[str], list[str], list[str]]:
    """(last base version, keys, measures, minmax) for the view head.
    These come from the manifest property stamp when present, else are
    inferred from the view schema itself (every column is either a
    key, ``_cnt``, ``sum_<m>``, ``min_<c>`` or ``max_<c>``) — so a
    maintenance commit that failed to carry the stamp (or a
    hand-written view) degrades to a rebuild, never a KeyError."""
    import json

    m = _read_manifest(view_path, view_v)
    props = m.get("properties", {})
    keys, measures = props.get("keys"), props.get("measures")
    minmax = props.get("minmax")
    if keys is None or measures is None:
        fields = [f["name"] for f in json.loads(m["schema"])["fields"]]
        agg_prefixes = ("sum_", "min_", "max_")
        keys = [
            c
            for c in fields
            if c != _CNT and not c.startswith(agg_prefixes)
        ]
        measures = [c[len("sum_"):] for c in fields if c.startswith("sum_")]
        minmax = [c[len("min_"):] for c in fields if c.startswith("min_")]
    return props.get("base_version"), keys, measures, list(minmax or [])


# Copy-on-write survivor delete+insert pairs *almost* cancel: the ±v
# doubles are identical but F.sum adds them in an order the engine
# does not pin, so untouched keys can carry ±epsilon residue. Deltas
# at or below this magnitude are noise, not data — dropping them keeps
# the merge to genuinely changed keys and stops drift accumulating in
# view sums across refreshes.
DELTA_TOLERANCE = 1e-6


def refresh_aggregate_view(
    spark: SparkSession, base_path: str, view_path: str
) -> int:
    """Advance the view to the base head using the CDC feed only.
    Returns the new view version (or the current one if already
    caught up). Falls back to a **full rebuild** when incremental
    maintenance is impossible: the base-version stamp is missing
    (e.g. a maintenance commit dropped it) or the stamped version has
    been expired from the base log."""
    view_v = _current_version(view_path)
    if view_v is None:
        raise FileNotFoundError(f"no view at {view_path}; create first")
    last, keys, measures, minmax = _view_spec(view_path, view_v)
    base_v = _current_version(base_path)
    if base_v == last:
        return view_v
    if last is None:
        return create_aggregate_view(
            spark, base_path, view_path, keys, measures, minmax
        )
    try:
        ch = snapshot_changes(
            spark, base_path, from_version=last, to_version=base_v
        )
    except ValueError:
        # stamped version no longer in the base log (expired): the CDC
        # range is gone, so rebuild from the head instead of failing
        return create_aggregate_view(
            spark, base_path, view_path, keys, measures, minmax
        )
    if minmax:
        return _refresh_by_rescan(
            spark, base_path, view_path, ch, keys, measures, minmax, base_v
        )
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = ch.groupBy(*keys).agg(
        F.sum(sign).alias("_d_cnt"),
        *[F.sum(sign * F.col(c)).alias(f"_d_{c}") for c in measures],
    )
    # survivor rows of copy-on-write file rewrites appear as
    # delete+insert pairs whose deltas cancel — to exactly 0 on the
    # count, to within float reduction-order noise on the sums. Drop
    # sub-tolerance deltas so the merge touches only genuinely changed
    # keys and residue never drifts into the view.
    nonzero = F.col("_d_cnt") != 0
    for c in measures:
        nonzero = nonzero | (F.abs(F.col(f"_d_{c}")) > DELTA_TOLERANCE)
    delta = delta.where(nonzero)

    cur = snapshot_read(spark, view_path).join(
        delta.select(*keys), keys, "left_semi"
    )
    joined = cur.join(delta, keys, "full_outer")
    new_cnt = F.coalesce(F.col(_CNT), F.lit(0)) + F.coalesce(
        F.col("_d_cnt"), F.lit(0)
    )
    # SQL SUM semantics: a key whose contributing values are all NULL
    # has sum NULL, not 0 — only coalesce when at least one side
    # actually carries a number.
    updated = joined.select(
        *keys,
        new_cnt.alias(_CNT),
        *[
            F.when(
                F.col(f"sum_{c}").isNull() & F.col(f"_d_{c}").isNull(),
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.coalesce(F.col(f"sum_{c}"), F.lit(0.0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0.0))
            )
            .alias(f"sum_{c}")
            for c in measures
        ],
    )
    upserts = updated.where(F.col(_CNT) > 0)
    deletes = updated.where(F.col(_CNT) <= 0).select(*keys)
    return snapshot_merge(
        spark,
        upserts,
        view_path,
        keys,
        delete_keys=deletes,
        properties={
            "base_version": base_v,
            "keys": keys,
            "measures": measures,
            "minmax": [],
        },
    )


def _refresh_by_rescan(
    spark: SparkSession,
    base_path: str,
    view_path: str,
    ch: DataFrame,
    keys: list[str],
    measures: list[str],
    minmax: list[str],
    base_v: int,
) -> int:
    """Refresh for views with non-self-maintainable aggregates
    (MIN/MAX): keys touched by the change range are re-aggregated from
    the base head (one semi-joined scan — O(touched keys' rows), the
    honest cost of a deleted minimum), untouched view files carry over
    by reference through the copy-on-write merge. Keys whose rows all
    vanished are deleted from the view."""
    touched = ch.select(*keys).distinct()
    recomputed = _aggregate(
        snapshot_read(spark, base_path).join(touched, keys, "left_semi"),
        keys,
        measures,
        minmax,
    )
    vanished = touched.join(recomputed.select(*keys), keys, "left_anti")
    return snapshot_merge(
        spark,
        recomputed,
        view_path,
        keys,
        delete_keys=vanished,
        properties={
            "base_version": base_v,
            "keys": keys,
            "measures": measures,
            "minmax": minmax,
        },
    )
