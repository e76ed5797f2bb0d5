"""Physical-plan shape assertions (the 100 TB discipline, SURVEY §4):
a correct answer with the wrong plan is a regression at scale, so the
plans themselves are under test.

- filters and column pruning must reach the parquet scan,
- dimension joins must broadcast (no shuffle of the fact table for
  nation/region/customer),
- aggregations must be two-phase (partial map-side combine),
- global top-k must be TakeOrderedAndProject (no full sort),
- the hot relational path must stay inside WholeStageCodegen.
"""

from __future__ import annotations

from crossfire_spark.operators.relational import (
    q01,
    q06,
    q10,
    q11,
    q18,
)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q01_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(q01(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "l_discount" in plan.split("PushedFilters")[1][:200]
    # only the 5 needed columns are read (3 output + 2 filter)
    read_schema = plan.split("ReadSchema")[1][:300]
    for col in ("l_orderkey", "l_linenumber", "l_quantity"):
        assert col in read_schema
    assert "l_extendedprice" not in read_schema, "column pruning failed"


def test_q11_broadcasts_dimensions(spark, sf_dir):
    plan = _plan(q11(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    # the one fact-fact join (lineitem x orders) may shuffle; the
    # dims must never force a fact-table shuffle join
    assert "CartesianProduct" not in plan


def test_q10_broadcast_join(spark, sf_dir):
    plan = _plan(q10(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q06_partial_aggregation(spark, sf_dir):
    plan = _plan(q06(spark, sf_dir))
    assert "HashAggregate" in plan
    # partial + final pairs: map-side combine before the shuffle
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan, "map-side combine missing"


def test_q18_take_ordered(spark, sf_dir):
    plan = _plan(q18(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, "global top-k must not full-sort"


def test_no_query_regresses_to_cartesian_or_row_python(spark, sf_dir):
    """Sweeping plan hygiene over every batch declared query: no
    accidental CartesianProduct (only q23 declares a cross join; the
    broadcast NLJ forms used by s01/r01 are fine) and no
    row-at-a-time Python UDF (BatchEvalPython) anywhere — Python is
    allowed only via Arrow (mapInPandas / applyInPandas)."""
    from crossfire_spark.registry import all_queries

    allowed_cartesian = {"q23"}
    streaming = {"st01", "st02", "st04", "st05", "st06"}  # plans not inspectable pre-run
    for name, fn in sorted(all_queries().items()):
        if name.split("_")[0] in streaming or name in streaming:
            continue
        df = fn(spark, sf_dir)
        plan = _plan(df)
        if name not in allowed_cartesian:
            assert "CartesianProduct" not in plan, f"{name} went cartesian"
        assert "BatchEvalPython" not in plan, f"{name} uses row-Python UDF"


def test_registry_contract_consistency():
    """Driver-contract invariants: every oracle key names a registered
    query, names are unique across families (dict merge would silently
    drop a collision), and every builder is callable. Pins the counts
    so an accidental unregistration shows up as a diff, not silence."""
    from crossfire_spark.registry import all_oracle_sql, all_queries

    qs, osql = all_queries(), all_oracle_sql()
    assert set(osql) <= set(qs), sorted(set(osql) - set(qs))
    assert all(callable(f) for f in qs.values())
    rows_only = sorted(set(qs) - set(osql))
    # rows-only set is a deliberate, reviewed list — additions must be
    # conscious (each needs a recall/metamorphic/determinism test).
    assert rows_only == [
        "d03_minhash_lsh",
        "d04_simhash",
        "d13_incremental_dedup",
        "d16_weighted_neardup",
        "d25_dedup_recall_audit",
        "d27_simhash_recall_audit",
        "d28_srp_recall_audit",
        "m11_goertzel_bands",
        "p02_deletion_drain",
        "p03_choose_targets",
        "s02_lsh_topk",
        "s16_ann_recall_audit",
        "s17_knn_graph_ann",
        "st14_index_maintenance",
        "t36_compression_quality",
        "v06_column_profile_approx",
        "v09_sketch_cardinality",
    ]
    assert len(qs) == 280 and len(osql) == 263


def test_q56_lateral_decorrelates_to_window(spark, sf_dir):
    """The correlated LATERAL ORDER BY/LIMIT subquery must plan as one
    ranked window over customer — never a per-outer-row re-execution
    or a cartesian."""
    from crossfire_spark.operators.relational import q56

    plan = _plan(q56(spark, sf_dir))
    assert "Window" in plan, plan[:1500]
    assert "CartesianProduct" not in plan


def test_t09_bm25_model_broadcasts_and_topk_is_take_ordered(spark, sf_dir):
    """BM25's IDF model must ride a broadcast join (the corpus side
    never shuffles for the model) and the top-20 must be TakeOrdered,
    not a global sort."""
    from crossfire_spark.functions.text import t09_bm25

    plan = _plan(t09_bm25(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:1500]
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_scan_counts_stay_bounded(spark, sf_dir):
    """Re-derived subplans appear as extra scans of the same source —
    the multi-pass hazard at 100 TB. Pin the ceilings for the queries
    that were specifically rewritten to be single-pass (the formatted
    plan under AQE lists each scan up to twice, so ceilings are 2x
    the logical pass count)."""
    from crossfire_spark.functions.dedup import d10_chunk_dedup
    from crossfire_spark.functions.text import t13_mixture_sample, t14_bigram_lm
    from crossfire_spark.operators.relational import q64

    for fn, max_scans in [
        (q64, 2),                # one shuffle, one scan
        (t13_mixture_sample, 2), # counts checkpointed; sampling scan only
        (t14_bigram_lm, 4),      # scoring instances + vocab
        (d10_chunk_dedup, 2),    # kernel materialized once
    ]:
        plan = _plan(fn(spark, sf_dir))
        n = plan.count("Scan parquet")
        assert n <= max_scans, f"{fn.__name__}: {n} scans > {max_scans}"


def test_s05_windows_fed_by_take_ordered(spark, sf_dir):
    """s05's two row_number windows are necessarily unpartitioned (a
    retriever rank is global), so the plan requirement is that each
    one consumes a TakeOrderedAndProject-capped candidate set (≤
    RRF_CAP rows), never the raw corpus: per-partition top-N, one
    tiny single-task rank. This pins the round-4 fix for the one
    declared query that funneled the full corpus through one task."""
    from crossfire_spark.functions.similarity import s05_hybrid_rrf

    plan = _plan(s05_hybrid_rrf(spark, sf_dir))
    lines = plan.splitlines()
    windows = [i for i, l in enumerate(lines) if "Window (" in l]
    assert len(windows) == 2, plan[:1500]
    for i in windows:
        assert "TakeOrderedAndProject" in lines[i + 1], (
            "Window input is not a TakeOrdered-capped set:\n"
            + "\n".join(lines[i : i + 3])
        )
