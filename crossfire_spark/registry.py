"""Central registry assembling every implemented query/operator into
the driver contract: ``queries()`` and ``oracle_sql()``.

Families:
- relational Q01–Q27 (operators.relational)
- crossfire placement domain Q28–Q31 (placement.queries)
- LLM-pipeline extensions: dedup / text analysis / similarity
  (functions.dedup, functions.text, functions.similarity)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

# The round driver's hard correctness gate samples the FIRST 50
# registry keys; a purely family-ordered dict would spend all 50 on
# relational queries and never oracle-check dedup/text/similarity/
# time-series/graph/multimodal/placement/streaming. This priority
# prefix interleaves every family (each key oracle-backed) so the
# driver's sample spans the whole engine; remaining keys follow in
# family order.
_DRIVER_SAMPLE_PREFIX = (
    # relational core — r7 rotation: q01/q03/q05 (driver-green since
    # r1) and q08/q09 (checked r6) rotate OUT; q07 stays for
    # continuity
    "q07",
    # round-5 session-4 additions (kNN graph, bipartite projection,
    # seasonality, Benford) — fresher driver signal than more q's
    "s15_knn_graph", "g08_bipartite_projection",
    "h11_seasonality", "v11_benford_report",
    # dedup family (r7: d01/d02/d06 driver-green -> d13_build_index,
    # never driver-checked; d07/d11 green since r2 -> r7 additions)
    "d24_bloom_decontam", "d13_build_index",
    "d26_threshold_sweep",
    # round-7 additions — every new oracled operator enters the
    # sample in the round it ships (VERDICT r6 task 8)
    "s22_ivf_pq_residual", "v15_profile_drift_gate", "h17_holt_linear",
    "st19_stream_cdc_apply", "g12_harmonic_centrality",
    "h18_scd2_intervals", "st20_stream_scd2", "v16_ks_test",
    # round-5 families: anomaly, profile, DSIR, link prediction, as-of
    "h20_forecast_anomaly", "v06_column_profile", "t23_dsir_weights",
    "g05_link_prediction", "a03_asof_nearest",
    # text pipeline (r7: t01/t03 driver-green -> t10/t15/t18, the
    # last never-driver-checked text keys)
    "t10_pii_scrub", "t15_split_assign", "t18_corpus_build",
    "t19_token_stats",
    "t21_stratified_sample", "q50", "t33_tokenizer_fertility",
    "t13_mixture_sample",
    # similarity / ANN (r7: s01/s03 driver-green since r3 rotate out)
    "s23_matryoshka_eval", "s11_filtered_topk",
    # time-series / validation / scalar-fn / join extensions
    # (r7: h05/v01 green since r1-r2 rotate out for the new ops)
    "h19_forecast_backtest", "h09_lttb_downsample",
    "v08_referential_integrity",
    "j01_json_extract", "a01_asof_join", "r01_range_join",
    # graph (r7: g01 green since r2 -> g12; g04 stays)
    "g04_kcore",
    # multimodal
    "m04_image_decode", "m10_image_patches",
    # placement domain
    "p01_verify_placement", "p04_verify_fast",
    # streaming — r7 rotation target: the st family is the last
    # driver-hash blind spot (VERDICT r6 item 1).  8 never-checked
    # st keys in; st01/st04/st06 (driver-green r5/r6) rotate out.
    "st02_stream_sliding", "st03_session_window", "st05_stream_static",
    "st07_stream_upsert", "st08_stream_dedup", "st12_stream_matview",
    "st15_stream_anomaly", "st17_stream_funnel",
)


def _interleave(out: dict[str, Builder]) -> dict[str, Builder]:
    ordered: dict[str, Builder] = {}
    for k in _DRIVER_SAMPLE_PREFIX:
        if k in out:
            ordered[k] = out[k]
    for k, v in out.items():
        if k not in ordered:
            ordered[k] = v
    return ordered


def all_queries() -> dict[str, Builder]:
    from crossfire_spark.operators.relational import RELATIONAL_QUERIES

    out: dict[str, Builder] = dict(RELATIONAL_QUERIES)

    try:
        from crossfire_spark.operators.asof import ASOF_QUERIES

        out.update(ASOF_QUERIES)
    except ImportError:
        pass
    try:
        from crossfire_spark.operators.extended import EXTENDED_QUERIES

        out.update(EXTENDED_QUERIES)
    except ImportError:
        pass

    try:
        from crossfire_spark.placement.queries import PLACEMENT_QUERIES

        out.update(PLACEMENT_QUERIES)
    except ImportError:
        pass
    try:
        from crossfire_spark.functions.dedup import DEDUP_QUERIES

        out.update(DEDUP_QUERIES)
    except ImportError:
        pass
    try:
        from crossfire_spark.functions.text import TEXT_QUERIES

        out.update(TEXT_QUERIES)
    except ImportError:
        pass
    try:
        from crossfire_spark.functions.similarity import SIMILARITY_QUERIES

        out.update(SIMILARITY_QUERIES)
    except ImportError:
        pass
    try:
        from crossfire_spark.functions.multimodal import MULTIMODAL_QUERIES

        out.update(MULTIMODAL_QUERIES)
    except ImportError:
        pass
    try:
        from crossfire_spark.functions.ann_index import ANN_INDEX_QUERIES

        out.update(ANN_INDEX_QUERIES)
    except ImportError:
        pass
    try:
        from crossfire_spark.streaming.jobs import STREAMING_QUERIES

        out.update(STREAMING_QUERIES)
    except ImportError:
        pass
    try:
        from crossfire_spark.streaming.stateful import STATEFUL_QUERIES

        out.update(STATEFUL_QUERIES)
    except ImportError:
        pass
    try:
        from crossfire_spark.streaming.joins import STREAM_JOIN_QUERIES

        out.update(STREAM_JOIN_QUERIES)
    except ImportError:
        pass
    try:
        from crossfire_spark.functions.graph import GRAPH_QUERIES

        out.update(GRAPH_QUERIES)
    except ImportError:
        pass
    return _interleave(out)


def all_oracle_sql() -> dict[str, str]:
    from crossfire_spark.operators.relational import ORACLE_SQL

    out: dict[str, str] = dict(ORACLE_SQL)

    try:
        from crossfire_spark.operators.asof import ASOF_ORACLE_SQL

        out.update(ASOF_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from crossfire_spark.operators.extended import EXTENDED_ORACLE_SQL

        out.update(EXTENDED_ORACLE_SQL)
    except ImportError:
        pass

    try:
        from crossfire_spark.placement.queries import PLACEMENT_ORACLE_SQL

        out.update(PLACEMENT_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from crossfire_spark.functions.dedup import DEDUP_ORACLE_SQL

        out.update(DEDUP_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from crossfire_spark.functions.text import TEXT_ORACLE_SQL

        out.update(TEXT_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from crossfire_spark.functions.similarity import SIMILARITY_ORACLE_SQL

        out.update(SIMILARITY_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from crossfire_spark.functions.multimodal import MULTIMODAL_ORACLE_SQL

        out.update(MULTIMODAL_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from crossfire_spark.functions.ann_index import ANN_INDEX_ORACLE_SQL

        out.update(ANN_INDEX_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from crossfire_spark.streaming.jobs import STREAMING_ORACLE_SQL

        out.update(STREAMING_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from crossfire_spark.streaming.stateful import STATEFUL_ORACLE_SQL

        out.update(STATEFUL_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from crossfire_spark.streaming.joins import STREAM_JOIN_ORACLE_SQL

        out.update(STREAM_JOIN_ORACLE_SQL)
    except ImportError:
        pass
    try:
        from crossfire_spark.functions.graph import GRAPH_ORACLE_SQL

        out.update(GRAPH_ORACLE_SQL)
    except ImportError:
        pass
    return out
