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
    # r8 rotation (VERDICT r7 task 1): the 16 slots with >=3 driver
    # hashes (q07 x6, q50 x5, j01/a01/r01 x4, s15/g08/h11/v11/v06/
    # t23/g05/a03/t13/s11/m04 x3) rotate OUT for 14 oracled keys the
    # driver has NEVER hashed plus the two new r8 recall audits
    # (rows-only, same-commit rotation discipline).
    # relational — q56 (grouping-sets tier) never driver-hashed
    "q56",
    # as-of extension — a02 never driver-hashed
    "a02_asof_forward",
    # dedup family: exact weighted tier + shared-span, never hashed;
    # d24/d13/d26 keep their single-hash continuity
    "d15_sparse_cosine", "d23_longest_shared_span",
    "d24_bloom_decontam", "d13_build_index",
    "d26_threshold_sweep",
    # r8 additions — every new operator enters the sample in the
    # round it ships (VERDICT r6 task 8); d27/d28 rows-only driver
    # check; h21/g13/t34 fully oracled (they displace their r7-hashed
    # unchanged twins h17/g12/v15)
    "d27_simhash_recall_audit", "d28_srp_recall_audit",
    "h21_holt_winters", "g13_weighted_shortest_path",
    "t34_token_budget_mix",
    # r8 late additions — same-commit rotation: v17/t35/st21 displace
    # their r7-hashed, since-unchanged twins v08/t10/st02
    "v17_mutual_information", "t35_shard_manifest",
    "st21_late_data_audit", "d29_lsh_param_planner",
    "t36_compression_quality", "d30_span_removal_plan",
    "st22_stateful_sessions",
    # round-7 additions keep one more round of hash continuity
    # (st19/st20 kept despite r7 hashes: their state store switched
    # to the bucketed MERGE this round — re-hash the new path)
    "s22_ivf_pq_residual",
    "st19_stream_cdc_apply",
    "h18_scd2_intervals", "st20_stream_scd2", "v16_ks_test",
    "h20_forecast_anomaly",
    # text pipeline — t24/t26 never driver-hashed; t10/t15/t18/t19
    # (first hashed r7) keep continuity
    "t24_ngram_novelty", "t26_sentence_dedup",
    "t15_split_assign", "t18_corpus_build",
    "t21_stratified_sample", "t33_tokenizer_fertility",
    # similarity / ANN — s09/s19 never driver-hashed
    "s09_pq_topk", "s19_hard_negatives", "s23_matryoshka_eval",
    # validation — v05/v12 never driver-hashed
    "v05_gopher_rules", "v12_fd_audit",
    # time-series / scalar-fn extensions
    # graph — g06 never driver-hashed; g04 stays
    "g06_labelprop_communities", "g04_kcore",
    # multimodal — m07 never driver-hashed; m10 keeps continuity
    "m07_image_neardup", "m10_image_patches",
    # placement domain
    "p01_verify_placement", "p04_verify_fast",
    # streaming — st09/st13 never driver-hashed; the 8 first hashed
    # in r7 keep continuity
    "st09_snapshot_merge_stream", "st13_stream_quality",
    "st03_session_window", "st05_stream_static",
    "st08_stream_dedup", "st12_stream_matview",
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
