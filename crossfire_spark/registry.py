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
    # r9 rotation (VERDICT r8 task 1). Ledger correction first
    # (ADVICE r8): the r8 comment understated its own rotation — the
    # full displaced set in r8 was SEVEN keys: v08, t10, st02 (as
    # stated) plus t19_token_stats, h19_forecast_backtest,
    # h09_lttb_downsample, st07_stream_upsert (displaced by
    # d29/t36/d30/st22).
    #
    # r9 rotation proper: 23 keys with >=2 driver hashes each and no
    # code change since their last hash rotate OUT —
    #   d24_bloom_decontam(x2) d13_build_index(x2)
    #   s22_ivf_pq_residual(x2) st19_stream_cdc_apply(x2)
    #   h18_scd2_intervals(x2) st20_stream_scd2(x2) v16_ks_test(x2)
    #   h20_forecast_anomaly(x2) t15_split_assign(x2)
    #   t18_corpus_build(x2) t21_stratified_sample(x3)
    #   t33_tokenizer_fertility(x2) s23_matryoshka_eval(x2)
    #   g04_kcore(x3) m10_image_patches(x2) p01_verify_placement(x4)
    #   p04_verify_fast(x4) st03_session_window(x2)
    #   st05_stream_static(x2) st08_stream_dedup(x2)
    #   st12_stream_matview(x2) st15_stream_anomaly(x2)
    #   st17_stream_funnel(x2)
    # — for 23 oracled keys the driver has NEVER hashed (r1-r8),
    # family-interleaved per the VERDICT r8 priority list. Keys first
    # hashed in r8 keep one round of continuity; d26 stays because
    # its rep-materialization changed this round (VERDICT r8 task 5)
    # and the new path needs a driver hash.
    #
    # relational — q61/q64/q65 never driver-hashed
    "q61", "q64", "q65",
    # as-of — a02 continuity
    "a02_asof_forward",
    # dedup — d14/d17/d19/d22 never hashed; d15/d23/d26-d30 stay
    "d14_containment", "d17_hashed_decontam",
    "d19_dedup_keep_best", "d22_anchor_positives",
    "d31_shard_leakage_audit",  # r9 addition, displaces d15
    "h23_sax_symbols",  # r9 addition, displaces d23 (1 r8 hash)
    "d26_threshold_sweep",
    "d27_simhash_recall_audit", "d28_srp_recall_audit",
    "d29_lsh_param_planner", "d30_span_removal_plan",
    # r9 additions enter the sample in their shipping round (r6 task
    # 8 discipline), each displacing a single-r8-hashed, unchanged
    # key: h22 displaces q56
    "h22_seasonal_decompose",
    # time-series / graph / text: late-r9 additions enter in their
    # shipping round (r6 task 8 discipline), each displacing a
    # single-r8-hashed, code-unchanged key — h24 displaces
    # h21_holt_winters (h22/h23 keep the family covered), t38
    # displaces t34_token_budget_mix, g14 displaces
    # g06_labelprop_communities (g14 recomputes g06's full
    # label-propagation chain as its input, so the displaced
    # computation stays driver-covered through g14)
    "h24_sax_motifs", "g13_weighted_shortest_path",
    "t38_stupid_backoff", "t35_shard_manifest",
    "t36_compression_quality",
    # validation — v13/v14 never hashed; v12 continuity; r9 addition
    # v18 displaces v05 (single r8 hash, unchanged); late-r9 addition
    # v19 displaces v17_mutual_information (single r8 hash, unchanged
    # — v19 recomputes v17's contingency + marginal chain as its
    # input, so the displaced computation stays driver-covered)
    "v13_split_drift", "v14_dup_label_consistency",
    "v18_spearman_audit", "v12_fd_audit", "v19_chi2_independence",
    # text — t25/t27/t28 never hashed; t26 continuity; r9 addition
    # t37 displaces t24 (single r8 hash, unchanged)
    # late-r9 additions m12/s25 enter in their shipping round: m12
    # displaces t26_sentence_dedup (single r8 hash, unchanged), s25
    # displaces s09_pq_topk (single r8 hash, unchanged — s25
    # recomputes s09's codebook+rounded-argmin assignment chain as
    # its input, so the displaced encode path stays driver-covered)
    "t25_heavy_hitters", "t27_zipf_fit", "t28_readability",
    "t37_vocab_coverage", "m12_phash_dct",
    # similarity / ANN — s12/s18/s20/s21 never hashed; r9 additions
    # s24 displaces s19 (single r8 hash, unchanged), s25 displaces s09
    "s12_range_search", "s18_density_clusters",
    "s20_ivf_pq_topk", "s21_ivf_pq_index",
    "s25_pq_distortion", "s24_probe_recall_curve",
    # graph — g10/g11 never hashed; g14 audits (and recomputes) g06
    "g10_assortativity", "g11_clustering_coefficient",
    "g14_modularity",
    # multimodal — m08/m09 never hashed; r9 addition m11 (rows-only
    # driver check, the d27/d28 mold) displaces m07 (single r8 hash,
    # unchanged)
    "m08_audio_neardup", "m09_audio_vad_trim", "m11_goertzel_bands",
    # streaming — st11/st16/st18 never hashed; st09/st13/st21/st22
    # continuity
    "st11_stream_pii", "st16_stream_topk",
    "st18_stream_interval_merge",
    "st09_snapshot_merge_stream", "st13_stream_quality",
    "st21_late_data_audit", "st22_stateful_sessions",
)


def _interleave(out: dict[str, Builder]) -> dict[str, Builder]:
    # A typo in the rotation prefix must FAIL LOUDLY, not silently
    # shrink the driver's 50-key correctness sample (ADVICE r9).
    missing = [k for k in _DRIVER_SAMPLE_PREFIX if k not in out]
    if missing:
        raise KeyError(
            f"_DRIVER_SAMPLE_PREFIX keys absent from registry: {missing}"
        )
    ordered: dict[str, Builder] = {}
    for k in _DRIVER_SAMPLE_PREFIX:
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
