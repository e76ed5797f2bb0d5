"""Text-analysis operators for LLM data pipelines (north-star
extension surface; graded alongside SURVEY §2).

Everything here is pure ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen-friendly, no Python UDFs — so the same plan
scales to a 100 TB documents table: each operator is a narrow
per-row projection (no shuffle at all until the final ORDER BY,
which exists only for oracle determinism).

Declared queries (each with an identical-formula DuckDB oracle):

- t01_langid      — marker-word language scoring (n-gram heuristic)
- t02_quality     — length/punctuation/stopword quality features
- t03_tokens      — whitespace + regex (BPE-ish) token counts
- t04_fingerprint — md5 content fingerprint + order-invariant
                    bag-of-words fingerprint
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crossfire_spark.catalog import load_table

# marker stopwords per language — the declared heuristic's fixed model
LANG_MARKERS = {
    "en": ("the", "a", "of", "and"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "y", "las"),
    "de": ("der", "die", "und", "das"),
}

_EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# BPE-ish tokenizer: runs of alphanumerics, or single non-space symbols
_TOKEN_RE = "[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]"


def _marker_count(col: str, markers: tuple[str, ...]) -> F.Column:
    inlist = ",".join(f"'{m}'" for m in markers)
    return F.expr(
        f"size(filter(split(lower({col}), ' '), w -> w IN ({inlist})))"
    )


def t01_langid(spark, sf_dir):
    """Language-ID heuristic: score each language by marker-word hits;
    predict the argmax (ties broken by fixed language order)."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        *[
            _marker_count("text", LANG_MARKERS[lang]).alias(f"s_{lang}")
            for lang in ("en", "fr", "es", "de")
        ],
    )
    pred = (
        F.when(
            (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_de")),
            F.lit("en"),
        )
        .when(
            (F.col("s_fr") >= F.col("s_es")) & (F.col("s_fr") >= F.col("s_de")),
            F.lit("fr"),
        )
        .when(F.col("s_es") >= F.col("s_de"), F.lit("es"))
        .otherwise(F.lit("de"))
    )
    return scored.withColumn("predicted", pred).orderBy(
        "doc_id", "s_en", "s_fr", "s_es", "s_de", "predicted"
    )


def t02_quality(spark, sf_dir):
    """Quality features: word count, average word length, punctuation
    ratio, stopword ratio, and a composite quality score."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), " ")
    n_words = F.size(words)
    n_punct = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), "[.,!?;:]", "")
    )
    inlist = ",".join(f"'{m}'" for m in _EN_STOPWORDS)
    n_stop = F.expr(f"size(filter(split(lower(text), ' '), w -> w IN ({inlist})))")
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(F.length("text") / n_words, 2).alias("avg_word_len"),
        F.round(n_punct / F.length("text"), 2).alias("punct_ratio"),
        F.round(n_stop / n_words, 2).alias("stop_ratio"),
        # Stabilized rounding: round to 6 dp first (collapses ~1e-16
        # cross-engine sum differences to one double), then nudge
        # +1e-9 off any exact .xx5 boundary — Spark ROUND goes through
        # decimal strings (0.575 -> 0.58) while DuckDB rounds the raw
        # binary (0.57499…9 -> 0.57); off-boundary they agree, and
        # non-boundary 6-dp multiples sit >= 1e-6 away so the nudge
        # can't flip them. (Both cases hit at sf0.1.)
        F.round(
            F.round(
                F.least(F.length("text") / 500.0, F.lit(1.0)) * 0.5
                + (1 - n_punct / F.length("text")) * 0.25
                + F.least(n_stop / n_words * 5.0, F.lit(1.0)) * 0.25,
                6,
            )
            + F.lit(1e-9),
            2,
        ).alias("quality"),
    ).orderBy("doc_id", "n_words", "avg_word_len", "punct_ratio", "stop_ratio", "quality")


def t03_tokens(spark, sf_dir):
    """Token counting: whitespace tokens, regex (BPE-ish) tokens,
    distinct-word count."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_TOKEN_RE), 0)).alias("re_tokens"),
        F.size(F.array_distinct(F.split(F.lower("text"), " "))).alias("distinct_words"),
    ).orderBy("doc_id", "ws_tokens", "re_tokens", "distinct_words")


def t04_fingerprint(spark, sf_dir):
    """Document fingerprinting: exact md5 of the lowered text plus an
    order-invariant bag-of-words fingerprint (md5 over the sorted
    distinct word list) — the primitive under shingle-free dedup."""
    d = load_table(spark, sf_dir, "documents")
    bag = F.concat_ws(
        " ", F.array_sort(F.array_distinct(F.split(F.lower("text"), " ")))
    )
    return d.select(
        "doc_id",
        F.md5(F.lower(F.col("text"))).alias("fp_exact"),
        F.md5(bag).alias("fp_bag"),
    ).orderBy("doc_id", "fp_exact", "fp_bag")


def _markers_sql(markers: tuple[str, ...]) -> str:
    inlist = ",".join(f"'{m}'" for m in markers)
    return f"len(list_filter(string_split(lower(text), ' '), w -> w IN ({inlist})))"


_STOP_SQL = _markers_sql(_EN_STOPWORDS)

TEXT_ORACLE_SQL: dict[str, str] = {
    "t01_langid": f"""
        SELECT doc_id,
               {_markers_sql(LANG_MARKERS['en'])} s_en,
               {_markers_sql(LANG_MARKERS['fr'])} s_fr,
               {_markers_sql(LANG_MARKERS['es'])} s_es,
               {_markers_sql(LANG_MARKERS['de'])} s_de,
               CASE WHEN {_markers_sql(LANG_MARKERS['en'])} >= {_markers_sql(LANG_MARKERS['fr'])}
                     AND {_markers_sql(LANG_MARKERS['en'])} >= {_markers_sql(LANG_MARKERS['es'])}
                     AND {_markers_sql(LANG_MARKERS['en'])} >= {_markers_sql(LANG_MARKERS['de'])} THEN 'en'
                    WHEN {_markers_sql(LANG_MARKERS['fr'])} >= {_markers_sql(LANG_MARKERS['es'])}
                     AND {_markers_sql(LANG_MARKERS['fr'])} >= {_markers_sql(LANG_MARKERS['de'])} THEN 'fr'
                    WHEN {_markers_sql(LANG_MARKERS['es'])} >= {_markers_sql(LANG_MARKERS['de'])} THEN 'es'
                    ELSE 'de' END predicted
        FROM documents ORDER BY doc_id, s_en, s_fr, s_es, s_de, predicted""",
    "t02_quality": f"""
        SELECT doc_id,
               len(string_split(lower(text), ' ')) n_words,
               ROUND(length(text) * 1.0 / len(string_split(lower(text), ' ')), 2) avg_word_len,
               ROUND((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / length(text), 2) punct_ratio,
               ROUND({_STOP_SQL} * 1.0 / len(string_split(lower(text), ' ')), 2) stop_ratio,
               ROUND(ROUND(LEAST(length(text) / 500.0, 1.0) * 0.5
                     + (1 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 1.0 / length(text)) * 0.25
                     + LEAST({_STOP_SQL} * 1.0 / len(string_split(lower(text), ' ')) * 5.0, 1.0) * 0.25, 6) + 1e-9, 2) quality
        FROM documents
        ORDER BY doc_id, n_words, avg_word_len, punct_ratio, stop_ratio, quality""",
    "t03_tokens": """
        SELECT doc_id,
               len(string_split(text, ' ')) ws_tokens,
               len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\\s]')) re_tokens,
               len(list_distinct(string_split(lower(text), ' '))) distinct_words
        FROM documents ORDER BY doc_id, ws_tokens, re_tokens, distinct_words""",
    "t04_fingerprint": """
        SELECT doc_id,
               md5(lower(text)) fp_exact,
               md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) fp_bag
        FROM documents ORDER BY doc_id, fp_exact, fp_bag""",
}

TEXT_QUERIES = {
    "t01_langid": t01_langid,
    "t02_quality": t02_quality,
    "t03_tokens": t03_tokens,
    "t04_fingerprint": t04_fingerprint,
}
