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
    return out


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
