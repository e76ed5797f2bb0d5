"""crossfire_spark — a PySpark-native analytics engine.

A brand-new engine re-expressing the query and data-processing
capabilities of the reference repo (zizon/crossfire — an HDFS
cross-AZ block placement policy; see SURVEY.md) as idiomatic Spark:

- ``session``    — SparkSession factory with scale-oriented defaults.
- ``catalog``    — registers the driver testdata parquet as temp views
                   (handles the nanosecond-timestamp ``events`` table).
- ``operators``  — the declared relational query surface (SURVEY §2.12
                   Q01–Q31), each as a DataFrame builder + ANSI-SQL oracle.
- ``placement``  — the crossfire domain layer: placement verification,
                   deletion ranking, target selection re-expressed as
                   DataFrame logic over topology metadata tables.
- ``functions``  — text analysis, dedup (exact/MinHash/SimHash/ngram),
                   similarity search (cosine top-k, LSH), multimodal
                   column plumbing for LLM-data pipelines.
- ``streaming``  — Structured Streaming jobs over the events table.

Everything is DataFrame-first: logical plans are declared through the
DataFrame/SQL API and physical strategy is left to Catalyst + AQE.
"""

import os as _os

# Executor Python workers inherit PYTHONPATH from the JVM environment,
# not from the driver's sys.path — make sure any pickled-by-value
# closure that still references this package can resolve it on workers.
_repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_pp = _os.environ.get("PYTHONPATH", "")
if _repo_root not in _pp.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        f"{_repo_root}{_os.pathsep}{_pp}" if _pp else _repo_root
    )

from crossfire_spark.session import get_spark  # noqa: E402,F401

__version__ = "0.1.0"
