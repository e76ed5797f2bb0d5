"""Plan utilities: result normalization for oracle comparison and
plan inspection helpers."""

from crossfire_spark.plans.compare import (  # noqa: F401
    normalize_rows,
    results_match,
    value_hash,
)
