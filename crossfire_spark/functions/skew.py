"""Skew-handling primitives: salting for hot keys.

AQE's skew-join split (on by default in ``session.py``) handles most
runtime skew; these helpers are for the cases planners can't fix —
a groupBy where one key holds half the table, or a shuffle join
against a hot dimension key — the placement-time analog of the
reference's greedy anti-hotspot balancing
(``CrossAZBlockPlacementPolicy.java:641-656,688-705``).

- ``salted_agg``: two-phase aggregation. Phase 1 groups on
  (keys + salt) so a hot key's rows spread across ``n_salts``
  reducers; phase 2 re-combines partials per key. Supported partials
  (count/sum/min/max) compose associatively, so results are exactly
  the plain groupBy's.
- ``salted_join``: fact rows get a deterministic salt; the (small,
  skewed-key) build side is exploded ``n_salts`` times so every
  (key, salt) bucket finds its match. Row-multiplication happens only
  on the small side.

Salts are deterministic (hash of the row's own columns, not rand()),
so retried tasks produce identical output — a correctness requirement
under speculative execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIALS = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: output_name -> (fn, column) with fn in
    count/sum/min/max. Equivalent to
    ``df.groupBy(keys).agg(fn(column))`` for any data, skewed or not.
    """
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).alias("_salt")
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt")
    partial_cols = []
    final_cols = []
    for name, (fn, col) in aggs.items():
        if fn not in _PARTIALS:
            raise ValueError(f"unsupported agg {fn!r}")
        pfn, ffn = _PARTIALS[fn]
        partial_cols.append(pfn(col).alias(f"_p_{name}"))
        final_cols.append(ffn(f"_p_{name}").alias(name))
    return phase1.agg(*partial_cols).groupBy(*keys).agg(*final_cols)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: fact salted, dim replicated per salt.
    Result columns = fact's then dim's (minus the dup key), exactly
    like ``fact.join(dim, on, how)``.

    Only fact-preserving join types are supported: the dim side is
    replicated ``n_salts`` times, so right/full/left_anti would emit
    unmatched dim rows once per salt (or break anti semantics).
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "semi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi, not {how!r}: "
            "the dim side is replicated per salt, so unmatched dim rows "
            "would be duplicated"
        )
    f = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts))
    )
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, [on, "_salt"], how).drop("_salt")
