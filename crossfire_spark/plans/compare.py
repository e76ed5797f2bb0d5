"""Result normalization for differential (oracle) testing.

Mirrors the driver's comparison: column-name-sorted, row-order
insensitive, value-level hash. Floats are canonicalized through a
fixed-precision repr so that e.g. numpy float64 vs python float vs
DuckDB DOUBLE compare equal; ints are canonicalized across widths;
timestamps to ISO strings. (SURVEY §5.2.1 — the oracle differential
harness replaces the reference's missing golden-file corpus; the
reference tests by scenario assertion, TestCrossAZBlockPlacementPolicy.java:111-218.)
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
from decimal import Decimal


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, (int,)):
        return f"i:{v}"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == int(v) and abs(v) < 1e15:
            return f"i:{int(v)}"  # 3.0 == 3 across engines
        return f"f:{v:.9g}"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return f"t:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "x:" + v.hex()
    # numpy scalars expose .item()
    item = getattr(v, "item", None)
    if item is not None:
        try:
            return _canon(v.item())
        except Exception:
            pass
    return f"s:{v}"


def normalize_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, canonicalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def value_hash(columns: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for row in normalize_rows(columns, rows):
        h.update("|".join(row).encode())
        h.update(b"\n")
    return h.hexdigest()


def results_match(
    spark_cols: list[str],
    spark_rows: list[tuple],
    oracle_cols: list[str],
    oracle_rows: list[tuple],
) -> tuple[bool, str]:
    """Compare two result sets; returns (match, reason)."""
    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in oracle_cols):
        return False, f"schema mismatch: {sorted(spark_cols)} vs {sorted(oracle_cols)}"
    if len(spark_rows) != len(oracle_rows):
        return False, f"row count {len(spark_rows)} vs {len(oracle_rows)}"
    a = normalize_rows([c.lower() for c in spark_cols], spark_rows)
    b = normalize_rows([c.lower() for c in oracle_cols], oracle_rows)
    if a != b:
        diff = next(
            (i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y
        )
        return False, f"value mismatch at sorted row {diff[0]}: {diff[1]} vs {diff[2]}"
    return True, "ok"
