#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Methodology (round-7 hygiene, after r6's 176-236 s host-noise swing):
- Each query runs $SPARK_GRAFT_BENCH_REPS (default 3) back-to-back
  timed reps; the reported per-query number is the MEDIAN.  Rep 1
  carries the one-time whole-stage-codegen compile for that plan
  shape, so it lands in the discarded max — no separate warmup pass
  is needed, and the median measures steady-state execution (what a
  production job sees: one plan compiled once, amortized over every
  partition).
- /proc/loadavg is sampled before and after the sweep and emitted so
  a noisy-host run is visible in the artifact instead of needing a
  forensic paragraph.
- The headline "value" is computed ONCE (sum of per-query medians)
  and reused verbatim in the detail line, the compact tail line, and
  BENCH_DETAIL.json, so the three can never disagree.
- Rep 1's one-time codegen compile lands in the discarded max only
  when REPS >= 3; with REPS < 3 one UNTIMED warmup rep runs first so
  a quick REPS=1 spot check still measures steady state. The emitted
  JSON carries "warmup_rep" so artifacts are self-describing.
- CALIBRATION ANCHOR BASKET (round-9, after r8 measured that the
  single-query anchor OVER-corrects: three identical-code runs read
  307/329/354 s raw — a 1.15x spread — but 692/471/819 normalized, a
  1.74x spread; one small query's latency does not linearly predict
  a 254-query suite). The r8 cpu anchor (10^7-row xxhash64 +
  mod-1024 group-agg) is kept verbatim as the basket's cpu component
  and still drives the anchor_before/after mid-run host-shift
  diagnostic, but "normalized_value" is now value / basket_sec over a
  THREE-shape basket (basket_sec was the mean of the BEFORE and AFTER
  sums in the first r9 design; see the r9b/r9c bullets below for what
  the validation runs forced), each component sized so timing noise
  is relatively small:
    * cpu    — the r8 anchor plan, unchanged (shuffle-heavy too:
               a 1024-group exchange over 10^7 rows);
    * scan   — full scan + filter + agg over a fixed 8M-row
               6-column parquet written once per process from
               spark.range (no SF dependence, byte-stable);
    * python — Arrow Python-worker round-trip: mapInPandas over 2M
               rows with a numpy transform, then an agg.
  The normalized series restarts at r9 — r8's single-anchor values
  are NOT comparable to it. Validation protocol (VERDICT r8 task 2):
  two back-to-back same-code runs must show a normalized-total ratio
  no further from 1.0 than the raw ratio; recorded in PERFORMANCE.md.
- MID-RUN SAMPLING (r9b, after the first r9 validation pair FAILED
  the protocol above: raw ratio 1.046 vs normalized 1.75 — a 2-point
  basket measures INSTANTANEOUS contention at the run's endpoints,
  while the 6-minute suite AVERAGES it; run 1's before-sample landed
  in a startup burst 2.4x its after-sample and poisoned the mean).
  The basket now also samples MID-RUN: one single-rep sum of the
  three components every ~n/5 queries (~1.5 s each, the process is
  fully warm). ``basket_sec`` is the MIN of all sample sums (before +
  mids + after): the fastest observed probe estimates the host's
  UNCONTENDED speed — contention is additive noise on top, and min is
  the standard microbenchmark estimator for exactly this reason. The
  r9b intermediate (median of samples) was also validated and also
  over-corrected (same-code raw 1.19x vs normalized 1.36x: a slower
  host inflates the suite all run long, but the median probe only
  sees the instants it lands on); the min design's validation pair is
  recorded in PERFORMANCE.md. ``normalized_basis`` = "basket_r9c".

Timing is end-to-end per query (plan + execute + noop-write); the
noop sink executes the FULL plan (count() would let Catalyst elide
final sorts) with zero sink cost.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crossfire_spark import get_spark  # noqa: E402
from crossfire_spark.registry import all_queries  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def _cpu_rep(spark) -> float:
    """One timed rep of the fixed CPU-bound anchor plan: 10^7 rows ->
    xxhash64 -> mod-1024 group count. No data files, no Python, one
    tiny shuffle — its cost tracks host CPU speed, not engine code."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(0, 10_000_000, 1, 32)
        .select(F.pmod(F.xxhash64("id"), F.lit(1024)).alias("b"))
        .groupBy("b")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0


def _anchor_sec(spark) -> float:
    _cpu_rep(spark)  # untimed: absorbs codegen + JIT at cold start
    return round(statistics.median(_cpu_rep(spark) for _ in range(3)), 4)


_SCAN_FIXTURE: list[str] = []  # one-per-process path memo


def _ensure_scan_fixture(spark) -> None:
    import tempfile

    from pyspark.sql import functions as F

    if not _SCAN_FIXTURE:
        path = os.path.join(
            tempfile.mkdtemp(prefix="bench_anchor_"), "scan8m"
        )
        (
            spark.range(0, 8_000_000, 1, 32)
            .select(
                "id",
                (F.col("id") % 977).alias("k"),
                (F.col("id") * 0.5).alias("x"),
                (F.col("id") % 13).cast("double").alias("y"),
                F.concat(F.lit("r"), F.col("id") % 10_000).alias("s"),
                (F.col("id") % 2 == 0).alias("flag"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
        _SCAN_FIXTURE.append(path)


def _scan_rep(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.read.parquet(_SCAN_FIXTURE[0])
        .where("flag AND k < 900")
        .groupBy("s")
        .agg(F.sum("x").alias("sx"), F.avg("y").alias("ay"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0


def _py_batch(it):
    import numpy as np
    import pandas as pd_mod

    for pdf in it:
        v = pdf["id"].to_numpy(dtype="float64")
        yield pd_mod.DataFrame({"z": np.sqrt(v) + np.log1p(v % 4096)})


def _python_rep(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(0, 2_000_000, 1, 32)
        .mapInPandas(_py_batch, "z double")
        .agg(F.sum("z"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0


def _basket_sec(spark) -> dict[str, float]:
    """Median-of-3 wall time for each basket component (see module
    docstring). Each plan is fixed-shape and engine-code-independent
    so its cost tracks the HOST (CPU, page cache / IO, Python worker
    fork+Arrow throughput), never the code under test."""
    _ensure_scan_fixture(spark)
    out: dict[str, float] = {}
    for name, fn in (("scan", _scan_rep), ("python", _python_rep)):
        fn(spark)  # untimed warm-up: codegen + (python) worker pool
        out[name] = round(
            statistics.median(fn(spark) for _ in range(3)), 4
        )
    return out


def _basket_sample(spark) -> float:
    """One single-rep sum of the three basket components — the
    MID-RUN sample (r9b). No warm-up rep and no median: mid-suite the
    process is fully warm, and the point is a cheap (~1.5 s) reading
    of the host's CURRENT contention to feed the cross-run median."""
    return round(
        _cpu_rep(spark) + _scan_rep(spark) + _python_rep(spark), 4
    )


def _loadavg() -> list[float] | None:
    try:
        with open("/proc/loadavg") as fh:
            return [float(x) for x in fh.read().split()[:3]]
    except (OSError, ValueError):
        return None


def main() -> None:
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(app_name="crossfire-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    load_before = _loadavg()
    anchor_before = _anchor_sec(spark)
    basket_before = _basket_sec(spark)
    warmup = REPS < 3

    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    mid_samples: list[float] = []
    names = sorted(qs)
    # ~4 mid-run basket samples, evenly spaced, never at the ends
    every = max(1, (len(names) + 4) // 5)
    for qi, name in enumerate(names):
        if qi > 0 and qi % every == 0:
            mid_samples.append(_basket_sample(spark))
        if warmup:
            try:
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:  # noqa: BLE001 — timed loop reports it
                pass
        reps: list[float] = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            try:
                df = qs[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                reps.append(round(time.perf_counter() - t0, 4))
            except Exception as exc:  # noqa: BLE001
                print(f"# bench error {name}: {exc}", file=sys.stderr)
                break
        if len(reps) == REPS:
            timings[name] = round(statistics.median(reps), 4)
            spreads[name] = [min(reps), max(reps)]
        else:
            timings[name] = -1.0

    anchor_after = _anchor_sec(spark)
    basket_after = _basket_sec(spark)
    load_after = _loadavg()
    ok = [v for v in timings.values() if v >= 0]
    total = round(sum(ok), 4)
    anchor = round((anchor_before + anchor_after) / 2.0, 4)
    # Basket normalization (r9c): cpu component = the anchor itself;
    # basket_sec = MIN of all sample sums — the before and after
    # median-of-3 endpoint samples plus the ~4 single-rep mid-run
    # samples (see module docstring: the 2-point mean AND the
    # median-of-samples both failed their same-code validation; the
    # min estimates the uncontended host speed, which is the
    # cross-round comparable quantity).
    bsum_before = round(anchor_before + sum(basket_before.values()), 4)
    bsum_after = round(anchor_after + sum(basket_after.values()), 4)
    all_samples = [bsum_before, *mid_samples, bsum_after]
    basket_sec = round(min(all_samples), 4)
    normalized = (
        round(total / basket_sec, 2) if basket_sec > 0 else None
    )
    full = {
        "metric": "total_query_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "reps": REPS,
        "rep_stat": "median",
        "warmup_rep": warmup,
        "anchor_sec": anchor,
        "anchor_before": anchor_before,
        "anchor_after": anchor_after,
        "basket_before": {"cpu": anchor_before, **basket_before},
        "basket_after": {"cpu": anchor_after, **basket_after},
        "basket_samples": all_samples,
        "basket_sec": basket_sec,
        "normalized_value": normalized,
        "normalized_basis": "basket_r9c",
        "spread_min_max": spreads,
        "load_before": load_before,
        "load_after": load_after,
    }
    # Detail line first (and a committed sidecar file), compact
    # headline LAST: the round driver records only the tail of stdout,
    # so the final line must be short enough to survive tail capture
    # whole — the full per-query dict outgrew it.
    print(json.dumps(full))
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
            "w",
        ) as fh:
            json.dump(full, fh)
    except OSError:
        pass  # read-only checkout: the stdout detail line still has it
    slowest = dict(
        sorted(
            ((k, round(v, 2)) for k, v in timings.items() if v >= 0),
            key=lambda kv: -kv[1],
        )[:10]
    )
    failed = {k: v for k, v in timings.items() if v < 0}
    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "n_failed": len(failed),
                "reps": REPS,
                "rep_stat": "median",
                "warmup_rep": warmup,
                "anchor_sec": anchor,
                "basket_sec": basket_sec,
                "normalized_value": normalized,
                "normalized_basis": "basket_r9c",
                "load_before": load_before,
                "load_after": load_after,
                "queries": {**slowest, **failed},
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
