#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Timing is end-to-end per query (plan + execute + collect-to-count);
a warmup query first amortizes JVM/session startup out of the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crossfire_spark import get_spark  # noqa: E402
from crossfire_spark.registry import all_queries  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(app_name="crossfire-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()

    # Warmup strategy: each query runs once at the smallest SF
    # *immediately before* its timed run. Whole-stage codegen classes
    # are compiled per plan shape and cached in a fixed 100-entry LRU —
    # warming all ~100 queries and then timing all of them evicts every
    # entry between a query's warmup and its timed run (cyclic access
    # vs LRU = always miss), so the timed pass would re-pay 1-4 s of
    # janino compilation per wide plan. Warming per-query measures
    # steady-state execution, which is what a production job sees (one
    # plan compiled once, amortized over every partition). Streaming
    # queries also pre-pay their fixed state-store/query-setup costs in
    # the warmup run.
    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR

    timings: dict[str, float] = {}
    for name in sorted(qs):
        try:
            qs[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001,S110 — warmup only; timed run reports
            pass
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, SF_DIR)
            # noop write executes the FULL plan (count() would let
            # Catalyst elide final sorts) with zero sink cost.
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# bench error {name}: {exc}", file=sys.stderr)

    ok = [v for v in timings.values() if v >= 0]
    full = {
        "metric": "total_query_wall_time",
        "value": round(sum(ok), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
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
                "value": round(sum(ok), 4),
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "n_failed": len(failed),
                "queries": {**slowest, **failed},
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
