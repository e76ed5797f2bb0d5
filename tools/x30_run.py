#!/usr/bin/env python
"""x30 (sf1-equivalent * 3) end-to-end runs for ANN and text-LM tiers
(VERDICT r9 task 4: extend >sf0.1 scale evidence beyond the dedup
family, which tools/sf1_dedup_run.py covered in r9).

Reuses the committed ``tools/scale_curve.py`` generator for the x30
fixture (150 000 docs / 60 000 vectors) and the VmHWM harness from
``tools/sf1_dedup_run.py``: each target runs END-TO-END once on a
fresh measurement window, recording wall time and the whole
local[*] JVM's high-water RSS — the HWM bounds every Spark-side
allocation including the broadcast ADC / centroid / model tables
whose sf1-scale size is exactly the cliff this run exists to catch.

Default targets:
- s20_ivf_pq_topk  (IVF-PQ query path: broadcast codebooks + ADC)
- s24_probe_recall_curve (probe sweep: per-tier conditional aggs)
- t38_stupid_backoff (trigram/bigram/unigram model build + scoring)

Usage:  python tools/x30_run.py [--skip-gen] [--targets a,b,c]
Prints a markdown block for PERFORMANCE.md + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
X30_DIR = os.path.join(REPO, "fixtures", "scale", "x30")

DEFAULT_TARGETS = (
    "s20_ivf_pq_topk",
    "s24_probe_recall_curve",
    "t38_stupid_backoff",
)


def _jvm_hwm_kib() -> int | None:
    """VmHWM of the (single) java child of this Python process tree."""
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/comm") as fh:
                if fh.read().strip() != "java":
                    continue
            with open(f"/proc/{pid}/stat") as fh:
                ppid = int(fh.read().split(")")[-1].split()[1])
            if ppid != me:
                continue
            with open(f"/proc/{pid}/status") as fh:
                for line in fh:
                    if line.startswith("VmHWM:"):
                        return int(line.split()[1])
        except (OSError, ValueError, IndexError):
            continue
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--targets", default=",".join(DEFAULT_TARGETS))
    args = ap.parse_args()

    if not args.skip_gen or not os.path.isdir(X30_DIR):
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from scale_curve import gen

        gen(scales=(30,))

    from crossfire_spark import get_spark
    from crossfire_spark.registry import all_queries

    spark = get_spark(app_name="crossfire-x30")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    results = {}
    for key in args.targets.split(","):
        hwm0 = _jvm_hwm_kib()
        t0 = time.perf_counter()
        df = qs[key](spark, X30_DIR)
        n = df.count()
        wall = round(time.perf_counter() - t0, 2)
        hwm1 = _jvm_hwm_kib()
        results[key] = {
            "rows": n,
            "wall_sec": wall,
            "jvm_hwm_gib_after": round(hwm1 / 1024 / 1024, 2) if hwm1 else None,
            "jvm_hwm_gib_before": round(hwm0 / 1024 / 1024, 2) if hwm0 else None,
        }
        print(f"{key}: {results[key]}", file=sys.stderr)

    lines = [
        "| query | rows out | wall (s) | JVM HWM before (GiB) | after |",
        "|---|---|---|---|---|",
    ]
    for k, r in results.items():
        lines.append(
            f"| {k} | {r['rows']} | {r['wall_sec']}"
            f" | {r['jvm_hwm_gib_before']} | {r['jvm_hwm_gib_after']} |"
        )
    print("\n".join(lines))
    print(json.dumps({"fixture": "x30 (150k docs / 60k vecs)", "results": results}))


if __name__ == "__main__":
    main()
