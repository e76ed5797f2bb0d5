#!/usr/bin/env python
"""Amortized-query-path measurement for the s28 adaptive IVF-PQ rule.

The x30 end-to-end run (PERFORMANCE.md "s28_ivf_pq_adaptive — the
nlist fix, measured honestly") showed the adaptive rule LOSING the
single-shot race because the coarse assignment (N*nlist distances) is
paid every call. Its claimed payoff regime is build-once/query-many —
the split `build_ivf_pq_index`/`query_ivf_pq_index` already ships.
This tool measures exactly that claim: build BOTH indexes (fixed
16/4 and adaptive sqrt-N sizing) once each on the x30 fixture, then
time ONLY the query path against the persisted tables, median of
--reps. If the adaptive claim is real, the adaptive query wall must
come in well under the fixed one at equal |Q|.

Usage: python tools/adaptive_query_bench.py [--reps 3]
Prints a markdown block for PERFORMANCE.md + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
X30_DIR = os.path.join(REPO, "fixtures", "scale", "x30")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if not os.path.isdir(X30_DIR):
        raise SystemExit(
            f"{X30_DIR} missing — run `python tools/scale_curve.py gen` "
            "(x30 fixture is generator-reproducible, gitignored)"
        )

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "96g")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("adaptive-query-bench")
        .getOrCreate()
    )

    from crossfire_spark.catalog import load_table, spread
    from crossfire_spark.functions.ann_index import (
        build_ivf_pq_index,
        query_ivf_pq_index,
    )
    from crossfire_spark.functions.similarity import (
        IVF_CENTROIDS,
        IVF_PROBES,
        _query_set,
    )

    em = spread(load_table(spark, X30_DIR, "embeddings"))
    n = em.count()
    nlist_ad = max(IVF_CENTROIDS, math.ceil(4.0 * math.sqrt(float(n))))
    nprobe_ad = max(IVF_PROBES, math.ceil(math.sqrt(float(nlist_ad))))
    q = _query_set(em)
    nq = q.count()

    shapes = {
        "fixed": (IVF_CENTROIDS, IVF_PROBES),
        "adaptive": (nlist_ad, nprobe_ad),
    }
    out: dict[str, dict] = {"n_vectors": n, "n_queries": nq}
    root = tempfile.mkdtemp(prefix="adaptive_query_bench_")
    try:
        for name, (nlist, nprobe) in shapes.items():
            path = os.path.join(root, name)
            t0 = time.monotonic()
            build_ivf_pq_index(em, path, n_centroids=nlist)
            build_s = time.monotonic() - t0
            rows = query_ivf_pq_index(
                spark, path, em, q, n_probes=nprobe
            ).count()
            walls = []
            for _ in range(args.reps):
                t0 = time.monotonic()
                query_ivf_pq_index(
                    spark, path, em, q, n_probes=nprobe
                ).write.format("noop").mode("overwrite").save()
                walls.append(time.monotonic() - t0)
            out[name] = {
                "nlist": nlist,
                "nprobe": nprobe,
                "build_s": round(build_s, 2),
                "query_median_s": round(statistics.median(walls), 2),
                "query_walls": [round(w, 2) for w in walls],
                "rows": rows,
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print("| shape | nlist | nprobe | build (s) | query median (s) | rows |")
    print("|---|---|---|---|---|---|")
    for name in shapes:
        r = out[name]
        print(
            f"| {name} | {r['nlist']} | {r['nprobe']} | {r['build_s']} "
            f"| {r['query_median_s']} | {r['rows']} |"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
