"""Exact SECOND-IMPLEMENTATION recompute pins for the two rows-only
placement entries p02_deletion_drain / p03_choose_targets (VERDICT r8
task 6: retire structure-only pins where feasible).

Until now these iterative ops were pinned by metamorphic tests
(delete-then-verify, choose-then-verify) and determinism checks but
never by an independent recomputation of the EXACT output. Here the
fixture tables are read through DuckDB (not the engine's loaders) and
the W2 drain / A6 greedy-choose semantics declared in
``placement/api.py`` (reference ``CrossAZBlockPlacementPolicy.java``
:294-362 drain, :587-721 choose) are re-derived in plain Python, then
compared row-for-row against the registry entries' Spark output.

The recompute deliberately shares no code with the engine: joins are
dict lookups, the per-round re-ranking is a fresh ``min`` over a
rebuilt Counter, and the greedy load tables are rebuilt from scratch
per block.
"""

from __future__ import annotations

import os
from collections import Counter

import duckdb
import pytest

FIXTURE_DIR = os.environ.get(
    "SPARK_GRAFT_FIXTURE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures", "topology"),
)


def _rows(name: str) -> list[tuple]:
    path = os.path.join(FIXTURE_DIR, f"{name}.parquet")
    return duckdb.sql(f"SELECT * FROM read_parquet('{path}')").fetchall()


@pytest.fixture(scope="module")
def topo_py():
    dn = {
        r[0]: {
            "datacenter": r[4],
            "rack": r[5],
            "alive": r[8],
            "decom": r[9],
            "stale": r[10],
            "xceiver": r[11],
        }
        for r in _rows("datanodes")
    }
    st = {
        r[0]: {
            "datanode_id": r[1],
            "state": r[2],
            "type": r[3],
            "remaining": r[6],
        }
        for r in _rows("storages")
    }
    replicas = [(r[0], r[2], r[3]) for r in _rows("replicas")]  # block, dn, sid
    cases = {r[0]: r[2] for r in _rows("placement_cases")}  # block -> required
    return dn, st, replicas, cases


def _recompute_drain(dn, st, replicas, keep=3):
    n_dcs = len({d["datacenter"] for d in dn.values()})
    eff_keep = min(4, keep) if n_dcs == 2 else keep
    per_block: dict[int, list[tuple]] = {}
    for block_id, node_id, sid in replicas:
        if sid not in st or node_id not in dn:
            continue  # inner joins in the engine drop these
        d = dn[node_id]
        s = st[sid]
        per_block.setdefault(block_id, []).append(
            (block_id, sid, node_id, s["state"], s["remaining"],
             d["datacenter"], d["rack"])
        )
    out = []
    for block_id, rows in per_block.items():
        if len(rows) <= eff_keep:
            continue
        rows = list(rows)
        rnd = 0
        while len(rows) > eff_keep:
            if all(r[3] == "FAILED" for r in rows):
                break
            rack_cnt = Counter((r[5], r[6]) for r in rows)
            dc_cnt = Counter(r[5] for r in rows)
            victim = min(
                rows,
                key=lambda r: (
                    0 if r[3] == "FAILED" else 1,
                    -rack_cnt[(r[5], r[6])],
                    -dc_cnt[r[5]],
                    r[4],
                    r[1],
                ),
            )
            out.append((block_id, rnd, victim[1], victim[2]))
            rows.remove(victim)
            rnd += 1
    return sorted(out)


def _recompute_choose(dn, st, replicas, cases, storage_type="SSD"):
    # candidate pool: healthy node x its single best NORMAL storage of
    # the demanded type (fixture has no remaining ties — asserted).
    best: dict[int, tuple] = {}
    for sid, s in st.items():
        if s["state"] != "NORMAL" or s["type"] != storage_type:
            continue
        node = s["datanode_id"]
        prev = best.get(node)
        if prev is not None:
            assert s["remaining"] != prev[1], f"remaining tie on node {node}"
        if prev is None or s["remaining"] > prev[1]:
            best[node] = (sid, s["remaining"])
    candidates = []
    for node_id in sorted(dn):
        d = dn[node_id]
        if not d["alive"] or d["decom"] or d["stale"] or node_id not in best:
            continue
        sid, rem = best[node_id]
        candidates.append(
            (node_id, d["datacenter"], d["rack"], d["xceiver"], sid, rem)
        )

    current = Counter(b for b, _, _ in replicas)
    existing: dict[int, list[tuple]] = {}
    for block_id, node_id, _sid in replicas:
        d = dn[node_id]
        existing.setdefault(block_id, []).append(
            (node_id, d["datacenter"], d["rack"])
        )

    out = []
    for block_id, required in cases.items():
        additional = required - current.get(block_id, 0)
        if additional <= 0:
            continue
        ex = existing.get(block_id, [])
        used = {r[0] for r in ex}
        dc_load: Counter = Counter(r[1] for r in ex)
        rack_load: Counter = Counter((r[1], r[2]) for r in ex)
        pool = [c for c in candidates if c[0] not in used]
        for slot in range(additional):
            if not pool:
                break
            dcs = {c[1] for c in pool}
            dc = min(dcs, key=lambda d_: (dc_load.get(d_, 0), d_))
            in_dc = [c for c in pool if c[1] == dc]
            racks = {c[2] for c in in_dc}
            rack = min(racks, key=lambda rk: (rack_load.get((dc, rk), 0), rk))
            in_rack = [c for c in in_dc if c[2] == rack]
            pick = min(in_rack, key=lambda c: (-c[5], c[3], c[0]))
            out.append((block_id, slot, pick[0], pick[4]))
            dc_load[dc] += 1
            rack_load[(dc, rack)] += 1
            pool = [c for c in pool if c[0] != pick[0]]
    return sorted(out)


def test_p02_deletion_drain_exact_recompute(spark, sf_dir, topo_py):
    from crossfire_spark.placement.queries import p02_deletion_drain

    dn, st, replicas, _ = topo_py
    expected = _recompute_drain(dn, st, replicas, keep=3)
    got = sorted(
        (r.block_id, r["round"], r.storage_id, r.datanode_id)
        for r in p02_deletion_drain(spark, sf_dir).collect()
    )
    assert got == expected


def test_p03_choose_targets_exact_recompute(spark, sf_dir, topo_py):
    from crossfire_spark.placement.queries import p03_choose_targets

    dn, st, replicas, cases = topo_py
    expected = _recompute_choose(dn, st, replicas, cases)
    got = sorted(
        (r.block_id, r.slot, r.datanode_id, r.storage_id)
        for r in p03_choose_targets(spark, sf_dir).collect()
    )
    assert got == expected
