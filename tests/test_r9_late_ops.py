"""Second-implementation pins for the late-round-9 operators.

Both m12 and t38 are fully oracled (closed-form cluster equivalence /
full SQL replay), so these tests exist for FAILURE LOCALITY: when the
sweep reddens, a kernel-level pin says which stage broke.

- m12: the pHash kernel's two construction properties — brightness
  invariance (uniform offsets move only the excluded DC coefficient)
  and pattern distinctness — asserted directly on the Arrow kernel's
  output, plus an independent plain-numpy recompute of the hash for a
  handful of images (scipy-free DCT re-derived from the closed form,
  sharing no code with the engine kernel).
- t38: the Stupid Backoff cascade re-derived in plain Python (dict
  counts, no Spark/DuckDB) on a tiny hand-built corpus where every
  backoff level genuinely fires, compared row-for-row.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest


# ------------------------------------------------------------- m12


@pytest.fixture(scope="module")
def phash_rows(spark):
    from crossfire_spark.functions.multimodal import (
        phash_images,
        synthesize_gradient_images,
    )

    # doc_ids chosen so ALL 50 patterns appear at 3 brightness
    # offsets (pattern = id % 50, brightness = (id // 50) % 55) —
    # the m12 oracle's GROUP BY doc_id % 50 relies on all 50 base
    # patterns hashing distinctly (ADVICE r9: pin that property for
    # the full pattern set, not a 5-pattern sample)
    ids = [p + 50 * b for p in range(50) for b in (0, 7, 31)]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = phash_images(synthesize_gradient_images(docs)).collect()
    return {r["media_id"]: r["ph"] for r in rows}


def test_m12_brightness_invariance_and_distinctness(phash_rows):
    by_pattern: dict[int, set[str]] = {}
    for mid, ph in phash_rows.items():
        by_pattern.setdefault(mid % 50, set()).add(ph)
    # every brightness variant of a pattern hashes identically
    for p, hs in by_pattern.items():
        assert len(hs) == 1, f"pattern {p} split across brightness: {hs}"
    # distinct patterns hash distinctly
    all_h = [next(iter(h)) for h in by_pattern.values()]
    assert len(set(all_h)) == len(all_h)


def test_m12_recompute_from_closed_form(phash_rows):
    """Plain-numpy pHash recompute sharing no code with the kernel:
    the PPM render, resize and DCT are re-derived from their closed
    forms (legacy MT19937 pattern + brightness, nearest-index resize,
    explicit double cosine sum for a few probed coefficients is too
    slow — use the matmul identity but with independently built
    basis/ordering)."""
    from crossfire_spark.functions.multimodal import PHASH_LOW, PHASH_N

    n = PHASH_N
    for mid in sorted(phash_rows)[:6]:
        p, bright = mid % 50, (mid // 50) % 55
        base = np.random.RandomState(int(p)).randint(0, 200, size=(12, 16))
        gray = (base + bright).astype(np.uint8)
        # gray mean of 3 identical channels == the channel itself
        img = np.stack([gray] * 3, axis=-1).mean(axis=2)
        # nearest resize re-derived: index maps floor(i * src / dst)
        ry = (np.arange(n) * img.shape[0]) // n
        rx = (np.arange(n) * img.shape[1]) // n
        small = img[ry][:, rx]
        x = np.arange(n)
        basis = np.cos(np.pi * (2 * x[None, :] + 1) * x[:, None] / (2 * n))
        coef = basis @ small @ basis.T
        low = np.round(coef[:PHASH_LOW, :PHASH_LOW].flatten()[1:], 6)
        med = np.median(low)
        val = 0
        for b in low > med:
            val = (val << 1) | int(b)
        assert phash_rows[mid] == f"{val:016x}", f"media {mid}"


# ------------------------------------------------------------- t38


def test_t38_backoff_cascade_recompute(spark):
    """Hand-built corpus where every cascade level fires for the
    scored (odd) docs: tri hits, bi-backoff, uni-backoff and OOV.
    Train (even ids): 'a b c d' and 'b c e'. Score (odd ids):
    'a b c' (trigram abc seen -> tri), 'x b c' (xbc unseen, bc seen
    -> bi), 'b a q c z' (several levels incl. OOV for q/z)."""
    from crossfire_spark.functions.text import stupid_backoff_scores

    docs = spark.createDataFrame(
        [
            (0, "a b c d"),
            (2, "b c e"),
            (1, "a b c"),
            (3, "x b c"),
            (5, "b a q c z"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in stupid_backoff_scores(docs).collect()
    }

    # plain-Python second implementation
    train = ["a b c d".split(), "b c e".split()]
    tri = Counter(
        (w[i], w[i + 1], w[i + 2])
        for w in train
        for i in range(len(w) - 2)
    )
    bi = Counter(
        (w[i], w[i + 1]) for w in train for i in range(len(w) - 1)
    )
    uni = Counter(t for w in train for t in w)
    n_tok = sum(uni.values())

    def score(u, v, w3):
        if (u, v, w3) in tri:
            return 3, math.log(tri[(u, v, w3)] * 1.0 / bi[(u, v)])
        if (v, w3) in bi:
            return 2, math.log(0.4 * bi[(v, w3)] / uni[v])
        if w3 in uni:
            return 1, math.log(0.16 * uni[w3] / n_tok)
        return 0, None

    for did, text in [(1, "a b c"), (3, "x b c"), (5, "b a q c z")]:
        w = text.split()
        lvls, lps = [], []
        for i in range(len(w) - 2):
            lvl, lp = score(w[i], w[i + 1], w[i + 2])
            lvls.append(lvl)
            if lp is not None:
                lps.append(lp)
        r = got[did]
        assert r["n_tri"] == len(lvls)
        assert r["tri_hits"] == sum(1 for v in lvls if v == 3)
        assert r["bi_hits"] == sum(1 for v in lvls if v == 2)
        assert r["uni_hits"] == sum(1 for v in lvls if v == 1)
        assert r["oov"] == sum(1 for v in lvls if v == 0)
        if lps:
            exp = round(round(sum(lps) / len(lps), 6) + 1e-9, 2)
            assert r["lp"] == pytest.approx(exp, abs=1e-9)
        else:
            assert r["lp"] is None
    # the corpus genuinely exercised every level
    assert got[1]["tri_hits"] >= 1
    assert got[3]["bi_hits"] >= 1
    assert got[5]["oov"] >= 1 and got[5]["uni_hits"] >= 1


# ------------------------------------------------------------- g14


def test_g14_modularity_recompute(spark, sf_dir):
    """Plain-Python Newman modularity recompute on the closed-form
    document link graph: rebuild the undirected closure and the
    synchronous label-propagation rounds with dicts/Counters (no
    Spark, no SQL), then compare every (community, n_nodes,
    intra_edges, deg_sum) row and the q_contrib arithmetic."""
    import duckdb

    from crossfire_spark.functions.graph import LP_ROUNDS
    from crossfire_spark.registry import all_queries

    got = {
        r["community"]: r
        for r in all_queries()["g14_modularity"](spark, sf_dir).collect()
    }

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    ]
    n = max(ids) + 1
    und = set()
    for i in ids:
        for dst in ((i * 7 + 1) % n, (i * 13 + 3) % n):
            if dst != i:
                und.add((min(i, dst), max(i, dst)))
    adj: dict[int, list[int]] = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lbl = {v: v for v in adj}
    for _ in range(LP_ROUNDS):
        nxt = {}
        for v, nbrs in adj.items():
            c = Counter(lbl[u] for u in nbrs)
            # most frequent label, ties -> smallest label
            nxt[v] = min(((-cnt, l) for l, cnt in c.items()))[1]
        lbl = nxt
    m = len(und)
    n_nodes: Counter = Counter(lbl.values())
    deg_sum: Counter = Counter()
    for v, nbrs in adj.items():
        deg_sum[lbl[v]] += len(nbrs)
    intra: Counter = Counter()
    for a, b in und:
        if lbl[a] == lbl[b]:
            intra[lbl[a]] += 1

    assert set(got) == set(n_nodes)
    for c in n_nodes:
        r = got[c]
        assert r["n_nodes"] == n_nodes[c], c
        assert r["deg_sum"] == deg_sum[c], c
        assert r["intra_edges"] == intra.get(c, 0), c
        half = deg_sum[c] / (2.0 * m)
        exp = round(round(intra.get(c, 0) / m - half * half, 9) + 1e-12, 6)
        assert r["q_contrib"] == pytest.approx(exp, abs=1e-12), c
