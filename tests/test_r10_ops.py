"""Second-implementation pins for the round-10 operators and
rewrites. Every op here is fully oracled (DuckDB differential runs in
test_extended/test_extensions); these exist for FAILURE LOCALITY — a
plain-Python/NumPy recompute sharing no code with the engine says
which stage broke when a sweep reddens.

- h25/h26: ACF + Ljung-Box re-derived with dict/list arithmetic from
  the raw events parquet (pandas groupby hourly, no Spark windows).
- v20: Gini re-derived from the textbook sorted-rank formula.
- g15: embeddedness re-derived with Python set intersections.
- s26: silhouette re-derived with NumPy from kmeans_fit's centroids.
- v18 rewrite: Spearman rho re-derived with fractional ranks in
  plain Python (the two-phase distributed rank must equal it).
- t31 rewrite: the distributed NTILE must equal the closed-form
  NTILE on the per-language score table.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest


def _events_pdf(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _hourly_cents(pdf: pd.DataFrame) -> dict[str, list[int]]:
    pdf = pdf.copy()
    pdf["b"] = pdf["ts"].dt.floor("h")
    pdf["cents"] = np.floor(pdf["value"] * 100).astype("int64")
    out: dict[str, list[int]] = {}
    g = pdf.groupby(["event_type", "b"])["cents"].sum().reset_index()
    for k, sub in g.groupby("event_type"):
        out[k] = sub.sort_values("b")["cents"].tolist()
    return out


def _acf_py(series: list[int], max_lag: int) -> tuple[int, list[float]]:
    n = len(series)
    m = float(sum(series)) / float(n)
    dev = [float(c) - m for c in series]
    den = sum(d * d for d in dev)
    rs = []
    for k in range(1, max_lag + 1):
        num = sum(dev[t] * dev[t - k] for t in range(k, n))
        r = num / den if den > 0 else 0.0
        rs.append(round(round(r, 9) + 1e-12, 6) + 0.0)
    return n, rs


def test_h25_acf_recompute(spark, sf_dir):
    from crossfire_spark.operators.extended import ACF_MAX_LAG, h25_acf

    got = {
        (r["skey"], r["lag"]): r["r"]
        for r in h25_acf(spark, sf_dir).collect()
    }
    series = _hourly_cents(_events_pdf(sf_dir))
    want = {}
    for skey, cents in series.items():
        n, rs = _acf_py(cents, ACF_MAX_LAG)
        for k, r in enumerate(rs, 1):
            if n > k:
                want[(skey, k)] = r
    assert got == pytest.approx(want)


def test_h26_ljung_box_recompute(spark, sf_dir):
    from crossfire_spark.operators.extended import (
        ACF_MAX_LAG,
        LB_CRIT_95,
        h26_ljung_box,
    )

    rows = {r["skey"]: r for r in h26_ljung_box(spark, sf_dir).collect()}
    for skey, cents in _hourly_cents(_events_pdf(sf_dir)).items():
        n, rs = _acf_py(cents, ACF_MAX_LAG)
        if n <= ACF_MAX_LAG:
            assert skey not in rows
            continue
        q = 0.0
        for k, r in enumerate(rs, 1):
            q += r * r / (float(n) - float(k))
        q = float(n) * (float(n) + 2.0) * q
        q4 = round(round(q, 9) + 1e-12, 4) + 0.0
        assert rows[skey]["q_lb"] == pytest.approx(q4, abs=2e-4)
        assert rows[skey]["reject_white_noise"] == (q4 > LB_CRIT_95)


def test_v20_gini_recompute(spark, sf_dir):
    from crossfire_spark.operators.extended import v20_token_gini

    got = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["gini"])
        for r in v20_token_gini(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for src, sub in docs.groupby("source"):
        xs = sorted(len(t.split(" ")) for t in sub["text"])
        n, sx = len(xs), sum(xs)
        sw = sum((i + 1) * x for i, x in enumerate(xs))
        g = 2.0 * sw / (n * sx) - (n + 1.0) / n if sx > 0 else 0.0
        g = round(round(g, 9) + 1e-12, 6) + 0.0
        assert got[src] == (n, sx, pytest.approx(g))


def test_g15_embeddedness_recompute(spark, sf_dir):
    from crossfire_spark.functions.graph import g15_edge_embeddedness

    rows = g15_edge_embeddedness(spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    m = int(docs["doc_id"].max()) + 1
    adj: dict[int, set[int]] = defaultdict(set)
    for i in docs["doc_id"]:
        for j in ((7 * i + 1) % m, (13 * i + 3) % m):
            if i != j:
                adj[int(i)].add(int(j))
                adj[int(j)].add(int(i))
    seen = set()
    for r in rows:
        a, b = r["a"], r["b"]
        seen.add((a, b))
        assert a < b
        common = len(adj[a] & adj[b])
        assert r["embeddedness"] == common, (a, b)
        assert r["is_local_bridge"] == (common == 0)
        assert r["deg_a"] == len(adj[a]) and r["deg_b"] == len(adj[b])
    n_edges = sum(len(v) for v in adj.values()) // 2
    assert len(seen) == n_edges  # every undirected edge reported once


def test_s26_silhouette_recompute(spark, sf_dir):
    from crossfire_spark.catalog import load_table
    from crossfire_spark.functions.similarity import (
        kmeans_fit,
        s26_silhouette,
    )

    em = load_table(spark, sf_dir, "embeddings")
    cents, _ = kmeans_fit(em, n_iter=3)
    C = np.asarray(cents, dtype=np.float64)
    X = np.stack(
        em.orderBy("vec_id").toPandas()["embedding"].map(np.asarray)
    ).astype(np.float64)
    d = np.round(
        ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1), 6
    )  # N x k, the engine's 6-dp assignment rounding
    order = np.lexsort((np.arange(C.shape[0])[None, :].repeat(len(X), 0), d))
    cid = order[:, 0]
    a = d[np.arange(len(X)), cid]
    b = np.sort(d, axis=1)[:, 1]
    # tie-exactness: b is the 2nd-smallest distance VALUE, which is
    # what both engine forms compute (sorted struct / MIN over others)
    s = np.where(np.maximum(a, b) > 0, (b - a) / np.maximum(a, b), 0.0)
    got = {r["cid"]: r for r in s26_silhouette(spark, sf_dir).collect()}
    for c in sorted(set(cid.tolist())):
        mask = cid == c
        assert got[c]["n_vecs"] == int(mask.sum())
        for col, arr in (("mean_a", a), ("mean_b", b), ("silhouette", s)):
            want = round(round(float(arr[mask].mean()), 9) + 1e-12, 6) + 0.0
            assert got[c][col] == pytest.approx(want, abs=2e-6), (c, col)


def test_v18_spearman_recompute(spark, sf_dir):
    from crossfire_spark.operators.extended import v18_spearman_audit

    got = {r["l_returnflag"]: r for r in v18_spearman_audit(spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")

    def frac_ranks(vals: list[float]) -> list[float]:
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            avg = (i + 1 + j) / 2.0  # mean of positions i+1..j
            for t in range(i, j):
                ranks[order[t]] = avg
            i = j
        return ranks

    for flag, sub in li.groupby("l_returnflag"):
        q = sub["l_quantity"].tolist()
        p = sub["l_extendedprice"].tolist()
        rq, rp = frac_ranks(q), frac_ranks(p)
        rho_s = float(np.corrcoef(rq, rp)[0, 1])
        rho_p = float(np.corrcoef(q, p)[0, 1])
        assert got[flag]["n"] == len(sub)
        assert got[flag]["rho_s"] == pytest.approx(rho_s, abs=2e-4)
        assert got[flag]["rho_p"] == pytest.approx(rho_p, abs=2e-4)


def test_t31_ntile_recompute(spark, sf_dir):
    """The distributed NTILE must reproduce exact NTILE(3) semantics:
    per language, ordered by (lp DESC, doc_id), the first n%3 terciles
    hold ceil(n/3) docs."""
    from crossfire_spark.functions.text import t31_ccnet_bucket

    rows = t31_ccnet_bucket(spark, sf_dir).collect()
    by_lang: dict[str, list] = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (-r["lp"], r["doc_id"]))
        n, k = len(rs), 3
        q, rem = divmod(n, k)
        for pos, r in enumerate(rs, 1):
            if q == 0:
                want = pos
            elif pos <= rem * (q + 1):
                want = (pos - 1) // (q + 1) + 1
            else:
                want = rem + (pos - rem * (q + 1) - 1) // q + 1
            assert r["bucket"] == want, (lang, pos, n)
            assert r["tier"] == ("head", "middle", "tail")[want - 1]


def test_d16_shuffle_sig_join_equals_broadcast(spark, sf_dir):
    """The implemented 100 TB fallback (sig_join="shuffle": signatures
    co-shuffled with the pair stream via a shuffle_hash hint instead
    of broadcast) must produce the IDENTICAL pair set and sims — the
    join strategy is a physical choice, never a semantic one. (The
    physical plan itself is truncated by the candidates
    localCheckpoint, so the pin is value-level equality.)"""
    from crossfire_spark.catalog import load_table
    from crossfire_spark.functions.dedup import weighted_srp_pairs

    docs = load_table(spark, sf_dir, "documents")
    bc = {
        (r["doc_a"], r["doc_b"]): r["sim"]
        for r in weighted_srp_pairs(docs).collect()
    }
    sh_df = weighted_srp_pairs(docs, sig_join="shuffle")
    sh = {(r["doc_a"], r["doc_b"]): r["sim"] for r in sh_df.collect()}
    assert bc == sh and len(bc) > 0
    with pytest.raises(ValueError):
        weighted_srp_pairs(docs, sig_join="bogus")


def test_h27_peak_recompute(spark, sf_dir):
    """Plain-Python strict-local-max recompute over the hourly cents
    series (truncated edge neighborhoods included)."""
    from crossfire_spark.operators.extended import (
        PEAK_HALF_WINDOW,
        h27_peak_detection,
    )

    got = {
        (r["skey"], r["b"]): (r["neighbor_max"], r["over_neighbors"])
        for r in h27_peak_detection(spark, sf_dir).collect()
    }
    pdf = _events_pdf(sf_dir).copy()
    pdf["b"] = pdf["ts"].dt.floor("h")
    pdf["cents"] = np.floor(pdf["value"] * 100).astype("int64")
    want = {}
    g = pdf.groupby(["event_type", "b"])["cents"].sum().reset_index()
    for skey, sub in g.groupby("event_type"):
        sub = sub.sort_values("b").reset_index(drop=True)
        cents = sub["cents"].tolist()
        for i, c in enumerate(cents):
            lo = max(0, i - PEAK_HALF_WINDOW)
            neigh = cents[lo:i] + cents[i + 1 : i + 1 + PEAK_HALF_WINDOW]
            nmax = max(neigh) if neigh else -(1 << 62)
            if c > nmax:
                want[(skey, sub["b"][i].to_pydatetime())] = (nmax, c - nmax)
    assert got == want and len(got) > 0


def test_m13_stats_invariance_and_recompute(spark):
    """The m13 kernel's construction properties, asserted directly:
    (a) brightness invariance — every brightness variant of a pattern
    produces the identical (entropy, variance, dyn_range, n_levels)
    tuple; (b) all 50 base patterns produce DISTINCT tuples (the
    property the GROUP BY doc_id % 50 oracle relies on); (c) the
    values match a plain-numpy recompute sharing no kernel code."""
    from crossfire_spark.functions.multimodal import (
        image_gray_stats,
        synthesize_gradient_images,
    )

    ids = [p + 50 * b for p in range(50) for b in (0, 11, 37)]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = {
        r["media_id"]: (
            r["entropy"],
            r["variance"],
            r["dyn_range"],
            r["n_levels"],
        )
        for r in image_gray_stats(synthesize_gradient_images(docs)).collect()
    }
    by_pattern: dict[int, set] = {}
    for mid, tup in rows.items():
        by_pattern.setdefault(mid % 50, set()).add(tup)
    for p, tups in by_pattern.items():
        assert len(tups) == 1, f"pattern {p} split across brightness"
    all_t = [next(iter(t)) for t in by_pattern.values()]
    assert len(set(all_t)) == 50
    # independent numpy recompute for a handful of images
    for mid in sorted(rows)[:5]:
        p, bright = mid % 50, (mid // 50) % 55
        base = np.random.RandomState(int(p)).randint(0, 200, size=(12, 16))
        gray = (base + bright).astype(np.int64)  # 3-channel mean == channel
        counts = np.bincount(gray.ravel(), minlength=256)
        pr = counts[counts > 0] / float(gray.size)
        want = (
            round(float(-(pr * np.log2(pr)).sum()), 6),
            round(float(gray.var()), 6),
            int(gray.max() - gray.min()),
            int((counts > 0).sum()),
        )
        assert rows[mid] == pytest.approx(want), mid


# ---------------------------------------------------------------- r10 batch 2


def test_h28_bollinger_recompute(spark, sf_dir):
    """h28 must equal a dict-arithmetic trailing-band recompute from
    the raw parquet (shares no code with the engine's window path)."""
    from crossfire_spark.operators.extended import (
        BOLL_K2,
        BOLL_MIN_N,
        BOLL_WINDOW,
        h28_bollinger_breakout,
    )

    got = {
        (r["skey"], r["b"]): (r["n"], r["s"], r["dev_sq"], r["band_sq"])
        for r in h28_bollinger_breakout(spark, sf_dir).collect()
    }
    pdf = _events_pdf(sf_dir)
    pdf["b"] = pdf["ts"].dt.floor("h")
    pdf["cents"] = np.floor(pdf["value"] * 100).astype("int64")
    g = pdf.groupby(["event_type", "b"])["cents"].sum().reset_index()
    want = {}
    for skey, sub in g.groupby("event_type"):
        rows = sub.sort_values("b")[["b", "cents"]].values.tolist()
        for i, (b, x) in enumerate(rows):
            trail = [int(c) for _, c in rows[max(0, i - BOLL_WINDOW) : i]]
            n = len(trail)
            if n < BOLL_MIN_N:
                continue
            s, ss = sum(trail), sum(c * c for c in trail)
            dev_sq = (n * int(x) - s) ** 2
            band_sq = BOLL_K2 * (n * ss - s * s)
            if dev_sq > band_sq:
                want[(skey, b.to_pydatetime())] = (n, s, dev_sq, band_sq)
    assert got == want and len(got) > 0


def test_d32_template_clusters(spark):
    """Digit/whitespace-masked near-copies collapse; distinct frames
    do not; singletons are dropped."""
    from crossfire_spark.functions.dedup import template_clusters

    docs = spark.createDataFrame(
        [
            (1, "Order #123 shipped  to warehouse 9.", "src0"),
            (2, "order #9981 SHIPPED to warehouse 4.", "src1"),
            (3, "ORDER #7 shipped\tto   warehouse 77.", "src1"),
            (4, "Totally different frame.", "src0"),
            (5, "Totally different frame.", "src0"),
            (6, "a singleton document", "src2"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        r["cluster_rep"]: (r["n_members"], r["n_sources"])
        for r in template_clusters(docs).collect()
    }
    assert rows == {1: (3, 2), 4: (2, 1)}


def test_s27_histogram_mass_and_bins(spark, sf_dir):
    """Total histogram mass == |Q| * (N - 1), and every bin index is
    in range with lo = bin/10 - 1."""
    from crossfire_spark.functions.similarity import (
        QUERY_STRIDE,
        SIM_HIST_BINS,
        s27_sim_histogram,
    )

    em = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    n = len(em)
    nq = int((em["vec_id"] % QUERY_STRIDE == 0).sum())
    rows = s27_sim_histogram(spark, sf_dir).collect()
    assert sum(r["n_pairs"] for r in rows) == nq * (n - 1)
    for r in rows:
        assert 0 <= r["bin"] < SIM_HIST_BINS
        assert r["lo"] == r["bin"] * 0.1 - 1.0


def test_s27_planted_bins(spark):
    """Three hand-built vectors with known cosines land in the known
    bins: cos=1 -> bin 19 (top bin closed), cos=0 -> bin 10,
    cos=-1 -> bin 0."""
    from crossfire_spark.functions.similarity import sim_histogram

    em = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    q = em.where("vec_id = 0").selectExpr(
        "vec_id qid", "embedding qe"
    )
    rows = {r["bin"]: r["n_pairs"] for r in sim_histogram(em, q).collect()}
    assert rows == {19: 1, 10: 1, 0: 1}


def test_m14_windows_recompute(spark, sf_dir):
    """m14 must equal the closed-form PCM recompute: windows of 100,
    last partial, zc pairs never cross a window boundary."""
    from crossfire_spark.functions.multimodal import (
        AUDIO_LOUD_WIN,
        AUDIO_MAX_SAMPLES,
        m14_audio_loudness,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    want = {}
    for did, nch in docs[docs["doc_id"] % 3 == 1][
        ["doc_id", "n_chars"]
    ].values.tolist():
        nn = min(int(nch), AUDIO_MAX_SAMPLES)
        c = [(did * (i + 1)) % 251 - 128 for i in range(nn)]
        for w0 in range(0, nn, AUDIO_LOUD_WIN):
            wc = c[w0 : w0 + AUDIO_LOUD_WIN]
            want[(did, w0 // AUDIO_LOUD_WIN)] = (
                len(wc),
                sum(v * v for v in wc),
                max(abs(v) for v in wc),
                sum(1 for a, b in zip(wc, wc[1:]) if a * b < 0),
            )
    got = {
        (r["media_id"], r["win"]): (r["n"], r["sumsq"], r["peak"], r["zc"])
        for r in m14_audio_loudness(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_t39_confusion_recompute(spark, sf_dir):
    """t39 cells must equal a plain-Python marker-vote recompute."""
    from crossfire_spark.functions.text import (
        LANG_MARKERS,
        t39_langid_confusion,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cells: dict[tuple[str, str], int] = defaultdict(int)
    for lang, text in docs[["lang", "text"]].values.tolist():
        words = text.lower().split(" ")
        sc = {
            k: sum(1 for w in words if w in LANG_MARKERS[k])
            for k in ("en", "fr", "es", "de")
        }
        if sc["en"] >= sc["fr"] and sc["en"] >= sc["es"] and sc["en"] >= sc["de"]:
            p = "en"
        elif sc["fr"] >= sc["es"] and sc["fr"] >= sc["de"]:
            p = "fr"
        elif sc["es"] >= sc["de"]:
            p = "es"
        else:
            p = "de"
        cells[(lang, p)] += 1
    lt: dict[str, int] = defaultdict(int)
    pt: dict[str, int] = defaultdict(int)
    for (lang, p), n in cells.items():
        lt[lang] += n
        pt[p] += n
    got = {}
    for r in t39_langid_confusion(spark, sf_dir).collect():
        got[(r["lang"], r["predicted"])] = (
            r["n"],
            r["label_total"],
            r["pred_total"],
            r["recall_share"],
            r["precision_share"],
        )
    want = {
        k: (
            n,
            lt[k[0]],
            pt[k[1]],
            round(round(n / lt[k[0]], 9) + 1e-12, 6) + 0.0,
            round(round(n / pt[k[1]], 9) + 1e-12, 6) + 0.0,
        )
        for k, n in cells.items()
    }
    assert got == want and len(got) > 0


# ---------------------------------------- s28 corpus-adaptive IVF-PQ


def test_s28_sizing_formula_cross_engine():
    """The (nlist, nprobe) pair must be IDENTICAL between the Spark
    path (Python math on a count) and the DuckDB oracle (SQL CEIL/
    SQRT/GREATEST), or the two engines probe different buckets and
    the bit-exact sweep becomes corpus-luck. Pin the formula pair
    across two decades of N including every perfect square (the only
    values where ceil sits on an exact-integer boundary)."""
    import duckdb

    from crossfire_spark.functions.similarity import (
        IVF_CENTROIDS,
        IVF_PROBES,
    )

    ns = sorted(
        set(range(1, 300))
        | {i * i for i in range(1, 400)}
        | {17, 20, 200, 2000, 20000, 60000, 123457}
    )
    con = duckdb.connect()
    for n in ns:
        nlist_py = max(IVF_CENTROIDS, math.ceil(4.0 * math.sqrt(float(n))))
        nprobe_py = max(IVF_PROBES, math.ceil(math.sqrt(float(nlist_py))))
        row = con.execute(
            f"""SELECT GREATEST({IVF_CENTROIDS},
                         CAST(CEIL(4.0 * SQRT({n})) AS BIGINT)) nl,
                       GREATEST({IVF_PROBES},
                         CAST(CEIL(SQRT(CAST(GREATEST({IVF_CENTROIDS},
                           CAST(CEIL(4.0 * SQRT({n})) AS BIGINT)) AS DOUBLE)))
                           AS BIGINT)) np"""
        ).fetchone()
        assert (nlist_py, nprobe_py) == (row[0], row[1]), n


def test_s28_adapts_and_shrinks_scan(spark):
    """Structural pin for the adaptive rule on a corpus big enough to
    leave the max() floors (sf0.1: N=2000 -> nlist=179, nprobe=14):
    s28 must equal ivf_pq_topk at the closed-form pair (wiring), the
    probed fraction must be well under the fixed shape's
    IVF_PROBES/IVF_CENTROIDS = 25%, and recall@5 vs the exact s01
    top-k must clear a floor (measured 0.44 on this corpus; random
    unit vectors are IVF's worst case)."""
    from crossfire_spark.catalog import load_table, spread
    from crossfire_spark.functions.similarity import (
        IVF_CENTROIDS,
        IVF_PROBES,
        _query_set,
        cosine_topk,
        ivf_pq_adaptive_topk,
        ivf_pq_topk,
    )

    sf = "/root/testdata/sf0.1"
    em = spread(load_table(spark, sf, "embeddings"))
    n = em.count()
    nlist = max(IVF_CENTROIDS, math.ceil(4.0 * math.sqrt(float(n))))
    nprobe = max(IVF_PROBES, math.ceil(math.sqrt(float(nlist))))
    assert nlist > IVF_CENTROIDS and nprobe > IVF_PROBES
    frac = nprobe / nlist
    assert frac < 0.5 * (IVF_PROBES / IVF_CENTROIDS)

    q = _query_set(em)
    ad = [
        (r.qid, r.vec_id, r.sim)
        for r in ivf_pq_adaptive_topk(em, q).orderBy("qid", "vec_id").collect()
    ]
    closed = [
        (r.qid, r.vec_id, r.sim)
        for r in ivf_pq_topk(em, q, n_centroids=nlist, n_probes=nprobe)
        .orderBy("qid", "vec_id")
        .collect()
    ]
    assert ad == closed and len(ad) > 0

    exact = {
        (r.qid, r.vec_id) for r in cosine_topk(em, q).collect()
    }
    got = {(a, b) for a, b, _ in ad}
    assert len(got & exact) / len(exact) >= 0.35


def test_s28_numpy_full_recompute(spark):
    """Third, fully independent implementation of the adaptive IVF-PQ
    composite (pandas/NumPy from the raw parquet — no engine code, no
    DuckDB): sizing -> deterministic centroids -> round-6 assignment
    and probes -> first-K codebooks -> round-9 encode -> ADC tables ->
    left-fold candidate distances -> round-9 rank -> round-4 exact
    cosine rerank. Every accumulation is an explicit sequential
    left-fold over dims/subspaces so the float path matches the
    engine's aggregate()/element_at chains bit-for-bit. Localizes a
    future sweep failure to a stage, which the end-to-end DuckDB
    oracle cannot."""
    from crossfire_spark.catalog import load_table, spread
    from crossfire_spark.functions.similarity import (
        IVF_CENTROIDS,
        IVF_PROBES,
        PQ_CAND_MULT,
        PQ_K,
        PQ_M,
        TOPK,
        QUERY_STRIDE,
        _query_set,
        ivf_pq_adaptive_topk,
    )

    sf = "/root/testdata/sf0.001"
    pdf = pd.read_parquet(f"{sf}/embeddings.parquet").sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    n, dim = V.shape

    def seq_fold(prod_rows):
        # explicit left-to-right accumulation over the last axis
        acc = np.zeros(prod_rows.shape[:-1], dtype=np.float64)
        for j in range(prod_rows.shape[-1]):
            acc = acc + prod_rows[..., j]
        return acc

    nlist = max(IVF_CENTROIDS, math.ceil(4.0 * math.sqrt(float(n))))
    nprobe = max(IVF_PROBES, math.ceil(math.sqrt(float(nlist))))

    cent_mask = ids < nlist
    cids = ids[cent_mask]
    C = V[cent_mask]

    def sqd(A, B_):
        # (a, b) pairwise sequential-fold squared distances
        diff = A[:, None, :] - B_[None, :, :]
        return seq_fold(diff * diff)

    # assignment: argmin over (round-6 dist, cid)
    ad = np.round(sqd(V, C), 6)
    order = np.lexsort((cids[None, :].repeat(n, 0), ad), axis=-1)
    assign = {int(ids[i]): int(cids[order[i, 0]]) for i in range(n)}

    qmask = ids % QUERY_STRIDE == 0
    qids = ids[qmask]
    Q = V[qmask]
    qd = np.round(sqd(Q, C), 6)
    qorder = np.lexsort((cids[None, :].repeat(len(qids), 0), qd), axis=-1)
    probes = {
        int(qids[i]): {int(cids[c]) for c in qorder[i, :nprobe]}
        for i in range(len(qids))
    }

    # codebooks: first PQ_K vectors by vec_id, split into M subspaces
    kk = min(PQ_K, n)
    d = dim // PQ_M
    B = V[:kk].reshape(kk, PQ_M, d).transpose(1, 0, 2)  # (M, kk, d)

    # encode: per subspace argmin of round-9 distance, lowest code
    Vs = V.reshape(n, PQ_M, d)
    codes = np.empty((n, PQ_M), dtype=np.int64)
    for s in range(PQ_M):
        diff = Vs[:, s, None, :] - B[s][None, :, :]
        ds = np.round(seq_fold(diff * diff), 9)
        codes[:, s] = ds.argmin(axis=1)  # argmin takes lowest index

    # ADC tables (NOT rounded), per query
    Qs = Q.reshape(len(qids), PQ_M, d)
    adc = np.empty((len(qids), PQ_M, kk), dtype=np.float64)
    for s in range(PQ_M):
        diff = Qs[:, s, None, :] - B[s][None, :, :]
        adc[:, s, :] = seq_fold(diff * diff)

    id2row = {int(v): i for i, v in enumerate(ids)}
    expected = []
    for qi, qv in enumerate(qids):
        cand = [
            int(v)
            for v in ids
            if v != qv and assign[int(v)] in probes[int(qv)]
        ]
        scored = []
        for v in cand:
            r = id2row[v]
            acc = 0.0
            for s in range(PQ_M):  # left-to-right subspace sum
                acc = acc + adc[qi, s, codes[r, s]]
            # Python round is half-even vs F.round's half-up — a
            # divergence only at an exact decimal half at 9 dp, which
            # a left-fold of binary doubles essentially never lands on
            # (the s25 ADVICE argument); the rank key is otherwise
            # identical
            scored.append((round(acc, 9), v))
        scored.sort()
        survivors = [v for _, v in scored[: PQ_CAND_MULT * TOPK]]
        rer = []
        for v in survivors:
            r = id2row[v]
            dot = 0.0
            na = 0.0
            nq = 0.0
            for j in range(dim):  # strict left folds
                dot = dot + V[r, j] * Q[qi, j]
                na = na + V[r, j] * V[r, j]
                nq = nq + Q[qi, j] * Q[qi, j]
            sim = round(dot / (math.sqrt(na) * math.sqrt(nq)), 4)
            rer.append((-sim, v))
        rer.sort()
        for negs, v in rer[:TOPK]:
            expected.append((int(qv), v, -negs))
    expected.sort()

    em = spread(load_table(spark, sf, "embeddings"))
    got = sorted(
        (r.qid, r.vec_id, r.sim)
        for r in ivf_pq_adaptive_topk(em, _query_set(em)).collect()
    )
    assert got == expected
