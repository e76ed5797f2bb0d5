"""Property-based tests (hypothesis): the as-of join and salted
aggregation must agree with brute-force oracles on arbitrary inputs,
not just the shipped testdata."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crossfire_spark.functions.skew import salted_agg
from crossfire_spark.operators.asof import asof_join

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=50),  # ts (seconds)
    ),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left=rows, right=rows)
def test_asof_join_matches_bruteforce(spark, left, right):
    # right must be unique per (key, ts): dedup, value = ts itself
    right_u = sorted({(k, t) for k, t in right})
    ldf = spark.createDataFrame(
        [(k, t) for k, t in left] or [(None, None)], "k int, t int"
    ).where(F.col("k").isNotNull()).select(
        "k", F.timestamp_micros("t").alias("ts")
    )
    rdf = spark.createDataFrame(
        right_u or [(None, None)], "k int, t int"
    ).where(F.col("k").isNotNull()).select(
        "k", F.timestamp_micros("t").alias("ts"), F.col("t").alias("v")
    )
    got = {
        (r.k, r.ts.microsecond if r.ts else None, r.prev_v)
        for r in asof_join(ldf, rdf, "k", "ts", "ts", ["v"]).collect()
    }
    expect = set()
    for k, t in left:
        earlier = [rv for rk, rv in right_u if rk == k and rv < t]
        expect.add((k, t, max(earlier) if earlier else None))
    assert got == expect


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(data=rows)
def test_salted_agg_matches_bruteforce(spark, data):
    if not data:
        return
    df = spark.createDataFrame(data, "k int, v int")
    got = {
        (r.k, r.c, r.s)
        for r in salted_agg(
            df, ["k"], {"c": ("count", "v"), "s": ("sum", "v")}, n_salts=4
        ).collect()
    }
    expect = set()
    for k in {k for k, _ in data}:
        vs = [v for kk, v in data if kk == k]
        expect.add((k, len(vs), sum(vs)))
    assert got == expect


doc_corpus = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        min_size=0,
        max_size=12,
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=doc_corpus)
def test_dup_span_fraction_matches_bruteforce(spark, corpus):
    """d20's duplicated-span coverage must equal a brute-force
    recompute on arbitrary tiny corpora: a position is covered iff
    some L-gram through it appears verbatim in another document."""
    from crossfire_spark.functions.dedup import DUP_SPAN_L, dup_span_report

    docs = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in dup_span_report(docs).collect()
    }
    L = DUP_SPAN_L
    toks = [" ".join(w).split(" ") for w in corpus]  # split('') -> ['']
    grams = {}
    for i, words in enumerate(toks):
        for p in range(len(words) - L + 1):
            grams.setdefault(" ".join(words[p : p + L]), set()).add(i)
    for i, words in enumerate(toks):
        covered = set()
        for p in range(len(words) - L + 1):
            g = " ".join(words[p : p + L])
            if len(grams[g]) > 1:
                covered.update(range(p, p + L))
        assert got[i] == (len(words), len(covered)), (i, corpus)


def test_every_query_survives_empty_inputs(spark, tmp_path_factory):
    """Empty partitions and zero-row SF slices are normal at 100 TB;
    every declared query must return (an empty) result on a dataset of
    ten empty tables — never raise. Catches driver-side .collect()[0],
    ZeroDivision on scalar counts, np.stack([]) kernels, zero-batch
    stream replays, and ANSI divide-by-zero in report assembly."""
    import os

    from crossfire_spark.registry import all_queries

    src = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, f"{t}.parquet")
        )
    failures = []
    for name, fn in sorted(all_queries().items()):
        try:
            fn(spark, d).collect()
        except Exception as ex:  # noqa: BLE001 — collecting the full list
            failures.append(f"{name}: {type(ex).__name__}: {ex}")
    assert not failures, "\n".join(failures)
