"""Property-based tests (hypothesis; SURVEY §5.2.4): money-parser roundtrip
over generated strings and pivot invariants over generated KV rows.

Examples are batched into single Spark jobs (one job per hypothesis
example would be prohibitively slow), so each example is a whole table.
"""

from __future__ import annotations

import pytest

from decimal import Decimal

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

amounts = st.decimals(
    min_value=Decimal("0.00"), max_value=Decimal("999999.99"), places=2
)
symbols = st.sampled_from(["", "$", "£", "€"])

SYMBOL_NAME = {"": "US Dollars", "$": "US Dollars", "£": "Pound Sterling", "€": "Euro"}


def fmt_money(amount: Decimal, symbol: str, grouped: bool, spaced: bool) -> str:
    s = f"{amount:,.2f}" if grouped else f"{amount:.2f}"
    sep = " " if spaced else ""
    return f"{symbol}{sep}{s}"


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(amounts, symbols, st.booleans(), st.booleans()),
        min_size=1,
        max_size=30,
    )
)
def test_money_roundtrip(cases):
    from receiptanalyzerpipeline_spark.functions.money import (
        money_amount,
        money_currency_name,
    )

    spark = _SPARK[0]
    rows = [
        (i, fmt_money(a, sym, g, sp), a, SYMBOL_NAME[sym])
        for i, (a, sym, g, sp) in enumerate(cases)
    ]
    df = spark.createDataFrame(
        rows, "i int, s string, expect_amount decimal(18,2), expect_currency string"
    ).select(
        "i",
        "expect_amount",
        "expect_currency",
        money_amount("s").alias("amount"),
        money_currency_name("s").alias("currency"),
    )
    for r in df.collect():
        assert r["amount"] == r["expect_amount"], r
        assert r["currency"] == r["expect_currency"], r


kv_types = st.sampled_from(
    ["VENDOR_NAME", "TOTAL", "SUBTOTAL", "TAX", "OTHER", "RECEIVER_ADDRESS"]
)
values = st.text(
    alphabet="abcdefghij0123456789.$ ", min_size=0, max_size=12
)


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(0, 4), kv_types, values),  # (img idx, type, value)
        min_size=1,
        max_size=60,
    )
)
def test_pivot_invariants(kv_rows):
    """For ANY kv input: one output row per img_id; money fields never NULL
    (defaults apply); vendor falls back to 'Unknown'."""
    from receiptanalyzerpipeline_spark.sources.textract import pivot_receipt_summary

    spark = _SPARK[0]
    rows = [
        (f"img{img}", pos, t, None, v, 90.0, 90.0, 90.0)
        for pos, (img, t, v) in enumerate(kv_rows)
    ]
    kv = spark.createDataFrame(
        rows,
        "img_id string, pos int, TypeText string, LabelText string, "
        "ValueText string, TypeConfidence double, LabelConfidence double, "
        "ValueConfidence double",
    )
    out = pivot_receipt_summary(kv).collect()
    assert len(out) == len({r[0] for r in rows})
    for r in out:
        assert r["total"] is not None
        assert r["sub_total"] is not None
        assert r["tax_amount"] is not None
        assert r["vendor_name"] is not None
        assert r["currency"] in ("US Dollars", "Pound Sterling", "Euro")


_SPARK = []


def setup_module(module):
    from receiptanalyzerpipeline_spark.session import get_spark

    _SPARK.append(get_spark(app_name="receiptanalyzerpipeline-tests"))


# --- asof_join vs pandas merge_asof (independent reference implementation) ---

_asof_keys = st.sampled_from(["k1", "k2", "k3"])
_asof_ts = st.integers(min_value=0, max_value=500)  # seconds offset


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    left=st.lists(st.tuples(_asof_keys, _asof_ts), min_size=1, max_size=25),
    right=st.lists(st.tuples(_asof_keys, _asof_ts), min_size=0, max_size=25),
    tolerance=st.one_of(st.none(), st.integers(min_value=1, max_value=120)),
)
@pytest.mark.slow
def test_asof_join_matches_pandas_merge_asof(spark, left, right, tolerance):
    import datetime as dt

    import pandas as pd

    from receiptanalyzerpipeline_spark.operators.temporal import asof_join

    base = dt.datetime(2024, 1, 1)
    # Unique (key, ts) on the right (operator contract) + a payload.
    right_u = {(k, t): i for i, (k, t) in enumerate(right)}
    lrows = [
        (i, k, base + dt.timedelta(seconds=t)) for i, (k, t) in enumerate(left)
    ]
    rrows = [
        (k, base + dt.timedelta(seconds=t), 1000 + i)
        for (k, t), i in sorted(right_u.items())
    ]
    ldf = spark.createDataFrame(lrows, "lid long, k string, lts timestamp_ntz")
    rdf = spark.createDataFrame(
        rrows or [("__none__", base, -1)], "k string, rts timestamp_ntz, payload long"
    )
    got = {
        r["lid"]: r["payload_matched"]
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="lts", right_ts="rts",
            tolerance_seconds=tolerance,
        ).collect()
    }

    lpd = pd.DataFrame(lrows, columns=["lid", "k", "lts"]).sort_values("lts")
    rpd = pd.DataFrame(
        rrows or [("__none__", base, -1)], columns=["k", "rts", "payload"]
    ).sort_values("rts")
    merged = pd.merge_asof(
        lpd, rpd, left_on="lts", right_on="rts", by="k",
        direction="backward", allow_exact_matches=True,
        tolerance=pd.Timedelta(seconds=tolerance) if tolerance else None,
    )
    want = {
        int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
        for r in merged.itertuples()
    }
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@pytest.mark.slow
def test_connected_components_matches_union_find(spark, edges):
    """Property: the distributed min-label propagation equals a classic
    union-find ground truth on random graphs (including chains whose
    diameter forces multiple propagation rounds)."""
    from receiptanalyzerpipeline_spark.operators.components import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}
    # Normalize union-find roots to min-of-component labels.
    comp_min: dict[int, int] = {}
    for x, r in want.items():
        comp_min[r] = min(comp_min.get(r, x), x)
    want = {x: comp_min[r] for x, r in want.items()}
    assert got == want


texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab c\t\n")),  # tiny alphabet → collisions
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=12,
)


def _py_tokens(s: str) -> list[str]:
    return [t for t in s.split() if t]  # str.split() == whitespace-run split


@given(texts)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_window_hash_index_matches_python(spark, docs):
    """window_hash_index emits exactly the n-w+1 sliding windows (with
    multiplicity) of the Python tokenization, for arbitrary whitespace."""
    import hashlib

    from receiptanalyzerpipeline_spark.operators.curation import window_hash_index

    w = 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id: long, text: string"
    )
    got = sorted(
        (r["doc_id"], r["whash"])
        for r in window_hash_index(df, "doc_id", "text", w).collect()
    )
    want = sorted(
        (i, hashlib.md5(" ".join(toks[j : j + w]).encode()).hexdigest())
        for i, t in enumerate(docs)
        for toks in [_py_tokens(t)]
        for j in range(len(toks) - w + 1)
    )
    assert got == want


@given(texts)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_heuristic_quality_matches_python(spark, docs):
    """heuristic_quality fractions equal the pure-Python computation
    bit-for-bit (int/int IEEE divisions) on arbitrary text."""
    import re

    from receiptanalyzerpipeline_spark.operators.curation import heuristic_quality

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id: long, text: string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_tok_len"], r["alpha_frac"], r["symbol_frac"])
        for r in heuristic_quality(df, "doc_id", "text").collect()
    }
    for i, t in enumerate(docs):
        toks = _py_tokens(t)
        if not toks:
            assert i not in got
            continue
        n = len(toks)
        want = (
            n,
            sum(len(x) for x in toks) / n,
            sum(1 for x in toks if re.search("[A-Za-z]", x)) / n,
            len(re.findall("[^A-Za-z0-9 \t\n]", t)) / len(t),
        )
        assert got[i] == want, (i, t, got[i], want)


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=2, max_size=60),
    st.integers(min_value=2, max_value=5),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_quota_capping_keeps_min_cap_n_per_group(spark, groups, cap):
    """Quota capping keeps exactly min(cap, |group|) rows per group and is
    idempotent (same members on a second run)."""
    from pyspark.sql import Window

    rows = [(i, f"g{g}") for i, g in enumerate(groups)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    key = F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(key, F.col("doc_id"))
    out = df.select("doc_id", "lang", F.row_number().over(w).alias("rk")).where(
        F.col("rk") <= cap
    )
    kept1 = sorted((r["lang"], r["doc_id"]) for r in out.collect())
    kept2 = sorted((r["lang"], r["doc_id"]) for r in out.collect())
    assert kept1 == kept2
    from collections import Counter

    sizes = Counter(g for _, g in [(i, f"g{g}") for i, g in enumerate(groups)])
    per_group = Counter(lang for lang, _ in kept1)
    for g, n in sizes.items():
        assert per_group[g] == min(cap, n)


def test_pq_rerank_recall_vs_brute_force(spark):
    """PQ shortlist+rerank recall@5 against the exact brute force — the
    whole pipeline is deterministic (md5 seeds, quantized ADC), so this
    is a fixed number for the fixture corpus, pinned with margin.
    Measured 0.74 at sf0.01 (m=8, ks=16, 10% shortlist) on near-uniform
    synthetic vectors — the adversarial case for any quantizer."""
    from pyspark.sql.window import Window

    from receiptanalyzerpipeline_spark.operators.pq import (
        pq_fit_encode,
        pq_search_rerank,
    )

    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(sf + "/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    probes = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with("qv", "v", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("q_id").orderBy("d2", "vec_id")
    exact5 = (
        probes.crossJoin(emb)
        .where(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", d2.alias("d2"))
        .withColumn("rn", F.row_number().over(w))
        .where("rn <= 5")
        .select("q_id", "vec_id")
    )
    cb, codes = pq_fit_encode(emb, dims=64, m=8, ks=16, iters=1)
    pq5 = pq_search_rerank(
        probes, cb, codes, emb, dims=64, m=8, shortlist=50, top_k=5
    ).select("q_id", "vec_id")
    hits = pq5.join(exact5, ["q_id", "vec_id"]).count()
    recall = hits / exact5.count()
    assert recall >= 0.7, f"PQ recall@5 degraded: {recall}"
