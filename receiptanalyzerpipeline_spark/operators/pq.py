"""Product quantization (PQ) ANN — the memory-side scale path for
similarity search, as exact-arithmetic DataFrame ops.

IVF (operators/ivf.py, q_x27) prunes WHICH vectors a probe scores;
PQ compresses HOW each vector is stored and scored: split a d-dim
vector into m blocks, learn a small per-block codebook (ks centroids via
the engine-portable k-means), and store each vector as m small codes —
64 dims of float64 (512 bytes) become m=4 single-byte codes plus a
shared 4×8×16-double codebook. Search is asymmetric distance computation
(ADC): the probe computes one (block, code) → distance table against the
codebooks (m·ks entries, broadcast), and each corpus vector's
approximate distance is the SUM of m table lookups — no per-vector
float math at all.

Determinism toolkit (same as q_x22/q_g1): per-block codebooks are
portable_kmeans with a per-block seed salt; per-block probe distances
are left-fold IEEE doubles, then floor(d2·1e9) BIGINT nano-units so the
cross-block SUM is exact integer math (order-free under any shuffle);
ranking ties break on vec_id. A DuckDB oracle replays fit + encode +
ADC bit-for-bit (plans/llmops.py q_x30).

Distributed shape:
- fit: m independent small k-means runs (each: k-row broadcast
  assignment + (cid, dim)-keyed update, bounded outputs);
- encode: the m final assignments ARE the codes — one (vec_id, block,
  code) row per block, unioned map-side;
- search: the probe×codebook table is P·m·ks rows (bounded by probes,
  not corpus) and broadcasts; the corpus side is one equi-join on
  (block, code) + one BIGINT-sum aggregate keyed (q_id, vec_id). No
  per-probe corpus scan, no nested loop over vectors.

At 100 TB: codes are ~d·8/m× smaller than raw vectors, so the scored
table scans bytes proportional to the CODE width; codebooks stay
KB-sized broadcasts at any corpus size. Recall improves with ks/m like
any PQ index; the exact brute-force (q_n2) and IVF (q_x27) siblings
remain the recall oracles.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from receiptanalyzerpipeline_spark.operators.kmeans import portable_kmeans


def pq_fit_encode(
    emb: DataFrame, dims: int, m: int, ks: int, iters: int = 1, seed_salt: str = "pq"
) -> tuple[DataFrame, DataFrame]:
    """``emb`` has (vec_id, v: array<double>) with len(v) == dims.

    Returns (codebooks, codes): codebooks = (block, cid, c: array<double>),
    codes = (vec_id, block, code). dims must divide evenly by m."""
    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m} blocks")
    w = dims // m
    cents, codes = [], []
    for b in range(m):
        sub = emb.select("vec_id", F.slice("v", b * w + 1, w).alias("v"))
        cent, asg = portable_kmeans(sub, k=ks, iters=iters, seed_salt=f"{seed_salt}{b}:")
        cents.append(cent.select(F.lit(b).alias("block"), "cid", "c"))
        codes.append(
            asg.select("vec_id", F.lit(b).alias("block"), F.col("cid").alias("code"))
        )
    union = lambda dfs: reduce(lambda a, b: a.unionByName(b), dfs)  # noqa: E731
    return union(cents), union(codes)


def pq_search(
    probes: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame,
    dims: int,
    m: int,
    top_k: int,
) -> DataFrame:
    """ADC top-k: ``probes`` has (q_id, qv: array<double>).

    Returns (q_id, vec_id, qdist, rank): qdist is the PQ-approximate
    squared L2 distance (nano-quantized per block, so cross-engine and
    shuffle-order exact); self-matches (vec_id == q_id) are excluded."""
    w = dims // m
    # Probe → per-block sub-vectors (P·m rows), then the (block, code)
    # distance table against the broadcast codebooks: P·m·ks rows total.
    pb = probes.select(
        "q_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda b: F.struct(
                    b.alias("block"),
                    F.slice("qv", b * w + 1, w).alias("qv"),
                ),
            )
        ).alias("e"),
    ).select("q_id", F.col("e.block").alias("block"), F.col("e.qv").alias("qv"))
    dist2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("c"), lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pbd = pb.join(F.broadcast(codebooks), "block").select(
        "q_id",
        "block",
        F.col("cid").alias("code"),
        F.floor(dist2 * F.lit(1e9)).alias("d2n"),
    )
    # Corpus side: equi-join codes to the broadcast table, exact BIGINT sum
    # across the m blocks per (q_id, vec_id).
    scored = (
        codes.join(F.broadcast(pbd), ["block", "code"])
        .where(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d2n").alias("qn"))
    )
    rk = Window.partitionBy("q_id").orderBy("qn", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(rk))
        .where(F.col("rank") <= top_k)
        .select(
            "q_id",
            "vec_id",
            (F.col("qn").cast("double") / F.lit(1e9)).alias("qdist"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def calibrate_shortlist(
    emb: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame,
    dims: int,
    m: int,
    recall_target: float = 0.9,
    k: int = 10,
    sample_probes: int = 12,
    max_shortlist: int = 4096,
) -> tuple[int, float]:
    """Smallest power-of-two-of-k ``shortlist`` whose PQ-rerank recall@k
    against EXACT L2 on a bounded probe sample meets ``recall_target``;
    returns (shortlist, measured_recall).

    VERDICT r6 task 6: a fixed shortlist decays with corpus size (0.915
    recall at 20 k vectors → 0.735 at 200 k with shortlist 64 — the ADC
    approximation error stays constant while the number of near-tied
    candidates grows), so the shortlist must be DERIVED, not guessed —
    same bounded-empirical pattern as ``ivf.calibrate_nprobe``. The
    probe sample is LIMIT-bounded (driver-side-scalar class), each trial
    is one pq_search_rerank over ≤ sample × shortlist rows, and the scan
    doubles until the bar clears — calibration cost is
    O(sample × log(max_shortlist/k)), corpus-size-free.

    ``emb`` must be the same (vec_id, v) table the codes were fit on.
    """
    probes = (
        emb.select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
        .orderBy("q_id")
        .limit(sample_probes)
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rk = Window.partitionBy("q_id").orderBy("d", "vec_id")
    truth = {
        (r["q_id"], r["vec_id"])
        for r in emb.join(F.broadcast(probes), F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", d2.alias("d"))
        .withColumn("rank", F.row_number().over(rk))
        .where(F.col("rank") <= k)
        .collect()
    }
    if not truth:
        return k, 1.0
    shortlist, best = max(k, 16), 0.0
    while True:
        got = {
            (r["q_id"], r["vec_id"])
            for r in pq_search_rerank(
                probes, codebooks, codes, emb, dims=dims, m=m,
                shortlist=shortlist, top_k=k,
            ).collect()
        }
        best = len(got & truth) / len(truth)
        if best >= recall_target or shortlist >= max_shortlist:
            return min(shortlist, max_shortlist), best
        shortlist *= 2


def pq_search_rerank(
    probes: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame,
    emb: DataFrame,
    dims: int,
    m: int,
    shortlist: int,
    top_k: int,
) -> DataFrame:
    """Production PQ search: ADC shortlists ``shortlist`` candidates per
    probe from the compressed codes, then EXACT L2 reranks only those —
    the scan stays code-width-cheap, the final ordering is true distance.
    Returns (q_id, vec_id, qdist, rank) with qdist the exact squared L2.

    The shortlist join is P·shortlist rows (bounded by probes) and
    broadcasts; the corpus is touched once more only for the candidate
    vec_ids."""
    cand = pq_search(probes, codebooks, codes, dims, m, top_k=shortlist).select(
        "q_id", "vec_id"
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rer = (
        F.broadcast(cand)
        .join(emb, "vec_id")
        .join(F.broadcast(probes), "q_id")
        .select("q_id", "vec_id", d2.alias("qdist"))
    )
    rk = Window.partitionBy("q_id").orderBy("qdist", "vec_id")
    return (
        rer.withColumn("rank", F.row_number().over(rk))
        .where(F.col("rank") <= top_k)
        .select("q_id", "vec_id", "qdist", F.col("rank").cast("long").alias("rank"))
    )
