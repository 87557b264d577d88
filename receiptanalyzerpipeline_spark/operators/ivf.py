"""IVF (inverted-file) approximate nearest neighbor over an embedding
column — the centroid-partitioned scale path complementing the
hyperplane-LSH variant (operators/similarity.py).

Shape of the operator (SURVEY N4, task-brief "IVF or LSH-bucketed"):

1. FIT — k-means centroids from a bounded, deterministic sample
   (``ORDER BY id LIMIT n``: the limit+sort prunes at the scan, the
   sample is small by construction, and the same rows arrive in the
   same order every run, so the fitted centroids are bit-reproducible).
   At 100 TB you would fit on a larger sample with MLlib
   ``pyspark.ml.clustering.KMeans(seed=...)`` — the index layout and
   search below are unchanged; only the fit distributes.
2. ASSIGN — every corpus vector gets its nearest-centroid id via an
   Arrow-batched pandas UDF (one numpy matmul per batch; the 10-100×
   rule vs row-at-a-time Python). This is map-side: no shuffle.
3. SEARCH — probes are assigned their ``nprobe`` nearest centroid ids,
   exploded, and equi-joined to the corpus on the centroid id; exact
   cosine re-ranking (JVM-side expression) runs only within the probed
   cells. With k cells and nprobe probes the scored fraction is
   ~nprobe/k of the corpus — the pruning that survives a 100× corpus.

Centroid count: sqrt(N) is the classical IVF sizing; callers pass
``n_cells`` explicitly so tests stay deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType
from pyspark.sql.window import Window

from receiptanalyzerpipeline_spark.operators.similarity import cosine

__all__ = ["fit_centroids", "assign_cells", "ivf_topk"]


def fit_centroids(
    corpus: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 2048,
    n_iters: int = 8,
) -> np.ndarray:
    """Deterministic k-means (cosine / normalized-dot) on a bounded sample.

    Init = first ``n_cells`` sample vectors (stable ``ORDER BY id``);
    Lloyd iterations on L2-normalized vectors; empty cells keep their
    previous centroid. Returns a (n_cells, dim) float64 array.
    """
    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(sample_n).collect()
    )
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    if len(X) < n_cells:
        raise ValueError(f"sample ({len(X)}) smaller than n_cells ({n_cells})")
    C = X[:n_cells].copy()
    for _ in range(n_iters):
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)


def _cell_udf(centroids: np.ndarray, nprobe: int):
    """pandas UDF: array<float> -> nearest-centroid id(s). nprobe=1 gives a
    single int cell; nprobe>1 is used probe-side (top-nprobe cells)."""
    C = centroids  # captured; ships to executors in the serialized UDF

    if nprobe == 1:

        @F.pandas_udf(IntegerType())
        def assign(v: pd.Series) -> pd.Series:
            X = np.array(v.tolist(), dtype=np.float64)
            X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            return pd.Series(np.argmax(X @ C.T, axis=1).astype(np.int32))

        return assign

    @F.pandas_udf("array<int>")
    def assign_n(v: pd.Series) -> pd.Series:
        X = np.array(v.tolist(), dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        sims = X @ C.T
        top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return assign_n


def assign_cells(
    corpus: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Corpus with a nearest-centroid ``cell`` column (map-side, no shuffle).
    In production this is the write-time partition/bucket column."""
    return corpus.withColumn(cell_col, _cell_udf(centroids, 1)(F.col(vec_col)))


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    centroids: np.ndarray,
    k: int = 3,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "q_id",
    probe_vec: str = "q_emb",
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank restricted to each probe's
    ``nprobe`` nearest centroid cells. Output: (probe_id, id, sim, rank)."""
    indexed = assign_cells(corpus, centroids, vec_col=vec_col)
    cells = _cell_udf(centroids, nprobe)(F.col(probe_vec))
    if nprobe == 1:
        cells = F.array(cells)  # the UDF returns a scalar cell at nprobe=1
    probed = probes.select(
        probe_id, probe_vec, F.explode(cells).alias("q_cell")
    )
    cands = indexed.join(
        F.broadcast(probed),
        (F.col("q_cell") == F.col("cell")) & (F.col(probe_id) != F.col(id_col)),
    ).select(
        probe_id,
        id_col,
        cosine(F.col(probe_vec), F.col(vec_col)).alias("sim"),
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("sim").desc(), F.col(id_col))
    return cands.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def auto_n_cells(n: int, target_cell_size: int = 256, lo: int = 4, hi: int = 4096) -> int:
    """Cells sized so a probe's per-cell scan stays ~constant as the
    corpus grows — the IVF member of the occupancy-target family
    (auto_n_planes, auto-blocking): n_cells ≈ n / target_cell_size."""
    import math

    return max(lo, min(hi, math.ceil(n / float(target_cell_size))))


def calibrate_nprobe(
    corpus: DataFrame,
    centroids: np.ndarray,
    recall_target: float = 0.9,
    k: int = 10,
    sample_probes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[int, float]:
    """Smallest power-of-two ``nprobe`` whose recall@k against exact
    brute force on a BOUNDED probe sample meets ``recall_target``;
    returns (nprobe, measured_recall). The sample is LIMIT-bounded like
    the centroid fit (same driver-side-scalar class), each trial is one
    ivf_topk plan over ≤ sample_probes × k rows, and the scan stops at
    the first nprobe that clears the bar — so calibration cost is
    O(sample × log n_cells), corpus-size-free. VERDICT r5 task 6: the
    occupancy family extended from cost to QUALITY targets."""
    from receiptanalyzerpipeline_spark.operators.similarity import brute_force_topk

    probes = (
        corpus.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb")
        )
        .orderBy("q_id")
        .limit(sample_probes)
    )
    truth = {
        (r["q_id"], r[id_col])
        for r in brute_force_topk(
            corpus, probes, k=k, id_col=id_col, vec_col=vec_col
        ).collect()
    }
    if not truth:
        return 1, 1.0
    nprobe, best = 1, 0.0
    while True:
        got = {
            (r["q_id"], r[id_col])
            for r in ivf_topk(
                corpus, probes, centroids, k=k, nprobe=nprobe,
                id_col=id_col, vec_col=vec_col,
            ).collect()
        }
        best = len(got & truth) / len(truth)
        if best >= recall_target or nprobe >= len(centroids):
            return min(nprobe, len(centroids)), best
        nprobe *= 2
