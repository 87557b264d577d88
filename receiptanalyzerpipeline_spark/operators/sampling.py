"""Deterministic sampling & dataset splitting (training-data curation).

``df.sample``/``randomSplit`` draw from per-partition RNG streams — the
result changes with partitioning, retries, and cluster size, which is
poison for reproducible training sets. These operators derive membership
from md5 of a key instead: any engine, any partitioning, any rerun
produces the same split (the same trick as the md5-parity LSH planes —
seedless and replayable in the DuckDB oracle).

Leakage note: split on the near-dup CLUSTER label
(operators/components.py), not the raw document id — near-duplicate
documents must land in the same split or held-out metrics are inflated.
100 TB posture: one md5 + one projection per row, no shuffle, no RNG
state; the split column prunes at the scan when used as a write-time
partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16-bit hash bucket: enough resolution for per-ten-thousandth fractions.
_BUCKETS = 1 << 16


def hash_bucket(key: Column, salt: str = "split") -> Column:
    """Deterministic bucket in [0, 65536) from md5('<salt>:'||key)."""
    hx = F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 4)
    return F.conv(hx, 16, 10).cast("long")


def deterministic_split(
    key: Column,
    weights: dict[str, float],
    salt: str = "split",
) -> Column:
    """Label column assigning ``key`` to a named split with the given
    weights (must sum to ~1). Equal keys always get equal labels."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(key, salt=salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        bound = int(cum * _BUCKETS)
        expr = F.when(bucket < bound, name) if expr is None else expr.when(
            bucket < bound, name
        )
    return (expr.otherwise(names[-1]) if expr is not None else F.lit(names[-1]))


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "sample") -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key hashes below
    ``fraction`` — stable under reruns, retries, and repartitioning."""
    bound = int(fraction * _BUCKETS)
    return df.where(hash_bucket(F.col(key_col), salt=salt) < bound)
