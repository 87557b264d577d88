"""Driver/executor-split proof (VERDICT r8 task 3): run the iterative +
materialized suites on a ``local-cluster[2,1,1024]`` master — REAL
separate executor JVMs with their own working directories — and require
bit-identical results to the in-process ``local[*]`` session.

``local[*]`` hides the driver-local-path bug class (ADVICE r7's
``_IterStore`` scratch): driver and executors share one filesystem and
one JVM there, so state written to a driver temp dir "works". On a
local-cluster master, an executor that can't see the driver's scratch
loses partitions or fails loudly. These tests pin the contract
mechanically: q_g1 (persisted-table iteration: connected components +
PageRank), q_x22 (k-means/IVF/PQ/BPE driver-held model state), and the
materialized q_d2 suite (spillable ``_IterStore`` parts + detach).

The cluster session runs in a SUBPROCESS (one SparkContext per process;
the session fixture owns this one) via scripts/local_cluster_check.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow  # excluded from the default run (VERDICT r10 task 2)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "local_cluster_check.py")

CLUSTER_SUITES = ["q_g1_graph_suite", "q_x22_portable_ml", "q_d2_neardup_suite"]


@pytest.fixture(scope="module")
def cluster_hashes(sf_dir):
    """One subprocess run for all suites (cluster startup is ~15 s)."""
    proc = subprocess.run(
        [sys.executable, SCRIPT, *CLUSTER_SUITES, "--sf-dir", sf_dir],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"local-cluster run failed:\n{proc.stderr[-3000:]}"
    rows = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    assert {r["name"] for r in rows} == set(CLUSTER_SUITES)
    return {r["name"]: (r["rows"], r["xor_hash"]) for r in rows}


@pytest.mark.parametrize("name", CLUSTER_SUITES)
def test_local_cluster_matches_local(spark, sf_dir, cluster_hashes, name):
    from receiptanalyzerpipeline_spark.plans import REGISTRY

    df = REGISTRY[name].spark(spark, sf_dir)
    n, h = (
        df.select(F.xxhash64(*df.columns).alias("__h"))
        .agg(F.count(F.lit(1)), F.expr("bit_xor(__h)"))
        .first()
    )
    assert (int(n), int(h)) == cluster_hashes[name], (
        f"{name}: local-cluster result diverges from local[*] — a "
        "driver-local assumption leaked into the operator"
    )
