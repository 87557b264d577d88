"""Guard the committed full-registry local-cluster parity artifact.

``tests/test_local_cluster.py`` runs three suites on a live
local-cluster master inside pytest; the FULL 50-query sweep is too slow
for the suite, so ``scripts/cluster_parity.py`` runs it out-of-band and
commits LOCAL_CLUSTER_PARITY.json. This test pins the artifact's
invariants so a stale or regressed sweep fails review mechanically:
every driver-surface query present, zero mismatches, zero errors."""

from __future__ import annotations

import importlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load():
    with open(os.path.join(REPO, "LOCAL_CLUSTER_PARITY.json")) as f:
        return json.load(f)


def test_parity_artifact_clean():
    d = _load()
    s = d["summary"]
    assert s["mismatch"] == 0, [
        r["name"] for r in d["results"] if r["parity"] == "MISMATCH"
    ]
    assert s["errs"] == 0, [
        r["name"] for r in d["results"] if r["parity"] == "err"
    ]
    assert s["match"] == s["n_queries"]
    assert "local-cluster[" in s["cluster_master"]


def test_parity_artifact_covers_driver_surface():
    """The artifact must cover exactly the driver surface — a new driver
    query without a parity row (or a renamed one leaving a stale row)
    fails here until the sweep is re-run."""
    d = _load()
    E = importlib.import_module("__spark_entry__")
    assert {r["name"] for r in d["results"]} == set(E.queries())
