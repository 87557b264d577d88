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


def test_parity_artifact_volume_section_clean():
    """VERDICT r9 task 6: the sf0.001 sweep proves serialization and
    scratch visibility; the VOLUME section re-proves the 10 heaviest
    suites at sf0.1 on local-cluster[2,2,2048] — the regime where
    shuffle sizes, partial-agg merges, and broadcast thresholds bite."""
    d = _load()
    v = d["volume"]
    s = v["summary"]
    assert "local-cluster[" in s["cluster_master"]
    assert abs(0.1 - float(s["sf_dir"].rsplit("sf", 1)[-1])) < 1e-9
    assert s["mismatch"] == 0 and s["errs"] == 0
    assert s["match"] == s["n_queries"] == 10
    assert {r["name"] for r in v["results"]} == set(_parity_mod().VOLUME_NAMES)


def _parity_mod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "cluster_parity", os.path.join(REPO, "scripts", "cluster_parity.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
