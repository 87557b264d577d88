"""Guards on the driver-facing registry (plans/suites.py).

The driver's correctness gate records at most 50 queries; round 3's
VERDICT found 38 registry entries silently falling outside that window.
These tests pin the invariants that prevent a regression:

- the exposed set stays within the window,
- every registered query is either exposed or fused into an exposed
  suite (nothing can fall outside the gate unnoticed),
- every exposed entry except the declared rows-only sketch has an oracle,
- the headline bench queries stay standalone (BENCH_r{N} comparability).
"""

from __future__ import annotations

from receiptanalyzerpipeline_spark.plans import (
    DRIVER_REGISTRY,
    REGISTRY,
    SUITE_MEMBERS,
)

# The 20 headline queries benched against BASELINE.md — must stay standalone.
HEADLINE = [
    "q_a3_tpch_q1",
    "q_as2_prepurchase_window",
    "q_d3_minhash_lsh",
    "q_er2_qgram_edit_join",
    "q_er3_linkage_scoring",
    "q_x28_bm25_retrieval",
    "q_j1_multijoin_revenue",
    "q_j2_reconciliation",
    "q_n2_embedding_topk",
    "q_p1_filter_project",
    "q_s1_topk",
    "q_t1_tumbling_window",
    "q_t3_sessionization",
    "q_w2_lag_running",
    "q_x5_ann_lsh",
    "q_x9_repetition_filter",
    "q_x11_decontamination",
    "q_x16_heuristic_quality",
    "q_x17_substring_dedup",
    "q_x24_curation_pipeline",
]

# Every driver entry now carries an oracle: q_x6_ann_ivf emits the exact
# brute-force top-3 plus a recall-invariant boolean (q_a5 pattern), so the
# rows-only escape hatch is empty — additions here need a written reason.
ROWS_ONLY_OK: set[str] = set()


def test_driver_registry_fits_the_window():
    assert len(DRIVER_REGISTRY) <= 50


def test_every_query_reaches_the_driver_gate():
    covered = set(DRIVER_REGISTRY)
    for suite, members in SUITE_MEMBERS.items():
        if suite in DRIVER_REGISTRY:
            covered.update(members)
    uncovered = sorted(set(REGISTRY) - covered)
    assert not uncovered, f"registry entries outside the driver window: {uncovered}"


def test_exposed_entries_have_oracles():
    missing = sorted(
        n for n, q in DRIVER_REGISTRY.items() if q.oracle is None and n not in ROWS_ONLY_OK
    )
    assert not missing, f"driver entries without oracle: {missing}"


def test_headline_bench_queries_stay_standalone():
    for name in HEADLINE:
        assert name in DRIVER_REGISTRY, f"headline query {name} not exposed"
        assert name not in SUITE_MEMBERS, f"headline query {name} became a suite"


def test_suite_members_are_registered_and_not_exposed():
    for suite, members in SUITE_MEMBERS.items():
        assert suite in REGISTRY
        for m in members:
            assert m in REGISTRY, f"{suite} fuses unknown member {m}"
            assert m not in DRIVER_REGISTRY, f"{m} is both fused and exposed"
