"""BPE tokenizer training (operators/bpe.py, q_x31).

The hand-computed case is the worked example from Sennrich et al. 2016
§3.2 (low/lower/newest/widest) with an end-of-word marker; ties break
on the pair string. The overlap case pins the two semantics the oracle
relies on: pair COUNTING sees overlapping occurrences ('a a a' has two
'a a' pairs), while the MERGE rewrite is leftmost-first non-overlapping
('a a a' -> 'aa a', not 'aa aa').
"""

from __future__ import annotations

from receiptanalyzerpipeline_spark.operators.bpe import bpe_train


def _corpus(spark, word_counts: dict[str, int]):
    text = " ".join(w for w, n in word_counts.items() for _ in range(n))
    return spark.createDataFrame([(1, text)], ["doc_id", "text"])


def test_bpe_matches_hand_computed_sennrich_example(spark):
    docs = _corpus(spark, {"low": 5, "lower": 2, "newest": 6, "widest": 3})
    got = [
        (r["step"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=5).collect()
    ]
    assert got == [
        (1, "es", 9),  # e s in newest(6)+widest(3); tie with 's t' -> lexicographic
        (2, "est", 9),
        (3, "est</w>", 9),
        (4, "lo", 7),  # l o in low(5)+lower(2); tie with 'o w'
        (5, "low", 7),
    ]


def test_bpe_overlap_counts_vs_leftmost_merge(spark):
    docs = _corpus(spark, {"aaa": 1})
    got = [
        (r["step"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=2).collect()
    ]
    # 'a a a </w>': pair 'a a' counted twice (overlapping), merged once
    # (leftmost-first) -> 'aa a </w>'; then 'a </w>' ties-beats 'aa a'.
    assert got == [(1, "aa", 2), (2, "a</w>", 1)]


def test_bpe_encode_applies_merges_in_order(spark):
    from receiptanalyzerpipeline_spark.operators.bpe import bpe_encode

    docs = _corpus(spark, {"lowest": 1, "low": 1})
    # merges from the Sennrich corpus above: es, est, est</w>, lo, low
    merges = ["e s", "es t", "est </w>", "l o", "lo w"]
    rows = {
        r["text"].split(" ")[0]: r["bpe_tokens"]
        for r in bpe_encode(docs, merges).collect()
    }
    (only,) = rows.values()
    # 'lowest low' -> low+est</w>  +  lo+w+</w> ('low </w>' never merged:
    # merge 5 is 'lo w', giving 'low', but 'low </w>' is not in the list)
    assert only == ["low", "est</w>", "low", "</w>"]


def test_bpe_deterministic_across_runs(spark, sf_dir):
    from receiptanalyzerpipeline_spark.plans import REGISTRY

    q = REGISTRY["q_x31_bpe_train"]
    r1 = [tuple(r) for r in q.spark(spark, sf_dir).collect()]
    r2 = [tuple(r) for r in q.spark(spark, sf_dir).collect()]
    assert r1 == r2 and len(r1) == 8


def test_bpe_trivial_corpus_returns_empty_table(spark):
    docs = spark.createDataFrame([(1, "a a a")], ["doc_id", "text"])
    # 'a </w>' has one pair -> 1 merge, then 'a</w>' exhausts
    rows = bpe_train(docs, n_merges=5).collect()
    assert [(r["step"], r["merged"]) for r in rows] == [(1, "a</w>")]
    empty = spark.createDataFrame([(1, "   ")], ["doc_id", "text"])
    assert bpe_train(empty, n_merges=3).collect() == []
