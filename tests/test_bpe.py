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


def test_bpe_merge_adjacent_runs_sennrich(spark):
    """ADVICE r4: the single-space padded replace consumed the shared
    separator, so 'a a a a' merged to 'aa a a' instead of 'aa aa'. The
    double-space encoding in _merge fixes it; pin the exact trajectory."""
    docs = _corpus(spark, {"aaaa": 1})
    got = [
        (r["step"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=3).collect()
    ]
    # 'a a a a </w>': 'a a' count 3 (overlapping); merge -> 'aa aa </w>'
    # (NOT 'aa a a </w>'); then 'aa </w>' tie-beats 'aa aa'; then done.
    assert got == [(1, "aa", 3), (2, "aa</w>", 1), (3, "aaaa</w>", 1)]


def test_bpe_merge_six_run_beats_fixpoint_semantics(spark):
    """6-symbol run: iterating the OLD padded replace to a fixpoint stalls
    at 'aa a aa a' (no ' a a ' left), while Sennrich greedy gives
    'aa aa aa' — i.e. fixpointing was not a valid fix, only the
    double-space encoding is. Pin the Sennrich trajectory."""
    docs = _corpus(spark, {"aaaaaa": 1})
    got = [
        (r["step"], r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=2).collect()
    ]
    # 'a a a a a a </w>': 'a a' count 5; merge -> 'aa aa aa </w>';
    # then pairs 'aa aa'(2) beats 'aa </w>'(1) -> 'aaaa'.
    assert got == [(1, "aa", 5), (2, "aaaa", 2)]


def test_bpe_encode_adjacent_occurrences(spark):
    """The ADVICE 'banana' case: pair 'a n' on 'b a n a n a </w>' must
    merge BOTH separator-sharing occurrences -> 'b an an a </w>'."""
    from receiptanalyzerpipeline_spark.operators.bpe import bpe_encode

    docs = _corpus(spark, {"banana": 1})
    (row,) = bpe_encode(docs, ["a n"]).collect()
    assert row["bpe_tokens"] == ["b", "an", "an", "a", "</w>"]


def _ref_sennrich(word_counts: dict[str, int], n_merges: int):
    """Pure-Python reference: Sennrich et al. 2016 learn_bpe — count all
    adjacent pairs weighted by word freq, merge the most frequent pair
    greedily left-to-right non-overlapping, ties on the pair string."""
    vocab = {tuple(w) + ("</w>",): n for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))[0]
        merges.append((best[0] + best[1], pairs[best]))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def test_bpe_matches_pure_python_sennrich_reference(spark):
    """End-to-end parity with an independent in-test reference
    implementation on a corpus full of separator-sharing runs."""
    word_counts = {
        "aaaa": 3,
        "aaaaaa": 2,
        "banana": 4,
        "abab": 2,
        "low": 5,
        "newest": 6,
        "papa": 1,
    }
    docs = _corpus(spark, word_counts)
    got = [
        (r["merged"], r["pair_count"])
        for r in bpe_train(docs, n_merges=10).collect()
    ]
    assert got == _ref_sennrich(word_counts, 10)


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


def test_bpe_fit_driver_and_spark_paths_agree(spark):
    """r11 size routing: small vocabularies run the merge loop on the
    driver (bpe_fit routes there under BPE_DRIVER_VOCAB_MAX); the
    distributed per-round aggregate path must produce the IDENTICAL
    merge list on the same corpus — including through count ties and
    separator-sharing runs — and both must equal the independent
    Sennrich reference."""
    from pyspark.sql import functions as F

    from receiptanalyzerpipeline_spark.operators import bpe

    word_counts = {
        "aaaa": 3, "aaaaaa": 2, "banana": 4, "abab": 2,
        "low": 5, "lowest": 5, "newest": 6, "papa": 1, "pb": 6,
    }
    docs = _corpus(spark, word_counts)
    driver_pairs = bpe.bpe_fit(docs, n_merges=10)  # routes to _fit_driver
    base = bpe.word_frequencies(docs, "text").select(
        F.concat(
            F.regexp_replace(F.col("w"), "(.)", "$1 "), F.lit(bpe.END_OF_WORD)
        ).alias("sym"),
        "freq",
    )
    spark_pairs = bpe._fit_spark(base, 10)
    assert driver_pairs == spark_pairs
    ref = [m for m, _ in _ref_sennrich(word_counts, 10)]
    assert [p.replace(" ", "") for p in driver_pairs] == ref
