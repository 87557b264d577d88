"""Distributed BPE tokenizer training — the iterative pair-merge loop
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units", ACL) expressed as vocabulary-sized Spark aggregates.

The brief's text-analysis family asks for "token counting (whitespace +
a BPE-ish regex)"; this goes one step further and TRAINS the merge
table. The classical algorithm: split every word into characters plus
an end-of-word marker, then repeatedly (1) count adjacent symbol pairs
weighted by word frequency, (2) merge the globally most frequent pair
everywhere it appears, leftmost-first. The merge table IS the tokenizer.

Distributed shape — the part that matters at 100 TB:

- The corpus is touched ONCE: one explode + map-side-combined groupBy
  produces the word-frequency table. Everything after runs on the
  vocabulary (distinct words), which is orders of magnitude smaller
  than the corpus and grows sub-linearly with it (Heaps' law). The
  vocabulary table is persisted — bounded by construction, the same
  class as the IVF fit sample.
- BPE is inherently sequential: iteration i's argmax must be known
  before iteration i+1 can count anything, and each argmax both feeds
  the merge rewrite AND must be recorded — a twice-referenced
  self-dependency that makes a fully-lazy unrolled plan EXPONENTIAL in
  the merge count (each sym(i) embeds sym(i-1) twice; measured: 8
  unrolled merges OOM the driver just printing the plan). So the merge
  table is driver-held model state, exactly like MLlib KMeansModel
  centroids: the training loop runs one vocabulary-sized aggregate +
  orderBy/limit(1) job per merge (a bounded 1-row ``first()`` — the
  documented driver-side-scalar exception class) and chains the winning
  pairs into the next iteration's plan as string literals, keeping
  every plan linear and map-side past the one word-count shuffle.
- The RETURNED DataFrame is not a transcript of driver state: it is one
  lazy single-pass plan that recomputes every step's pair count from
  the vocabulary table with the merges embedded as literals — 8
  chained-replace projections fused by whole-stage codegen into one
  map, one 1-row aggregate, one explode. If the driver loop had picked
  any wrong pair or count, this recomputation (and the DuckDB oracle's
  independent replay) would expose it.

Determinism (what makes the DuckDB oracle replay bit-for-bit, see
plans/llmops.py q_x31): all counts are exact BIGINT sums; the top pair
tie-breaks on the pair string; and the merge rewrite is plain
non-overlapping leftmost-first ``replace`` over DOUBLE-SPACE-separated
symbol strings (see ``_merge`` — the double-space encoding is what makes
one replace pass equal the reference's ``(?<!\\S)L R(?!\\S)`` greedy
re.sub even when adjacent occurrences share a separator), identical
semantics in Spark and DuckDB (probed, plus pinned by the q_x31 oracle
hash match at sf0.001/0.01/0.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.operators.textanalysis import WS_RE

END_OF_WORD = "</w>"

__all__ = ["word_frequencies", "bpe_fit", "bpe_train", "merge_table", "bpe_encode"]


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq): lowercase whitespace tokens and their corpus counts.
    One corpus pass; map-side partial counts collapse the shuffle to
    distinct words."""
    return (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), WS_RE)).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pairs(sym: Column) -> Column:
    """Array of adjacent symbol pairs 'a b' of a space-separated symbol
    string (overlapping occurrences all counted, per the reference
    algorithm). Caller guards the single-symbol case.

    Deliberately NOT let_bound (r10, measured): BPE symbol strings are a
    handful of symbols, so the embedded-split re-evaluation the binding
    removes is negligible here, while the extra interpreted transform
    wrapper runs in the 8-round merge hot loop — q_x22's sf1 wall went
    22.7 s (inline) -> 33.6 s (let_bound) warm, identical output hash.
    let_bound pays off only where the bound tree is expensive relative
    to the lambda body (regex tokens() splits over documents)."""
    toks = F.split(sym, " ")
    return F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda j: F.concat(F.get(toks, j), F.lit(" "), F.get(toks, j + 1)),
    )


def _merge(sym: Column, pair: str) -> Column:
    """Leftmost-first non-overlapping merge of ``pair`` ('a b' -> 'ab'),
    with Sennrich semantics for separator-sharing runs.

    A single-space padded replace is WRONG for adjacent occurrences: the
    match consumes the shared separator, so 'a a a a' -> 'aa a a' instead
    of 'aa aa' (and iterating that replace to a fixpoint is not a fix:
    6 a's reach the 'aa a aa a' fixpoint, while the reference greedy scan
    gives 'aa aa aa'). The double-space encoding makes one plain replace
    pass exact: with TWO spaces between symbols, the pattern ' L  R '
    consumes only one space from each shared gap, so the between-token
    two-space invariant survives every substitution and all adjacent
    occurrences merge left-to-right non-overlapping — precisely the
    reference regex ``(?<!\\S)L R(?!\\S)`` re.sub (which RE2/DuckDB cannot
    express directly; plain ``replace`` has identical scan semantics in
    both engines, so the oracle replays this bit-for-bit)."""
    merged = pair.replace(" ", "")
    padded = F.concat(
        F.lit("  "), F.replace(sym, F.lit(" "), F.lit("  ")), F.lit("  ")
    )
    replaced = F.replace(
        padded,
        F.lit(" " + pair.replace(" ", "  ") + " "),
        F.lit(f" {merged} "),
    )
    return F.trim(F.replace(replaced, F.lit("  "), F.lit(" ")))


# Vocabularies at or under this row count run the merge loop on the
# DRIVER over the collected (sym, freq) table; larger ones keep the
# per-round Spark aggregates. 64 k rows × ~100 B is a few MB — the same
# bounded-driver-model-state class as the IVF fit sample or a broadcast
# codebook. The split exists because each Spark round is a full
# job/stage round-trip (~0.3-0.9 s of pure scheduling latency on a
# 31-row cached vocab, r11 measured — 8 rounds ≈ 3-6 s of wall for
# microseconds of work), while past the threshold the per-round
# aggregate IS the 100 TB shape (a million-row vocab has no business on
# one driver).
BPE_DRIVER_VOCAB_MAX = 65536


def bpe_fit(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> list[str]:
    """The training loop. Returns the winning pair strings ('a b', in
    merge order) — the model, driver-held like MLlib centroids. Stops
    early on pair exhaustion (every word a single symbol — only possible
    on near-trivial corpora). Deterministic: ties break on the pair
    string.

    Size-routed (r11): the corpus is always reduced to the vocabulary
    with ONE distributed pass (word_frequencies); the 8-round merge loop
    then runs on the driver when the vocabulary fits
    ``BPE_DRIVER_VOCAB_MAX`` (identical argmax/tie-break/merge
    semantics — ``tests/test_bpe.py`` pins both paths against the
    Sennrich reference and each other) and as per-round vocabulary-sized
    Spark aggregates otherwise. ``merge_table``'s lazy plan and the
    DuckDB oracle recompute every step's count distributed, so a
    divergence between the paths cannot go unnoticed."""
    base = (
        word_frequencies(docs, text_col)
        .select(
            # 'abc' -> 'a b c </w>' : space-separated symbols, marker last.
            F.concat(
                F.regexp_replace(F.col("w"), "(.)", "$1 "), F.lit(END_OF_WORD)
            ).alias("sym"),
            "freq",
        )
        .persist()
    )
    try:
        n_vocab = base.count()  # one job; materializes the cache either way
        if n_vocab <= BPE_DRIVER_VOCAB_MAX:
            return _fit_driver(base.collect(), n_merges)
        return _fit_spark(base, n_merges)
    finally:
        # The cache only serves the training loop's jobs; downstream plans
        # reference the vocabulary table ONCE, so release the memory now —
        # otherwise a 50-query sweep in a default-heap driver session
        # accumulates pinned cache blocks (observed: later sf0.1
        # aggregations OOM at spark.driver.memory=1g).
        base.unpersist(blocking=False)


def _fit_driver(rows, n_merges: int) -> list[str]:
    """Driver-side merge loop over the collected vocabulary — the
    classical Sennrich learn_bpe, bit-equal to ``_fit_spark``:
    count all adjacent pairs weighted by word freq (overlapping
    occurrences all counted), pick max count with ties on the pair
    string ascending, merge greedily left-to-right non-overlapping."""
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        key = tuple(r["sym"].split(" "))
        vocab[key] = vocab.get(key, 0) + r["freq"]
    pairs: list[str] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        # Same order as the Spark loop's (pair_count DESC, p ASC) where
        # p is the space-joined pair string.
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))[0]
        pairs.append(best[0] + " " + best[1])
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            k = tuple(out)
            new_vocab[k] = new_vocab.get(k, 0) + n
        vocab = new_vocab
    return pairs


def _fit_spark(base: DataFrame, n_merges: int) -> list[str]:
    """Distributed merge loop: one vocabulary-sized aggregate +
    TakeOrdered(1) job per merge, the winning pairs chained into the
    next round's plan as literals (see module docstring)."""
    pairs: list[str] = []
    cur = base
    for _ in range(n_merges):
        top = (
            cur.where(F.size(F.split(F.col("sym"), " ")) >= 2)
            .select(F.explode(_pairs(F.col("sym"))).alias("p"), "freq")
            .groupBy("p")
            .agg(F.sum("freq").alias("pair_count"))
            .orderBy(F.col("pair_count").desc(), "p")
            .limit(1)
            .first()
        )
        if top is None:
            break
        pairs.append(top["p"])
        cur = cur.select(_merge(F.col("sym"), top["p"]).alias("sym"), "freq")
    return pairs


def bpe_train(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> DataFrame:
    """Train ``n_merges`` BPE merges; returns the merge table
    (step BIGINT, merged STRING, pair_count BIGINT) in merge order.

    ``merged`` is the new symbol created at that step (concatenation of
    the merged pair); ``pair_count`` is the pair's corpus frequency at
    merge time. If the corpus exhausts its pairs early, fewer rows are
    returned. Equivalent to ``merge_table(docs, text_col, bpe_fit(...))``.
    """
    return merge_table(docs, text_col, bpe_fit(docs, text_col, n_merges))


def merge_table(docs: DataFrame, text_col: str, pairs: list[str]) -> DataFrame:
    """Lazy verification/model table for an already-fitted merge list:
    recomputes every step's pair count from the vocabulary in ONE
    codegen-fused pass with the merges embedded as literals."""
    if not pairs:  # trivial corpus exhausted before the first merge
        return docs.sparkSession.createDataFrame(
            [], "step bigint, merged string, pair_count bigint"
        )
    base = word_frequencies(docs, text_col).select(
        F.concat(
            F.regexp_replace(F.col("w"), "(.)", "$1 "), F.lit(END_OF_WORD)
        ).alias("sym"),
        "freq",
    )
    merges = list(enumerate(pairs, start=1))
    agg_cols = []
    sym: Column = F.col("sym")
    for step, pair in merges:
        occurrences = F.when(
            F.size(F.split(sym, " ")) >= 2,
            F.size(F.filter(_pairs(sym), lambda x: x == F.lit(pair))),
        ).otherwise(F.lit(0))
        agg_cols.append(
            F.sum(occurrences * F.col("freq")).cast("long").alias(f"c{step}")
        )
        sym = _merge(sym, pair)
    counted = base.agg(*agg_cols)
    rows = F.array(
        *[
            F.struct(
                F.lit(step).cast("long").alias("step"),
                F.lit(pair.replace(" ", "")).alias("merged"),
                F.col(f"c{step}").alias("pair_count"),
            )
            for step, pair in merges
        ]
    )
    return (
        counted.select(F.explode(rows).alias("r"))
        .select("r.step", "r.merged", "r.pair_count")
        .orderBy("step")
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[str],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a trained merge list (pair strings 'a b', in merge order) to
    tokenize ``text_col``; adds ``out_col`` array<string> of subword
    tokens (end-of-word markers kept, word order preserved).

    Entirely map-side: per word, character-split then one chained
    ``replace`` per merge — whole-stage codegen fuses the chain into a
    single projection, so encoding shards the corpus with zero shuffle
    (the property that matters when tokenizing 100 TB: it composes with
    any upstream partitioning and adds no stage boundary). The merge
    list is plan-embedded literals — KB-sized for real vocabularies,
    the same class as a broadcast codebook.
    """
    tokens = F.flatten(
        F.transform(
            F.filter(F.split(F.lower(F.col(text_col)), WS_RE), lambda w: w != ""),
            lambda w: F.split(_encode_word_expr(w, merges), " "),
        )
    )
    return docs.withColumn(out_col, tokens)


def _encode_word_expr(w: Column, merges: list[str]) -> Column:
    """'word' -> merged space-separated symbol string, as one expression."""
    sym = F.concat(F.regexp_replace(w, "(.)", "$1 "), F.lit(END_OF_WORD))
    for pair in merges:
        sym = _merge(sym, pair)
    return sym
