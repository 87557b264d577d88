"""Training-data curation queries (corpus → training shards): the
Gopher/C4-style repetition filter, deterministic source-mixture
sampling, benchmark decontamination, shard packing, and per-source
distinctive terms.

These are the steps between "deduplicated corpus" (plans/llmops.py) and
"training-set export": score repetition pathologies, mix sources at
target rates, drop eval-set contamination, then pack into
deterministic shards. All math is engine-portable (int/int IEEE
divisions, md5-derived buckets) so every query is DuckDB-replayable.

Output contract per registry docstring: BIGINT / DOUBLE / STRING /
BOOLEAN only; every query ends in a total ORDER BY with a unique
tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from receiptanalyzerpipeline_spark.catalog import table
from receiptanalyzerpipeline_spark.operators import curation as C
from receiptanalyzerpipeline_spark.operators import textanalysis as T
from receiptanalyzerpipeline_spark.operators.textanalysis import DUCK_TOKENS
from receiptanalyzerpipeline_spark.plans.registry import register

# Repetition threshold: flags the extreme tail (p99 ≈ 0.111 at sf0.01)
# without tripping on ordinary token reuse.
_TOP_BIGRAM_FLAG = 0.125

# Mixture: head sources kept in full, tail sources downsampled to 25% —
# the shape of a pretraining source-weighting pass.
_MIX_FULL = ("src0", "src1", "src2", "src3", "src4")
_MIX_TAIL_RATE = 0.25


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "documents")


@register(
    "q_x9_repetition_filter",
    oracle=f"""
        WITH toks AS (SELECT doc_id, {DUCK_TOKENS} t FROM documents),
        base AS (
            SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct,
                   [t[i] || ' ' || t[i+1] for i in range(1, len(t))] AS bg
            FROM toks WHERE len(t) >= 2
        ),
        e AS (SELECT doc_id, unnest(bg) AS g FROM base),
        c AS (SELECT doc_id, g, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
        m AS (SELECT doc_id, MAX(cnt) AS top_cnt, SUM(cnt) AS n_bigrams FROM c GROUP BY 1)
        SELECT b.doc_id,
               CAST(b.n_tokens AS BIGINT) AS n_tokens,
               CAST(b.n_tokens - b.n_distinct AS DOUBLE) / b.n_tokens AS dup_token_frac,
               CAST(m.top_cnt AS DOUBLE) / m.n_bigrams AS top_bigram_frac,
               CAST(m.top_cnt AS DOUBLE) / m.n_bigrams >= {_TOP_BIGRAM_FLAG} AS flagged
        FROM base b JOIN m USING (doc_id)
        ORDER BY doc_id
    """,
    doc=(
        "Gopher-style repetition-quality filter: duplicate-token fraction "
        "and top-bigram share per document, flag the pathological tail. "
        "Zero-shuffle: the top-bigram count is a map-side sorted-run fold "
        "(operators/curation.py); fractions are int/int IEEE divisions. "
        "The oracle computes the same counts via explode+groupBy."
    ),
    tags=("text", "quality", "curation"),
    bench=True,
)
def q_x9(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats = C.repetition_stats(_docs(spark, sf_dir), "doc_id", "text")
    return stats.withColumn(
        "flagged", F.col("top_bigram_frac") >= F.lit(_TOP_BIGRAM_FLAG)
    ).orderBy("doc_id")


@register(
    "q_x10_data_mixture",
    oracle=f"""
        WITH rated AS (
            SELECT doc_id, source,
                   CASE WHEN source IN {_MIX_FULL!r} THEN 65536
                        ELSE {int(_MIX_TAIL_RATE * 65536)} END AS bound,
                   CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4))
                        AS BIGINT) AS bucket
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_total,
               CAST(SUM(CASE WHEN bucket < bound THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN bucket < bound THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS kept_frac
        FROM rated GROUP BY source ORDER BY source
    """,
    doc=(
        "Deterministic source-mixture sampling audit: head sources kept "
        "in full, tail sources at 25%, membership from md5(doc_id) — no "
        "RNG, stable under retries/repartitioning, replayed exactly by "
        "the oracle. One hash + projection per row, then a tiny agg."
    ),
    tags=("sampling", "curation"),
)
def q_x10(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    rates = {s: 1.0 for s in _MIX_FULL}
    keep = C.mixture_keep(F.col("doc_id"), F.col("source"), rates, default=_MIX_TAIL_RATE)
    return (
        docs.withColumn("keep", keep)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            (F.sum(F.col("keep").cast("long")).cast("double") / F.count("*")).alias("kept_frac"),
        )
        .orderBy("source")
    )


@register(
    "q_x11_decontamination",
    oracle=f"""
        WITH toks AS (SELECT doc_id, source, {DUCK_TOKENS} t FROM documents),
        sh AS (
            SELECT doc_id, source,
                   list_distinct([array_to_string(t[i:i+4], ' ')
                                  for i in range(1, len(t) - 3)]) s
            FROM toks WHERE len(t) >= 5
        ),
        e AS (SELECT doc_id, source, unnest(s) AS g FROM sh),
        ev AS (SELECT DISTINCT g FROM e WHERE source = 'src0'),
        hits AS (
            SELECT DISTINCT e.doc_id FROM e JOIN ev USING (g) WHERE e.source <> 'src0'
        )
        SELECT d.doc_id, d.source, (h.doc_id IS NOT NULL) AS contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE d.source <> 'src0'
        ORDER BY d.doc_id
    """,
    doc=(
        "Benchmark decontamination: flag training docs (source<>src0) "
        "sharing any 5-word shingle with the eval set (src0). Inverted-"
        "index semi-join on shingles — shuffle bounded by co-occurrence, "
        "never train×eval; eval side reduced to DISTINCT shingles first "
        "(broadcastable). k=5 measured discriminative: k=3 flags 84% of "
        "this corpus, k=5 flags exactly the true near-dups."
    ),
    tags=("dedup", "curation", "decontamination"),
    bench=True,
)
def q_x11(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    train = docs.where(F.col("source") != "src0")
    ev = docs.where(F.col("source") == "src0")
    hits = C.contaminated_ids(train, ev, "doc_id", "text", k=5).withColumn(
        "contaminated", F.lit(True)
    )
    return (
        train.select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id", "source", F.coalesce(F.col("contaminated"), F.lit(False)).alias("contaminated")
        )
        .orderBy("doc_id")
    )


@register(
    "q_x12_shard_packing",
    oracle=f"""
        WITH s AS (
            SELECT doc_id, len({DUCK_TOKENS}) AS n_tok,
                   CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 4))
                        AS BIGINT) % 16 AS shard_id
            FROM documents
        )
        SELECT shard_id, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
        FROM s GROUP BY shard_id ORDER BY shard_id
    """,
    doc=(
        "Training-set shard packing audit: deterministic md5 shard "
        "assignment (16 shards) + per-shard doc/token totals. The shard "
        "id doubles as the write-time partition key (sinks.write_"
        "partitioned_by_hash_prefix layout): a resumed 100 TB export "
        "never double-writes because membership is content-derived, "
        "not RNG- or partition-derived."
    ),
    tags=("sampling", "curation", "sink-layout"),
)
def q_x12(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        docs.select(
            C.shard_assign(F.col("doc_id"), 16).alias("shard_id"),
            T.token_count_ws(F.col("text")).cast("long").alias("n_tok"),
        )
        .groupBy("shard_id")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("total_tokens"))
        .orderBy("shard_id")
    )


@register(
    "q_x13_sequence_packing",
    oracle=f"""
        WITH s AS (
            SELECT doc_id, len({DUCK_TOKENS}) AS n_tok,
                   CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 4))
                        AS BIGINT) % 16 AS shard_id
            FROM documents
        ),
        p AS (
            SELECT doc_id, shard_id, n_tok,
                   COALESCE(SUM(n_tok) OVER (PARTITION BY shard_id ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
            FROM s
        )
        SELECT shard_id, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
               CAST(off AS BIGINT) AS token_offset,
               CAST(off // 256 AS BIGINT) AS chunk_id
        FROM p ORDER BY shard_id, doc_id
    """,
    doc=(
        "Concat-then-chunk sequence packing (the GPT-style training "
        "layout): within each md5 shard, documents concatenate in doc_id "
        "order; each doc's token offset is the exclusive running sum and "
        "its chunk id is offset div 256. One window per shard partition — "
        "a single shuffle on shard_id, O(1) state per row; offsets are "
        "exact integer math so the oracle replays bit-for-bit."
    ),
    tags=("sampling", "curation", "packing"),
)
def q_x13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    s = docs.select(
        "doc_id",
        T.token_count_ws(F.col("text")).cast("long").alias("n_tok"),
        C.shard_assign(F.col("doc_id"), 16).alias("shard_id"),
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        s.withColumn("token_offset", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .select(
            "shard_id",
            "doc_id",
            "n_tok",
            "token_offset",
            F.expr("token_offset div 256").alias("chunk_id"),
        )
        .orderBy("shard_id", "doc_id")
    )


@register(
    "q_n3_distinctive_terms",
    oracle=f"""
        WITH tok AS (
            SELECT source, unnest({DUCK_TOKENS}) AS tok FROM documents
        ),
        tf AS (SELECT source, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        df AS (SELECT tok, COUNT(DISTINCT source) AS df FROM tok GROUP BY tok),
        ns AS (SELECT COUNT(DISTINCT source) AS n_src FROM tok),
        scored AS (
            SELECT f.source, f.tok, f.tf, d.df,
                   (CAST(f.tf AS DOUBLE) * ns.n_src) / d.df AS score
            FROM tf f JOIN df d USING (tok) CROSS JOIN ns
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                         ORDER BY score DESC, tok) AS rk
            FROM scored
        )
        SELECT source, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS n_sources,
               score, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 3
        ORDER BY source, rk
    """,
    doc=(
        "Top-3 distinctive terms per source by rarity-weighted term "
        "frequency tf·(N/df). Linear rarity weight instead of log-idf so "
        "the score is pure IEEE mul/div of identical operands in both "
        "engines (ln() is not guaranteed correctly-rounded across "
        "libms); ranking is what matters and is deterministic with the "
        "token tiebreaker. Distributed: explode→two aggs→broadcast df "
        "join→per-source top-k window."
    ),
    tags=("text", "tfidf", "topk"),
)
def q_n3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    tok = docs.select("source", F.explode(T.tokens(F.col("text"))).alias("tok"))
    tf = tok.groupBy("source", "tok").agg(F.count("*").alias("tf"))
    df = tok.groupBy("tok").agg(F.countDistinct("source").alias("df"))
    ns = tok.agg(F.countDistinct("source").alias("n_src"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(ns))
        .select(
            "source",
            "tok",
            "tf",
            F.col("df").alias("n_sources"),
            ((F.col("tf").cast("double") * F.col("n_src")) / F.col("df")).alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select("source", "tok", "tf", "n_sources", "score", "rk")
        .orderBy("source", "rk")
    )


@register(
    "q_er1_fuzzy_match",
    oracle="""
        SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
               a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
        FROM part a JOIN part b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 2
        ORDER BY key_a, key_b
    """,
    doc=(
        "Blocked fuzzy matching (entity resolution): candidate pairs come "
        "from a blocking-key EQUI-join (p_brand), then exact Levenshtein "
        "<= 2 scores each candidate — the vendor-string dedup shape for "
        "OCR'd text (the reference's vendor names, anarcptlib.py:44-50, "
        "arrive with exactly these 1-2 character OCR edits). Cost is "
        "sum(block^2), never corpus^2; blocks shuffle on the blocking "
        "key. Both engines implement classic Levenshtein on ints — "
        "engine-portable with no rounding concerns."
    ),
    tags=("dedup", "entity-resolution", "fuzzy"),
)
def q_er1(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _er1_plan(spark, sf_dir)


def _er1_plan(
    spark: SparkSession, sf_dir: str, pairs_per_record_budget: float = 64.0
) -> DataFrame:
    # Occupancy-targeted routing (VERDICT r6 task 4): the coarse
    # (brand, length-band) blocking is linear-ish at small SF, but on a
    # clone-dense corpus its per-block pair mass grows quadratically —
    # the sf1 sweep killed the JVM after 348 s of in-block Levenshteins.
    # blocking.join_cardinality computes the EXACT candidate count of the
    # coarse join from per-key counts (O(distinct keys), no join run);
    # when it exceeds the pairs-per-record budget, the plan routes
    # through the LOSSLESS rarest-q-gram prefix filter
    # (blocking.prefix_filter_pairs, q_er2's machinery) with brand as an
    # exact blocking key — candidate mass then scales with true-match
    # density, not block². Both branches verify with the same exact
    # Levenshtein, so results (and the oracle hash) are identical either
    # way; only the candidate-generation cost differs.
    from receiptanalyzerpipeline_spark.operators import blocking as B

    part = table(spark, sf_dir, "part")
    band_w = 4
    a = part.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.col("p_brand").alias("brand"),
        F.floor(F.length("p_name") / band_w).alias("band"),
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.col("p_brand").alias("brand"),
        F.floor(F.length("p_name") / band_w).alias("band_b"),
    )
    b3 = b.withColumn(
        "band",
        F.explode(F.array(F.col("band_b") - 1, F.col("band_b"), F.col("band_b") + 1)),
    ).drop("band_b")

    n = part.count()
    coarse_pairs = B.join_cardinality(a, b3, ["brand", "band"])
    if coarse_pairs <= pairs_per_record_budget * max(n, 1):
        # Length band is lossless for edit ≤ 2 (width 4 ≥ max edit, and
        # adjacent bands are joined, so |len diff| ≤ 2 pairs can never
        # span non-adjacent bands). merge hint ⇒ both sides shuffle on
        # (brand, band): parallelism = distinct keys, never a one-task
        # broadcast probe (round-6 hardening, kept for the coarse path).
        cands = (
            a.hint("merge")
            .join(b3, ["brand", "band"])
            .where(F.col("key_a") < F.col("key_b"))
            .where((F.length("name_a") - F.length("name_b")).between(-2, 2))
            .select("key_a", "key_b", "name_a", "name_b")
        )
    else:
        # Lossless prefix-filter edit join with exact-duplicate collapse
        # (blocking.prefix_filter_edit_join, the full derivation lives
        # there): discovery and Levenshtein run once per distinct
        # (brand, name); clone members expand back mechanically.
        return B.prefix_filter_edit_join(
            part.withColumnRenamed("p_brand", "brand"),
            "p_partkey",
            "p_name",
            q=3,
            d=2,
            block_keys=("brand",),
        ).orderBy("key_a", "key_b")
    return (
        cands.select(
            "key_a",
            "key_b",
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= 2)
        .orderBy("key_a", "key_b")
    )


@register(
    "q_x14_quantile_filter",
    oracle=f"""
        WITH m AS (
            SELECT doc_id, lang,
                   CASE WHEN len({DUCK_TOKENS}) > 0
                        THEN CAST(len(list_filter({DUCK_TOKENS},
                                 x -> x IN ('the','a','of','and','to','in')))
                             AS DOUBLE) / len({DUCK_TOKENS})
                        ELSE 0.0 END AS stop_ratio
            FROM documents
        ), r AS (
            SELECT doc_id, lang, stop_ratio,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY stop_ratio DESC, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS cnt
            FROM m
        )
        SELECT doc_id, lang, stop_ratio, rn, cnt
        FROM r WHERE rn * 4 <= cnt
        ORDER BY doc_id
    """,
    doc=(
        "Group-relative quantile filter: keep each language's top quartile "
        "by stopword ratio (Gopher-style 'natural prose has stopwords' "
        "signal). Fraction-of-group selection = row_number + count over the "
        "same window partition — one shuffle on lang, and the rn*4<=cnt "
        "comparison is pure integer math, so the kept set is exact and "
        "engine-portable (no float percentile interpolation). At 100 TB "
        "per-language windows skew (en dominates); the scale path swaps the "
        "exact rank for a two-pass approx_percentile threshold + filter — "
        "same selection semantics at the boundary modulo sketch error — or "
        "salts the window partition. Exact-rank form kept here because it "
        "is the oracle-replayable ground truth the sketch is graded against."
    ),
    tags=("text", "quality", "curation", "window"),
)
def q_x14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    m = _docs(spark, sf_dir).select(
        "doc_id", "lang", T.stopword_ratio(F.col("text")).alias("stop_ratio")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("stop_ratio"), "doc_id")
    wc = Window.partitionBy("lang")
    return (
        m.select(
            "doc_id",
            "lang",
            "stop_ratio",
            F.row_number().over(w).cast("long").alias("rn"),
            F.count("*").over(wc).alias("cnt"),
        )
        .where(F.col("rn") * 4 <= F.col("cnt"))
        .orderBy("doc_id")
    )


@register(
    "q_x15_overlap_chunks",
    oracle="""
        WITH bt AS (
            SELECT doc_id, string_split(text, ' ') AS t,
                   len(string_split(text, ' ')) AS n
            FROM documents
        ),
        c AS (
            SELECT doc_id, t, n,
                   1 + (CASE WHEN n > 32 THEN (n - 32 + 23) // 24 ELSE 0 END)
                       AS n_chunks
            FROM bt
        )
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_idx,
               CAST(least(32, n - i * 24) AS BIGINT) AS chunk_tokens,
               md5(array_to_string(list_slice(t, i * 24 + 1, i * 24 + 32), ' '))
                   AS chunk_md5
        FROM c, LATERAL unnest(range(0, n_chunks)) AS u(i)
        ORDER BY doc_id, chunk_idx
    """,
    doc=(
        "Overlapping-window chunking (RAG / long-context training export): "
        "each document becomes ceil((n-32)/24)+1 chunks of 32 tokens at "
        "stride 24 (25% overlap), identified by the md5 of the joined "
        "slice. Pure map-side — sequence+explode+slice per row, NO shuffle "
        "until the final ORDER BY — so it streams at corpus scale; chunk "
        "counts are exact integer math and the slice join is "
        "byte-identical in both engines. q_x13 is the disjoint-packing "
        "sibling; this is the retrieval-index layout."
    ),
    tags=("sampling", "curation", "packing", "chunking"),
)
def q_x15(spark: SparkSession, sf_dir: str) -> DataFrame:
    C, S = 32, 24
    docs = _docs(spark, sf_dir)
    t = F.split(F.col("text"), " ")
    n = F.size(t)
    n_chunks = F.lit(1) + F.when(
        n > C, F.expr(f"(size(split(text, ' ')) - {C} + {S - 1}) div {S}")
    ).otherwise(F.lit(0))
    return (
        docs.select(
            "doc_id",
            t.alias("t"),
            n.alias("n"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.least(F.lit(C), F.col("n") - F.col("chunk_idx") * S)
            .cast("long")
            .alias("chunk_tokens"),
            F.md5(
                F.array_join(F.slice(F.col("t"), F.col("chunk_idx") * S + 1, C), " ")
            ).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


_QUALITY_RULES = "n_tokens BETWEEN 5 AND 10000 AND mean_tok_len BETWEEN 2 AND 12 AND alpha_frac >= 0.7 AND symbol_frac <= 0.1"


@register(
    "q_x16_heuristic_quality",
    oracle=f"""
        WITH t AS (SELECT doc_id, text, {DUCK_TOKENS} tk FROM documents),
        m AS (
            SELECT doc_id,
                   CAST(len(tk) AS BIGINT) AS n_tokens,
                   CAST(list_aggregate(list_transform(tk, x -> len(x)), 'sum')
                        AS DOUBLE) / len(tk) AS mean_tok_len,
                   CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))
                        AS DOUBLE) / len(tk) AS alpha_frac,
                   CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 \\t\\n]'))
                        AS DOUBLE) / len(text) AS symbol_frac
            FROM t WHERE len(tk) >= 1
        )
        SELECT doc_id, n_tokens, mean_tok_len, alpha_frac, symbol_frac,
               ({_QUALITY_RULES}) AS keep
        FROM m ORDER BY doc_id
    """,
    doc=(
        "Gopher/C4 rule-based quality pre-filter: token count, mean token "
        "length, letter-token fraction, symbol share, and the combined "
        "keep verdict. Zero shuffle — one projection per row (the "
        "scan-speed pass that prunes a 100 TB corpus before any "
        "shuffle-heavy dedup runs); every fraction is an int/int IEEE "
        "division so both engines emit identical bits."
    ),
    tags=("text", "quality", "curation"),
    bench=True,
)
def q_x16(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = C.heuristic_quality(_docs(spark, sf_dir), "doc_id", "text")
    return m.withColumn("keep", F.expr(_QUALITY_RULES)).orderBy("doc_id")


@register(
    "q_x17_substring_dedup",
    oracle=f"""
        WITH t AS (SELECT doc_id, {DUCK_TOKENS} tk FROM documents),
        wins AS (
            SELECT doc_id,
                   [md5(array_to_string(tk[i:i+7], ' '))
                    for i in range(1, len(tk) - 6)] AS ws
            FROM t WHERE len(tk) >= 8
        ),
        e AS (SELECT doc_id, unnest(ws) AS whash FROM wins),
        nd AS (SELECT whash, COUNT(DISTINCT doc_id) AS n_docs FROM e GROUP BY whash)
        SELECT e.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(SUM(CASE WHEN nd.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_windows,
               CAST(SUM(CASE WHEN nd.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                   / COUNT(*) AS dup_frac
        FROM e JOIN nd USING (whash)
        GROUP BY e.doc_id
        ORDER BY doc_id
    """,
    doc=(
        "Exact substring-span deduplication signal (Lee et al. 2022): "
        "8-token sliding windows hashed map-side (md5 inside the "
        "transform, BEFORE the explode — the shuffle carries 32-byte "
        "hashes, not w-token strings), inverted index on window hash, "
        "per-document duplicated-window fraction. Two shuffles total: a "
        "window over whash marks cross-document windows without a "
        "join-back, then one groupBy(doc_id) folds the per-doc counts. "
        "The suffix-array formulation needs a global token-stream sort; "
        "this is the shuffle-native equivalent at 100 TB."
    ),
    tags=("text", "dedup", "curation"),
    bench=True,
)
def q_x17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = C.window_hash_index(_docs(spark, sf_dir), "doc_id", "text", 8)
    # "shared by >= 2 distinct docs" as min != max over the hash
    # partition: same single shuffle as a collect_set, but O(1) state
    # per partition — a boilerplate window hash shared by millions of
    # documents at 100 TB would otherwise materialize the whole doc-id
    # set in one executor's window buffer (round 8).
    w = Window.partitionBy("whash")
    wd = e.withColumn(
        "_dup", F.min("doc_id").over(w) != F.max("doc_id").over(w)
    )
    dup = F.sum(F.when(F.col("_dup"), 1).otherwise(0)).cast("long")
    return (
        wd.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            dup.alias("n_dup_windows"),
        )
        .withColumn(
            "dup_frac", F.col("n_dup_windows").cast("double") / F.col("n_windows")
        )
        .orderBy("doc_id")
    )


_DSIR_BUCKETS = 128
_DSIR_TARGET = "src0"


@register(
    "q_x18_dsir_importance",
    oracle=f"""
        WITH t AS (SELECT doc_id, source, {DUCK_TOKENS} tk FROM documents),
        bg AS (
            SELECT doc_id, source, unnest([tk[i] || ' ' || tk[i+1]
                                           for i in range(1, len(tk))]) AS g
            FROM t WHERE len(tk) >= 2
        ),
        f AS (
            SELECT doc_id, source,
                   CAST(('0x' || substr(md5('dsir:' || g), 1, 4)) AS BIGINT)
                       % {_DSIR_BUCKETS} AS b
            FROM bg
        ),
        tot AS (
            SELECT CAST(SUM(CASE WHEN source = '{_DSIR_TARGET}' THEN 1 ELSE 0 END)
                        AS BIGINT) AS t_total,
                   COUNT(*) AS c_total
            FROM f
        ),
        tgt AS (SELECT b, COUNT(*) AS c FROM f WHERE source = '{_DSIR_TARGET}' GROUP BY b),
        cor AS (SELECT b, COUNT(*) AS c FROM f GROUP BY b),
        lr AS (
            SELECT cor.b,
                   ROUND(ln((COALESCE(tgt.c, 0) + 1.0) / (tot.t_total + {_DSIR_BUCKETS}))
                         - ln((cor.c + 1.0) / (tot.c_total + {_DSIR_BUCKETS})), 12) AS lr
            FROM cor LEFT JOIN tgt USING (b) CROSS JOIN tot
        ),
        db AS (SELECT doc_id, source, b, COUNT(*) AS n FROM f GROUP BY 1, 2, 3),
        terms AS (
            SELECT db.doc_id, db.source, db.b, db.n, db.n * lr.lr AS term
            FROM db JOIN lr USING (b)
        )
        SELECT doc_id, source,
               CAST(SUM(n) AS BIGINT) AS n_feats,
               ROUND(list_aggregate(list(term ORDER BY b), 'sum'), 9) AS log_weight
        FROM terms
        GROUP BY doc_id, source
        ORDER BY doc_id
    """,
    doc=(
        "DSIR-style importance weight (Xie et al. 2023): hashed bigram "
        "features (md5 % 128 buckets — replayable in the oracle), add-1-"
        "smoothed target-vs-corpus bucket distributions, per-document "
        "log-likelihood-ratio weight. Distributed shape: one explode + "
        "bucket projection, two 128-row distribution aggregates that "
        "broadcast back, one groupBy(doc). Cross-engine float contract: "
        "per-bucket log-ratios are ROUNDed to 12 decimals (kills ln() "
        "last-ulp divergence between libm and the JVM), and the per-doc "
        "sum folds in explicit bucket order on BOTH engines (sort_array "
        "fold here, list(... ORDER BY b) fold in DuckDB) so double "
        "addition order — and therefore every output bit — matches."
    ),
    tags=("sampling", "curation", "statistics"),
)
def q_x18(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    f = docs.select(
        "doc_id",
        "source",
        F.explode(C.word_kgrams(F.col("text"), 2)).alias("g"),
    ).select("doc_id", "source", C.dsir_bucket(F.col("g"), _DSIR_BUCKETS).alias("b"))

    # ONE tokenize+explode+bucket pass: db is the only aggregate over
    # raw features; tot/tgt/cor re-fold db's partial counts (integer-
    # exact, bit-identical results) so the corpus-sized map and its
    # (doc, source, bucket) shuffle run once and the exchange is reused
    # by every consumer — previously FOUR full tokenize passes.
    db = f.groupBy("doc_id", "source", "b").agg(F.count("*").alias("n"))
    # coalesce keeps the pre-r9 non-null contract (count(*) never NULL;
    # sum(n) is NULL on empty input) — ADVICE r9.
    tot = db.agg(
        F.coalesce(
            F.sum(F.when(F.col("source") == _DSIR_TARGET, F.col("n")).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("t_total"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("c_total"),
    )
    tgt = (
        db.where(F.col("source") == _DSIR_TARGET)
        .groupBy("b")
        .agg(F.sum("n").alias("tc"))
    )
    cor = db.groupBy("b").agg(F.sum("n").alias("cc"))
    lr = (
        cor.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + F.lit(1.0))
                    / (F.col("t_total") + F.lit(_DSIR_BUCKETS))
                )
                - F.log(
                    (F.col("cc") + F.lit(1.0))
                    / (F.col("c_total") + F.lit(_DSIR_BUCKETS))
                ),
                12,
            ).alias("lr"),
        )
    )
    terms = db.join(F.broadcast(lr), "b").select(
        "doc_id", "source", "b", "n", (F.col("n") * F.col("lr")).alias("term")
    )
    return (
        terms.groupBy("doc_id", "source")
        .agg(
            F.sum("n").cast("long").alias("n_feats"),
            F.round(
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct("b", "term"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["term"],
                ),
                9,
            ).alias("log_weight"),
        )
        .orderBy("doc_id")
    )


_QUOTA_CAP = 60


@register(
    "q_x19_quota_capping",
    oracle=f"""
        WITH r AS (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rk
            FROM documents
        )
        SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk,
               rk <= {_QUOTA_CAP} AS kept
        FROM r ORDER BY doc_id
    """,
    doc=(
        "Per-language hard quota capping: keep at most N docs per "
        "language, membership by md5 rank — the hard-cap companion to "
        "the rate-based mixture (q_x10), used to stop a head language "
        "from swamping a multilingual training mix. Deterministic: the "
        "md5 order is a seedless shuffle that is identical across "
        "engines, reruns, and cluster sizes, so a resumed export keeps "
        "exactly the same documents. One window shuffle on lang; at "
        "100 TB the rank never materializes more than the group's rows "
        "on one partition's sort spill."
    ),
    tags=("sampling", "curation"),
)
def q_x19(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    order_key = F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(order_key, F.col("doc_id"))
    return (
        docs.select(
            "doc_id",
            "lang",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .withColumn("kept", F.col("rk") <= _QUOTA_CAP)
        .orderBy("doc_id")
    )


@register(
    "q_x23_span_removal",
    oracle=f"""
        WITH t AS (SELECT doc_id, {DUCK_TOKENS} tk FROM documents),
        wh AS (
            SELECT doc_id, tk,
                   CASE WHEN len(tk) >= 8
                        THEN [md5(array_to_string(tk[i:i+7], ' '))
                              for i in range(1, len(tk) - 6)]
                        ELSE []::VARCHAR[] END AS ws
            FROM t
        ),
        e AS (
            SELECT doc_id, unnest(ws) AS whash,
                   generate_subscripts(ws, 1) - 1 AS pos
            FROM wh
        ),
        nd AS (SELECT whash FROM e GROUP BY whash HAVING COUNT(DISTINCT doc_id) >= 2),
        fl AS (
            SELECT doc_id, list(pos ORDER BY pos) AS fs
            FROM e JOIN nd USING (whash) GROUP BY doc_id
        ),
        j AS (
            SELECT wh.doc_id, wh.tk, COALESCE(fl.fs, []::BIGINT[]) AS fs
            FROM wh LEFT JOIN fl USING (doc_id)
        ),
        k AS (
            SELECT doc_id, tk,
                   [tk[i+1] for i in range(0, len(tk))
                    if len(list_filter(fs, s -> s <= i AND i < s + 8)) = 0] AS kept
            FROM j
        )
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               CAST(len(tk) - len(kept) AS BIGINT) AS n_removed,
               COALESCE(array_to_string(kept, ' '), '') AS clean_text
        FROM k ORDER BY doc_id
    """,
    doc=(
        "Span-level dedup REMOVAL (Lee et al. 2022's cut step, not just "
        "the signal): tokens covered by any 8-token window shared across "
        "documents are deleted and the unique remainder reassembled — "
        "recovers the unique tokens of partially-duplicated documents "
        "instead of dropping them whole. Same inverted-index shape as "
        "q_x17 plus one flagged-positions array per doc; the coverage "
        "mask is a map-side EXISTS. The oracle rebuilds the cleaned text "
        "with the identical comprehension."
    ),
    tags=("text", "dedup", "curation"),
)
def q_x23(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.remove_duplicated_spans(
        _docs(spark, sf_dir), "doc_id", "text", w=8
    ).orderBy("doc_id")


@register(
    "q_x24_curation_pipeline",
    oracle=f"""
        WITH t AS (SELECT doc_id, source, text, {DUCK_TOKENS} tk FROM documents),
        m AS (
            SELECT doc_id, source, text, tk,
                   CAST(len(tk) AS BIGINT) AS n_tokens,
                   CAST(list_aggregate(list_transform(tk, x -> len(x)), 'sum')
                        AS DOUBLE) / len(tk) AS mean_tok_len,
                   CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))
                        AS DOUBLE) / len(tk) AS alpha_frac,
                   CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 \\t\\n]'))
                        AS DOUBLE) / len(text) AS symbol_frac
            FROM t WHERE len(tk) >= 1 AND source <> 'src0'
        ),
        quality AS (
            SELECT doc_id, source, text, tk, n_tokens FROM m
            WHERE {_QUALITY_RULES}
        ),
        dedup AS (
            SELECT * FROM (
                SELECT q.*, ROW_NUMBER() OVER (
                    PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
                FROM quality q
            ) WHERE rn = 1
        ),
        ev AS (
            SELECT DISTINCT g FROM (
                SELECT unnest(list_distinct([array_to_string(tk[i:i+4], ' ')
                                             for i in range(1, len(tk) - 3)])) AS g
                FROM t WHERE source = 'src0' AND len(tk) >= 5
            )
        ),
        contaminated AS (
            SELECT DISTINCT d.doc_id
            FROM (SELECT doc_id, unnest(list_distinct(
                      [array_to_string(tk[i:i+4], ' ')
                       for i in range(1, len(tk) - 3)])) AS g
                  FROM dedup WHERE len(tk) >= 5) d
            JOIN ev USING (g)
        ),
        clean AS (
            SELECT d.* FROM dedup d LEFT JOIN contaminated c USING (doc_id)
            WHERE c.doc_id IS NULL
        ),
        mixed AS (
            SELECT * FROM clean
            WHERE CAST(('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4))
                       AS BIGINT)
                  < CASE WHEN source IN {_MIX_FULL!r} THEN 65536
                         ELSE {int(_MIX_TAIL_RATE * 65536)} END
        )
        SELECT CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 4))
                    AS BIGINT) % 16 AS shard_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM mixed
        GROUP BY shard_id
        ORDER BY shard_id
    """,
    doc=(
        "The END-TO-END curation pipeline as one declarative plan: "
        "quality rules (q_x16) → exact-content dedup survivors → 5-gram "
        "decontamination vs the src0 eval set (q_x11) → deterministic "
        "source mixture (q_x10) → md5 shard assignment (q_x12), audited "
        "per shard. Each stage is a filter/window on the previous one, so "
        "Catalyst fuses the map-side stages and the whole pipeline runs "
        "as one job — the composition a reference user runs daily, "
        "verified end-to-end against a single DuckDB replay of all five "
        "stages chained."
    ),
    tags=("curation", "pipeline", "dedup", "sampling"),
    bench=True,
)
def q_x24(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).where(F.col("source") != "src0")
    metrics = C.heuristic_quality(docs, "doc_id", "text")
    quality = (
        docs.join(metrics.where(F.expr(_QUALITY_RULES)).select("doc_id"), "doc_id")
    )
    fp = F.md5(F.lower(F.trim(F.col("text"))))
    w = Window.partitionBy(fp).orderBy("doc_id")
    dedup = (
        quality.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
    )
    ev = _docs(spark, sf_dir).where(F.col("source") == "src0")
    hits = C.contaminated_ids(dedup, ev, "doc_id", "text", k=5)
    clean = dedup.join(hits, "doc_id", "left_anti")
    rates = {s: 1.0 for s in _MIX_FULL}
    mixed = clean.where(
        C.mixture_keep(F.col("doc_id"), F.col("source"), rates, default=_MIX_TAIL_RATE)
    )
    return (
        mixed.select(
            C.shard_assign(F.col("doc_id"), 16).alias("shard_id"),
            F.size(T.tokens(F.col("text"))).cast("long").alias("n_tok"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
        .orderBy("shard_id")
    )


@register(
    "q_x25_lm_perplexity",
    oracle=f"""
        WITH t AS (SELECT doc_id, {DUCK_TOKENS} tk FROM documents),
        bg AS (
            SELECT doc_id, unnest([tk[i] || ' ' || tk[i+1]
                                   for i in range(1, len(tk))]) AS g
            FROM t WHERE len(tk) >= 2
        ),
        v AS (SELECT CAST(COUNT(DISTINCT g) AS BIGINT) AS vocab,
                     COUNT(*) AS total FROM bg),
        lm AS (SELECT g, COUNT(*) AS c FROM bg GROUP BY g),
        db AS (SELECT doc_id, g, COUNT(*) AS n FROM bg GROUP BY 1, 2),
        terms AS (
            SELECT db.doc_id, db.g, db.n,
                   db.n * ROUND(ln((lm.c + 1.0) / (v.total + v.vocab)), 12) AS term
            FROM db JOIN lm USING (g) CROSS JOIN v
        )
        SELECT doc_id,
               CAST(SUM(n) AS BIGINT) AS n_bigrams,
               ROUND(-list_reduce(list_prepend(0.0, list(term ORDER BY g)),
                                  (acc, x) -> acc + x)
                     / SUM(n), 9) AS nll_per_token
        FROM terms
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc=(
        "LM-perplexity quality filter (the CCNet shape, with the corpus "
        "itself as the LM): add-1-smoothed unigram-of-bigrams language "
        "model fitted on the full corpus, per-document mean negative "
        "log-likelihood per bigram — high values mark atypical/noisy "
        "documents, the model-based complement to rule filters (q_x16) "
        "and importance weights (q_x18). Cross-engine float contract as "
        "q_x18: per-bigram log-probs ROUNDed at 1e-12, per-doc sums fold "
        "in explicit bigram order on both engines, final score rounded "
        "at 1e-9. Distributed shape: the LM is a (bigram, count) "
        "aggregate joined back on the bigram key — shuffle bounded by "
        "vocabulary co-occurrence, not doc pairs; one groupBy(doc) after."
    ),
    tags=("text", "quality", "curation", "statistics"),
)
def q_x25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bg = docs.select(
        "doc_id", F.explode(C.word_kgrams(F.col("text"), 2)).alias("g")
    )
    # ONE tokenize+explode pass: db is the only aggregate computed from
    # raw bigrams; lm re-groups db's partial counts (sum over docs) and
    # v folds lm — all integer-exact, so results are bit-identical to
    # aggregating bg three times, but the corpus-sized map and its
    # shuffle run once and Catalyst reuses the exchange for every
    # consumer (sf1: 63 s -> the map was 3x of the wall).
    db = bg.groupBy("doc_id", "g").agg(F.count("*").alias("n"))
    lm = db.groupBy("g").agg(F.sum("n").alias("c"))
    v = lm.agg(
        F.count("*").cast("long").alias("vocab"),
        # coalesce: sum() is NULL on empty input; keep the count(*)-era
        # non-null contract (ADVICE r9).
        F.coalesce(F.sum("c"), F.lit(0)).alias("total"),
    )
    terms = (
        db.join(lm, "g")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "g",
            "n",
            (
                F.col("n")
                * F.round(
                    F.log((F.col("c") + F.lit(1.0)) / (F.col("total") + F.col("vocab"))),
                    12,
                )
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.sum("n").cast("long").alias("n_bigrams"),
            F.round(
                -F.aggregate(
                    F.sort_array(F.collect_list(F.struct("g", "term"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["term"],
                )
                / F.sum("n"),
                9,
            ).alias("nll_per_token"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_er2_qgram_edit_join",
    oracle="""
        SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
               a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
        FROM part a JOIN part b ON a.p_partkey < b.p_partkey
        WHERE abs(len(a.p_name) - len(b.p_name)) <= 2
          AND levenshtein(a.p_name, b.p_name) <= 2
        ORDER BY key_a, key_b
    """,
    doc=(
        "Blocking-free edit-distance self-join via q-gram PREFIX "
        "filtering (the EDJoin/AllPairs principle): each name indexes "
        "only its d*q+1 = 7 globally-rarest 3-grams (rarity = corpus "
        "gram frequency, ties by gram — deterministic); any pair within "
        "edit distance 2 must share a prefix gram, so candidates come "
        "from a rare-gram inverted-index equi-join + length filter, and "
        "exact Levenshtein verifies survivors. The ORACLE is the "
        "EXHAUSTIVE O(n^2) join — the driver's hash check therefore "
        "proves the prefix filter is lossless, not just self-consistent. "
        "Candidate volume is bounded by rare-gram bucket sizes, never "
        "n^2 — the entity-resolution shape when no blocking attribute "
        "exists (q_er1 is the blocked sibling)."
    ),
    tags=("dedup", "entity-resolution", "fuzzy", "strings"),
    bench=True,
)
def q_er2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Candidate generation + verify live in operators/blocking.
    # prefix_filter_edit_join (factored out in round 7, with the
    # exact-duplicate collapse added after q_er2 itself ground at sf1 —
    # clone groups square the gram-bucket mass AND multiply the
    # Levenshtein count 100×). With no block keys this produces exactly
    # the original q_er2 result; the exhaustive oracle proves the whole
    # composition (prefix filter + collapse/expand) lossless end-to-end
    # (tests/test_curation.py covers short/empty-string edge cases vs
    # the exhaustive join).
    from receiptanalyzerpipeline_spark.operators.blocking import (
        prefix_filter_edit_join,
    )

    parts = table(spark, sf_dir, "part")
    return prefix_filter_edit_join(
        parts, "p_partkey", "p_name", q=3, d=2
    ).orderBy("key_a", "key_b")


# --- Fellegi–Sunter probabilistic record linkage (q_er3) ----------------
#
# m-probabilities: P(field agrees | true match), declared to match the
# synthetic perturbation rates below. Their complements are spelled as
# literal constants (NOT computed as 1.0 - m) so the Spark plan and the
# DuckDB oracle evaluate the IDENTICAL IEEE double literal — 1.0 - 0.8
# is 0.19999999999999996, and f-string interpolation of a rounded value
# on one side only is a hash mismatch (round-4 lesson).
_FS_M = {"name": 0.75, "seg": 0.8, "bal": 0.9}
_FS_NM = {"name": 0.25, "seg": 0.2, "bal": 0.1}
_FS_MATCH, _FS_POSSIBLE = 100.0, 10.0


def _fs_md5_sql(salt: str) -> str:
    """DuckDB replay of operators.sampling.hash_bucket (16-bit md5)."""
    return (
        f"CAST(('0x' || substr(md5('{salt}:' || CAST(c_custkey AS VARCHAR)), 1, 4)) "
        "AS BIGINT)"
    )


@register(
    "q_er3_linkage_scoring",
    oracle=f"""
        WITH a AS (
            SELECT c_custkey AS key_a, c_name AS name_a, c_mktsegment AS seg_a,
                   CAST(c_nationkey AS BIGINT) AS nat,
                   CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bb_a
            FROM customer
        ),
        b AS (
            SELECT c_custkey AS key_b,
                   CASE WHEN {_fs_md5_sql('ern')} % 4 = 0
                        THEN substr(c_name, 1, length(c_name) - 1) || 'X'
                        ELSE c_name END AS name_b,
                   CASE WHEN {_fs_md5_sql('ers')} % 5 = 0
                        THEN 'UNKNOWN' ELSE c_mktsegment END AS seg_b,
                   CAST(c_nationkey AS BIGINT) AS nat,
                   CAST(floor(c_acctbal / 1000.0) AS BIGINT)
                     + CASE WHEN {_fs_md5_sql('erb')} % 10 = 0 THEN 1 ELSE 0 END AS bb_b
            FROM customer
        ),
        u_name AS (
            SELECT CAST(SUM(cnt * cnt) AS DOUBLE)
                   / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE)) AS u_name
            FROM (SELECT COUNT(*) AS cnt FROM a GROUP BY name_a) t
        ),
        u_seg AS (
            SELECT CAST(SUM(cnt * cnt) AS DOUBLE)
                   / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE)) AS u_seg
            FROM (SELECT COUNT(*) AS cnt FROM a GROUP BY seg_a) t
        ),
        u_bal AS (
            SELECT CAST(SUM(cnt * cnt) AS DOUBLE)
                   / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE)) AS u_bal
            FROM (SELECT COUNT(*) AS cnt FROM a GROUP BY bb_a) t
        ),
        pairs AS (
            SELECT a.key_a, b.key_b,
                   a.name_a = b.name_b AS ag_name,
                   a.seg_a = b.seg_b AS ag_seg,
                   a.bb_a = b.bb_b AS ag_bal,
                   u_name.u_name, u_seg.u_seg, u_bal.u_bal
            FROM a JOIN b ON a.nat = b.nat, u_name, u_seg, u_bal
        ),
        scored AS (
            SELECT key_a, key_b, ag_name, ag_seg, ag_bal,
                   (CASE WHEN ag_name THEN {_FS_M['name']} / u_name
                         ELSE {_FS_NM['name']} / (1.0 - u_name) END)
                 * (CASE WHEN ag_seg THEN {_FS_M['seg']} / u_seg
                         ELSE {_FS_NM['seg']} / (1.0 - u_seg) END)
                 * (CASE WHEN ag_bal THEN {_FS_M['bal']} / u_bal
                         ELSE {_FS_NM['bal']} / (1.0 - u_bal) END) AS weight
            FROM pairs
        )
        SELECT key_a, key_b, ag_name, ag_seg, ag_bal, weight,
               CASE WHEN weight >= {_FS_MATCH} THEN 'match'
                    ELSE 'possible' END AS cls
        FROM scored WHERE weight >= {_FS_POSSIBLE}
        ORDER BY key_a, key_b
    """,
    doc=(
        "Fellegi–Sunter probabilistic record linkage over two 'sources' "
        "(customer vs a deterministically md5-perturbed clone: 1/4 of "
        "names corrupted, 1/5 of segments blanked, 1/10 of balance "
        "buckets shifted — the OCR-noise shape of the reference's "
        "vendor strings, anarcptlib.py:44-50). Candidates are BLOCKED on "
        "nationkey; each pair gets a field-agreement vector, and the "
        "match weight is the product of per-field likelihood ratios "
        "m/u (agree) vs (1-m)/(1-u) (disagree), with u-probabilities "
        "ESTIMATED FROM DATA as the random-agreement rate sum(cnt^2)/N^2 "
        "per field — the classical FS estimator. The weight stays an "
        "ODDS RATIO (no log): a fixed-order product/division of "
        "identical IEEE doubles is bit-deterministic across engines, "
        "where ln() is not (q_n3 precedent); thresholds are just "
        "exponentiated versions of the usual log-weight cuts. "
        "Scale design — MULTI-PASS BLOCKING: the Spark side generates "
        "candidates as the union of a (nation,name) pass (near-unique, "
        "~O(matches)) and a COMPOSITE (nation,segment,bucket) pass "
        "(single low-cardinality block keys grow pair counts "
        "quadratically; composing them multiplies block cardinalities), "
        "while the ORACLE blocks on nation alone. A pair skipped by "
        "both passes disagrees on name and on >=1 of segment/bucket, "
        "bounding its weight at ~0.7 << the emit threshold (see inline "
        "derivation), so the skip is provably lossless and the driver's "
        "hash match IS that proof (q_er2 precedent). u-estimation is "
        "three one-row aggs broadcast to the pass joins; measured 10x: "
        "candidates scale with matches, not corpus^2."
    ),
    tags=("entity-resolution", "linkage", "dedup", "statistics"),
    bench=True,
)
def q_er3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_mktsegment").alias("seg_a"),
        F.col("c_nationkey").cast("long").alias("nat"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bb_a"),
    )
    b = cust.select(
        F.col("c_custkey").alias("key_b"),
        F.when(
            C.hash_bucket(F.col("c_custkey"), salt="ern") % 4 == 0,
            F.concat(
                F.substring(F.col("c_name"), 1, F.length("c_name") - 1), F.lit("X")
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("name_b"),
        F.when(C.hash_bucket(F.col("c_custkey"), salt="ers") % 5 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg_b"),
        F.col("c_nationkey").cast("long").alias("nat"),
        (
            F.floor(F.col("c_acctbal") / 1000.0).cast("long")
            + F.when(C.hash_bucket(F.col("c_custkey"), salt="erb") % 10 == 0, 1).otherwise(0)
        ).alias("bb_b"),
    )

    def _u(src: DataFrame, col: str, out: str) -> DataFrame:
        # u = sum(cnt^2)/N^2 with N = sum(cnt): one aggregation, no
        # driver-side count() action.
        cnts = src.groupBy(col).agg(F.count("*").alias("cnt"))
        return cnts.agg(
            (
                F.sum(F.col("cnt") * F.col("cnt")).cast("double")
                / (F.sum("cnt").cast("double") * F.sum("cnt").cast("double"))
            ).alias(out)
        )

    # Multi-pass blocking. Pass 1 joins on (nation, name) — near-unique,
    # so candidates ~ O(true matches). Pass 2 joins on the COMPOSITE
    # (nation, segment, bucket): single low-cardinality fields make
    # blocks (hence pairs) grow quadratically with the corpus, while the
    # composite key multiplies their cardinalities (25x6x~11 blocks).
    # A pair skipped by both passes disagrees on name AND on at least one
    # of {segment, bucket}: its weight is at most
    # NM_name/(1-u_name) * max(m_seg/u_seg * NM_bal/(1-u_bal),
    #                          NM_seg/(1-u_seg) * m_bal/u_bal)
    # <= 0.26 * max(4.8*0.12, 0.26*10.8) ~ 0.7 << W_POSSIBLE, using
    # u_seg >= 1/6 and u_bal >= 1/11 (Cauchy-Schwarz over <=6 segment and
    # <=11 bucket values) — so the skip is lossless, and the oracle's
    # nation-only-blocked replay proves it via the driver hash.
    def _pass(*fields: tuple) -> DataFrame:
        cond = a["nat"] == b["nat"]
        for fa, fb in fields:
            cond = cond & (a[fa] == b[fb])
        return a.join(b, cond).select(
            "key_a", "name_a", "seg_a", "bb_a", "key_b", "name_b", "seg_b", "bb_b"
        )

    cands = (
        _pass(("name_a", "name_b"))
        .unionByName(_pass(("seg_a", "seg_b"), ("bb_a", "bb_b")))
        .dropDuplicates(["key_a", "key_b"])
    )
    pairs = (
        cands.crossJoin(F.broadcast(_u(a, "name_a", "u_name")))
        .crossJoin(F.broadcast(_u(a, "seg_a", "u_seg")))
        .crossJoin(F.broadcast(_u(a, "bb_a", "u_bal")))
        .select(
            "key_a",
            "key_b",
            (F.col("name_a") == F.col("name_b")).alias("ag_name"),
            (F.col("seg_a") == F.col("seg_b")).alias("ag_seg"),
            (F.col("bb_a") == F.col("bb_b")).alias("ag_bal"),
            "u_name",
            "u_seg",
            "u_bal",
        )
    )
    weight = (
        F.when(F.col("ag_name"), F.lit(_FS_M["name"]) / F.col("u_name"))
        .otherwise(F.lit(_FS_NM["name"]) / (F.lit(1.0) - F.col("u_name")))
        * F.when(F.col("ag_seg"), F.lit(_FS_M["seg"]) / F.col("u_seg"))
        .otherwise(F.lit(_FS_NM["seg"]) / (F.lit(1.0) - F.col("u_seg")))
        * F.when(F.col("ag_bal"), F.lit(_FS_M["bal"]) / F.col("u_bal"))
        .otherwise(F.lit(_FS_NM["bal"]) / (F.lit(1.0) - F.col("u_bal")))
    )
    return (
        pairs.withColumn("weight", weight)
        .where(F.col("weight") >= _FS_POSSIBLE)
        .select(
            "key_a",
            "key_b",
            "ag_name",
            "ag_seg",
            "ag_bal",
            "weight",
            F.when(F.col("weight") >= _FS_MATCH, "match")
            .otherwise("possible")
            .alias("cls"),
        )
        .orderBy("key_a", "key_b")
    )


@register(
    "q_x29_temperature_mixture",
    oracle="""
        WITH c AS (
            SELECT source, COUNT(*) AS n,
                   CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1048576.0) AS BIGINT) AS wq
            FROM documents GROUP BY source
        ),
        s AS (
            SELECT CAST(SUM(wq) AS BIGINT) AS sum_wq,
                   CAST(SUM(n) AS BIGINT) AS n_corpus
            FROM c
        ),
        r AS (
            SELECT c.source, c.n,
                   CASE WHEN (CAST(s.n_corpus AS DOUBLE) * 0.5)
                             * CAST(c.wq AS DOUBLE) / CAST(s.sum_wq AS DOUBLE)
                             / CAST(c.n AS DOUBLE) > 1.0
                        THEN 1.0
                        ELSE (CAST(s.n_corpus AS DOUBLE) * 0.5)
                             * CAST(c.wq AS DOUBLE) / CAST(s.sum_wq AS DOUBLE)
                             / CAST(c.n AS DOUBLE) END AS rate
            FROM c, s
        ),
        kept AS (
            SELECT d.source,
                   CASE WHEN CAST(('0x' || substr(md5('tmix:' || CAST(d.doc_id AS VARCHAR)), 1, 4))
                             AS BIGINT) < CAST(floor(r.rate * 65536.0) AS BIGINT)
                        THEN 1 ELSE 0 END AS keep
            FROM documents d JOIN r USING (source)
        )
        SELECT source, CAST(r.n AS BIGINT) AS n_total, r.rate,
               CAST(SUM(k.keep) AS BIGINT) AS n_kept,
               CAST(SUM(k.keep) AS DOUBLE) / r.n AS kept_frac
        FROM kept k JOIN r USING (source)
        GROUP BY source, r.n, r.rate
        ORDER BY source
    """,
    doc=(
        "Temperature-based mixture sampling (tau = 0.5, the multilingual-"
        "pretraining reweighting): source s's target share becomes "
        "n_s^tau / sum_t n_t^tau of a half-corpus budget, flattening head "
        "sources and boosting the tail. Per-source keep RATES are derived "
        "from data in one tiny agg (sqrt is IEEE-754 correctly rounded — "
        "portable across engines, unlike ln/pow — and the divisions run "
        "in one fixed order); per-doc membership is the md5 16-bit bucket "
        "vs floor(rate*65536), so reruns, retries, and repartitioning "
        "keep the identical sample (q_x10's contract, now with "
        "data-derived rates). Scale: counts agg + broadcast rate join + "
        "map-side hash compare — one shuffle on source, no RNG state."
    ),
    tags=("sampling", "curation", "mixture"),
)
def q_x29(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # Source weights n^0.5 are floor-quantized to 2^-20 units so the
    # cross-source SUM is exact BIGINT math — a float sum's accumulation
    # order is partition-dependent and would differ between engines.
    # sqrt itself is IEEE-754 correctly rounded (unlike ln/pow), so the
    # quantized weights are identical on both sides.
    c = docs.groupBy("source").agg(
        F.count("*").alias("n"),
        F.floor(F.sqrt(F.count("*").cast("double")) * 1048576.0)
        .cast("long")
        .alias("wq"),
    )
    s = c.agg(
        F.sum("wq").cast("long").alias("sum_wq"),
        F.sum("n").cast("long").alias("n_corpus"),
    )
    raw_rate = (
        (F.col("n_corpus").cast("double") * F.lit(0.5))
        * F.col("wq").cast("double")
        / F.col("sum_wq").cast("double")
        / F.col("n").cast("double")
    )
    r = c.crossJoin(F.broadcast(s)).select(
        "source",
        "n",
        F.when(raw_rate > 1.0, F.lit(1.0)).otherwise(raw_rate).alias("rate"),
    )
    kept = docs.join(F.broadcast(r), "source").select(
        "source",
        "n",
        "rate",
        (
            C.hash_bucket(F.col("doc_id"), salt="tmix")
            < F.floor(F.col("rate") * 65536.0).cast("long")
        )
        .cast("long")
        .alias("keep"),
    )
    return (
        kept.groupBy("source", "n", "rate")
        .agg(
            F.sum("keep").alias("n_kept"),
            (F.sum("keep").cast("double") / F.col("n")).alias("kept_frac"),
        )
        .select(
            "source",
            F.col("n").alias("n_total"),
            "rate",
            "n_kept",
            "kept_frac",
        )
        .orderBy("source")
    )


@register(
    "q_x36_streaming_membership",
    oracle=f"""
        WITH t AS (SELECT doc_id, text, {DUCK_TOKENS} tk FROM documents),
        m AS (
            SELECT doc_id, text,
                   CAST(len(tk) AS BIGINT) AS n_tokens,
                   CAST(list_aggregate(list_transform(tk, x -> len(x)), 'sum')
                        AS DOUBLE) / len(tk) AS mean_tok_len,
                   CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))
                        AS DOUBLE) / len(tk) AS alpha_frac,
                   CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 \\t\\n]'))
                        AS DOUBLE) / len(text) AS symbol_frac
            FROM t WHERE len(tk) >= 1
        ),
        quality AS (
            SELECT doc_id, text FROM m WHERE {_QUALITY_RULES}
        ),
        dedup AS (
            SELECT doc_id FROM (
                SELECT doc_id, ROW_NUMBER() OVER (
                    PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
                FROM quality
            ) WHERE rn = 1
        )
        SELECT CAST(('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 4))
                    AS BIGINT) % 16 AS shard_id,
               doc_id
        FROM dedup
        ORDER BY shard_id, doc_id
    """,
    doc=(
        "The STREAMING curation loop's shard membership, driver-checked "
        "against the batch-SQL replay (VERDICT r8 task 8): documents are "
        "delivered as two id-ordered file chunks through the checkpointed "
        "availableNow topology (streaming/curation_stream.py — quality "
        "rules, snapshot-backed exact dedup whose state is the snapshot "
        "table itself, md5 shard export with exactly-once batch commits), "
        "then the exported (shard_id, doc_id) membership is returned. "
        "Arrival order = id order, so the streaming first-arrived dedup "
        "representative equals the batch smallest-id representative and "
        "membership is bit-identical to the one-shot batch pipeline the "
        "oracle replays. Scale note: per-batch cost is O(batch + state "
        "probe); the corpus-side state is bucketable (bucket_fps) so the "
        "anti-join scans O(|batch buckets|/N) of the table at 100 TB."
    ),
    tags=("streaming", "curation", "dedup"),
)
def q_x36(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import os
    import shutil
    import tempfile

    from receiptanalyzerpipeline_spark.streaming.curation_stream import (
        read_shard_membership,
        run_streaming_curation,
    )

    docs = _docs(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="rap-streammem-")
    try:
        src = os.path.join(base, "in")
        os.makedirs(src)
        # Two id-ordered chunks with pinned mtimes: the file source
        # delivers them as two deterministic micro-batches in id order.
        med = docs.selectExpr("percentile(doc_id, 0.5) AS m").first()["m"]
        halves = [
            docs.where(F.col("doc_id") <= med),
            docs.where(F.col("doc_id") > med),
        ]
        for i, half in enumerate(halves):
            tmpd = os.path.join(base, f"w{i}")
            half.coalesce(1).write.parquet(tmpd)
            (part,) = _glob.glob(os.path.join(tmpd, "part-*.parquet"))
            dest = os.path.join(src, f"chunk_{i}.parquet")
            shutil.move(part, dest)
            os.utime(dest, (1_700_000_000 + i * 10,) * 2)
        q = run_streaming_curation(
            spark,
            src,
            snapshot_path=os.path.join(base, "snapshot"),
            shards_path=os.path.join(base, "shards"),
            checkpoint=os.path.join(base, "ckpt"),
            schema=docs.schema,
            max_files_per_trigger=1,
        )
        q.awaitTermination(600)
        if q.exception() is not None:
            raise RuntimeError(f"streaming curation failed: {q.exception()}")
        mem = (
            read_shard_membership(spark, os.path.join(base, "shards"))
            .select(
                F.col("shard_id").cast("long").alias("shard_id"),
                F.col("doc_id").cast("long").alias("doc_id"),
            )
            .orderBy("shard_id", "doc_id")
        )
        # Small result (one row per surviving doc): pin it so the tmp
        # dirs (input chunks, checkpoint, snapshot state, shard export)
        # can be deleted before returning.
        return mem.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
