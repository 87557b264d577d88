"""Deduplication operators (SURVEY N1-N3), each with a 100 TB-shaped plan.

Generalizes the reference's only dedup mechanism — rename-to-perceptual-
hash collision (anarcpt/anarcptlib.py:155-159) — into the full family a
training-data pipeline needs:

    exact_dedup          hash-groupBy, deterministic survivor
    shingle/jaccard      exact n-gram Jaccard via shingle-inverted-index join
    minhash signatures   md5-based minhash + banded LSH candidate pruning
    simhash              64→60-bit sign-aggregate + pigeonhole-banded pairs

Scale posture:
- The Jaccard inverted-index join shuffles on *shingle*, never doc×doc.
- MinHash/LSH makes candidate generation O(near-dups), not O(n²): band
  buckets are the join key; exact Jaccard runs only on candidates.
- SimHash pairs join on 15-bit band equality: for Hamming ≤ 3 over a
  60-bit signature, the pigeonhole principle guarantees one of the 4
  bands matches exactly, so the banded join loses nothing.
- All hashes derive from md5 (stable across engines, sessions, and
  languages) — no JVM-hash nondeterminism in results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from receiptanalyzerpipeline_spark.operators.textanalysis import tokens

# 15 hex chars = 60 bits: fits signed int64 positively in Spark AND DuckDB.
HASH_BITS = 60


def md5_hash60(c: Column, seed: str | Column = "") -> Column:
    """Deterministic 60-bit hash of a string column (md5-derived)."""
    seeded = F.concat(F.lit(seed) if isinstance(seed, str) else seed, F.lit(":"), c)
    return F.conv(F.substring(F.md5(seeded), 1, 15), 16, 10).cast("bigint")


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one deterministic survivor (lowest id) per exact content.

    Hash-groupBy shape: shuffles on the content fingerprint, so skew equals
    duplicate multiplicity — AQE skew-join/agg handles pathological cases.
    """
    fp = F.md5(F.lower(F.trim(F.col(text_col))))
    w = Window.partitionBy(fp).orderBy(F.col(id_col))
    return df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")


def word_shingles(c: Column, k: int = 3) -> Column:
    """Distinct word k-shingles as array<string>."""
    toks = tokens(c)
    n = F.size(toks)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.when(
                n >= k, F.array_join(F.slice(toks, i + 1, k), " ")
            ),
        )
    )


def shingle_index(docs: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Inverted index (doc_id, shingle) — the join substrate for exact Jaccard."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("shingle"),
    ).where(F.col("shingle").isNotNull())


def jaccard_pairs(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold via the inverted-index self-join.

    Shuffle key is the shingle, so cost scales with co-occurrence, not n².
    (At 100 TB you put minhash_lsh_candidates in front; this is also the
    verify stage for those candidates.)
    """
    # Every join side here is corpus-proportional, so the strategy must
    # be size-independent: Spark's post-shuffle size ESTIMATES can fall
    # under autoBroadcastJoinThreshold while the true built size is far
    # larger, and on a default 1 GB driver (the gate's shape) the
    # broadcast build OOMs — caught by the sf1 sweep. merge = SMJ.
    idx = shingle_index(docs, id_col, text_col, k).hint("merge")
    sizes = idx.groupBy("doc_id").agg(F.count("*").alias("n_shingles")).hint("merge")
    a, b = idx.alias("a"), idx.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame, id_col: str, text_col: str, k: int = 3, n_hashes: int = 32
) -> DataFrame:
    """(doc_id, sig array<bigint>[n_hashes]) — elementwise min over shingle
    hashes, one md5 seed per hash function. Pure map-side per doc."""
    sh = word_shingles(F.col(text_col), k)
    per_shingle = F.transform(
        sh,
        lambda s: F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda i: F.conv(
                F.substring(F.md5(F.concat(i.cast("string"), F.lit(":"), s)), 1, 15), 16, 10
            ).cast("bigint"),
        ),
    )
    sig = F.reduce(
        per_shingle,
        F.array_repeat(F.lit(2**62).cast("bigint"), n_hashes),
        lambda acc, hs: F.zip_with(acc, hs, lambda x, y: F.least(x, y)),
    )
    return docs.select(F.col(id_col).alias("doc_id"), sig.alias("sig"))


def minhash_lsh_candidates(
    sigs: DataFrame, n_hashes: int = 32, rows_per_band: int = 2
) -> DataFrame:
    """Candidate pairs from banded LSH: docs sharing ≥1 band bucket.

    rows_per_band=2 with 16 bands ⇒ a pair at Jaccard 0.8 is missed with
    probability (1−0.8²)¹⁶ ≈ 3e-8 — effectively total recall for real
    near-dups, at the cost of more candidates (all false positives are
    removed by the exact-Jaccard verify stage). The band bucket is the
    shuffle key: candidate generation is O(collisions), never O(n²).
    """
    n_bands = n_hashes // rows_per_band
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band).alias("vals"),
                ),
            )
        ).alias("bucket"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    n_hashes: int = 32,
    rows_per_band: int = 2,
) -> DataFrame:
    """LSH-pruned near-dup pairs with *exact* Jaccard on the candidates.

    The scale path: signatures are map-side, candidates join on band
    buckets, and the expensive shingle-intersection join runs only on the
    candidate set."""
    cands = minhash_lsh_candidates(
        minhash_signatures(docs, id_col, text_col, k, n_hashes), n_hashes, rows_per_band
    )
    # Size-independent strategies for corpus-proportional sides (see
    # jaccard_pairs): a mis-estimated auto-broadcast of the shingle index
    # OOMs a default driver at sf1 — sf1-sweep finding, round 6.
    idx = shingle_index(docs, id_col, text_col, k).hint("merge")
    sizes = idx.groupBy("doc_id").agg(F.count("*").alias("n_shingles")).hint("merge")
    inter = (
        cands.join(idx.alias("ia"), F.col("id_a") == F.col("ia.doc_id"))
        .join(
            idx.alias("ib"),
            (F.col("id_b") == F.col("ib.doc_id")) & (F.col("ia.shingle") == F.col("ib.shingle")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash_signatures(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, simhash bigint): per-bit majority vote over distinct-token
    60-bit hashes. Explode-by-bit keeps everything in codegen'd aggregates;
    rows = |tokens| × 60, shuffled by (doc, bit) then (doc)."""
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok")
    )
    hashed = tok.select("doc_id", md5_hash60(F.col("tok"), "sim").alias("h"))
    bits = hashed.select(
        "doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(HASH_BITS - 1))).alias("b")
    )
    # Column-valued shift amounts need SQL exprs (the Python shiftleft/
    # shiftright wrappers only take literal ints).
    votes = bits.groupBy("doc_id", "b").agg(
        F.sum(
            F.when(F.expr("shiftright(h, b)").bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias("vote")
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("vote") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(
                F.lit(0).cast("bigint")
            )
        ).alias("simhash")
    )


def simhash_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming via 4×15-bit banded join.

    Pigeonhole: ≤3 differing bits over 4 bands ⇒ at least one band is
    bit-identical, so the band-equality join has perfect recall while
    keeping the shuffle key a 15-bit integer."""
    n_bands = 4
    band_bits = HASH_BITS // n_bands  # 15
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), i * band_bits)
                        .bitwiseAND((1 << band_bits) - 1)
                        .alias("key"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bucket"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def incremental_dedup_status(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Classify each batch document against an EXISTING corpus:
    ``exact_dup`` (content fingerprint already present), ``near_dup``
    (k-gram Jaccard ≥ threshold with some corpus doc), else ``new`` —
    the continuous-corpus-building shape, where dedup runs new data
    against the accumulated index instead of within one snapshot.

    Both probes are asymmetric joins: fingerprint left-join against the
    distinct corpus fingerprint set, and a batch-side × corpus-side
    shingle inverted-index join (shuffle key = shingle, never doc×doc).
    At 100 TB the corpus-side fingerprint set and shingle index are
    precomputed, stored, and bucketed by their join key, so each
    incremental batch only shuffles ITS OWN rows into co-located
    buckets; a bloom filter of batch shingles prunes the corpus-index
    scan (session.py runtime bloom filters do this automatically once
    the batch side is selective).

    Returns (id_col, status) — one row per batch document.
    """
    from receiptanalyzerpipeline_spark.operators.textanalysis import content_fingerprint

    bfp = batch.select(
        F.col(id_col), content_fingerprint(F.col(text_col)).alias("__fp")
    )
    cfp = corpus.select(content_fingerprint(F.col(text_col)).alias("__fp")).distinct()
    exact = bfp.join(cfp, "__fp", "left_semi").select(id_col).withColumn(
        "__exact", F.lit(True)
    )

    bidx = shingle_index(batch, id_col, text_col, k)
    cidx = shingle_index(corpus, id_col, text_col, k)
    bsz = bidx.groupBy("doc_id").agg(F.count("*").alias("n_b"))
    csz = cidx.groupBy("doc_id").agg(F.count("*").alias("n_c"))
    inter = (
        bidx.alias("b")
        .join(cidx.alias("c"), F.col("b.shingle") == F.col("c.shingle"))
        .groupBy(F.col("b.doc_id").alias("bid"), F.col("c.doc_id").alias("cid"))
        .agg(F.count("*").alias("n_inter"))
    )
    near = (
        inter.join(bsz.select(F.col("doc_id").alias("bid"), "n_b"), "bid")
        .join(csz.select(F.col("doc_id").alias("cid"), "n_c"), "cid")
        .where(
            F.col("n_inter").cast("double")
            / (F.col("n_b") + F.col("n_c") - F.col("n_inter"))
            >= threshold
        )
        .select(F.col("bid").alias(id_col))
        .distinct()
        .withColumn("__near", F.lit(True))
    )
    return (
        batch.select(id_col)
        .join(exact, id_col, "left")
        .join(near, id_col, "left")
        .select(
            id_col,
            F.when(F.col("__exact"), "exact_dup")
            .when(F.col("__near"), "near_dup")
            .otherwise("new")
            .alias("status"),
        )
    )
