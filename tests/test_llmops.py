"""Dedup / similarity / text-analysis operator tests beyond the oracle gate:
LSH recall properties, winnowing fingerprints, determinism of the
approximate ops."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_minhash_candidates_cover_all_true_pairs(spark, sf_dir):
    """LSH(16 bands × 2 rows) candidates must contain every exhaustive
    Jaccard≥0.5 pair (miss prob ≈ 3e-8 at j=0.8)."""
    from receiptanalyzerpipeline_spark.catalog import table
    from receiptanalyzerpipeline_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    docs = table(spark, sf_dir, "documents")
    truth = {
        (r["id_a"], r["id_b"])
        for r in jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5).collect()
    }
    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            minhash_signatures(docs, "doc_id", "text", k=3, n_hashes=32), 32, 2
        ).collect()
    }
    assert truth, "testdata should contain engineered near-dup pairs"
    assert truth <= cands, f"LSH missed true pairs: {truth - cands}"


def test_ann_lsh_deterministic_and_useful(spark, sf_dir):
    from receiptanalyzerpipeline_spark.plans import REGISTRY

    q = REGISTRY["q_x5_ann_lsh"]
    r1 = sorted(map(tuple, q.spark(spark, sf_dir).collect()))
    r2 = sorted(map(tuple, q.spark(spark, sf_dir).collect()))
    assert r1 == r2, "approximate top-k must still be deterministic"

    bf = {
        (r["q_id"], r["vec_id"])
        for r in REGISTRY["q_n2_embedding_topk"].spark(spark, sf_dir).collect()
        if r["rank"] <= 3
    }
    ann = {(r[0], r[1]) for r in r1}
    recall = len(bf & ann) / len(bf)
    # Random embeddings (max pair cosine ≈ 0.51) are the worst case for
    # hyperplane LSH; clustered real-world embeddings recall far higher.
    assert recall >= 0.3, f"ANN recall collapsed: {recall}"


def test_winnow_fingerprints(spark):
    from receiptanalyzerpipeline_spark.operators.textanalysis import winnow_fingerprints

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # identical
            (3, "the quick brown fox vaults over the lazy dog"),  # near-dup
            (4, "completely different content entirely here"),
            (5, "ab"),  # shorter than k
        ],
        ["doc_id", "text"],
    ).select("doc_id", winnow_fingerprints("text").alias("fp"))
    got = {r["doc_id"]: r["fp"] for r in df.collect()}
    assert got[1] == got[2], "identical docs → identical fingerprint sets"
    inter13 = len(set(got[1]) & set(got[3]))
    union13 = len(set(got[1]) | set(got[3]))
    assert inter13 / union13 > 0.5, "near-dups share most fingerprints"
    inter14 = len(set(got[1]) & set(got[4]))
    assert inter14 == 0, "unrelated docs share nothing"
    assert got[5] == [], "sub-k text → empty fingerprint set"


def test_exact_dedup_idempotent(spark, sf_dir):
    """Property (SURVEY §5.2.4): dedup(dedup(x)) == dedup(x)."""
    from receiptanalyzerpipeline_spark.catalog import table
    from receiptanalyzerpipeline_spark.operators.dedup import exact_dedup

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    once = exact_dedup(docs.unionByName(docs), "text", "doc_id")
    twice = exact_dedup(once, "text", "doc_id")
    assert once.count() == twice.count() == docs.count()


def test_simhash_identical_token_sets_collide(spark):
    from receiptanalyzerpipeline_spark.operators.dedup import simhash_signatures

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha beta"), (3, "delta epsilon zeta")],
        ["doc_id", "text"],
    )
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(df, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2], "same distinct-token set → same simhash"
    assert sigs[1] != sigs[3]


def test_ann_ivf_deterministic_and_useful(spark, sf_dir):
    from receiptanalyzerpipeline_spark.catalog import table
    from receiptanalyzerpipeline_spark.operators import ivf
    from receiptanalyzerpipeline_spark.plans import REGISTRY

    emb = table(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    centroids = ivf.fit_centroids(emb, n_cells=16)

    def run():
        return sorted(
            map(tuple, ivf.ivf_topk(emb, probes, centroids, k=3, nprobe=4).collect())
        )

    r1, r2 = run(), run()
    assert r1 == r2, "IVF top-k must be deterministic (fit + assign + search)"

    bf = {
        (r["q_id"], r["vec_id"])
        for r in REGISTRY["q_n2_embedding_topk"].spark(spark, sf_dir).collect()
        if r["rank"] <= 3
    }
    ann = {(r[0], r[1]) for r in r1}
    recall = len(bf & ann) / len(bf)
    # nprobe=4 of 16 cells scores ~25% of a *uniform* corpus — the floor
    # here reflects that worst case; clustered embeddings recall higher.
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"

    # q_x6's driver surface: exact top-3 rows + the recall invariant as data.
    rows = REGISTRY["q_x6_ann_ivf"].spark(spark, sf_dir).collect()
    assert len(rows) == 30 and all(r["ivf_recall_ok"] for r in rows)


def test_ivf_cells_partition_corpus(spark, sf_dir):
    from receiptanalyzerpipeline_spark.catalog import table
    from receiptanalyzerpipeline_spark.operators import ivf

    emb = table(spark, sf_dir, "embeddings")
    C = ivf.fit_centroids(emb, n_cells=8, sample_n=256)
    assigned = ivf.assign_cells(emb, C)
    counts = {
        r["cell"]: r["n"]
        for r in assigned.groupBy("cell").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == emb.count()
    assert all(0 <= c < 8 for c in counts)


def test_connected_components_transitive_chain(spark):
    """A-B, B-C, C-D chain collapses to one min-labeled cluster even though
    most pairs were never emitted; disjoint pair stays separate."""
    from receiptanalyzerpipeline_spark.operators.components import (
        connected_components,
        dedup_survivors,
    )

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (9, 8)], "id_a long, id_b long"
    )
    labels = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 8: 8, 9: 8}

    corpus = spark.createDataFrame([(i, f"d{i}") for i in [1, 2, 3, 4, 7, 8, 9]],
                                   "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in dedup_survivors(corpus, connected_components(edges)).collect())
    # min of each cluster survives; 7 has no edges and survives untouched.
    assert kept == [1, 7, 8]


def test_q_d7_matches_recursive_cte_oracle(spark, sf_dir, oracle_con):
    from receiptanalyzerpipeline_spark.oracle import compare
    from receiptanalyzerpipeline_spark.plans import REGISTRY

    q = REGISTRY["q_d7_dedup_clusters"]
    res = compare("q_d7", q.spark(spark, sf_dir), q.oracle, oracle_con)
    assert res.ok, str(res)


def test_deterministic_split_stability_and_weights(spark):
    """Same key → same split under any partitioning/rerun; observed
    fractions near the 90/5/5 request; leakage guard: cluster members
    share a split."""
    from pyspark.sql import functions as F

    from receiptanalyzerpipeline_spark.operators.sampling import (
        deterministic_split,
        hash_sample,
    )

    keys = spark.range(0, 20000).select(F.col("id").alias("k"))
    split_col = deterministic_split(F.col("k"), {"train": 0.9, "valid": 0.05, "test": 0.05})
    once = {r["k"]: r["s"] for r in keys.select("k", split_col.alias("s")).collect()}
    again = {
        r["k"]: r["s"]
        for r in keys.repartition(13).select("k", split_col.alias("s")).collect()
    }
    assert once == again, "split must not depend on partitioning"
    from collections import Counter

    frac = Counter(once.values())
    assert abs(frac["train"] / 20000 - 0.90) < 0.01
    assert abs(frac["valid"] / 20000 - 0.05) < 0.005
    assert abs(frac["test"] / 20000 - 0.05) < 0.005

    sampled = hash_sample(keys, "k", fraction=0.25)
    n1, n2 = sampled.count(), hash_sample(keys.repartition(7), "k", 0.25).count()
    assert n1 == n2 and abs(n1 / 20000 - 0.25) < 0.01


def test_redact_pii_examples(spark):
    from pyspark.sql import functions as F

    from receiptanalyzerpipeline_spark.operators.textanalysis import (
        count_emails,
        count_phones,
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+spam@mail.example.org thanks"),
            (2, "call +1 (555) 010-7788 now"),
            (3, "no pii here at all"),
            (4, "two: a@b.io and c.d@e.co plus 555 010 7788 done"),
        ],
        "id long, t string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            count_emails("t").alias("ne"),
            count_phones("t").alias("np"),
            redact_pii("t").alias("red"),
        ).collect()
    }
    assert rows[1]["ne"] == 1 and "<EMAIL>" in rows[1]["red"]
    assert "jane" not in rows[1]["red"]
    assert rows[2]["np"] == 1 and "<PHONE>" in rows[2]["red"]
    assert "555" not in rows[2]["red"]
    assert rows[3]["ne"] == 0 and rows[3]["np"] == 0 and rows[3]["red"] == "no pii here at all"
    assert rows[4]["ne"] == 2 and rows[4]["np"] == 1


def test_embedder_content_keyed(spark):
    """embed_documents with key_col='text': identical texts get identical
    vectors (content-keyed), distinct texts differ."""
    from receiptanalyzerpipeline_spark.operators.embedder import (
        StubEmbeddingBackend,
        embed_documents,
    )

    docs = spark.createDataFrame(
        [(0, "same text"), (1, "same text"), (2, "other text")],
        "doc_id: long, text: string",
    )
    rows = {
        r["doc_id"]: tuple(r["embedding"])
        for r in embed_documents(docs, StubEmbeddingBackend(dim=8), key_col="text").collect()
    }
    assert rows[0] == rows[1] != rows[2]
    assert len(rows[0]) == 8


def test_minhash_empty_doc_signature_is_seed_only(spark):
    """Docs with no shingles (empty/short/NULL text) share one signature
    whose components are the SEED-ONLY hashes xxhash64(lit(i)) — Spark's
    xxhash64 skips NULL inputs, so MIN never sees NULL and the old 2^62
    sentinel coalesce was dead code (ADVICE r10, removed). Their band
    collisions die in the exact-Jaccard verify, so no pairs leak."""
    from receiptanalyzerpipeline_spark.operators.dedup import (
        minhash_lsh_jaccard_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "ab"), (3, None), (4, "one two three four five")],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: list(r["sig"]) for r in
            minhash_signatures(docs, "doc_id", "text").collect()}
    seed_only = [
        r["h"]
        for r in spark.range(32).select(
            F.xxhash64(F.col("id").cast("int")).alias("h")
        ).orderBy("id").collect()
    ]
    assert sigs[1] == sigs[3] == seed_only  # shingle-less docs
    assert sigs[2] == seed_only  # < k tokens: all-NULL shingle array
    assert sigs[4] != seed_only and None not in sigs[4]
    # The shared signature never becomes a declared pair.
    pairs = minhash_lsh_jaccard_pairs(docs, "doc_id", "text").collect()
    assert pairs == []


def test_auto_n_blocks_memory_bound():
    """auto_n_blocks must pick the smallest B whose two per-group
    (n/B, dims) float32 matrices fit the worker budget (VERDICT r10
    task 5) — except at the hi cap, where the budget must be raised."""
    import math

    from receiptanalyzerpipeline_spark.operators.similarity import (
        COSINE_BLOCK_BUDGET_BYTES,
        auto_n_blocks,
    )

    for n in (1, 100, 5_000, 200_000, 10**7, 10**9, 10**11):
        for dims in (16, 64, 1024):
            b = auto_n_blocks(n, dims)
            assert 16 <= b <= 4096
            if b < 4096:
                per_group = 2 * math.ceil(n / b) * dims * 4
                # ceil slack: one extra row per side at most.
                assert per_group <= COSINE_BLOCK_BUDGET_BYTES + 8 * dims
    # Monotone in n for fixed dims (more data never fewer blocks).
    seq = [auto_n_blocks(n, 64) for n in (10**6, 10**8, 10**9, 10**10)]
    assert seq == sorted(seq)


def test_cosine_neardup_block_count_invariant(spark):
    """The block count is a pure execution parameter: auto-derived,
    small, and large B must produce the identical pair set."""
    from receiptanalyzerpipeline_spark.operators.similarity import (
        cosine_neardup_pairs,
    )

    docs = spark.createDataFrame(
        [(i, [float((i * j) % 7 - 3) for j in range(8)]) for i in range(24)],
        "vec_id long, embedding array<double>",
    )
    ref = sorted(
        map(tuple, cosine_neardup_pairs(docs, 0.8, n_blocks=16, dims=8).collect())
    )
    assert ref  # the grid has engineered collisions
    for nb in (None, 3):
        got = sorted(
            map(
                tuple,
                cosine_neardup_pairs(docs, 0.8, n_blocks=nb, dims=8).collect(),
            )
        )
        assert got == ref
