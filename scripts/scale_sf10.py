"""sf10 anchor for the slow tail (VERDICT r9 task 5).

Every committed growth exponent was measured 10x -> 100x on single
OPERATORS or light queries; the sweep itself tops out at sf1 (10x).
This runs the four heaviest SUITES — q_d2_neardup_suite,
q_x10_selection_suite, q_er2_qgram_edit_join, q_x25_model_scoring — at
x1/x10/x100 CORPUS GROWTH under the full-host session (local[16]/8g,
the SCALE_*_100X methodology: the quantity under test is the exponent,
not fit), and compares the actual x100 wall to the exponent-predicted
wall extrapolated from this run's own x10 wall:

    predicted_x100 = wall_x10 * 10^alpha_committed

Growth regime — corpus GROWTH, not duplication. The sf1 sweep already
measures the duplication regime (exact-clone replicas, where pair
output explodes quadratically in clone-group size and rep-collapse is
what keeps cost ~ distinct content). Cloning to x100 is unusable for
the pair suites — q_er2's 552 M member pairs at x10 become ~55 G at
x100 — and answers a different question. Here each replica is NEW
content, so output grows linearly and the anchor isolates ENGINE
scaling from combinatorial output growth. Per-suite transforms, chosen
so each replica's INTERNAL pair structure is preserved while
cross-replica matches are impossible:

- q_er2 (part): p_partkey shifts by r*stride; p_name gains a 6-char
  digit-triple tag prefix (``d1 d1 d1 d2 d2 d2``) — any two distinct
  tags are >= 3 edits apart, so no cross-replica pair can pass d=2,
  while within a replica every pairwise distance is untouched (shared
  equal-length prefix). Pair rows must therefore scale EXACTLY
  linearly — asserted, which evidences the prefix filter's
  losslessness at 2 M names.
- q_d2 (documents+embeddings): per-replica WORD BIJECTION (every word
  suffixed with the replica tag) — word 3-shingle sets map bijectively
  so in-replica Jaccard is EXACT and cross-replica shingle overlap is
  zero; ngram part rows must scale exactly linearly — asserted.
  Embeddings get a per-replica SIGNED PERMUTATION of dimensions (an
  orthogonal transform: in-replica cosines exact, cross-replica
  cosines scramble to ~N(0, 1/sqrt(64))). The 0.45-threshold cosine
  part is therefore NOT exactly linear: clustered 64-dim data cannot
  grow 100x without some rotated centroids landing within the
  threshold tail (measured ~19 leaked pairs per replica pair at x2) —
  which mirrors reality: at fixed threshold, pair DENSITY grows with
  corpus density. q_d5 is recorded as a density probe (rows + wall at
  each scale; the engine claim is cost ~ output, i.e. flat rows/s),
  not an exactness probe. simhash/semantic parts are statistically
  preserved (token hashes change per replica).
- q_x10 / q_x25 (documents): doc_id shift only, content identical —
  these suites do per-doc map-side work + grouped aggregation, no
  cross-doc matching, so identical-content replicas just fatten every
  group 100x (and this matches the regime the committed q_x25 prior
  alpha=1.04 was measured in, scripts/family_scale_100x.py).

Honest caveats, recorded in the artifact: vocab grows linearly with
replicas in the q_d2 regime (real corpora grow sublinearly — shingle
dictionaries here are pessimistically large), and constant-vocab in
the q_x25 regime (bigram state constant, counts fatten — the
optimistic extreme). Walls bracket reality between the two.

Run:  python scripts/scale_sf10.py [--out SCALE_SF10.json]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# suite -> (alpha_committed, source of the prior)
PRIORS = {
    "q_d2_neardup_suite": (None, "no committed suite exponent; linear null (alpha=1.0)"),
    "q_x10_selection_suite": (None, "no committed suite exponent; linear null (alpha=1.0)"),
    "q_er2_qgram_edit_join": (None, "no committed suite exponent; linear null (alpha=1.0)"),
    "q_x25_model_scoring": (1.04, "SCALE_FAMILY_100X.json q_x25_lm_perplexity"),
}

# suite -> row-exactness probes: queries whose per-replica structure is
# preserved EXACTLY by the transform, so rows(xN) == N * rows(x1).
EXACT_LINEAR_PROBES = {
    "q_er2_qgram_edit_join": ["q_er2_qgram_edit_join"],
    "q_d2_neardup_suite": ["q_d2_ngram_jaccard"],
}

# suite -> threshold-similarity probes where output DENSITY legitimately
# grows with corpus growth (see docstring); recorded, not asserted.
DENSITY_PROBES = {
    "q_d2_neardup_suite": ["q_d5_cosine_neardup"],
}

DIM = 64  # embeddings dim (TESTDATA.md)


def _stride(con, src: str, table: str, col: str) -> int:
    hi = con.execute(
        f"SELECT max({col}) FROM read_parquet('{src}/{table}.parquet')"
    ).fetchone()[0]
    return int(hi) + 1


def _link_rest(src: str, dst: str, built: set[str]) -> None:
    for t in ALL_TABLES:
        if t in built:
            continue
        link = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(src, f"{t}.parquet"), link)


def build_part_growth(con, src: str, dst: str, times: int) -> None:
    """part x times: key shift + 6-char digit-triple name tag."""
    stride = _stride(con, src, "part", "p_partkey")
    tag = (
        "repeat(CAST((g.r // 10) AS VARCHAR), 3) || "
        "repeat(CAST((g.r % 10) AS VARCHAR), 3)"
    )
    con.execute(
        f"COPY (SELECT p.* REPLACE ("
        f"  CAST(p.p_partkey + g.r * {stride} AS BIGINT) AS p_partkey,"
        f"  {tag} || ' ' || p.p_name AS p_name) "
        f"FROM read_parquet('{src}/part.parquet') p, range({times}) g(r)) "
        f"TO '{dst}/part.parquet' (FORMAT PARQUET)"
    )


def build_documents_growth(
    con, src: str, dst: str, times: int, word_bijection: bool
) -> None:
    """documents x times: key shift; optionally per-replica word bijection."""
    stride = _stride(con, src, "documents", "doc_id")
    if word_bijection:
        text = (
            "array_to_string(list_transform(string_split(d.text, ' '), "
            "w -> w || 'x' || lpad(CAST(g.r AS VARCHAR), 2, '0')), ' ')"
        )
    else:
        text = "d.text"
    con.execute(
        f"COPY (SELECT d.* REPLACE ("
        f"  CAST(d.doc_id + g.r * {stride} AS BIGINT) AS doc_id,"
        f"  {text} AS text) "
        f"FROM read_parquet('{src}/documents.parquet') d, range({times}) g(r)) "
        f"TO '{dst}/documents.parquet' (FORMAT PARQUET)"
    )


def build_embeddings_growth(con, src: str, dst: str, times: int) -> None:
    """embeddings x times: key shift + per-replica signed permutation
    (orthogonal => in-replica cosines exact, cross-replica ~0)."""
    stride = _stride(con, src, "embeddings", "vec_id")
    con.execute("DROP TABLE IF EXISTS _rp")
    con.execute("CREATE TEMP TABLE _rp(r INT, perm INT[], signs FLOAT[])")
    for r in range(times):
        # Deterministic per-replica signed permutation from md5 (no
        # PYTHONHASHSEED dependence).
        def h(i: int, salt: str) -> int:
            return int.from_bytes(
                hashlib.md5(f"{salt}:{r}:{i}".encode()).digest()[:8], "big"
            )

        perm = sorted(range(1, DIM + 1), key=lambda i: h(i, "perm"))
        signs = [1.0 if h(i, "sign") % 2 == 0 else -1.0 for i in range(1, DIM + 1)]
        con.execute("INSERT INTO _rp VALUES (?, ?, ?)", [r, perm, signs])
    con.execute(
        f"COPY (SELECT CAST(e.vec_id + g.r * {stride} AS BIGINT) AS vec_id, "
        f"  list_transform(list_zip(g.perm, g.signs), "
        f"    s -> e.embedding[s[1]] * s[2]) AS embedding, "
        f"  e.label AS label "
        f"FROM read_parquet('{src}/embeddings.parquet') e, _rp g) "
        f"TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"
    )


def build_regime_dirs(src: str, root: str, times: int) -> dict[str, str]:
    """Build the three regime dirs for one scale; returns suite -> dir."""
    import duckdb

    con = duckdb.connect()
    dirs: dict[str, str] = {}

    d_er2 = os.path.join(root, f"er2_x{times}")
    if not os.path.isdir(d_er2):
        os.makedirs(d_er2)
        build_part_growth(con, src, d_er2, times)
        _link_rest(src, d_er2, {"part"})
    dirs["q_er2_qgram_edit_join"] = d_er2

    d_d2 = os.path.join(root, f"d2_x{times}")
    if not os.path.isdir(d_d2):
        os.makedirs(d_d2)
        build_documents_growth(con, src, d_d2, times, word_bijection=True)
        build_embeddings_growth(con, src, d_d2, times)
        _link_rest(src, d_d2, {"documents", "embeddings"})
    dirs["q_d2_neardup_suite"] = d_d2

    d_sel = os.path.join(root, f"sel_x{times}")
    if not os.path.isdir(d_sel):
        os.makedirs(d_sel)
        build_documents_growth(con, src, d_sel, times, word_bijection=False)
        _link_rest(src, d_sel, {"documents"})
    dirs["q_x10_selection_suite"] = d_sel
    dirs["q_x25_model_scoring"] = d_sel

    con.close()
    return dirs


def measure(spark, name: str, sf_dir: str, timeout_s: float) -> dict:
    """xor-folded full materialization (the sweep's statistic) with a
    cancellation timer — a suite that blows the cap records 'timeout'
    instead of wedging the anchor run."""
    from pyspark.sql import functions as F

    from receiptanalyzerpipeline_spark.plans import REGISTRY

    sc = spark.sparkContext
    group = f"sf10-{name}-{os.path.basename(sf_dir)}"
    done = threading.Event()

    def _cancel():
        if not done.wait(timeout_s):
            sc.cancelJobGroup(group)

    t = threading.Thread(target=_cancel, daemon=True)
    t.start()
    sc.setJobGroup(group, "sf10 anchor", interruptOnCancel=True)
    t0 = time.time()
    try:
        df = REGISTRY[name].spark(spark, sf_dir)
        n, h = (
            df.select(F.xxhash64(*df.columns).alias("__h"))
            .agg(F.count(F.lit(1)), F.expr("bit_xor(__h)"))
            .first()
        )
        return {
            "wall_s": round(time.time() - t0, 1),
            "rows": int(n),
            "xor_hash": int(h) if h is not None else None,
        }
    except Exception as e:  # noqa: BLE001
        wall = round(time.time() - t0, 1)
        kind = "timeout" if wall >= timeout_s * 0.95 else "err"
        return {"wall_s": wall, kind: f"{type(e).__name__}: {str(e)[:200]}"}
    finally:
        done.set()
        sc.setJobGroup("", "")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--root", default="/tmp/sf10_growth")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALE_SF10.json"))
    ap.add_argument("--timeout", type=float, default=3000.0)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    scales = (1, 10, 100)
    dirs_by_scale: dict[int, dict[str, str]] = {}
    for times in scales:
        print(f"# building x{times} regime dirs", file=sys.stderr, flush=True)
        dirs_by_scale[times] = build_regime_dirs(args.src, args.root, times)

    from pyspark.sql import SparkSession

    from receiptanalyzerpipeline_spark.session import prepare_session

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("scale-sf10")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .getOrCreate()
    )
    prepare_session(spark)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {
        "regime": "corpus growth (new content per replica); see module docstring",
        "ops": {},
        "exact_linear": {},
        "recorded_at": time.time(),
    }

    def flush():
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)

    for name in PRIORS:
        row: dict = {}
        for times in scales:
            sf_dir = dirs_by_scale[times][name]
            print(f"# {name} x{times}", file=sys.stderr, flush=True)
            row[f"x{times}"] = measure(spark, name, sf_dir, args.timeout)
            print(json.dumps({name: {f"x{times}": row[f"x{times}"]}}), flush=True)
            out["ops"][name] = row
            flush()
        a, b = row.get("x10", {}), row.get("x100", {})
        if "rows" in a and "rows" in b:
            row["alpha_wall_x10_x100"] = round(math.log10(b["wall_s"] / a["wall_s"]), 2)
            if "rows" in row.get("x1", {}):
                row["alpha_wall_x1_x10"] = round(
                    math.log10(a["wall_s"] / row["x1"]["wall_s"]), 2
                )
            if a["rows"] and b["rows"]:
                row["alpha_rows"] = round(math.log10(b["rows"] / a["rows"]), 2)
                row["rows_per_s"] = {
                    "x10": round(a["rows"] / a["wall_s"]),
                    "x100": round(b["rows"] / b["wall_s"]),
                }
            alpha_c, src_doc = PRIORS[name]
            alpha_used = 1.0 if alpha_c is None else alpha_c
            pred = a["wall_s"] * (10 ** alpha_used)
            row["prediction"] = {
                "alpha": alpha_used,
                "source": src_doc,
                "predicted_x100_wall_s": round(pred, 1),
                "actual_over_predicted": round(b["wall_s"] / pred, 2),
            }
        out["ops"][name] = row
        flush()

    # Row-exactness probes: transforms that preserve per-replica pair
    # structure exactly must produce rows(xN) == N * rows(x1).
    from receiptanalyzerpipeline_spark.plans import REGISTRY

    for suite, probes in EXACT_LINEAR_PROBES.items():
        for probe in probes:
            counts = {}
            for times in scales:
                sf_dir = dirs_by_scale[times][suite]
                counts[f"x{times}"] = REGISTRY[probe].spark(spark, sf_dir).count()
            ok = (
                counts["x10"] == 10 * counts["x1"]
                and counts["x100"] == 100 * counts["x1"]
            )
            out["exact_linear"][probe] = {"counts": counts, "exactly_linear": ok}
            print(json.dumps({probe: out["exact_linear"][probe]}), flush=True)
            flush()

    # Density probes: threshold-similarity outputs whose pair density
    # legitimately grows with corpus growth — record rows + wall so the
    # suite's wall exponent can be attributed; the engine claim is
    # cost ~ output (flat rows/s), not linear rows.
    out["density"] = {}
    for suite, probes in DENSITY_PROBES.items():
        for probe in probes:
            rows = {}
            for times in scales:
                sf_dir = dirs_by_scale[times][suite]
                rows[f"x{times}"] = measure(spark, probe, sf_dir, args.timeout)
            out["density"][probe] = rows
            print(json.dumps({probe: rows}), flush=True)
            flush()

    print(json.dumps({n: r.get("prediction") for n, r in out["ops"].items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
