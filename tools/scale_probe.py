#!/usr/bin/env python
"""10x scale probe: replicate the fact tables of an sf dir with
key-shifted copies, then time registry keys at 1x vs 10x and report
the growth ratio. A scale-safe operator grows at or below ~linear
(ratio <= factor, usually far below on local[32] where the 1x runs
are overhead-dominated); a super-linear ratio flags a pair-space or
state blowup that 100 TB would amplify.

Usage: python tools/scale_probe.py key1 key2 ... [--factor 10]
        [--unique-text] [--counts]
Writes the replicated dir to .scratch/sf_probe_<factor>x (reused if
present) and prints one JSON line with per-key (base_s, big_s, ratio).

--unique-text (VERDICT r9 item 5): every document copy i gets a
per-copy 6-char token suffix, making copies token-DISJOINT — so the
set-similarity pair ops (jaccard/containment) see exactly linear pair
growth. For the edit-distance op the guarantee is weaker and
data-dependent: copy-0-vs-copy-i pairs differ by ~6 chars/token (past
the lev·5 <= max(len) band), but two SUFFIXED copies i,j differ by
only ~1 digit/token (lev ≈ n vs a ~2.6n band — inside it), and such
pairs are excluded only because the per-copy digit falls INSIDE the
16-char blocking prefix for this corpus's short first tokens (blocks
differ across copies). On a corpus with ≥11-char first tokens,
cross-copy same-doc pairs WOULD qualify as genuine near-dups — check
the --counts output-rows ratio (exactly ×factor here) before reading
the time ratio. --counts additionally records output rows and (for
the pair ops) candidate-join rows at both scales, separating blocking
cost from verify cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# per-table key shifts applied to copy i (column -> stride)
SHIFTS = {
    "events": {"event_id": 10**9, "user_id": 10**6},
    "embeddings": {"vec_id": 10**9},
    "orders": {"o_orderkey": 10**7, "o_custkey": 10**6},
    "lineitem": {"l_orderkey": 10**7},
    "customer": {"c_custkey": 10**6},
    "documents": {"doc_id": 10**8},
}
COPY_AS_IS = ("region", "nation", "supplier", "part")


def build(spark, factor: int, unique_text: bool = False) -> str:
    import hashlib

    from pyspark.sql import functions as F

    # replica dir keyed on (base dir, factor): reusing an sf0.1-derived
    # replica under a different SPARK_GRAFT_SF_DIR would silently time
    # the wrong data
    tag = hashlib.md5(BASE.encode()).hexdigest()[:8]
    if unique_text:
        tag += "_uq"
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"sf_probe_{factor}x_{tag}",
    )
    if os.path.isdir(out) and os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    for t, shifts in SHIFTS.items():
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        parts = []
        for i in range(factor):
            c = df
            for col, stride in shifts.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            if unique_text and t == "documents" and i > 0:
                # per-copy token suffix: copies become token-DISJOINT
                # (jaccard/containment cross-copy overlap = 0), so the
                # set-similarity pair space grows exactly linearly;
                # within-copy pair structure is preserved (a
                # consistent token renaming). Edit-distance linearity
                # is data-dependent — see the module docstring.
                c = c.withColumn(
                    "text",
                    F.regexp_replace("text", r"(\S+)", rf"$1_c{i:04d}"),
                )
                if "n_chars" in c.columns:
                    c = c.withColumn(
                        "n_chars",
                        F.length("text").cast(dict(df.dtypes)["n_chars"]),
                    )
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    for t in COPY_AS_IS:
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    open(os.path.join(out, "_DONE"), "w").close()
    return out


def time_key(spark, fn, sf, reps=2) -> float:
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _candidate_count(spark, key: str, sf: str) -> int | None:
    """Candidate-join cardinality for the pair ops (the blocking stage,
    before the expensive verify) — the number that separates blocking
    cost from verify cost in a probe."""
    from pyspark.sql import functions as F

    from landsat_tair_data_pipeline_spark.operators import dedup
    from landsat_tair_data_pipeline_spark.sources.tables import table

    if key in ("dedup_containment_pairs", "dedup_jaccard_pairs",
               "dedup_containment_asym"):
        docs = (
            table(spark, sf, "documents")
            .select(
                "doc_id",
                "source",
                F.array_distinct(
                    F.transform(dedup.TOKENS(), lambda t: F.xxhash64(t))
                ).alias("toks"),
            )
            .withColumn("sz", F.size("toks"))
        )
        if key == "dedup_containment_asym":
            cand = dedup._asym_containment_candidates(docs, 7999, 10000)
        else:
            cand = dedup._prefix_filter_pairs(docs, 3999, 10000)
        return cand.select("doc_a", "doc_b").count()
    if key == "ext_dedup_near":
        # blocking stage: banded-MinHash distinct candidate pairs,
        # before the exact-jaccard verify join-back (r13: RAW tokens —
        # the md5-derived mod-prime family hashes inside _minhash_mins)
        docs = table(spark, sf, "documents").select(
            "doc_id", F.array_distinct(dedup.TOKENS()).alias("toks")
        )
        return dedup._banded_candidates(docs).count()
    if key == "dedup_simhash_hamming":
        # blocking stage: the 4x8-bit pigeonhole band equi-join volume
        # (doc_a < doc_b, before canonical-band dedup + hamming cut) -
        # the number that exposes 8-bit-band bucket saturation at scale
        return dedup._simhash32_band_join(spark, sf).count()
    if key == "dedup_simhash_hamming_wide":
        # blocking stage: the 4x32-bit pigeonhole band equi-join volume
        # (doc_a < doc_b, before canonical-band dedup + hamming cut) —
        # compare against dedup_simhash_hamming's 8-bit saturation
        return dedup._simhash128_band_join(spark, sf).count()
    if key in ("sim_knn_graph_ivf", "dedup_semdedup"):
        # blocking stage: IVF-cell candidate volume — ordered
        # (prober, member) pairs for the graph, unordered within-cell
        # pairs for semdedup; the number that must stay sub-quadratic
        from landsat_tair_data_pipeline_spark.operators import similarity

        ranked = similarity._ivf_graph_ranked(spark, sf)
        members = ranked.where(F.col("rk") == 1).select(
            F.col("vec_id").alias("m_id"), F.col("cid").alias("cell")
        )
        if key == "sim_knn_graph_ivf":
            probers = ranked.select(
                F.col("vec_id").alias("p_id"), F.col("cid").alias("cell")
            )
            return (
                probers.join(members, "cell")
                .where(F.col("p_id") != F.col("m_id"))
                .count()
            )
        a = members.select(F.col("m_id").alias("va"), "cell")
        b = members.select(F.col("m_id").alias("vb"), "cell")
        return a.join(b, "cell").where(F.col("va") < F.col("vb")).count()
    if key == "sim_ann_cross_join":
        # blocking stage: cross-corpus candidate volume — (B-probe,
        # A-member) pairs through the index-side-seeded cells
        from landsat_tair_data_pipeline_spark.operators import similarity

        emb = similarity._emb(spark, sf).select("vec_id", "v")
        ranked = similarity._ranked_cells(
            emb, emb.where(F.col("vec_id") % 2 == 0)
        )
        members = ranked.where(
            (F.col("rk") == 1) & (F.col("vec_id") % 2 == 0)
        ).select(F.col("vec_id").alias("m_id"), F.col("cid").alias("cell"))
        probers = ranked.where(F.col("vec_id") % 2 == 1).select(
            F.col("vec_id").alias("p_id"), F.col("cid").alias("cell")
        )
        return probers.join(members, "cell").count()
    if key == "dedup_edit_distance_pairs":
        # blocking stage: same 16-char prefix + lossless length band,
        # before the levenshtein verify (mirrors the operator's join)
        docs = table(spark, sf, "documents").select(
            "doc_id",
            F.substring(F.trim(F.lower(F.col("text"))), 1, 16).alias("blk"),
            F.length(F.trim(F.lower(F.col("text")))).alias("len"),
        )
        a = docs.select(
            F.col("doc_id").alias("doc_a"),
            "blk",
            F.col("len").alias("len_a"),
        )
        b = docs.select(
            F.col("doc_id").alias("doc_b"),
            "blk",
            F.col("len").alias("len_b"),
        )
        return (
            a.join(b, "blk")
            .where(
                (F.col("doc_a") < F.col("doc_b"))
                & (
                    F.abs(F.col("len_a") - F.col("len_b")) * 5
                    <= F.greatest("len_a", "len_b")
                )
            )
            .count()
        )
    return None


def main() -> None:
    argv = sys.argv[1:]
    factor = 10
    unique_text = counts = False
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--factor"):
            if "=" in a:
                factor = int(a.split("=", 1)[1])
            else:
                factor = int(argv[i + 1])
                i += 1  # consume the flag's value, not a query key
        elif a == "--unique-text":
            unique_text = True
        elif a == "--counts":
            counts = True
        else:
            args.append(a)
        i += 1
    if not args:
        raise SystemExit(__doc__)
    from landsat_tair_data_pipeline_spark.registry import spark_queries
    from landsat_tair_data_pipeline_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()
    missing = [k for k in args if k not in qs]
    if missing:
        raise SystemExit(f"unknown keys: {missing}")
    big = build(spark, factor, unique_text)
    # warmup
    qs[args[0]](spark, BASE).write.format("noop").mode("overwrite").save()
    out = {}
    for k in args:
        b = time_key(spark, qs[k], BASE)
        g = time_key(spark, qs[k], big)
        out[k] = {
            "base_s": b,
            "big_s": g,
            "ratio": round(g / b, 2),
            # per-input-row normalized: <= ~2 means the op is
            # input-linear (local 1x runs are overhead-dominated, so
            # sub-1 values are common)
            "ratio_per_input": round(g / (b * factor), 3),
        }
        if counts:
            out[k]["rows_base"] = qs[k](spark, BASE).count()
            out[k]["rows_big"] = qs[k](spark, big).count()
            cb = _candidate_count(spark, k, BASE)
            if cb is not None:
                out[k]["candidates_base"] = cb
                out[k]["candidates_big"] = _candidate_count(spark, k, big)
        print(json.dumps({k: out[k]}), flush=True)
    print(
        json.dumps(
            {
                "factor": factor,
                "base": BASE,
                "unique_text": unique_text,
                "keys": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
