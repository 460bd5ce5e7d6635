#!/usr/bin/env python
"""Stage-level timing of the _pipeline_v67 funnel (optimization round
tooling): rebuilds the v8-shaped funnel piece by piece, forcing each
stage with a noop write and timing it, so the composed pipeline's
seconds are attributable to stages. Mirrors dedup._pipeline_v67 —
keep in sync by hand; this is a measurement harness, not product code.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def t(label, df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"{label:28s} {dt:7.3f}s", flush=True)
    return dt


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from landsat_tair_data_pipeline_spark.operators import dedup as D
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        TOKENS,
        _asym_containment_candidates,
        _md5_long,
        _url_ranked,
        dedup_paragraph,
    )
    from landsat_tair_data_pipeline_spark.operators.similarity import (
        dedup_semdedup,
        sim_semantic_decontam,
    )
    from landsat_tair_data_pipeline_spark.operators.text import text_dsir_weight
    from landsat_tair_data_pipeline_spark.session import get_spark
    from landsat_tair_data_pipeline_spark.sources.tables import table
    from landsat_tair_data_pipeline_spark.util import persist_tracked

    spark = get_spark("profile-v67")
    spark.sparkContext.setLogLevel("ERROR")
    # warm
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (p for p in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    total0 = time.perf_counter()
    docs = table(spark, sf, "documents").select("doc_id", "source", "text")
    t0 = time.perf_counter()
    url_dups = _url_ranked(spark, sf).where(F.col("_rn") > 1).select("doc_id")
    base = docs.join(url_dups, "doc_id", "left_anti").localCheckpoint()
    print(f"{'stage0 url checkpoint':28s} {time.perf_counter()-t0:7.3f}s", flush=True)

    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(TOKENS()))))
    flagged = (
        base.select("source", fp.alias("f"))
        .groupBy("source")
        .agg(
            F.round(
                1.0 - F.countDistinct("f").cast("double") / F.count(F.lit(1)) + 1e-9, 4
            ).alias("dr")
        )
        .where(F.col("dr") > 0.055)
        .select("source")
    )
    d0 = persist_tracked(base.join(F.broadcast(flagged), "source", "left_anti"))
    t("d0 domain-flag", d0)
    keep1 = d0.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    d1 = persist_tracked(d0.join(keep1.select("doc_id"), "doc_id", "left_semi"))
    t("d1 exact-dedup", d1)
    bad_para = dedup_paragraph(spark, sf).where(F.col("keep_doc") == 0).select("doc_id")
    d1b = persist_tracked(d1.join(bad_para, "doc_id", "left_anti"))
    t("d1b paragraph", d1b)
    tok = d1b.select("doc_id", F.explode(TOKENS()).alias("tok"))
    cnt = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    ent = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.sum(F.col("c").cast("double") * F.log2("c")).alias("_clog"),
    )
    ent = ent.select(
        "doc_id",
        "n_tokens",
        F.round(F.log2("n_tokens") - F.col("_clog") / F.col("n_tokens") + 1e-9, 6).alias(
            "entropy"
        ),
    )
    d2 = persist_tracked(
        d1b.join(ent, "doc_id").where(
            (F.col("entropy") >= 4.0) & (F.col("n_tokens") >= 20)
        )
    )
    t("d2 entropy", d2)
    docs2 = d2.select(
        "doc_id",
        "source",
        F.array_distinct(F.transform(TOKENS(), _md5_long)).alias("toks"),
    ).withColumn("sz", F.size("toks"))
    pairs = _asym_containment_candidates(docs2, 7999, 10000)
    containment = F.round(
        F.col("inter").cast("double") / F.col("sz_a").cast("double") + 1e-9, 4
    )
    cdrops = (
        pairs.where(
            (containment >= 0.8)
            & (
                (F.col("sz_b") > F.col("sz_a"))
                | ((F.col("sz_b") == F.col("sz_a")) & (F.col("doc_b") < F.col("doc_a")))
            )
        )
        .select(F.col("doc_a").alias("doc_id"))
        .distinct()
    )
    kept_c = persist_tracked(d2.join(cdrops, "doc_id", "left_anti"))
    t("kept_c containment", kept_c)
    sem_drops = dedup_semdedup(spark, sf).select(F.col("vec_id").alias("doc_id"))
    kept_sem = kept_c.join(sem_drops, "doc_id", "left_anti").localCheckpoint()
    print(f"{'kept_sem semdedup ckpt':28s} (in next line)")
    t("kept_sem", kept_sem)
    dec_drops = sim_semantic_decontam(spark, sf).select("doc_id")
    kept_dec = kept_sem.join(dec_drops, "doc_id", "left_anti").localCheckpoint()
    t("kept_dec decontam", kept_dec)
    from landsat_tair_data_pipeline_spark.util import global_prefix

    dsir_w = text_dsir_weight(spark, sf).select("doc_id", "log_weight")
    scored = kept_dec.join(dsir_w, "doc_id").withColumn("_negw", -F.col("log_weight"))
    kept = (
        global_prefix(scored, ["_negw", "doc_id"])
        .where(F.col("_prefix") <= F.expr("(_total + 1) DIV 2"))
        .drop("_negw", "_prefix", "_total")
        .localCheckpoint()
    )
    t("kept dsir-half", kept)
    # funnel count branches + mix — mirrors the r16 union-tagged
    # single-pass count block (and times the r15 9-aggregate shape
    # beside it so the VERDICT r15 item-5 delta stays attributable)
    from functools import reduce

    from pyspark.sql import DataFrame

    layers = [
        (docs, "n_raw"),
        (base, "n_after_url"),
        (d0, "n_after_domain"),
        (d1, "n_after_exact"),
        (d1b, "n_after_boilerplate"),
        (d2, "n_after_quality"),
        (kept_c, "n_after_containment"),
        (kept_sem, "n_after_semantic"),
        (kept_dec, "n_after_decontam"),
    ]
    tagged = reduce(
        DataFrame.unionByName,
        [
            df.select("source", F.lit(i).alias("_st"))
            for i, (df, _) in enumerate(layers)
        ],
    )
    counts = tagged.groupBy("source").agg(
        *[
            F.count(F.when(F.col("_st") == i, 1)).alias(name)
            for i, (_, name) in enumerate(layers)
        ]
    )
    t("counts union-pass (r16)", counts)
    raw_n = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_raw"))
    url_n = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_after_url"))
    d0_n = d0.groupBy("source").agg(F.count(F.lit(1)).alias("n_after_domain"))
    d1_n = d1.groupBy("source").agg(F.count(F.lit(1)).alias("n_after_exact"))
    d2_n = d2.groupBy("source").agg(F.count(F.lit(1)).alias("n_after_quality"))
    cont_n = kept_c.groupBy("source").agg(F.count(F.lit(1)).alias("n_after_containment"))
    sem_n = kept_sem.groupBy("source").agg(F.count(F.lit(1)).alias("n_after_semantic"))
    dec_n = kept_dec.groupBy("source").agg(F.count(F.lit(1)).alias("n_after_decontam"))
    b_n = d1b.groupBy("source").agg(F.count(F.lit(1)).alias("n_after_boilerplate"))
    kept_n = (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").alias("kept_tokens"),
            F.round(F.avg("log_weight") + 1e-9, 4).alias("mean_dsir_kept"),
        )
        .localCheckpoint()
    )
    t("kept_n", kept_n)
    tot = kept_n.agg(F.sum("kept_tokens").alias("tot"))
    p = F.col("kept_tokens").cast("double") / F.col("tot").cast("double")
    shares = persist_tracked(
        kept_n.crossJoin(F.broadcast(tot)).select(
            "source", p.alias("p"), F.pow(p, 0.3).alias("w")
        )
    )
    z = shares.agg(F.sum("w").alias("z"))
    epochs = F.round(F.lit(4.0) * F.col("w") / F.col("z") / F.col("p") + 1e-9, 4)
    mix = shares.crossJoin(F.broadcast(z)).select(
        F.col("source"),
        F.round(F.col("w") / F.col("z") + 1e-9, 6).alias("q_temp"),
        F.round(F.col("w") / F.col("z") / F.col("p") + 1e-9, 4).alias("boost"),
        epochs.alias("epochs_at_4x"),
        (epochs > 4.0).alias("over_repeat"),
    )
    out_r15 = (
        raw_n.join(d0_n, "source", "left")
        .join(d1_n, "source", "left")
        .join(d2_n, "source", "left")
        .join(cont_n, "source", "left")
        .join(sem_n, "source", "left")
        .join(b_n, "source", "left")
        .join(kept_n, "source", "left")
        .join(mix, "source", "left")
        .join(dec_n, "source", "left")
        .join(url_n, "source", "left")
    )
    t("out join 9-agg (r15 shape)", out_r15)
    out = counts.join(kept_n, "source", "left").join(mix, "source", "left")
    t("out join union (r16 shape)", out)
    print(f"{'TOTAL':28s} {time.perf_counter()-total0:7.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
