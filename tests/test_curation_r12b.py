"""Round-12 second-wave keys: chunk-grain dedup, DSIR weights,
temperature mixing.

Structural invariants the oracle hash can't see on a lucky corpus:
brute-forced chunk duplication, DSIR's discriminative direction,
temperature flattening monotonicity.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F


def _raw_docs(spark, sf_dir):
    return {
        r["doc_id"]: (r["source"], r["text"].strip().lower().split())
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }


def test_dedup_paragraph_brute_force(spark, sf_dir):
    """Recompute the 5-token chunking in plain Python and verify every
    per-doc count, the cross-doc duplication of every counted chunk,
    and the keep flag."""
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        _PARA_DROP_FRAC,
        _PARA_WIDTH,
        dedup_paragraph,
    )

    docs = _raw_docs(spark, sf_dir)
    chunks_by_doc: dict[int, list[str]] = {}
    owners: dict[str, set[int]] = defaultdict(set)
    for did, (_, toks) in docs.items():
        ch = [
            " ".join(toks[i : i + _PARA_WIDTH])
            for i in range(0, len(toks), _PARA_WIDTH)
        ]
        chunks_by_doc[did] = ch
        for c in ch:
            owners[c].add(did)

    rows = dedup_paragraph(spark, sf_dir).collect()
    assert len(rows) == len(docs)
    saw_dup = saw_drop = False
    for r in rows:
        ch = chunks_by_doc[r["doc_id"]]
        n_dup = sum(1 for c in ch if len(owners[c]) >= 2)
        assert r["n_chunks"] == len(ch)
        assert r["n_dup_chunks"] == n_dup
        frac = round(n_dup / len(ch) + 1e-9, 6)
        assert abs(r["dup_chunk_fraction"] - frac) < 1e-12
        assert r["keep_doc"] == int(frac <= _PARA_DROP_FRAC)
        saw_dup = saw_dup or n_dup > 0
        saw_drop = saw_drop or r["keep_doc"] == 0
    assert saw_dup, "vacuous corpus: no cross-doc duplicate chunks"
    # saw_drop may legitimately be False at tiny sf; assert only that
    # the fraction spread is non-degenerate
    fracs = {r["dup_chunk_fraction"] for r in rows}
    assert len(fracs) > 1


def test_dsir_weight_brute_force_and_direction(spark, sf_dir):
    """Brute-force the hashed-bigram likelihood-ratio weight for every
    doc; check DSIR's defining property: the target slice's mean
    weight exceeds the rest's (docs score higher under their own
    distribution)."""
    from landsat_tair_data_pipeline_spark.operators.text import (
        _DSIR_BUCKETS,
        _DSIR_TARGET,
        text_dsir_weight,
    )

    docs = _raw_docs(spark, sf_dir)
    buckets_by_doc: dict[int, list[int]] = {}
    c_r: Counter = Counter()
    c_t: Counter = Counter()
    for did, (src, toks) in docs.items():
        if len(toks) < 2:
            continue
        bs = []
        for a, b in zip(toks, toks[1:]):
            h = hashlib.md5(f"{a} {b}".encode()).hexdigest()
            bs.append(int(h[:2], 16) % _DSIR_BUCKETS)
        buckets_by_doc[did] = bs
        c_r.update(bs)
        if src == _DSIR_TARGET:
            c_t.update(bs)
    t_r = sum(c_r.values())
    t_t = sum(c_t.values())
    llr = {
        b: math.log((c_t[b] + 1) / (t_t + _DSIR_BUCKETS))
        - math.log((c_r[b] + 1) / (t_r + _DSIR_BUCKETS))
        for b in range(_DSIR_BUCKETS)
    }

    rows = text_dsir_weight(spark, sf_dir).collect()
    assert len(rows) == len(buckets_by_doc)
    by_src: dict[str, list[float]] = defaultdict(list)
    for r in rows:
        bs = buckets_by_doc[r["doc_id"]]
        assert r["n_bigrams"] == len(bs)
        want = round(sum(llr[b] for b in bs) + 1e-9, 6)
        assert abs(r["log_weight"] - want) < 1e-9, r
        assert r["selected"] == int(r["log_weight"] > 0)
        by_src[r["source"]].append(r["log_weight"])
    tgt_mean = sum(by_src[_DSIR_TARGET]) / len(by_src[_DSIR_TARGET])
    rest = [v for s, vs in by_src.items() if s != _DSIR_TARGET for v in vs]
    assert tgt_mean > sum(rest) / len(rest), (
        "DSIR lost its discriminative direction"
    )


def test_sample_temperature_flattens(spark, sf_dir):
    """q_temp is a distribution; temperature strictly flattens:
    boost ordering is inverse to share ordering, the largest source is
    down-sampled, the smallest up-sampled (whenever shares differ)."""
    from landsat_tair_data_pipeline_spark.operators.augment import (
        sample_temperature,
    )

    rows = sorted(
        sample_temperature(spark, sf_dir).collect(),
        key=lambda r: r["n_tokens"],
    )
    assert len(rows) >= 2
    assert abs(sum(r["q_temp"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["p_mix"] for r in rows) - 1.0) < 1e-4
    boosts = [r["boost"] for r in rows]
    assert boosts == sorted(boosts, reverse=True), (
        "boost must decrease as share grows"
    )
    if rows[0]["n_tokens"] != rows[-1]["n_tokens"]:
        assert rows[0]["direction"] == "up"
        assert rows[-1]["direction"] == "down"
    for r in rows:
        assert r["direction"] == ("up" if r["boost"] > 1 else "down")


def test_pipeline_v6_funnel_invariants(spark, sf_dir):
    """Funnel monotonicity per source, the top-half DSIR selection
    size rule (total n_kept == ceil(total semantic survivors / 2),
    every survivor having a DSIR row), and the mixture being a
    distribution over the surviving sources."""
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        llm_data_pipeline_v6,
    )

    rows = llm_data_pipeline_v6(spark, sf_dir).collect()
    assert rows
    stages = [
        "n_raw",
        "n_after_domain",
        "n_after_exact",
        "n_after_boilerplate",
        "n_after_quality",
        "n_after_containment",
        "n_after_semantic",
        "n_kept",
    ]
    for r in rows:
        vals = [r[s] for s in stages]
        assert vals == sorted(vals, reverse=True), r
    total_sem = sum(r["n_after_semantic"] for r in rows)
    total_kept = sum(r["n_kept"] for r in rows)
    assert total_kept == (total_sem + 1) // 2
    assert total_kept > 0, "vacuous corpus: nothing kept"
    qs = [r["q_temp"] for r in rows if r["q_temp"] is not None]
    assert len(qs) == sum(1 for r in rows if r["n_kept"] > 0)
    assert abs(sum(qs) - 1.0) < 1e-4


def test_quality_bucket_order_and_mass(spark, sf_dir):
    """Bucket order must follow the LM score (head >= middle >= tail
    with ties only at boundaries), every bucket non-empty, and the
    token-mass split balanced to within one document (the integer
    prefix-cut guarantee)."""
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        text_quality_bucket,
    )

    rows = text_quality_bucket(spark, sf_dir).collect()
    assert rows
    by_bucket = {"head": [], "middle": [], "tail": []}
    for r in rows:
        by_bucket[r["bucket"]].append(r)
    assert all(by_bucket.values()), "a bucket is empty"
    assert min(r["avg_logp"] for r in by_bucket["head"]) >= max(
        r["avg_logp"] for r in by_bucket["middle"]
    )
    assert min(r["avg_logp"] for r in by_bucket["middle"]) >= max(
        r["avg_logp"] for r in by_bucket["tail"]
    )
    total = sum(r["n_tokens"] for r in rows)
    max_doc = max(r["n_tokens"] for r in rows)
    for b, rs in by_bucket.items():
        mass = sum(r["n_tokens"] for r in rs)
        assert abs(mass - total / 3) <= max_doc, (b, mass, total)


def test_paragraph_scrub_brute_force(spark, sf_dir):
    """Rebuild every scrubbed text in plain Python from the same
    chunking and duplication rule; fully-scrubbed docs must yield the
    empty string, not NULL."""
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        _PARA_WIDTH,
        dedup_paragraph_scrub,
    )

    docs = _raw_docs(spark, sf_dir)
    owners: dict[str, set[int]] = defaultdict(set)
    chunks_by_doc: dict[int, list[str]] = {}
    for did, (_, toks) in docs.items():
        ch = [
            " ".join(toks[i : i + _PARA_WIDTH])
            for i in range(0, len(toks), _PARA_WIDTH)
        ]
        chunks_by_doc[did] = ch
        for c in ch:
            owners[c].add(did)

    rows = dedup_paragraph_scrub(spark, sf_dir).collect()
    assert len(rows) == len(docs)
    saw_removed = saw_empty = False
    for r in rows:
        ch = chunks_by_doc[r["doc_id"]]
        kept = [c for c in ch if len(owners[c]) < 2]
        assert r["n_chunks"] == len(ch)
        assert r["n_removed"] == len(ch) - len(kept)
        assert r["scrubbed_text"] == " ".join(kept)
        assert r["n_tokens_kept"] == sum(len(c.split()) for c in kept)
        saw_removed = saw_removed or r["n_removed"] > 0
        saw_empty = saw_empty or (r["scrubbed_text"] == "" and ch)
    assert saw_removed, "vacuous corpus: nothing scrubbed"


def test_seasonal_naive_brute_force(spark, sf_dir):
    """Recompute the backtest from raw events in plain Python: daily
    4dp-rounded totals, 7-day lag join, MAE/MAPE/bias per type."""
    from landsat_tair_data_pipeline_spark.operators.events import (
        ts_forecast_seasonal_naive,
    )
    from landsat_tair_data_pipeline_spark.sources.tables import table
    import datetime

    ev = table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    ).collect()
    daily: dict[tuple, float] = defaultdict(float)
    for r in ev:
        daily[(r["event_type"], r["day"])] += r["value"]
    daily = {k: round(v + 1e-9, 4) for k, v in daily.items()}
    per_type: dict[str, list] = defaultdict(list)
    for (et, day), total in daily.items():
        prev = daily.get((et, day - datetime.timedelta(days=7)))
        if prev is not None:
            per_type[et].append((total, prev))

    rows = ts_forecast_seasonal_naive(spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} == set(per_type)
    for r in rows:
        pairs = per_type[r["event_type"]]
        assert r["n_days"] == len(pairs)
        errs = [a - f for a, f in pairs]
        assert abs(r["mae"] - round(sum(map(abs, errs)) / len(errs) + 1e-9, 4)) < 1e-9
        assert abs(r["bias"] - round(sum(errs) / len(errs) + 1e-9, 4)) < 1e-9
        apes = [abs(a - f) / abs(a) for a, f in pairs if a != 0.0]
        if apes:
            assert abs(r["mape"] - round(sum(apes) / len(apes) + 1e-9, 4)) < 1e-9
        assert r["n_zero_actual"] == sum(1 for a, _ in pairs if a == 0.0)
        assert r["mae"] > 0, "vacuous backtest"


def test_dq_constraint_check_verdict_mix(spark, sf_dir):
    """Both verdicts must occur (the all-pass-suite trap): the
    lineitem uniqueness negative control fails with the exact
    rows-minus-distinct count; every metric is a non-negative int and
    passed == (metric == 0)."""
    from landsat_tair_data_pipeline_spark.operators.relational import (
        dq_constraint_check,
    )
    from landsat_tair_data_pipeline_spark.sources.tables import table

    rows = {r["check_name"]: r for r in dq_constraint_check(spark, sf_dir).collect()}
    assert len(rows) == 6
    verdicts = {r["passed"] for r in rows.values()}
    assert verdicts == {0, 1}, "need both pass and fail on this corpus"
    for r in rows.values():
        assert r["n_violations"] >= 0
        assert r["passed"] == int(r["n_violations"] == 0)
    li = table(spark, sf_dir, "lineitem")
    n = li.count()
    d = li.select("l_orderkey").distinct().count()
    assert rows["unique(l_orderkey)"]["n_violations"] == n - d
    assert rows["unique(l_orderkey)"]["passed"] == 0
