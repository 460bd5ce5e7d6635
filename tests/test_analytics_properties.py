"""Property tests for the r7 analytics operators — invariants that
hold on ANY data, complementing the exact-value oracle parity at two
fixed SFs (a future edit that keeps the oracle in lockstep but breaks
the semantics on other distributions fails here)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from landsat_tair_data_pipeline_spark.registry import all_queries

SF = "/root/testdata/sf0.01"
SPECS = all_queries()


def test_markov_rows_normalize(spark):
    rows = SPECS["events_markov_transitions"].fn(spark, SF).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.prob
    for prev, total in by_prev.items():
        # per-pair rounding at 4 decimals over ≤5 cells
        assert abs(total - 1.0) < 5e-4, (prev, total)


def test_decayed_sum_bounded_by_plain_sum(spark):
    got = {
        r.user_id: (r.decayed_sum, r.n_events)
        for r in SPECS["agg_decayed_sum"].fn(spark, SF).collect()
    }
    from landsat_tair_data_pipeline_spark.sources.tables import table

    plain = {
        r.user_id: (r.s, r.n)
        for r in table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(got) == set(plain)
    for uid, (ds, n) in got.items():
        ps, pn = plain[uid]
        assert n == pn
        # decay weights are in (0, 1]: decayed magnitude can't exceed
        # the all-positive plain sum (values are non-negative here)
        assert ds <= ps + 0.01, (uid, ds, ps)
        assert ds >= -0.01


def test_asof_interp_value_between_neighbors(spark):
    """Every interpolated value lies within [min, max] of the user's
    click values — linear interpolation cannot extrapolate."""
    from landsat_tair_data_pipeline_spark.sources.tables import table

    ev = table(spark, SF, "events")
    bounds = {
        r.user_id: (r.lo, r.hi)
        for r in ev.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in SPECS["ts_asof_interp"].fn(spark, SF).collect():
        if r.user_id not in bounds or r.interp_click_value is None:
            continue  # users with no clicks get NULL
        lo, hi = bounds[r.user_id]
        assert lo - 1e-6 <= r.interp_click_value <= hi + 1e-6, r


def test_bloom_positions_no_false_negatives_random_keys(spark):
    """The Bloom construction itself, on adversarially overlapping
    random key sets: every true member must pass the k-hit filter
    (false positives allowed, false negatives never)."""
    from landsat_tair_data_pipeline_spark.operators.relational import (
        _BLOOM_K,
        _bloom_positions,
    )

    rng = random.Random(99)
    members = rng.sample(range(10**12), 500)
    probes = members[:250] + rng.sample(range(10**12), 250)
    b = spark.createDataFrame([(m,) for m in members], "k: long")
    p = spark.createDataFrame([(x,) for x in probes], "k: long")
    build = b.select(
        F.explode(F.array(*_bloom_positions("k"))).alias("pos")
    ).distinct()
    probe = p.select("k").select(
        "k", F.explode(F.array(*_bloom_positions("k"))).alias("pos")
    )
    passed = {
        r.k
        for r in probe.join(build, "pos", "left_semi")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("h"))
        .where(F.col("h") == _BLOOM_K)
        .collect()
    }
    assert set(members[:250]) <= passed


def test_nearest_centroid_counts_cover_corpus(spark):
    rows = SPECS["emb_nearest_centroid"].fn(spark, SF).collect()
    from landsat_tair_data_pipeline_spark.sources.tables import table

    n_vec = table(spark, SF, "embeddings").count()
    assert sum(r.n for r in rows) == n_vec
    for r in rows:
        assert 0 <= r.n_correct <= r.n
        assert math.isclose(
            r.accuracy, round(r.n_correct / r.n + 1e-9, 4), abs_tol=1e-9
        )
