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


def test_mg_summary_supersets_heavy_hitters(monkeypatch):
    """The Misra-Gries partition summary must contain EVERY token
    whose count exceeds n_p/(k+1) — the superset guarantee
    text_heavy_hitters' exactness rests on (a dropped true heavy
    hitter cannot be recovered by the verify pass). Driven directly
    on pandas batches with a small counter budget and a worst-case
    mix: a few heavy tokens drowned in a long unique-token tail,
    shuffled, split into uneven batches."""
    import pandas as pd

    from landsat_tair_data_pipeline_spark.operators import text as t

    k = 16
    monkeypatch.setattr(t, "_HH_COUNTERS", k)
    rng = random.Random(7)
    stream = (
        ["heavy_a"] * 400
        + ["heavy_b"] * 250
        + ["mid"] * 120
        + [f"u{i}" for i in range(1500)]
    )
    rng.shuffle(stream)
    n = len(stream)
    cuts = sorted(rng.sample(range(1, n), 5))
    batches = [
        pd.DataFrame({"tok": stream[a:b]})
        for a, b in zip([0, *cuts], [*cuts, n])
    ]
    out = list(t._mg_partition(iter(batches)))
    assert len(out) == 1 and len(out[0]) <= k
    survivors = set(out[0]["tok"])
    from collections import Counter

    true = Counter(stream)
    for tok, c in true.items():
        if c > n / (k + 1):
            assert tok in survivors, (tok, c, n // (k + 1))


def test_heavy_hitters_exact_vs_plain_groupby(spark):
    """End-to-end exactness: the sketch-then-verify result must equal
    the direct groupBy(token) heavy-hitter set — same tokens, same
    exact counts — independent of partition layout."""
    from landsat_tair_data_pipeline_spark.operators.text import (
        _HH_PHI,
        TOKENS,
    )
    from landsat_tair_data_pipeline_spark.sources.tables import table

    got = {
        (r.tok, r.n_occurrences)
        for r in SPECS["text_heavy_hitters"].fn(spark, SF).collect()
    }
    toks = table(spark, SF, "documents").select(
        F.explode(TOKENS()).alias("tok")
    )
    n = toks.count()
    want = {
        (r.tok, r.c)
        for r in toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") * _HH_PHI > F.lit(n))
        .collect()
    }
    assert got == want and len(want) > 0


def test_bitmap_distinct_crosses_bucket_boundaries(spark):
    """agg_bitmap_distinct's bucket arithmetic must count exactly at
    the 32768-bit bucket edges (an off-by-one in bucket_number /
    bit_position double-counts or merges adjacent buckets). Synthetic
    ids straddling three boundaries, with duplicates."""
    ids = [0, 1, 32767, 32768, 32769, 65535, 65536, 10**9, 10**9 + 1]
    rows = [(i,) for i in ids * 3]
    df = spark.createDataFrame(rows, "user_id: long")
    got = (
        df.select(
            F.bitmap_bucket_number("user_id").alias("bkt"),
            F.bitmap_bit_position("user_id").alias("pos"),
        )
        .groupBy("bkt")
        .agg(F.bitmap_construct_agg("pos").alias("bm"))
        .agg(F.sum(F.bitmap_count("bm")).alias("n"))
        .collect()[0]
        .n
    )
    assert got == len(set(ids))


def test_quant_expr_constant_dim_is_single_bin_both_engines(spark):
    """layout_zorder_stats' shared quantizer must map a constant
    column (global min == max) to bin 0 IDENTICALLY in both engines —
    without the guard the division by zero makes Spark floor(NaN) -> 0
    while DuckDB errors on CAST(NaN AS INT), so a degenerate extract
    would crash the oracle instead of quantizing to one bin."""
    import duckdb

    from landsat_tair_data_pipeline_spark.operators.events import _quant_expr

    expr = _quant_expr("CAST(x AS DOUBLE)", "lo", "hi", 256)
    q = f"SELECT {expr} AS q FROM (SELECT 5 AS x, 5 AS lo, 5 AS hi) t"
    assert spark.sql(q).collect()[0]["q"] == 0
    assert duckdb.sql(q).fetchone()[0] == 0


def _mult_hash_py(x: int) -> int:
    """Pure-python twin of augment._mult_hash_key for property tests."""
    a = x % 4294967296
    lo, hi = a % 65536, (a // 65536) % 65536
    return (lo * 2654435761 + hi * 2041643008) % 4294967296


def test_high_bit_splits_mix_low_bit_structured_ids():
    """The r9 review finding, pinned: the Knuth hash passes an input's
    low bits through unmixed — h(x) % 2^k depends only on x's low 16
    bits, and h(x) == x (mod 2^k) exactly for k <= 4 since the
    multiplier is 1 mod 16 — so arm/bucket/sample splits must read
    the TOP bits. All-even ids (one ingestion stripe) must still
    split ~50/50 on the top bit — a low-bit arm would put 100% in
    arm 0."""
    ids = [2 * i for i in range(10000)]
    # the broken form: low-bit arm inherits parity exactly
    assert all(_mult_hash_py(x) % 2 == x % 2 for x in ids)
    top = sum(_mult_hash_py(x) // 2147483648 for x in ids)
    assert 0.45 < top / len(ids) < 0.55
    # the 1/16 sampler: top-4-bit sample keeps ~1/16 of a mod-16
    # stripe (a low-bit sampler would keep 0% or 100% of it)
    stripe = [16 * i for i in range(10000)]
    kept = sum(1 for x in stripe if _mult_hash_py(x) // 268435456 == 0)
    assert 0.04 < kept / len(stripe) < 0.085


def test_negative_pair_draw_is_not_a_rotation():
    """sample_negative_pairs' XOR-then-hash draw: per-anchor candidate
    orders must NOT be one fixed circular order rotated per anchor
    (the affine-combination defect the r9 review caught). For a pool
    of m candidates, a rotation family has the property that every
    anchor's ranking is a cyclic shift of one base sequence — refute
    it by exhibiting two anchors whose orders are not cyclic shifts
    of each other."""
    pool = list(range(100, 164))
    def order(anchor):
        ah = _mult_hash_py(anchor)
        keyed = sorted(
            (( _mult_hash_py(ah ^ _mult_hash_py(c)), c) for c in pool)
        )
        return [c for _, c in keyed]
    o1, o2 = order(1), order(2)
    m = len(pool)
    is_rotation = any(o1[k:] + o1[:k] == o2 for k in range(m))
    assert not is_rotation
