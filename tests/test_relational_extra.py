"""Accuracy bounds for the sketch aggregates, and the
partitioned-layout pruning demonstration from SURVEY §4.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from landsat_tair_data_pipeline_spark.operators.relational import agg_approx
from landsat_tair_data_pipeline_spark.sources.tables import table


def test_approx_aggregates_within_bounds(spark, sf_dir):
    """Since the r12 graduation agg_approx surfaces its own pinned
    bound booleans (oracle pins them TRUE); here assert them plus the
    exact anchors against an independent recomputation."""
    got = agg_approx(spark, sf_dir).first()
    li = table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("orders"),
        F.countDistinct("l_partkey").alias("parts"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
    ).first()
    assert got["exact_orders"] == exact["orders"]
    assert got["exact_parts"] == exact["parts"]
    assert abs(got["exact_median"] - exact["median"]) < 1e-3
    assert got["hll_orders_within_6pct"] is True
    assert got["hll_parts_within_6pct"] is True
    assert got["median_rank_bracket_ok"] is True
    assert got["p99_rank_bracket_ok"] is True


def test_partitioned_layout_prunes(spark, tmp_path):
    """The SURVEY §4 layout decision: pixels partitioned by scene land
    in per-scene directories, and a scene-filtered read prunes to ONE
    partition (PartitionFilters at the scan, one input directory)."""
    from landsat_tair_data_pipeline_spark.sources.landsat import scene_pixels

    out = str(tmp_path / "px_by_scene")
    scene_pixels(spark).write.partitionBy("scene_id").parquet(out)

    one = spark.read.parquet(out).where(
        F.col("scene_id") == "LT05_L1TP_175038_20101007_20200823_02_T1"
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "scene_id" in plan.split(
        "PartitionFilters"
    )[1][:200]
    # pruning is real: the filtered scan reads exactly the one scene
    assert one.select("scene_id").distinct().count() == 1
    full = spark.read.parquet(out)
    assert full.select("scene_id").distinct().count() > 1


def test_hll_sketch_merge_is_lossless_and_bounded(spark):
    """Union of per-day sketches vs the direct whole-table sketch:
    bit-equality holds only while sketches stay in exact sparse mode;
    in dense mode the DataSketches union gadget can diverge by a few
    counts (observed at sf0.1 — r7). The honest invariants: merged
    and direct within 1% of each other, and both within 5% of the
    exact distinct count."""
    from landsat_tair_data_pipeline_spark.operators.events import agg_sketch_hll

    rows = agg_sketch_hll(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r["direct_est"] - r["merged_est"]) <= (
            0.01 * r["exact_distinct"]
        ), r
        assert abs(r["direct_est"] - r["exact_distinct"]) <= (
            0.05 * r["exact_distinct"]
        ), r
        assert abs(r["merged_est"] - r["exact_distinct"]) <= (
            0.05 * r["exact_distinct"]
        ), r


def test_explode_outer_keeps_null_bounded_intervals(spark):
    """join_range_interval's NULL contract: a NULL interval bound
    yields a NULL bin sequence, and explode_outer must KEEP the row
    (plain explode drops it) so the left join emits the interval with
    n_hits=0 exactly like the oracle's range LEFT JOIN. Pin the Spark
    semantics the operator relies on."""
    df = spark.createDataFrame([(1, None), (2, 5.0)], "id long, v double")
    out = df.select(
        "id",
        F.explode_outer(
            F.sequence(F.floor(F.col("v")), F.floor(F.col("v")))
        ).alias("bin"),
    )
    rows = {r["id"]: r["bin"] for r in out.collect()}
    assert rows == {1: None, 2: 5}


def test_mult_hash_key_is_engine_exact_past_int64_overflow(spark):
    """The sampling hash's reproducibility contract: identical values
    from the Spark column expression, the DuckDB SQL twin, and an
    arbitrary-precision Python reference — INCLUDING ids past
    ~3.47e9 where the naive (id * 2654435761) product overflows
    int64, and negative ids where % semantics diverge between
    engines."""
    import duckdb

    from landsat_tair_data_pipeline_spark.operators.augment import (
        _MULT_HASH_SQL,
        _mult_hash_key,
    )

    ids = [0, 1, 65535, 65536, 2**31 - 1, 2**32 - 1, 2**32,
           2**33 + 5, 3_470_000_000, 10**12 + 7, -1, -2**31]

    def ref(x):
        return ((x % 2**32) * 2654435761) % 2**32

    sdf = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got_spark = {
        r["doc_id"]: r["k"]
        for r in sdf.select("doc_id", _mult_hash_key().alias("k")).collect()
    }
    vals = ", ".join(f"({i})" for i in ids)
    got_duck = dict(
        duckdb.sql(
            f"SELECT doc_id, {_MULT_HASH_SQL} AS k FROM ("
            f"SELECT doc_id, ((doc_id % 4294967296) + 4294967296) "
            f"% 4294967296 AS a FROM (VALUES {vals}) t(doc_id))"
        ).fetchall()
    )
    for i in ids:
        assert got_spark[i] == ref(i), (i, got_spark[i], ref(i))
        assert got_duck[i] == ref(i), (i, got_duck[i], ref(i))
