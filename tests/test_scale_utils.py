"""Scale-utility verification: salted joins produce identical results
to plain joins on skewed data; bucketed tables join without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from landsat_tair_data_pipeline_spark.plans.scale import (
    bucketed_join,
    salted_join,
    write_bucketed,
)


def test_salted_join_equals_plain_join(spark):
    """90% of fact rows share one hot key — the salted join must return
    exactly the plain join's rows."""
    fact = spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, 1)
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    plain = set(
        map(tuple, fact.join(dim, "k").select("k", "payload", "dim_val").collect())
    )
    salted = set(
        map(
            tuple,
            salted_join(fact, dim, "k").select("k", "payload", "dim_val").collect(),
        )
    )
    assert salted == plain and len(plain) == 20000


def test_salted_join_splits_hot_key(spark):
    """The hot key's rows must actually spread across salts."""
    fact = spark.range(10000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    dim = spark.range(2).select(F.col("id").alias("k"))
    salted = fact.withColumn("_salt", (F.rand(7) * 8).cast("int"))
    n_salts_used = salted.where("k = 1").select("_salt").distinct().count()
    assert n_salts_used == 8


def test_radiometry_at_volume(spark):
    """The nested-HOF radiometry path at ~1M pixels (100 scenes × 20
    stations × 11 bands × 49 px): generated distributedly, converted,
    exploded, aggregated — validates the per-scene-parallel shape the
    fixtures are too small to exercise, with a spot value check."""
    from landsat_tair_data_pipeline_spark.functions.radiometry import (
        to_brightness_temperature,
    )

    scenes = spark.range(100).select(
        F.concat(F.lit("LC08_SYN_"), F.col("id")).alias("scene_id")
    )
    stations = spark.range(20).select(F.col("id").alias("station_id"))
    grid = F.transform(
        F.sequence(F.lit(0), F.lit(10)),
        lambda b: F.transform(
            F.sequence(F.lit(0), F.lit(6)),
            lambda y: F.transform(
                F.sequence(F.lit(0), F.lit(6)),
                lambda x: (b * 49 + y * 7 + x + 1).cast("int"),
            ),
        ),
    )
    rescaling = F.map_concat(
        *[
            F.create_map(
                F.lit(f"RADIANCE_MULT_BAND_{i}"),
                F.lit("2.0E-0"),
                F.lit(f"RADIANCE_ADD_BAND_{i}"),
                F.lit("1.0E-0"),
            )
            for i in range(1, 12)
        ]
    )
    thermal = F.create_map(
        F.lit("K1_CONSTANT_BAND_10"), F.lit("774.8853"),
        F.lit("K2_CONSTANT_BAND_10"), F.lit("1321.0789"),
    )
    patches = (
        scenes.crossJoin(stations)
        .repartition(32)
        .select(
            "scene_id", "station_id",
            grid.alias("bands"),
            rescaling.alias("rescaling"),
            thermal.alias("thermal"),
        )
    )
    bt = to_brightness_temperature(patches)
    out = (
        bt.select(F.explode(F.flatten(F.flatten("bt_bands"))).alias("v"))
        .agg(F.count("v").alias("n"), F.round(F.sum("v"), 2).alias("s"))
        .first()
    )
    assert out["n"] == 100 * 20 * 11 * 49
    # spot check: band 1 (non-thermal), dn=1 → 2*1+1 = 3.0
    first = bt.select(F.col("bt_bands")[0][0][0].alias("v")).first()
    assert first["v"] == 3.0


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Same-bucketed orders/lineitem join on the bucket key: zero
    Exchange in the executed plan, and results match the plain join."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "k")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "k")
    write_bucketed(o, "t_orders_b", "k")
    write_bucketed(li, "t_lineitem_b", "k")
    # bucketing pays off for sort-merge joins; at test scale the planner
    # would broadcast instead (and skip bucketing), so pin SMJ — at the
    # 100 TB scale this emulates, neither side is broadcastable anyway
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        assert joined.count() == o.join(li, "k").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
