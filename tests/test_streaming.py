"""Streaming semantics the finite-source oracle parity can't show:
watermark late-data drop across micro-batches, and append-mode window
finalization.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(h, m):
    return dt.datetime(2024, 1, 1, h, m)


def test_watermark_drops_late_data(spark, tmp_path):
    """Two-batch feed: after batch 1 sets the watermark, a batch-2 event
    older than the watermark must be dropped; an on-time event must
    land. Append-mode tumbling windows."""
    src = str(tmp_path / "events_src")
    schema = "ts timestamp, k string, v double"

    batch1 = spark.createDataFrame(
        [
            (_ts(10, 0), "a", 1.0),
            (_ts(10, 5), "a", 1.0),
            (_ts(12, 0), "a", 1.0),  # advances max event time to 12:00
        ],
        schema,
    )
    batch1.coalesce(1).write.mode("append").parquet(src)

    agg = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_data_sink")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1 → watermark becomes 11:50

        batch2 = spark.createDataFrame(
            [
                (_ts(10, 2), "a", 1.0),   # LATE: before 11:50 → dropped
                (_ts(12, 10), "a", 1.0),  # on time
            ],
            schema,
        )
        batch2.coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()  # batch 2 drops the late row, emits closed windows
    finally:
        q.stop()

    got = {r["start"]: r["n"] for r in spark.table("late_data_sink").collect()}
    # the 10:00 window was finalized with batch-1 rows only — the late
    # 10:02 event did NOT bump it to 3
    assert got[_ts(10, 0)] == 2
    # windows still inside the watermark at stream end stay unemitted
    assert _ts(12, 10) not in got


def test_stream_matches_batch_tumbling(spark, sf_dir):
    """The streaming tumbling window must agree with the batch form on
    the same data (complete mode, finite source)."""
    from landsat_tair_data_pipeline_spark.operators.events import events_tumbling
    from landsat_tair_data_pipeline_spark.session import tune
    from landsat_tair_data_pipeline_spark.streaming.windows import stream_tumbling

    tune(spark)
    batch = sorted(map(tuple, events_tumbling(spark, sf_dir).collect()))
    stream = sorted(map(tuple, stream_tumbling(spark, sf_dir).collect()))
    assert batch == stream
