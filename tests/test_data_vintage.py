"""Data-vintage canary: the driver regenerates /root/testdata between
rounds and has already changed events.ts parquet physical type once
(TIMESTAMP(NANOS) → timestamp[us]/NTZ), silently breaking every
watermarked streaming query. This test fails in ONE obvious place if
the normalization seam (sources.tables._normalize_event_ts) stops
producing TIMESTAMP, instead of nine scattered failures.
"""

from __future__ import annotations

from pyspark.sql.types import TimestampType

from landsat_tair_data_pipeline_spark.sources.tables import table
from landsat_tair_data_pipeline_spark.streaming.windows import stream_events


def test_events_ts_is_timestamp_ltz(spark, sf_dir):
    dt = table(spark, sf_dir, "events").schema["ts"].dataType
    assert isinstance(dt, TimestampType), (
        f"events.ts must normalize to TIMESTAMP (LTZ); got {dt} — "
        "driver testdata vintage changed? fix sources/tables.py seam"
    )


def test_stream_events_ts_is_timestamp_ltz(spark, sf_dir):
    dt = stream_events(spark, sf_dir).schema["ts"].dataType
    assert isinstance(dt, TimestampType), (
        f"stream events.ts must normalize to TIMESTAMP (LTZ); got {dt}"
    )


def test_events_ts_values_survive_normalization(spark, sf_dir):
    """The cast is lossless under the UTC session pin: min/max epoch
    micros agree with a raw pyarrow read of the parquet file."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])
    col = t.column("ts").cast("int64")  # epoch micros for timestamp[us]
    import pyarrow.compute as pc

    want_min = pc.min(col).as_py()
    want_max = pc.max(col).as_py()

    from pyspark.sql import functions as F

    row = (
        table(spark, sf_dir, "events")
        .agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        )
        .collect()[0]
    )
    assert (row["lo"], row["hi"]) == (want_min, want_max)
