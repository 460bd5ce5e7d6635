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


def test_nanos_flag_not_set_globally(spark, sf_dir):
    """The legacy nanosAsLong flag must stay OFF for current-vintage
    (timestamp[us]) data — it is a per-need shim, not a session
    default (VERDICT r6 item 5). Reading events through the seam must
    not flip it."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    table(spark, sf_dir, "events").count()
    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false"
    ), "µs-vintage read must not enable the global nanos legacy flag"


def test_ns_vintage_events_read_through_seam(spark, tmp_path):
    """An ns-vintage events parquet (the r1-r3 driver format) still
    reads and normalizes to TIMESTAMP: the footer probe enables the
    legacy flag for exactly this case."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pa.array([1_700_000_000_000_000_000, 1_700_000_060_000_000_000],
                  type=pa.timestamp("ns"))
    t = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([10, 11], type=pa.int64()),
            "event_type": pa.array(["click", "view"]),
            "value": pa.array([1.0, 2.0]),
            "props": pa.array(["{}", "{}"]),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"),
                   store_schema=False, coerce_timestamps=None)
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = table(spark, str(tmp_path), "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType)
        from pyspark.sql import functions as F

        lo = df.agg(F.min(F.unix_micros("ts")).alias("m")).collect()[0]["m"]
        assert lo == 1_700_000_000_000_000
    finally:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
