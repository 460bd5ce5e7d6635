"""Parquet table sources for the driver's synthetic star schema.

One parquet file per table under an sf directory (TESTDATA.md). Reads
are plain ``spark.read.parquet`` so Catalyst gets native column pruning
and predicate pushdown into the scan — verify with
``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to always broadcast in joins, even at
# 100 TB fact scale (region=5 rows, nation=25; customer/supplier/part
# grow with sf but stay dimension-sized relative to lineitem).
BROADCAST_DIMS = ("region", "nation", "supplier", "part", "customer")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; one of {TABLES}")
    if name == "events":
        ensure_nanos_readable(spark, f"{sf_dir}/events.parquet")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_event_ts(df)
    return df


def ensure_nanos_readable(spark: SparkSession, path: str) -> None:
    """Data-vintage shim SCOPED to the events read path: older driver
    testdata stored ``events.ts`` as parquet TIMESTAMP(NANOS), which
    Spark's reader rejects unless
    ``spark.sql.legacy.parquet.nanosAsLong=true`` — but that legacy
    flag changes how *any* nanos parquet reads, so it must not sit in
    the global session confs (it used to live in session.RUNTIME_CONFS;
    VERDICT r6 flagged the global mutable state). Probe THIS file's
    footer with one driver-side pyarrow metadata read and set the flag
    only when the ns vintage is actually present; current
    timestamp[us] data never touches it.

    Build-vs-execute caveat (r8 ADVICE): this sets a session-global
    SQLConf at DataFrame BUILD time, but Spark reads SQLConf at
    EXECUTION. Interleaving builds across vintages — build an
    ns-vintage events frame, build a µs-vintage one (resets the flag),
    then execute the first — fails LOUDLY at execution ("Illegal
    Parquet type"). All in-repo callers build-and-execute one events
    frame at a time; if multi-vintage interleaving ever becomes a real
    pattern, move the flag to a per-read DataFrameReader option."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        cands = sorted(
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        if not cands:
            return
        f = cands[0]
    try:
        stamp = (f, os.stat(f).st_mtime_ns)
    except OSError:
        return  # missing file: let the Spark read surface the real error
    if stamp not in _NANOS_PROBE_CACHE:
        try:
            t = pq.read_schema(f).field("ts").type
        except Exception:
            return  # missing column/unreadable: same — Spark reports it
        _NANOS_PROBE_CACHE[stamp] = bool(
            pa.types.is_timestamp(t) and t.unit == "ns"
        )
    # set the flag to match THIS file's vintage — including back to
    # "false" for µs data, otherwise one ns-vintage read would leave
    # the legacy flag on session-global (the un-scoping this helper
    # exists to prevent; r7 review finding)
    spark.conf.set(
        "spark.sql.legacy.parquet.nanosAsLong",
        "true" if _NANOS_PROBE_CACHE[stamp] else "false",
    )


# vintage probe memo: the footer of a given (path, mtime) cannot
# change within a run, and the probe would otherwise pay a driver-side
# file open on EVERY events read — including inside bench's timed
# region
_NANOS_PROBE_CACHE: dict[tuple[str, int], bool] = {}


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to TIMESTAMP (with local time zone)
    regardless of the driver data vintage:

    - ``timestamp[us]`` parquet → Spark reads TIMESTAMP_NTZ; cast to
      TIMESTAMP is lossless under the UTC session pin (session.py) and
      restores ``withWatermark`` / ``unix_micros`` compatibility.
    - TIMESTAMP(NANOS) parquet → read as long via
      ``spark.sql.legacy.parquet.nanosAsLong``; integer div keeps the
      conversion lossless (the data's sub-µs part is zero).
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    elif isinstance(dt, LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df
