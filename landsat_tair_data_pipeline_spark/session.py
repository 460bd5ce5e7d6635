"""SparkSession factory tuned for this engine.

Local mode mirrors a multi-executor deployment: AQE on (runtime
coalescing, skew-join splitting), a bounded shuffle-partition count, and
Arrow for any pandas exchange. At cluster scale the same configs hold;
only ``master``/memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session our queries run under —
# including the driver-provided session in __spark_entry__.entry(). The
# timezone pin makes timestamp results independent of the host zone
# (DuckDB oracle timestamps are naive/UTC).
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Cap the explain/UI plan STRING (not the plan itself). AQE
    # regenerates the explain string on every adaptive update, and a
    # deep persisted-funnel plan prints its nested InMemoryRelation
    # subtrees combinatorially — measured 2.9 MB of plan text and
    # ~2x the driver CPU of the capped run on llm_data_pipeline_v6
    # before its localCheckpoint cuts. The cap bounds the damage for
    # any future deep-lineage key; 64 KiB keeps real plans readable.
    "spark.sql.maxPlanStringLength": "65536",
    # NOTE: spark.sql.legacy.parquet.nanosAsLong (the events.ts
    # data-vintage shim) deliberately does NOT live here — a global
    # legacy flag changes how ANY nanos parquet reads. It is set
    # per-need by sources.tables.ensure_nanos_readable, which probes
    # the events footer first.
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an existing session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in some deployments; defaults are acceptable
    return spark


def get_spark(app_name: str = "landsat-tair-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # one shuffle partition per core at local scale; on a real
        # cluster this scales with executor count (or AQE coalesces).
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
