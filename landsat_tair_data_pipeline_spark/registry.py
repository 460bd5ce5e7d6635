"""Query registry: every engine operator exposed as a named query.

Each :class:`QuerySpec` pairs a Spark implementation ``(spark, sf_dir)
-> DataFrame`` with (where SQL-expressible) the equivalent ANSI SQL the
DuckDB oracle runs on the same parquet tables. Keys follow SURVEY.md §2
operator ids. The driver's correctness gate compares the two per query
(row-count + schema + order-insensitive value-hash), so:

- every computed column is aliased identically on both sides;
- every column produced by floating-point *arithmetic* (sums, averages,
  similarity scores) is rounded identically on both sides, because
  accumulation order differs between engines; raw passthrough doubles
  are left untouched (bit-identical in both engines).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .session import tune


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        tune(spark)
        return fn(spark, sf_dir)

    return runner


def all_queries() -> dict[str, QuerySpec]:
    """Collect QuerySpecs from every operator module. Imports fail
    LOUDLY: a silently-shrinking registry would pass the correctness
    gate with less coverage, which is worse than a visible error (the
    one genuinely optional dependency, torch, is gated inside
    sources.landsat at call time, not import time)."""
    from .operators import (
        augment,
        dedup,
        domain,
        events,
        mapping,
        multimodal,
        relational,
        similarity,
        text,
    )
    from .streaming import windows as streaming_windows

    # Merge order is LOAD-BEARING: the driver's correctness gate records
    # only the first 50 registry entries in this insertion order. Round 1
    # verified relational/events/dedup/similarity-head; round 2 fronts the
    # never-verified surfaces (domain, mapping, text, streaming = exactly
    # 50 oracled keys). Round 3 should front multimodal/augment/similarity
    # to pick up the remaining 14 unverified keys.
    merged: dict[str, QuerySpec] = {}
    for mod in (
        domain,
        mapping,
        text,
        streaming_windows,
        multimodal,
        augment,
        similarity,
        dedup,
        events,
        relational,
    ):
        for name, spec in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query id {name!r}")
            merged[name] = spec
    return merged


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(spec.fn) for name, spec in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
