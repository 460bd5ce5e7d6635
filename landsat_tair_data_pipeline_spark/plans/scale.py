"""Physical-layout utilities for the 100 TB posture (SURVEY §2, §4):
skew-salted joins and bucketed co-located joins. These are plan-shaping
helpers, not queries — their correctness (result equality with the
plain join) and plan effects (no shuffle for bucketed joins) are
pinned in tests/test_scale_utils.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed fact against a smaller side by salting: the
    skewed side gets a random salt in [0, n_salts), the other side is
    replicated once per salt, and the join key becomes (key, salt) —
    splitting each hot key's rows across n_salts tasks.

    AQE's skew-join splitting covers sort-merge joins automatically;
    explicit salting still matters for aggregate-then-join patterns
    and for engines/joins AQE can't split. Result is identical to the
    unsalted join (each skewed row matches exactly its salt's replica).
    """
    salted = skewed.withColumn(
        "_salt", (F.rand(7) * n_salts).cast("int")
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted.join(replicated, [key, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 8
) -> None:
    """Persist as a bucketed+sorted table: repeated joins/aggregations
    on `key` then read pre-partitioned data and skip the shuffle
    entirely (verified by plan assertion in tests). The 100 TB pattern:
    bucket the fact tables once at ingest on their join key."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst
    sees compatible output partitioning on both sides and plans a
    sort-merge join with NO Exchange."""
    return spark.table(left_table).join(spark.table(right_table), key)
