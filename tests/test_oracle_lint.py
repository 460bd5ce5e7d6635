"""Oracle-SQL type lint: no HUGEINT-producing aggregates.

The driver canonicalizes both result sets through pandas/Arrow before
hashing. DuckDB's integer ``SUM`` returns HUGEINT (int128), which Arrow
renders as float64/object while Spark's BIGINT stays int64 — the exact
rows-match/schema-match/hash-mismatch signature that cost
``src_jsonl_documents`` its r5 driver row (VERDICT r5 §What's wrong).
Instead of regexing SQL text for bare ``SUM(``, this lint asks DuckDB
itself: ``DESCRIBE <query>`` plans every registered oracle against the
real sf views (no execution) and fails with the key + column name on
any HUGEINT/UHUGEINT output column. Fix at the source: wrap the
aggregate in ``CAST(... AS BIGINT)`` (or ``ROUND`` for floats) exactly
as ``_PIPE2_SQL`` does for ``total_tokens``.
"""

from __future__ import annotations

import os

import pytest

from landsat_tair_data_pipeline_spark.registry import oracle_sqls
from tests.oracle_check import duck_con

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

_BANNED = {"HUGEINT", "UHUGEINT"}


def test_no_hugeint_oracle_columns():
    con = duck_con(SF_DIR)
    offenders: list[str] = []
    try:
        for key, sql in oracle_sqls().items():
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
            for col, typ, *_ in rows:
                if typ.upper() in _BANNED:
                    offenders.append(f"{key}.{col}: {typ}")
    finally:
        con.close()
    assert not offenders, (
        "oracle columns whose DuckDB type the driver canonicalizer "
        "renders differently from Spark (wrap in CAST(... AS BIGINT)): "
        + ", ".join(offenders)
    )
