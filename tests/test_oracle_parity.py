"""The key correctness gate, run locally: every registered query with
an oracle must hash-match DuckDB on the same parquet (mirrors the
driver's t2 check). Rows-only queries must at least run and return a
stable schema.
"""

from __future__ import annotations

import pytest

from landsat_tair_data_pipeline_spark.registry import all_queries
from tests.oracle_check import compare

SPECS = all_queries()
ORACLED = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, sf_dir, name):
    spec = SPECS[name]
    compare(spark, sf_dir, spec.fn, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns


def test_oracle_keys_subset():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 25
