"""Local replica of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL on the same sf dir and compares:
row count, column names (sorted), and order-insensitive values — with
exact equality, matching the driver's value-hash semantics (both sides
round float arithmetic identically, so exact compare is the honest
gate).
"""

from __future__ import annotations

import math

import duckdb

from landsat_tair_data_pipeline_spark.sources.tables import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        # a Spark-written table is a DIRECTORY of part files; DuckDB's
        # bare-path read errors on it ("No files found"), so glob the
        # parts — this keeps the hash gate runnable on replica layouts
        # (the layout where the r8 streaming zero-rows bug lived),
        # not just the driver's single-file testdata
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0 vs 0.0
        return v
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def compare(spark, sf_dir: str, spark_fn, oracle: str) -> None:
    sdf = spark_fn(spark, sf_dir)
    scols = list(sdf.columns)
    srows = [tuple(r) for r in sdf.collect()]

    con = duck_con(sf_dir)
    cur = con.execute(oracle)
    ocols = [d[0] for d in cur.description]
    orows = [tuple(r) for r in cur.fetchall()]
    con.close()

    assert sorted(scols) == sorted(ocols), (
        f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}"
    )
    assert len(srows) == len(orows), (
        f"row count mismatch: spark={len(srows)} oracle={len(orows)}"
    )
    _, snorm = _normalize(scols, srows)
    _, onorm = _normalize(ocols, orows)
    for i, (a, b) in enumerate(zip(snorm, onorm)):
        assert a == b, f"row {i} differs:\n  spark : {a}\n  oracle: {b}"
