#!/usr/bin/env python
"""r14 probe: A/B the MinHash signature-frame shapes at sf0.1.

A = current explode + 256-column MIN groupBy (md5 per raw token)
B = same agg shape, but over a pre-hashed distinct th array (shared
    with the verify stage — one md5 per token for the whole key)
C = per-row: 256 F.aggregate folds over the th array (zero shuffle)
D = per-row: 256 array_min(transform(...)) (zero shuffle, allocs)

Times a count() over the full 256-col signature frame, best of 2
after 1 warm rep.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from landsat_tair_data_pipeline_spark.operators.dedup import (
    _MH_A,
    _MH_B,
    _MH_BANDS,
    _MH_H_MOD,
    _MH_P,
    _MH_ROWS,
    _md5_long,
    TOKENS,
)
from landsat_tair_data_pipeline_spark.session import get_spark
from landsat_tair_data_pipeline_spark.sources.tables import table

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_PERM = _MH_BANDS * _MH_ROWS


def variant_a(spark):
    docs = table(spark, SF, "documents").select(
        "doc_id", F.array_distinct(TOKENS()).alias("toks")
    )
    tok = docs.select("doc_id", F.explode("toks").alias("t")).select(
        "doc_id", (_md5_long(F.col("t")) % _MH_H_MOD).alias("h30")
    )
    return tok.groupBy("doc_id").agg(
        *[
            F.min((F.lit(_MH_A[p]) * F.col("h30") + F.lit(_MH_B[p])) % _MH_P).alias(
                f"m{p}"
            )
            for p in range(N_PERM)
        ]
    )


def _th(spark):
    return table(spark, SF, "documents").select(
        "doc_id", F.array_distinct(F.transform(TOKENS(), _md5_long)).alias("th")
    )


def variant_b(spark):
    tok = _th(spark).select(
        "doc_id", F.explode("th").alias("t")
    ).select("doc_id", (F.col("t") % _MH_H_MOD).alias("h30"))
    return tok.groupBy("doc_id").agg(
        *[
            F.min((F.lit(_MH_A[p]) * F.col("h30") + F.lit(_MH_B[p])) % _MH_P).alias(
                f"m{p}"
            )
            for p in range(N_PERM)
        ]
    )


def _fold(p):
    def merge(acc, h):
        return F.least(acc, (F.lit(_MH_A[p]) * h + F.lit(_MH_B[p])) % _MH_P)

    return merge


def _perm(p):
    def apply(h):
        return (F.lit(_MH_A[p]) * h + F.lit(_MH_B[p])) % _MH_P

    return apply


def variant_c(spark):
    hs = _th(spark).select(
        "doc_id", F.transform("th", lambda t: t % _MH_H_MOD).alias("hs")
    )
    return hs.select(
        "doc_id",
        *[
            F.aggregate("hs", F.lit(_MH_P).cast("long"), _fold(p)).alias(f"m{p}")
            for p in range(N_PERM)
        ],
    )


def variant_d(spark):
    hs = _th(spark).select(
        "doc_id", F.transform("th", lambda t: t % _MH_H_MOD).alias("hs")
    )
    return hs.select(
        "doc_id",
        *[
            F.array_min(F.transform("hs", _perm(p))).alias(f"m{p}")
            for p in range(N_PERM)
        ],
    )


import numpy as np
import pandas as pd


def variant_e(spark):
    from pyspark.sql.functions import pandas_udf

    A = np.array(_MH_A, dtype=np.int64)
    B = np.array(_MH_B, dtype=np.int64)

    @pandas_udf("array<long>")
    def sig(th: pd.Series) -> pd.Series:
        out = []
        for arr in th:
            h = np.asarray(arr, dtype=np.int64) % _MH_H_MOD
            vals = (h[:, None] * A[None, :] + B[None, :]) % _MH_P
            out.append(vals.min(axis=0))
        return pd.Series(out)

    return _th(spark).select("doc_id", sig("th").alias("sig"))


def main():
    spark = get_spark("landsat-tair-r14-mh-ab")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name, fn in (
        ("A_explode_raw", variant_a),
        ("B_explode_prehashed", variant_b),
        ("C_agg_fold", variant_c),
        ("D_arraymin", variant_d),
        ("E_pandas_numpy", variant_e),
    ):
        fn(spark).write.format("noop").mode("overwrite").save()  # warm
        best = None
        for _ in range(2):
            gc.collect()
            t0 = time.perf_counter()
            fn(spark).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    # value identity: A vs C and A vs E signatures must match row-for-row
    a = variant_a(spark)
    out["a_vs_c_diff_rows"] = a.exceptAll(variant_c(spark)).count()
    a_arr = a.select(
        "doc_id", F.array(*[F.col(f"m{p}") for p in range(N_PERM)]).alias("sig")
    )
    out["a_vs_e_diff_rows"] = a_arr.exceptAll(variant_e(spark)).count()
    print("MHABJSON:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
