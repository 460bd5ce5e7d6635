"""Round-14 operators: URL/address grain, epoch-budget accounting,
the v8 pipeline, and the streaming incremental-shard twin.

Structural invariants the oracle hash can't certify on its own terms:
each canonicalization rule individually (the oracle mirrors the same
construction, so a rule both sides get wrong would still hash-match),
keep-best argmax semantics against a pure-Python model, the epoch
formula against a pandas recompute, v8's funnel monotonicity, and the
streaming drain's row-for-row equality with the batch op it claims to
reproduce.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F


# --- URL canonicalizer: one test per rule -----------------------------------

CANON_CASES = [
    # (raw, expected canonical)
    ("https://h1.example.com/p/3", "h1.example.com/p/3"),
    ("HTTPS://H1.EXAMPLE.COM/p/3/", "h1.example.com/p/3"),  # case + slash
    ("http://h1.example.com/p/3?utm_source=feed", "h1.example.com/p/3"),
    ("https://www.h1.example.com/p/3#section-2", "h1.example.com/p/3"),
    (
        "https://h1.example.com/p/3?id=7&utm_campaign=x",
        "h1.example.com/p/3?id=7",
    ),
    ("https://h1.example.com:443/p/3?ref=tw&id=7", "h1.example.com/p/3?id=7"),
    # rules beyond the six derived variants
    ("https://a.com:80/x", "a.com/x"),  # http default port
    ("https://a.com:8080/x", "a.com:8080/x"),  # NON-default port kept
    ("https://a.com/x?b=2&a=1", "a.com/x?a=1&b=2"),  # param sort
    ("https://a.com/x?fbclid=abc&gclid=def", "a.com/x"),  # tracking only
    ("https://a.com/x?utm_source=s&utm_medium=m&id=1", "a.com/x?id=1"),
    ("https://a.com/", "a.com"),  # root slash
    ("https://a.com", "a.com"),  # bare host
    ("ftp://a.com/f", "a.com/f"),  # any scheme strips
    ("https://WWW.A.COM/x", "a.com/x"),  # www after lowering
    ("https://a.com/x#f?notquery=1", "a.com/x"),  # ? inside fragment
    ("https://a.com/x?refresh=1", "a.com/x?refresh=1"),  # ref= is a
    # PREFIX test on the whole param, refresh=1 must survive
    ("https://a.com/x?a=1&a=1", "a.com/x?a=1&a=1"),  # dup params kept
]


def test_url_canon_rules(spark):
    from landsat_tair_data_pipeline_spark.operators.text import _url_canon

    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CANON_CASES)], "i int, u string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", _url_canon(F.col("u")).alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CANON_CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_url_canon_duckdb_rules_match():
    """The SQL template must implement the same rules — run the same
    case table through DuckDB (the oracle's construction) and compare
    to the expected strings, not just to Spark."""
    import duckdb

    from landsat_tair_data_pipeline_spark.operators.text import (
        _URL_CANON_SQL_TMPL,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE cases (i INT, u VARCHAR)")
    con.executemany(
        "INSERT INTO cases VALUES (?, ?)",
        [(i, raw) for i, (raw, _) in enumerate(CANON_CASES)],
    )
    got = dict(
        con.execute(
            "SELECT i, "
            + _URL_CANON_SQL_TMPL.format(u="u")
            + " FROM cases"
        ).fetchall()
    )
    for i, (raw, want) in enumerate(CANON_CASES):
        assert got[i] == want, f"duckdb {raw!r}: {got[i]!r} != {want!r}"


# --- dedup_url_grain: keep-best vs a pure-Python model ----------------------


def test_url_grain_keeper_is_argmax_quality(spark, sf_dir):
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        _url_ranked,
        text_bigram_lm_score,
    )
    from landsat_tair_data_pipeline_spark.operators.text import (
        text_url_canonicalize,
    )

    canon = {
        r["doc_id"]: r["canon_url"]
        for r in text_url_canonicalize(spark, sf_dir).collect()
    }
    lm = {
        r["doc_id"]: r["avg_logp"]
        for r in text_bigram_lm_score(spark, sf_dir).collect()
    }
    groups = defaultdict(list)
    for d, c in canon.items():
        groups[c].append(d)
    expect_keeper = {}
    for c, ds in groups.items():
        expect_keeper[c] = min(
            ds, key=lambda d: (-lm.get(d, -1e9), d)
        )
    ranked = _url_ranked(spark, sf_dir).collect()
    got_keeper = {
        r["canon_url"]: r["doc_id"] for r in ranked if r["_rn"] == 1
    }
    assert got_keeper == expect_keeper
    # non-vacuity: the derived address must actually collide
    assert any(len(ds) > 1 for ds in groups.values())


def test_url_grain_funnel_partitions(spark, sf_dir):
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        dedup_url_grain,
    )

    rows = dedup_url_grain(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] + r["n_dropped_dup"] == r["n_raw"]
        assert r["n_kept"] >= 0 and r["n_dropped_dup"] >= 0
    assert sum(r["n_dropped_dup"] for r in rows) > 0, "vacuous dedup"


# --- tokens_epoch_budget: formula vs pandas recompute -----------------------


def test_epoch_budget_formula(spark, sf_dir):
    from landsat_tair_data_pipeline_spark.operators.augment import (
        _EPOCH_BUDGET_MULT,
        _TEMP_ALPHA,
        tokens_epoch_budget,
    )
    from landsat_tair_data_pipeline_spark.operators.text import TOKENS
    from landsat_tair_data_pipeline_spark.sources.tables import table

    per_src = {
        r["source"]: r["n"]
        for r in table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(TOKENS())).alias("n"))
        .collect()
    }
    tot = sum(per_src.values())
    w = {s: (n / tot) ** _TEMP_ALPHA for s, n in per_src.items()}
    z = sum(w.values())
    rows = tokens_epoch_budget(spark, sf_dir).collect()
    assert len(rows) == len(per_src)
    seen_over = seen_under = False
    for r in rows:
        s = r["source"]
        p = per_src[s] / tot
        q = w[s] / z
        exp_epochs = round(_EPOCH_BUDGET_MULT * q / p + 1e-9, 4)
        assert math.isclose(r["epochs"], exp_epochs, abs_tol=2e-4), s
        assert r["over_repeat"] == (r["epochs"] > 4.0)
        drawn = _EPOCH_BUDGET_MULT * tot * q
        capped = min(drawn, 4.0 * per_src[s])
        assert math.isclose(
            r["capped_share"],
            round(capped / (_EPOCH_BUDGET_MULT * tot) + 1e-9, 6),
            abs_tol=2e-6,
        ), s
        seen_over |= r["over_repeat"]
        seen_under |= not r["over_repeat"]
    assert seen_over and seen_under, "over_repeat must split the sources"


# --- v8 pipeline: funnel shape ----------------------------------------------


def test_v8_funnel_monotone_and_url_stage_bites(spark, sf_dir):
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        llm_data_pipeline_v8,
    )

    rows = llm_data_pipeline_v8(spark, sf_dir).collect()
    assert rows
    stages = [
        "n_raw",
        "n_after_url",
        "n_after_domain",
        "n_after_exact",
        "n_after_boilerplate",
        "n_after_quality",
        "n_after_containment",
        "n_after_semantic",
        "n_after_decontam",
        "n_kept",
    ]
    for r in rows:
        vals = [r[c] for c in stages]
        # domain flagging can only zero a source, never grow it; every
        # later stage is an anti/semi join — monotone non-increasing
        for a, b in zip(vals, vals[1:]):
            assert b <= a, (r["source"], stages, vals)
    total_raw = sum(r["n_raw"] for r in rows)
    total_url = sum(r["n_after_url"] for r in rows)
    assert total_url < total_raw, "URL stage vacuous"
    # epoch columns present and boolean/double typed
    for r in rows:
        if r["epochs_at_4x"] is not None:
            assert r["over_repeat"] == (r["epochs_at_4x"] > 4.0)


# --- streaming shard dedup: equals the batch op row-for-row -----------------


def test_stream_dedup_shard_equals_batch(spark, sf_dir):
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        dedup_incremental_shard,
    )
    from landsat_tair_data_pipeline_spark.streaming.windows import (
        stream_dedup_shard,
    )

    batch = sorted(map(tuple, dedup_incremental_shard(spark, sf_dir).collect()))
    stream = sorted(map(tuple, stream_dedup_shard(spark, sf_dir).collect()))
    assert batch == stream


def test_stream_dedup_shard_idempotent_rerun(spark, sf_dir):
    """Second drain in the same session must produce the same result
    (the seen/outcome sinks are wiped per invocation; a stale seen
    ledger would mark every shard doc dup_within)."""
    from landsat_tair_data_pipeline_spark.streaming.windows import (
        stream_dedup_shard,
    )

    a = sorted(map(tuple, stream_dedup_shard(spark, sf_dir).collect()))
    b = sorted(map(tuple, stream_dedup_shard(spark, sf_dir).collect()))
    assert a == b
