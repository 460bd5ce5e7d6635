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

import numpy as np
import pytest
from pyspark.sql import functions as F


def _emb_np(spark, sf_dir):
    from landsat_tair_data_pipeline_spark.operators.similarity import _emb

    rows = _emb(spark, sf_dir).select("vec_id", "v").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    V = np.array([r["v"] for r in rows], dtype=np.float64)
    V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
    order = np.argsort(ids)
    return ids[order], V[order]


def _round6(x):
    # mirror the kernel exactly: nudge BEFORE sign/abs
    raw = x + 1e-9
    return np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6


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


# --- host reputation: consistency with the canonicalizer --------------------


def test_host_reputation_consistent_with_canon(spark, sf_dir):
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        text_host_reputation,
    )
    from landsat_tair_data_pipeline_spark.operators.text import (
        text_url_canonicalize,
    )

    canon = text_url_canonicalize(spark, sf_dir).collect()
    per_host = defaultdict(lambda: [0, set()])
    for r in canon:
        host = r["canon_url"].split("/")[0].split("?")[0]
        per_host[host][0] += 1
        per_host[host][1].add(r["canon_url"])
    rows = text_host_reputation(spark, sf_dir).collect()
    assert {r["host"] for r in rows} == set(per_host)
    for r in rows:
        n, urls = per_host[r["host"]]
        assert r["n_docs"] == n
        assert r["n_urls"] == len(urls)
        assert abs(r["dup_factor"] - round(n / len(urls) + 1e-9, 4)) < 1e-9
        assert r["mean_quality"] is None or r["mean_quality"] < 0


# --- incremental semantic dedup: exactness over probed cells ----------------


def test_emb_dedup_incremental_shape_and_flags(spark, sf_dir):
    """Shard coverage, side disjointness, flag consistency, and
    within-probed-cells exactness: each emitted best match must BE the
    exact-cosine argmax among the corpus members of the shard vector's
    probed cells (recomputed in numpy from the same frames)."""
    import numpy as np

    from landsat_tair_data_pipeline_spark.operators.similarity import (
        _INCR_SEM_SHARD_MOD,
        _SEMDEDUP_TAU,
        _emb,
        _ranked_cells,
        emb_dedup_incremental,
    )

    m = _INCR_SEM_SHARD_MOD
    rows = emb_dedup_incremental(spark, sf_dir).collect()
    assert rows
    ids_e, V = _emb_np(spark, sf_dir)
    id_pos = {int(i): p for p, i in enumerate(ids_e)}
    emb = _emb(spark, sf_dir).select("vec_id", "v")
    corpus = emb.where((F.col("vec_id") % m) != m - 1)
    ranked = _ranked_cells(emb, corpus).collect()
    assign = {}
    probes = defaultdict(list)
    for r in ranked:
        if r["vec_id"] % m != m - 1 and r["rk"] == 1:
            assign.setdefault(r["cid"], []).append(r["vec_id"])
        if r["vec_id"] % m == m - 1:
            probes[r["vec_id"]].append(r["cid"])
    seen = set()
    for r in rows:
        q = r["shard_vec_id"]
        assert q % m == m - 1
        assert r["best_corpus_id"] % m != m - 1
        assert r["is_dup"] == (r["cosine"] >= _SEMDEDUP_TAU)
        assert q not in seen
        seen.add(q)
        cands = [
            c for cell in probes[q] for c in assign.get(cell, [])
        ]
        assert cands, q
        qv = V[id_pos[q]]
        cos = {
            c: float(_round6(np.dot(qv, V[id_pos[c]])))
            for c in cands
        }
        best = min(cos, key=lambda c: (-cos[c], c))
        assert (r["best_corpus_id"], r["cosine"]) == (best, cos[best]), q


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
