"""Round-12 curation family: domain rollup, SemDeDup, pipeline v5.

Structural invariants the oracle hash can't see on a lucky corpus:
funnel monotonicity, drop-list keep-lowest-id validity, rollup rank
permutation.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F


def test_domain_rollup_shape_and_rank(spark, sf_dir):
    from landsat_tair_data_pipeline_spark.operators.text import (
        text_domain_rollup,
    )

    rows = text_domain_rollup(spark, sf_dir).collect()
    assert rows, "no domains"
    # one row per source, rank is a permutation of 1..n
    assert len({r["source"] for r in rows}) == len(rows)
    assert sorted(r["dup_rank"] for r in rows) == list(
        range(1, len(rows) + 1)
    )
    for r in rows:
        assert 0 <= r["fp_dup_rate"] <= 1
        assert 0 <= r["ent_pass_rate"] <= 1
        assert r["n_unique_fp"] <= r["n_docs"]
        assert r["flag_high_dup"] == (r["fp_dup_rate"] > 0.055)
    # rank order matches dup rate order (desc, source asc tiebreak)
    by_rank = sorted(rows, key=lambda r: r["dup_rank"])
    keys = [(-r["fp_dup_rate"], r["source"]) for r in by_rank]
    assert keys == sorted(keys)


def test_semdedup_drop_list_is_valid(spark, sf_dir):
    """Every dropped vector's witness must be a LOWER-id member of the
    SAME cell at cosine >= tau; no kept vector may have such a witness
    (completeness); a witness must itself be the MINIMUM qualifying
    id. Brute-forced against the raw embeddings + the op's own cell
    assignment."""
    from landsat_tair_data_pipeline_spark.operators.similarity import (
        _SEMDEDUP_TAU,
        _emb,
        _ivf_graph_ranked,
        dedup_semdedup,
    )

    drops = {
        r["vec_id"]: (r["cell"], r["witness_id"], r["cosine"])
        for r in dedup_semdedup(spark, sf_dir).collect()
    }
    assert drops, "vacuous corpus: nothing dropped"
    cells = {
        r["vec_id"]: r["cid"]
        for r in _ivf_graph_ranked(spark, sf_dir)
        .where(F.col("rk") == 1)
        .collect()
    }
    vecs = {
        r["vec_id"]: r["v"] for r in _emb(spark, sf_dir).collect()
    }

    import numpy as np

    def cos(u, v):
        a, b = np.array(vecs[u]), np.array(vecs[v])
        raw = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))) + 1e-9
        return np.sign(raw) * np.floor(abs(raw) * 1e6 + 0.5) / 1e6

    by_cell = defaultdict(list)
    for v, c in cells.items():
        by_cell[c].append(v)
    for v, (cell, w, c) in drops.items():
        assert cells[v] == cell and cells[w] == cell and w < v
        assert abs(cos(w, v) - c) < 2e-6 and c >= _SEMDEDUP_TAU
        # witness minimality
        for u in by_cell[cell]:
            if u < w:
                assert cos(u, v) < _SEMDEDUP_TAU, (u, v)
    # completeness: a kept vector has NO lower qualifying cell-mate
    for cell, members in by_cell.items():
        members.sort()
        for i, v in enumerate(members):
            if v in drops:
                continue
            for u in members[:i]:
                assert cos(u, v) < _SEMDEDUP_TAU, (u, v)


def test_pipeline_v5_funnel_is_monotone(spark, sf_dir):
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        llm_data_pipeline_v5,
    )

    rows = llm_data_pipeline_v5(spark, sf_dir).collect()
    assert rows
    stages = (
        "n_raw",
        "n_after_domain",
        "n_after_exact",
        "n_after_quality",
        "n_after_containment",
        "n_kept",
    )
    for r in rows:
        seq = [r[s] for s in stages]
        assert all(a >= b >= 0 for a, b in zip(seq, seq[1:])), r
        if r["n_kept"] == 0:
            assert r["mean_entropy_kept"] is None and r["kept_tokens"] == 0
        else:
            assert r["kept_tokens"] > 0 and r["mean_entropy_kept"] > 0
    # the two NEW stages each bite somewhere at this sf
    assert any(r["n_after_domain"] < r["n_raw"] for r in rows), (
        "domain pre-filter vacuous"
    )
