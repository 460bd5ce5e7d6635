"""Round-13 retrieval pair: cross-corpus ANN join + semantic decontam.

Structural invariants the oracle hash can't certify on its own terms:
side disjointness, probed-cell provenance, within-candidate exactness
(the ANN join must be EXACT over the cells it probed), and brute-force
completeness of the decontamination flags (a missed contaminated doc
is a silent eval leak — the one property the op exists to guarantee).
"""

from __future__ import annotations

import numpy as np
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
    return np.sign(x) * np.floor(np.abs(x) * 1e6 + 0.5) / 1e6


def test_ann_cross_sides_and_ranks(spark, sf_dir):
    from landsat_tair_data_pipeline_spark.operators.similarity import (
        _KNN_K,
        sim_ann_cross_join,
    )

    rows = sim_ann_cross_join(spark, sf_dir).collect()
    assert rows, "vacuous cross join"
    by_q = {}
    for r in rows:
        assert r["query_id"] % 2 == 1, "query side must be odd ids"
        assert r["nn_id"] % 2 == 0, "index side must be even ids"
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _KNN_K
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_ann_cross_candidates_from_probed_cells(spark, sf_dir):
    """Every returned neighbor must be an index-side member ASSIGNED
    (rk=1) to one of the query's probed cells — the IVF contract."""
    from landsat_tair_data_pipeline_spark.operators.similarity import (
        _emb,
        _ranked_cells,
        sim_ann_cross_join,
    )

    emb = _emb(spark, sf_dir).select("vec_id", "v")
    ranked = _ranked_cells(emb, emb.where(F.col("vec_id") % 2 == 0))
    home = {
        r["vec_id"]: r["cid"]
        for r in ranked.where(F.col("rk") == 1).collect()
    }
    probes = {}
    for r in ranked.collect():
        if r["vec_id"] % 2 == 1:
            probes.setdefault(r["vec_id"], set()).add(r["cid"])
    for r in sim_ann_cross_join(spark, sf_dir).collect():
        assert home[r["nn_id"]] in probes[r["query_id"]], (
            f"neighbor {r['nn_id']} of query {r['query_id']} not in a "
            "probed cell"
        )


def test_ann_cross_exact_within_candidates(spark, sf_dir):
    """Within the probed candidate set the join must be EXACT: for
    every query, its returned top-k equals the brute-force cosine
    top-k over the assigned members of its probed cells (numpy, same
    6dp half-away-from-zero rounding + id tiebreak)."""
    from landsat_tair_data_pipeline_spark.operators.similarity import (
        _KNN_K,
        _emb,
        _ranked_cells,
        sim_ann_cross_join,
    )

    ids, V = _emb_np(spark, sf_dir)
    vec = {i: V[j] for j, i in enumerate(ids)}
    emb = _emb(spark, sf_dir).select("vec_id", "v")
    ranked = _ranked_cells(emb, emb.where(F.col("vec_id") % 2 == 0))
    members_by_cell = {}
    probes = {}
    for r in ranked.collect():
        if r["vec_id"] % 2 == 0:
            if r["rk"] == 1:
                members_by_cell.setdefault(r["cid"], []).append(r["vec_id"])
        else:
            probes.setdefault(r["vec_id"], set()).add(r["cid"])
    got = {}
    for r in sim_ann_cross_join(spark, sf_dir).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["nn_id"], r["cosine"])
        )
    assert got
    for q, rs in got.items():
        cands = sorted(
            {m for c in probes[q] for m in members_by_cell.get(c, [])}
        )
        cos = _round6(np.array([vec[q] @ vec[m] for m in cands]) + 1e-9)
        want = sorted(
            zip(-cos, cands),
        )[:_KNN_K]
        want = [(i + 1, m, -negc) for i, (negc, m) in enumerate(want)]
        assert sorted(rs) == want, f"query {q} mismatch"


def test_semantic_decontam_complete_and_tight(spark, sf_dir):
    """Brute-force completeness: EVERY train doc whose best eval-match
    rounded cosine >= tau is flagged with exactly that (argmax,
    lowest-eval-id tiebreak) witness, and NO doc below tau appears."""
    from landsat_tair_data_pipeline_spark.operators.similarity import (
        _DECONTAM_EVAL_N,
        _DECONTAM_TAU,
        sim_semantic_decontam,
    )

    ids, V = _emb_np(spark, sf_dir)
    ev_mask = ids < _DECONTAM_EVAL_N
    ev_ids, ev_V = ids[ev_mask], V[ev_mask]
    tr_ids, tr_V = ids[~ev_mask], V[~ev_mask]
    cos = _round6(tr_V @ ev_V.T + 1e-9)
    want = {}
    for j, d in enumerate(tr_ids):
        best = np.lexsort((ev_ids, -cos[j]))[0]
        if cos[j][best] >= _DECONTAM_TAU:
            want[int(d)] = (int(ev_ids[best]), float(cos[j][best]))
    got = {
        r["doc_id"]: (r["eval_id"], r["cosine"])
        for r in sim_semantic_decontam(spark, sf_dir).collect()
    }
    assert want, "vacuous corpus: nothing contaminated"
    assert got == want


def test_v7_funnel_monotone_and_v6_consistent(spark, sf_dir):
    """v7's funnel must be stage-monotone including the new decontam
    column, and its columns UP THROUGH n_after_semantic must equal
    v6's exactly — the decontam stage may only affect what follows."""
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        llm_data_pipeline_v6,
        llm_data_pipeline_v7,
    )

    v7 = {r["source"]: r for r in llm_data_pipeline_v7(spark, sf_dir).collect()}
    v6 = {r["source"]: r for r in llm_data_pipeline_v6(spark, sf_dir).collect()}
    assert set(v7) == set(v6)
    shared = [
        "n_raw",
        "n_after_domain",
        "n_after_exact",
        "n_after_boilerplate",
        "n_after_quality",
        "n_after_containment",
        "n_after_semantic",
    ]
    for src, r in v7.items():
        for c in shared:
            assert r[c] == v6[src][c], (src, c)
        assert (
            r["n_raw"]
            >= r["n_after_domain"]
            >= r["n_after_exact"]
            >= r["n_after_boilerplate"]
            >= r["n_after_quality"]
            >= r["n_after_containment"]
            >= r["n_after_semantic"]
            >= r["n_after_decontam"]
            >= r["n_kept"]
        )
