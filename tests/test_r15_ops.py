"""Round-15 operators: BPE merge-step induction, corpus snapshot
diff, graded retrieval metrics, and the sim_ivf_topk graduation.

Structural invariants the oracle hash can't certify on its own terms
(both engines mirror the same construction, so a shared construction
bug would still hash-match): the BPE rounds against an independent
pure-Python reference implementation, the leftmost-non-overlapping
merge semantics and sentinel safety on crafted words, the diff carve
against direct slot arithmetic, the MRR/nDCG arithmetic against a
pure-Python recompute from its own inputs, and the IVF top-k against
a numpy exact re-rank within the probed cells.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F


# --- BPE ------------------------------------------------------------------


def _bpe_reference(word_counts: dict[str, int], rounds: int):
    """Independent BPE model: symbol sequences as Python tuples,
    leftmost-non-overlapping merge application, (count DESC, pair
    lexicographic) tie-break. Returns the per-round readout rows."""
    state = {w: tuple(w) for w in word_counts}
    out = []
    total_chars = sum(n * len(w) for w, n in word_counts.items())
    for r in range(1, rounds + 1):
        pairs: Counter = Counter()
        for w, syms in state.items():
            n = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        (l, rr), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = l + rr
        new_state = {}
        for w, syms in state.items():
            res = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rr:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_state[w] = tuple(res)
        state = new_state
        vocab = {s for syms in state.values() for s in syms}
        total_syms = sum(
            word_counts[w] * len(syms) for w, syms in state.items()
        )
        out.append(
            {
                "merge_rank": r,
                "left_sym": l,
                "right_sym": rr,
                "pair_count": cnt,
                "vocab_size": len(vocab),
                "total_symbols": total_syms,
                "compression": round(total_syms / total_chars + 1e-9, 6),
            }
        )
    return out


def test_bpe_vocab_matches_pure_python_reference(spark, sf_dir):
    """text_bpe_vocab's 3 rounds must equal an independently written
    BPE (different data structures, explicit merge loop) run on the
    same word counts — the both-engines-wrong guard."""
    from landsat_tair_data_pipeline_spark.operators.text import (
        TOKENS,
        text_bpe_vocab,
    )
    from landsat_tair_data_pipeline_spark.sources.tables import table

    words = (
        table(spark, sf_dir, "documents")
        .select(F.explode(TOKENS()).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    ref = _bpe_reference({r["w"]: r["n"] for r in words}, 3)
    got = [
        r.asDict()
        for r in text_bpe_vocab(spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    assert len(got) == 3
    for g, e in zip(got, ref):
        assert g == e, (g, e)


def test_bpe_merge_semantics_on_crafted_words(spark):
    """The two traps the sentinel representation must survive:
    leftmost-non-overlapping application ('aaa' with pair (a,a) counts
    2 but merges ONCE -> ['aa','a']) and partial-symbol safety (a pair
    must never fire across a symbol boundary)."""
    from landsat_tair_data_pipeline_spark.operators.text import (
        _bpe_arr,
        _bpe_round,
    )

    state = spark.createDataFrame(
        [("aaa", 10, "|a||a||a|"), ("abab", 1, "|a||b||a||b|")],
        "word string, n long, w string",
    )
    top, new_state = _bpe_round(state)
    t = top.collect()[0]
    # (a,a) count = 2 adjacencies x 10 = 20 beats (a,b)=2=(b,a)=1
    assert (t["l"], t["r"], t["cnt"]) == ("a", "a", 20)
    arrs = {
        r["word"]: r["arr"]
        for r in new_state.withColumn("arr", _bpe_arr()).collect()
    }
    assert arrs["aaa"] == ["aa", "a"]  # merged once, leftmost
    assert arrs["abab"] == ["a", "b", "a", "b"]  # untouched
    # sentinel safety: pair (b,c) must not fire inside ['ab','c'] and
    # (a,b) must not fire inside ['a','bc']
    state2 = spark.createDataFrame(
        [("q", 1, "|ab||c|"), ("z", 5, "|b||c|"), ("y", 1, "|a||bc|")],
        "word string, n long, w string",
    )
    top2, new2 = _bpe_round(state2)
    t2 = top2.collect()[0]
    # (b,c) counts only z's 5 — NOT q's (ab,c)=1 or y's (a,bc)=1
    assert (t2["l"], t2["r"], t2["cnt"]) == ("b", "c", 5)
    arrs2 = {
        r["word"]: r["arr"]
        for r in new2.withColumn("arr", _bpe_arr()).collect()
    }
    assert arrs2["q"] == ["ab", "c"]  # boundary NOT crossed
    assert arrs2["z"] == ["bc"]
    assert arrs2["y"] == ["a", "bc"]


def test_bpe_corpus_tokens_carry_no_sentinel(spark, sf_dir):
    """The '|' sentinel is only safe because the house tokenizer never
    emits it; pin that against the live corpus."""
    from landsat_tair_data_pipeline_spark.operators.text import TOKENS
    from landsat_tair_data_pipeline_spark.sources.tables import table

    n = (
        table(spark, sf_dir, "documents")
        .select(F.explode(TOKENS()).alias("w"))
        .where(F.col("w").contains("|"))
        .count()
    )
    assert n == 0


def test_bpe_encode_token_totals_and_bounds(spark, sf_dir):
    """The encode join must drop nothing (n_tokens equals the direct
    per-source whitespace totals), symbol counts must sit between the
    fully-merged floor (n_tokens) and the character ceiling, and the
    corpus-wide symbol total must equal text_bpe_vocab's round-3
    readout (two independent aggregations of the same state)."""
    from landsat_tair_data_pipeline_spark.operators.text import (
        TOKENS,
        text_bpe_encode,
        text_bpe_vocab,
    )
    from landsat_tair_data_pipeline_spark.sources.tables import table

    got = text_bpe_encode(spark, sf_dir).collect()
    direct = {
        r["source"]: r["c"]
        for r in table(spark, sf_dir, "documents")
        .select("source", F.explode(TOKENS()).alias("w"))
        .where(F.col("w") != "")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert {r["source"]: r["n_tokens"] for r in got} == direct
    for r in got:
        assert r["n_tokens"] <= r["n_symbols"] <= r["n_chars"], r
    vocab3 = (
        text_bpe_vocab(spark, sf_dir)
        .where(F.col("merge_rank") == 3)
        .collect()[0]
    )
    assert sum(r["n_symbols"] for r in got) == vocab3["total_symbols"]


def test_v9_shares_v8_funnel_exactly(spark, sf_dir):
    """llm_data_pipeline_v9 = v8 + the BPE tail and NOTHING else: on
    every shared column the two frames must be row-identical (the
    shared-core cannot-drift pin extended to the fourth variant), and
    the tail must be internally consistent (symbols >= the kept BPE
    token count, ratio recomputes exactly)."""
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        llm_data_pipeline_v8,
        llm_data_pipeline_v9,
    )

    v8 = {r["source"]: r.asDict() for r in llm_data_pipeline_v8(spark, sf_dir).collect()}
    v9 = {r["source"]: r.asDict() for r in llm_data_pipeline_v9(spark, sf_dir).collect()}
    assert set(v8) == set(v9)
    shared = set(next(iter(v8.values()))) & set(next(iter(v9.values())))
    assert "bpe_symbols_kept" not in shared and "bpe_symbols_kept" in next(
        iter(v9.values())
    )
    for src in v8:
        for c in shared:
            assert v8[src][c] == v9[src][c], (src, c)
    total_syms = sum(r["bpe_symbols_kept"] for r in v9.values())
    assert total_syms > 0
    for src, r in v9.items():
        if r["n_kept"] > 0:
            assert r["bpe_symbols_kept"] > 0, src
            assert r["bpe_symbols_per_token"] is not None


# --- corpus snapshot diff --------------------------------------------------


def test_corpus_diff_statuses_match_slot_arithmetic(spark, sf_dir):
    """The per-source status totals must equal direct counts from the
    carve definition, and token mass must balance exactly."""
    from landsat_tair_data_pipeline_spark.operators.text import (
        _DIFF_ADD_SLOT,
        _DIFF_DEL_SLOT,
        _DIFF_EDIT_SLOT,
        _DIFF_MOD,
        TOKENS,
        corpus_diff_snapshot,
    )
    from landsat_tair_data_pipeline_spark.sources.tables import table

    got = corpus_diff_snapshot(spark, sf_dir).collect()
    docs = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            (F.col("doc_id") % _DIFF_MOD).alias("slot"),
            F.size(TOKENS()).cast("long").alias("toks"),
        )
        .collect()
    )
    slots = Counter(r["slot"] for r in docs)
    assert sum(r["n_added"] for r in got) == slots[_DIFF_ADD_SLOT]
    assert sum(r["n_removed"] for r in got) == slots[_DIFF_DEL_SLOT]
    assert sum(r["n_changed"] for r in got) == slots[_DIFF_EDIT_SLOT]
    n_docs = len(docs)
    assert (
        sum(r["n_unchanged"] for r in got)
        == n_docs - slots[_DIFF_ADD_SLOT] - slots[_DIFF_DEL_SLOT] - slots[_DIFF_EDIT_SLOT]
    )
    # token balance: added docs contribute +toks, removed -toks,
    # edited +2 (' rev2 edit' adds two whitespace tokens)
    expect = (
        sum(r["toks"] for r in docs if r["slot"] == _DIFF_ADD_SLOT)
        - sum(r["toks"] for r in docs if r["slot"] == _DIFF_DEL_SLOT)
        + 2 * slots[_DIFF_EDIT_SLOT]
    )
    assert sum(r["tok_delta"] for r in got) == expect
    # non-vacuity: every status class occurs somewhere
    for c in ("n_added", "n_removed", "n_changed", "n_unchanged"):
        assert sum(r[c] for r in got) > 0, c


# --- graded retrieval metrics ---------------------------------------------


def test_mrr_ndcg_matches_python_recompute(spark, sf_dir):
    """Recompute MRR@10 / nDCG@10 in pure Python from the op's own two
    inputs (exact top-10 and IVF top-10) and demand equality — the
    metric-arithmetic guard (the rankings themselves are oracled)."""
    from landsat_tair_data_pipeline_spark.operators.similarity import (
        _EVAL_K,
        _RECALL_QUERIES,
        _exact_topk,
        _house_ivf_topk,
        sim_eval_mrr_ndcg,
    )

    exact = _exact_topk(
        spark, sf_dir, n_queries=_RECALL_QUERIES, k=_EVAL_K
    ).collect()
    ivf = _house_ivf_topk(spark, sf_dir, _RECALL_QUERIES, _EVAL_K).collect()
    erank = {(r["query_id"], r["cand_id"]): r["rank"] for r in exact}
    by_q: dict[int, list] = {}
    for r in ivf:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cand_id"]))
    idcg: dict[int, float] = {}
    for r in exact:
        idcg[r["query_id"]] = idcg.get(r["query_id"], 0.0) + (
            (_EVAL_K + 1 - r["rank"]) / (math.log(r["rank"] + 1) / math.log(2))
        )
    got = {
        r["query_id"]: r for r in sim_eval_mrr_ndcg(spark, sf_dir).collect()
    }
    assert set(got) == set(by_q)
    for q, lst in by_q.items():
        dcg = 0.0
        first = None
        for rank, cand in sorted(lst):
            er = erank.get((q, cand))
            if er is not None:
                dcg += (_EVAL_K + 1 - er) / (math.log(rank + 1) / math.log(2))
                if first is None:
                    first = rank
        mrr = round((1.0 / first if first else 0.0) + 1e-9, 6)
        ndcg = round(dcg / idcg[q] + 1e-9, 6)
        g = got[q]
        assert g["n_retrieved"] == len(lst)
        assert g["mrr_at10"] == pytest.approx(mrr, abs=1e-9)
        assert g["ndcg_at10"] == pytest.approx(ndcg, abs=1e-9)
        assert 0.0 <= g["mrr_at10"] <= 1.0 + 1e-9
        assert 0.0 <= g["ndcg_at10"] <= 1.0 + 1e-9


def test_pq_eval_consistent_with_recall(spark, sf_dir):
    """The PQ graded metrics and sim_pq_recall must read the SAME
    search: per-query hit counts from the ranked frames sum to the
    recall op's n_hits, metrics recompute exactly through the shared
    block, and a query with zero hits shows mrr = ndcg = 0."""
    from landsat_tair_data_pipeline_spark.operators.similarity import (
        _ADC_K,
        _pq_search_ranked,
        sim_eval_pq_mrr_ndcg,
        sim_pq_recall,
    )

    exk, adck = _pq_search_ranked(spark, sf_dir)
    e = {(r["query_id"], r["vec_id"]): r["rn"] for r in exk.collect()}
    a = {(r["query_id"], r["vec_id"]): r["rn"] for r in adck.collect()}
    hits = set(e) & set(a)
    rec = sim_pq_recall(spark, sf_dir).collect()[0]
    assert rec["n_hits"] == len(hits)
    got = {
        r["query_id"]: r
        for r in sim_eval_pq_mrr_ndcg(spark, sf_dir).collect()
    }
    for q, r in got.items():
        q_hits = [a[k] for k in hits if k[0] == q]
        if not q_hits:
            assert r[f"mrr_at{_ADC_K}"] == 0.0 and r[f"ndcg_at{_ADC_K}"] == 0.0
        else:
            assert r[f"mrr_at{_ADC_K}"] == pytest.approx(
                round(1.0 / min(q_hits) + 1e-9, 6), abs=1e-9
            )
        dcg = sum(
            (_ADC_K + 1 - e[k]) / (math.log(a[k] + 1) / math.log(2))
            for k in hits
            if k[0] == q
        )
        idcg = sum(
            (_ADC_K + 1 - rn) / (math.log(rn + 1) / math.log(2))
            for k, rn in e.items()
            if k[0] == q
        )
        assert r[f"ndcg_at{_ADC_K}"] == pytest.approx(
            round(dcg / idcg + 1e-9, 6), abs=1e-9
        )


# --- sim_ivf_topk graduation ----------------------------------------------


def test_ivf_topk_exact_within_probed_cells(spark, sf_dir):
    """The graduated sim_ivf_topk must equal a numpy exact re-rank
    over the candidates its own cell assignment admits (the
    emb_dedup_incremental within-probed-cells pin applied here)."""
    from landsat_tair_data_pipeline_spark.operators.similarity import (
        _IVF_TOPK_K,
        _IVF_TOPK_QUERIES,
        _emb,
        _ivf_graph_ranked,
        sim_ivf_topk,
    )

    ranked = _ivf_graph_ranked(spark, sf_dir).collect()
    home = {r["vec_id"]: r["cid"] for r in ranked if r["rk"] == 1}
    probes: dict[int, set] = {}
    for r in ranked:
        if r["vec_id"] < _IVF_TOPK_QUERIES:
            probes.setdefault(r["vec_id"], set()).add(r["cid"])
    rows = _emb(spark, sf_dir).select("vec_id", "v").collect()
    vecs = {r["vec_id"]: np.asarray(r["v"], dtype=np.float64) for r in rows}
    for v in vecs.values():
        v /= max(np.linalg.norm(v), 1e-300)

    def r6(x: float) -> float:
        raw = x + 1e-9
        return math.copysign(math.floor(abs(raw) * 1e6 + 0.5) / 1e6, raw)

    got: dict[int, list] = {}
    for r in sim_ivf_topk(spark, sf_dir).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["cand_id"], r["cosine"])
        )
    assert set(got) == set(probes)
    for q, cells in probes.items():
        cands = [
            c for c, cell in home.items() if cell in cells and c != q
        ]
        scored = sorted(
            ((r6(float(vecs[q] @ vecs[c])), c) for c in cands),
            key=lambda t: (-t[0], t[1]),
        )[:_IVF_TOPK_K]
        expect = [
            (i + 1, c, cos) for i, (cos, c) in enumerate(scored)
        ]
        assert sorted(got[q]) == expect, q
