"""Edge-case guards for the r11 text/curation operators.

Synthetic documents written to a temp parquet dir (the ops read via
sources.tables.table, so the tests exercise the real read path):

- text_repeated_ngrams: the sequence(1, sz-2) guard — Spark sequence
  DESCENDS when start > stop, so an unguarded 1-2-token doc would
  fabricate grams from negative indices; plus the exact per-doc
  arithmetic and the lexicographic top-gram tie-break.
- text_psi_drift: identical distributions must read EXACTLY 0 after
  rounding (Laplace terms cancel), and a shifted source must read > 0.
- ext_dedup_near (banded MinHash): an exact duplicate pair (jaccard 1,
  every band equal) must always be found; token-disjoint docs never.
"""

from __future__ import annotations

import pytest


def _write_docs(spark, tmp_path, rows):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def test_repeated_ngrams_short_doc_guard_and_arithmetic(spark, tmp_path):
    from landsat_tair_data_pipeline_spark.operators.text import (
        text_repeated_ngrams,
    )

    sf = _write_docs(
        spark,
        tmp_path,
        [
            ("one", "s0"),  # 1 token: no grams, never fabricated
            ("one two", "s0"),  # 2 tokens: ditto
            ("a b a b a b", "s0"),  # grams: "a b a"x2, "b a b"x2
            ("x y z w", "s0"),  # 2 grams, no repeats -> excluded
        ],
    )
    rows = {r["doc_id"]: r for r in text_repeated_ngrams(spark, sf).collect()}
    assert set(rows) == {2}, "only the stuttering doc is emitted"
    r = rows[2]
    assert r["n_grams"] == 4
    assert r["n_repeated"] == 2
    assert r["max_repeat"] == 2
    assert r["rep_fraction"] == pytest.approx(1.0)
    # tie at count 2 -> lexicographically smallest gram wins
    assert r["top_gram"] == "a b a"


def test_psi_zero_on_identical_and_positive_on_shift(spark, tmp_path):
    from landsat_tair_data_pipeline_spark.operators.text import text_psi_drift

    short, long_ = "x" * 50, "y" * 400  # bins 0 and 6
    sf = _write_docs(
        spark,
        tmp_path,
        # s0 and s1: identical length distributions; s2: all long docs
        [(short, "s0")] * 3
        + [(long_, "s0")] * 3
        + [(short, "s1")] * 3
        + [(long_, "s1")] * 3
        + [(long_, "s2")] * 6,
    )
    psi = {r["source"]: r["psi_vs_rest"] for r in text_psi_drift(spark, sf).collect()}
    # s0's rest (s1+s2) is long-heavy, so s0 drifts; the cleanest exact
    # pin: s0 and s1 see the SAME rest-complement by symmetry
    assert psi["s0"] == pytest.approx(psi["s1"])
    assert psi["s2"] > psi["s0"] >= 0.0


def test_psi_exact_zero_two_identical_sources(spark, tmp_path):
    from landsat_tair_data_pipeline_spark.operators.text import text_psi_drift

    sf = _write_docs(
        spark,
        tmp_path,
        [("a" * 100, "s0")] * 4 + [("a" * 100, "s1")] * 4,
    )
    psi = {r["source"]: r["psi_vs_rest"] for r in text_psi_drift(spark, sf).collect()}
    # p == q in every bin -> every (p-q)ln(p/q) term is exactly 0
    assert psi == {"s0": 0.0, "s1": 0.0}


def test_banded_minhash_finds_exact_dup_never_disjoint(spark, tmp_path):
    from landsat_tair_data_pipeline_spark.operators.dedup import ext_dedup_near

    text_a = "alpha beta gamma delta epsilon zeta eta theta"
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (text_a, "s0"),
            (text_a, "s0"),  # exact dup: all 64 bands equal by identity
            ("uno dos tres cuatro cinco seis siete ocho", "s0"),
        ],
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard_sim"]
        for r in ext_dedup_near(spark, sf).collect()
    }
    assert pairs == {(0, 1): 1.0}
