"""Property-based tests for the r12 second-wave ops: random tiny
corpora (5-word alphabet → dense chunk/bigram collisions, the corner
the fixed testdata can't sweep) checked against independent pure-Python
models. Each example writes its own documents.parquet so the ops run
their real read path.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["alpha", "beta", "gamma", "delta", "eps"]


@st.composite
def corpus(draw):
    n_docs = draw(st.integers(2, 12))
    docs = []
    for i in range(n_docs):
        n_tok = draw(st.integers(1, 23))
        toks = [
            _WORDS[draw(st.integers(0, len(_WORDS) - 1))]
            for _ in range(n_tok)
        ]
        docs.append((i, " ".join(toks), "en", f"src{i % 3}", len(" ".join(toks))))
    return docs


_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
_SEQ = [0]


def _write(spark, tmp_path, docs):
    _SEQ[0] += 1
    d = tmp_path / f"c{_SEQ[0]}"
    spark.createDataFrame(docs, _SCHEMA).coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus())
def test_dedup_paragraph_random_corpora(spark, tmp_path, docs):
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        _PARA_WIDTH,
        dedup_paragraph,
    )

    sf = _write(spark, tmp_path, docs)
    owners: dict[str, set[int]] = defaultdict(set)
    model: dict[int, list[str]] = {}
    for did, text, *_ in docs:
        toks = text.split()
        ch = [
            " ".join(toks[i : i + _PARA_WIDTH])
            for i in range(0, len(toks), _PARA_WIDTH)
        ]
        model[did] = ch
        for c in ch:
            owners[c].add(did)
    for r in dedup_paragraph(spark, sf).collect():
        ch = model[r["doc_id"]]
        assert r["n_chunks"] == len(ch)
        assert r["n_dup_chunks"] == sum(
            1 for c in ch if len(owners[c]) >= 2
        )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus())
def test_dsir_weight_random_corpora(spark, tmp_path, docs):
    from landsat_tair_data_pipeline_spark.operators.text import (
        _DSIR_BUCKETS,
        _DSIR_TARGET,
        text_dsir_weight,
    )

    sf = _write(spark, tmp_path, docs)
    c_r: Counter = Counter()
    c_t: Counter = Counter()
    bdoc: dict[int, list[int]] = {}
    for did, text, _, src, _n in docs:
        toks = text.split()
        if len(toks) < 2:
            continue
        bs = [
            int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:2], 16)
            for a, b in zip(toks, toks[1:])
        ]
        bdoc[did] = bs
        c_r.update(bs)
        if src == _DSIR_TARGET:
            c_t.update(bs)
    t_r, t_t = sum(c_r.values()), sum(c_t.values())
    rows = text_dsir_weight(spark, sf).collect()
    assert len(rows) == len(bdoc)
    for r in rows:
        want = round(
            sum(
                math.log((c_t[b] + 1) / (t_t + _DSIR_BUCKETS))
                - math.log((c_r[b] + 1) / (t_r + _DSIR_BUCKETS))
                for b in bdoc[r["doc_id"]]
            )
            + 1e-9,
            6,
        )
        assert abs(r["log_weight"] - want) < 1e-8, (r, want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus())
def test_sample_temperature_random_corpora(spark, tmp_path, docs):
    from landsat_tair_data_pipeline_spark.operators.augment import (
        sample_temperature,
    )

    sf = _write(spark, tmp_path, docs)
    mass: Counter = Counter()
    for _did, text, _, src, _n in docs:
        mass[src] += len(text.split())
    rows = sample_temperature(spark, sf).collect()
    assert {r["source"]: r["n_tokens"] for r in rows} == dict(mass)
    assert abs(sum(r["q_temp"] for r in rows) - 1.0) < 1e-3
    by_tok = sorted(rows, key=lambda r: r["n_tokens"])
    boosts = [r["boost"] for r in by_tok]
    assert boosts == sorted(boosts, reverse=True)
