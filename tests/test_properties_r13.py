"""Property-based tests for the r13 ops: random tiny corpora (5-word
alphabet → dense token collisions, the corner the fixed testdata can't
sweep) checked against independent pure-Python models. Each example
writes its own documents.parquet / events.parquet so the ops run their
real read path. The MinHash model reimplements the r13 md5-derived
mod-prime family end-to-end (signatures → bands → candidates → exact
verify), so a drift in ANY stage of the newly-oracled pipeline fails
here on corpora the driver never sees.
"""

from __future__ import annotations

import datetime
import hashlib
from collections import defaultdict

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
        docs.append(
            (i, " ".join(toks), "en", f"src{i % 3}", len(" ".join(toks)))
        )
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


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _r4(x: float) -> float:
    v = x + 1e-9
    return (1.0 if v >= 0 else -1.0) * (int(abs(v) * 1e4 + 0.5) / 1e4)


def _signature(toks: set[str], A, B, P, hmod):
    h30s = [_md5_long(t) % hmod for t in toks]
    return [min((a * h + b) % P for h in h30s) for a, b in zip(A, B)]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus())
def test_ext_dedup_near_matches_model_family(spark, tmp_path, docs):
    """Full-pipeline model: md5-long → h30 → 256 mod-prime mins →
    md5-long band keys → shared-band candidates → exact jaccard ≥ 0.5
    on distinct-token sets (sizes are hash-invariant)."""
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        _MH_A,
        _MH_B,
        _MH_BANDS,
        _MH_H_MOD,
        _MH_P,
        _MH_ROWS,
        ext_dedup_near,
    )

    sf = _write(spark, tmp_path, docs)
    sets = {d[0]: set(d[1].strip().lower().split()) for d in docs}
    bands_by_doc = {}
    for did, toks in sets.items():
        sig = _signature(toks, _MH_A, _MH_B, _MH_P, _MH_H_MOD)
        bands_by_doc[did] = [
            _md5_long(
                ":".join(
                    str(sig[k * _MH_ROWS + r]) for r in range(_MH_ROWS)
                )
            )
            for k in range(_MH_BANDS)
        ]
    buckets = defaultdict(set)
    for did, bl in bands_by_doc.items():
        for k, bv in enumerate(bl):
            buckets[(k, bv)].add(did)
    cands = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                cands.add((a, b))
    want = {}
    for a, b in cands:
        inter = len(sets[a] & sets[b])
        j = _r4(inter / (len(sets[a]) + len(sets[b]) - inter))
        if j >= 0.5:
            want[(a, b)] = j
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard_sim"]
        for r in ext_dedup_near(spark, sf).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus())
def test_shuffle_deterministic_matches_model(spark, tmp_path, docs):
    from landsat_tair_data_pipeline_spark.operators.augment import (
        _SHUFFLE_SEED,
        sample_shuffle_deterministic,
    )

    sf = _write(spark, tmp_path, docs)
    keys = {
        d[0]: hashlib.md5(f"{_SHUFFLE_SEED}:{d[0]}".encode()).hexdigest()
        for d in docs
    }
    order = sorted(keys, key=lambda i: (keys[i], i))
    want = {did: pos + 1 for pos, did in enumerate(order)}
    rows = sample_shuffle_deterministic(spark, sf).collect()
    assert {r["doc_id"]: r["position"] for r in rows} == want
    assert all(r["shuffle_key"] == keys[r["doc_id"]] for r in rows)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus())
def test_incremental_shard_matches_model(spark, tmp_path, docs):
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        _SHARD_MOD,
        dedup_incremental_shard,
    )

    sf = _write(spark, tmp_path, docs)
    fp = {
        d[0]: hashlib.md5(
            " ".join(sorted(set(d[1].strip().lower().split()))).encode()
        ).hexdigest()
        for d in docs
    }
    src = {d[0]: d[3] for d in docs}
    corpus_h = {
        h for i, h in fp.items() if i % _SHARD_MOD != _SHARD_MOD - 1
    }
    shard = sorted(
        i for i in fp if i % _SHARD_MOD == _SHARD_MOD - 1
    )
    want = defaultdict(lambda: [0, 0, 0, 0])  # n, vs, within, kept
    seen_fresh = {}
    for i in shard:
        w = want[src[i]]
        w[0] += 1
        if fp[i] in corpus_h:
            w[1] += 1
        elif fp[i] in seen_fresh:
            w[2] += 1
        else:
            seen_fresh[fp[i]] = i
            w[3] += 1
    got = {
        r["source"]: [
            r["n_shard"],
            r["n_dup_vs_corpus"],
            r["n_dup_within"],
            r["n_kept"],
        ]
        for r in dedup_incremental_shard(spark, sf).collect()
    }
    assert got == {k: list(v) for k, v in want.items()}


@st.composite
def daily_series(draw):
    n_types = draw(st.integers(1, 3))
    out = []
    eid = 0
    for t in range(n_types):
        n_days = draw(st.integers(10, 32))
        base = datetime.datetime(2024, 3, 1, 12, 0, 0)
        for d in range(n_days):
            # 1-3 events per day so daily totals aggregate something
            for _ in range(draw(st.integers(1, 3))):
                val = draw(
                    st.floats(
                        min_value=-50,
                        max_value=50,
                        allow_nan=False,
                        allow_infinity=False,
                        width=32,
                    )
                )
                out.append(
                    (
                        eid,
                        base + datetime.timedelta(days=d),
                        eid % 7,
                        f"type{t}",
                        float(val),
                        "{}",
                    )
                )
                eid += 1
    return out


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(daily_series())
def test_holt_winters_random_series_matches_model(spark, tmp_path, events):
    """Random series including the short-series edge: types under 15
    days must emit NOTHING; the rest must match the pure-Python
    recursion (same init, same scored window, 4dp half-up)."""
    from landsat_tair_data_pipeline_spark.operators.events import (
        _HW_ALPHA,
        _HW_BETA,
        _HW_GAMMA,
        _HW_M,
        _HW_SCORE_FROM,
        ts_forecast_holt_winters,
    )

    _SEQ[0] += 1
    d = tmp_path / f"e{_SEQ[0]}"
    spark.createDataFrame(events, _EV_SCHEMA).coalesce(1).write.parquet(
        str(d / "events.parquet")
    )
    sf = str(d)
    daily = defaultdict(dict)
    for _, ts, _, et, val, _ in events:
        day = ts.date()
        daily[et][day] = daily[et].get(day, 0.0) + val
    m, a, bt, g, sc = _HW_M, _HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_SCORE_FROM
    want = {}
    for et, days in daily.items():
        y = [_r4(days[k]) for k in sorted(days)]
        if len(y) < sc + 1:
            continue
        l = sum(y[0:m]) / m
        b = (sum(y[m : 2 * m]) / m - l) / m
        s = [y[i] - l for i in range(m)]
        errs, nerrs = [], []
        for t in range(m, len(y)):
            if t >= sc:
                errs.append(abs(y[t] - (l + b + s[t - m])))
                nerrs.append(abs(y[t] - y[t - m]))
            l_new = a * (y[t] - s[t - m]) + (1 - a) * (l + b)
            b_new = bt * (l_new - l) + (1 - bt) * b
            s.append(g * (y[t] - (l + b)) + (1 - g) * s[t - m])
            l, b = l_new, b_new
        hw, nv = _r4(sum(errs) / len(errs)), _r4(sum(nerrs) / len(nerrs))
        want[et] = (len(errs), hw, nv, hw <= nv)
    got = {
        r["event_type"]: (
            r["n_scored"],
            r["hw_mae"],
            r["naive_mae"],
            r["beats_naive"],
        )
        for r in ts_forecast_holt_winters(spark, sf).collect()
    }
    assert got == want
