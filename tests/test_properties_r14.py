"""Property-based tests for the r14 ops.

The URL canonicalizer is checked three ways on RANDOM generated URLs
(schemes × host case × www × ports × paths × shuffled tracking/real
params × fragments — the space the 18-case rule table can't sweep):
a pure-Python model, the Spark expression, and the DuckDB SQL
template must all agree byte-for-byte. The epoch-budget accounting is
checked against a pure-Python recompute on random per-source token
masses (rounding discipline included).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# --- pure-Python canonicalizer model (independent of both engines) ---------


def _canon_model(u: str) -> str:
    import re

    x = re.sub(r"^[A-Za-z]+://", "", u)
    x = re.sub(r"#.*$", "", x)
    hostpath = re.sub(r"\?.*$", "", x)
    m = re.search(r"\?(.*)$", x)
    query = m.group(1) if m else ""
    hm = re.match(r"^([^/]*)", hostpath)
    host = hm.group(1).lower()
    host = re.sub(r"^www\.", "", host)
    host = re.sub(r":(443|80)$", "", host)
    path = re.sub(r"^[^/]*", "", hostpath)
    path = re.sub(r"/$", "", path)
    keep = sorted(
        p
        for p in query.split("&")
        if p != ""
        and p[:4] != "utm_"
        and p[:4] != "ref="
        and p[:7] != "fbclid="
        and p[:6] != "gclid="
    )
    q = "&".join(keep)
    return host + path + ("?" + q if q != "" else "")


@st.composite
def url(draw):
    scheme = draw(st.sampled_from(["https", "HTTPS", "http", "Http", "ftp"]))
    www = draw(st.sampled_from(["", "www.", "WWW."]))
    host = draw(st.sampled_from(["h1.example.com", "A.B.Com", "x.org"]))
    port = draw(st.sampled_from(["", ":443", ":80", ":8080"]))
    n_seg = draw(st.integers(0, 3))
    segs = [
        draw(st.sampled_from(["p", "q2", "a-b", "Z"])) for _ in range(n_seg)
    ]
    path = "".join("/" + s for s in segs)
    slash = draw(st.sampled_from(["", "/"]))
    params = draw(
        st.lists(
            st.sampled_from(
                [
                    "id=7",
                    "a=1",
                    "b=2",
                    "utm_source=x",
                    "utm_campaign=y",
                    "ref=tw",
                    "refresh=1",
                    "fbclid=z",
                    "gclid=w",
                    "",
                ]
            ),
            max_size=4,
        )
    )
    qs = "?" + "&".join(params) if draw(st.booleans()) and params else ""
    frag = draw(st.sampled_from(["", "#f", "#s?fake=1"]))
    return f"{scheme}://{www}{host}{port}{path}{slash}{qs}{frag}"


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(url(), min_size=1, max_size=12))
def test_url_canon_three_way_agreement(spark, urls):
    from landsat_tair_data_pipeline_spark.operators.text import (
        _URL_CANON_SQL_TMPL,
        _url_canon,
    )

    want = [_canon_model(u) for u in urls]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i int, u string"
    )
    got_spark = [
        r["c"]
        for r in df.select("i", _url_canon(F.col("u")).alias("c"))
        .orderBy("i")
        .collect()
    ]
    assert got_spark == want, list(zip(urls, got_spark, want))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, u VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(urls))
    )
    got_duck = [
        r[0]
        for r in con.execute(
            "SELECT "
            + _URL_CANON_SQL_TMPL.format(u="u")
            + " FROM t ORDER BY i"
        ).fetchall()
    ]
    assert got_duck == want, list(zip(urls, got_duck, want))


# --- epoch budget vs pure-Python model -------------------------------------


def _r(x: float, nd: int) -> float:
    return round(x + 1e-9, nd)


def _waterfill_model(masses, alpha, mult):
    """Independent ITERATIVE water-filling model (the convergence-loop
    formulation the op's closed-form sorted-breakpoint solve must
    equal): repeatedly allocate the remaining budget over uncapped
    sources by weight, cap any overflow, until stable."""
    tot = sum(masses.values())
    w = {s: (n / tot) ** alpha for s, n in masses.items()}
    c = {s: 4.0 * n for s, n in masses.items()}
    alloc = {}
    remaining = mult * tot
    live = set(masses)
    while True:
        zs = sum(w[s] for s in live)
        newly = []
        for s in live:
            a = remaining * w[s] / zs
            if a >= c[s]:
                newly.append(s)
        if not newly:
            for s in live:
                alloc[s] = remaining * w[s] / zs
            break
        for s in newly:
            alloc[s] = c[s]
            remaining -= c[s]
            live.discard(s)
        if not live:
            break
    return alloc


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.integers(1, 40), min_size=2, max_size=6))
def test_waterfill_random_masses(spark, tmp_path_factory, reps):
    """The closed-form sorted-breakpoint water level must equal the
    iterative model's allocation on random per-source token masses
    (incl. heavily skewed ones where most sources cap)."""
    from landsat_tair_data_pipeline_spark.operators.augment import (
        _TEMP_ALPHA,
        _WF_BUDGET_MULT,
        tokens_budget_waterfill,
    )

    docs = []
    i = 0
    for s, n_docs in enumerate(reps):
        for _ in range(n_docs):
            toks = " ".join(f"w{j}" for j in range(3 + i % 5))
            docs.append((i, toks, "en", f"s{s}", len(toks)))
            i += 1
    d = tmp_path_factory.mktemp("wf")
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    masses = {}
    for _, toks, _, s, _n in docs:
        masses[s] = masses.get(s, 0) + len(toks.split())
    want = _waterfill_model(masses, _TEMP_ALPHA, _WF_BUDGET_MULT)
    rows = tokens_budget_waterfill(spark, str(d)).collect()
    assert len(rows) == len(masses)
    total_share = 0.0
    for r in rows:
        s = r["source"]
        assert math.isclose(
            r["alloc_tokens"], _r(want[s], 2), rel_tol=1e-9, abs_tol=0.02
        ), (s, r["alloc_tokens"], want[s])
        assert r["epochs_alloc"] <= 4.0 + 1e-9
        assert r["is_capped"] == (
            _r(want[s], 2) >= _r(4.0 * masses[s], 2)
        )
        total_share += r["alloc_share"]
    # budget exhausted unless everything capped
    if not all(r["is_capped"] for r in rows):
        assert math.isclose(total_share, 1.0, abs_tol=1e-4)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.integers(1, 40), min_size=2, max_size=6))
def test_epoch_budget_random_masses(spark, tmp_path_factory, reps):
    """Random per-source doc-count corpora (each doc contributes a
    known token count) → the op's epochs/flags/capped shares must
    match the closed-form model."""
    from landsat_tair_data_pipeline_spark.operators.augment import (
        _EPOCH_BUDGET_MULT,
        _TEMP_ALPHA,
        tokens_epoch_budget,
    )

    docs = []
    i = 0
    for s, n_docs in enumerate(reps):
        for _ in range(n_docs):
            # 3 + (i % 5) tokens per doc, deterministic
            toks = " ".join(f"w{j}" for j in range(3 + i % 5))
            docs.append((i, toks, "en", f"s{s}", len(toks)))
            i += 1
    d = tmp_path_factory.mktemp("epoch")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    per = {}
    for doc_id, toks, _, s, _n in docs:
        per[s] = per.get(s, 0) + len(toks.split())
    tot = sum(per.values())
    w = {s: (n / tot) ** _TEMP_ALPHA for s, n in per.items()}
    z = sum(w.values())
    rows = tokens_epoch_budget(spark, str(d)).collect()
    assert len(rows) == len(per)
    for r in rows:
        s = r["source"]
        q = w[s] / z
        p = per[s] / tot
        assert r["n_tokens"] == per[s]
        assert math.isclose(
            r["epochs"], _r(_EPOCH_BUDGET_MULT * q / p, 4), abs_tol=2e-4
        )
        assert r["over_repeat"] == (r["epochs"] > 4.0)
        drawn = _EPOCH_BUDGET_MULT * tot * q
        capped = min(drawn, 4.0 * per[s])
        assert math.isclose(
            r["capped_share"],
            _r(capped / (_EPOCH_BUDGET_MULT * tot), 6),
            abs_tol=2e-6,
        )
