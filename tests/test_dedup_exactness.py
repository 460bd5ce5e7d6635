"""Exactness guard for the AllPairs/PPJoin candidate generation.

The prefix filter + size-ratio prune + positional filter stack in
dedup._prefix_filter_pairs claims EXACTNESS: every pair meeting the
jaccard threshold must survive candidate pruning. That proof has three
subtle integer-arithmetic edges (ceil via int math, the relaxed
threshold for round-up boundary pairs, the first-shared-token bound) —
this test brute-forces randomized corpora and asserts the Spark
pipeline finds the identical pair set, so a future edit that silently
over-prunes fails here, not in a driver round.
"""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from landsat_tair_data_pipeline_spark.operators.dedup import (
    _prefix_filter_pairs,
)

# threshold 0.4 with the relaxed rational used by dedup_jaccard_pairs
T_NUM, T_DEN = 3999, 10000
THRESH = 0.4


def _random_corpus(seed: int, n_docs: int = 60, vocab: int = 25):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        size = rng.randint(1, 12)
        toks = sorted(rng.sample(range(vocab), min(size, vocab)))
        # two source blocks so the blocking predicate is exercised
        docs.append((i, f"s{i % 2}", toks))
    return docs


def _brute_pairs(docs):
    want = set()
    for (ia, sa, ta), (ib, sb, tb) in itertools.combinations(docs, 2):
        if sa != sb:
            continue
        inter = len(set(ta) & set(tb))
        union = len(ta) + len(tb) - inter
        j = round(inter / union + 1e-9, 4)
        if j >= THRESH:
            want.add((min(ia, ib), max(ia, ib)))
    return want


@pytest.mark.parametrize("seed", [7, 42, 1337])
def test_prefix_filter_finds_every_qualifying_pair(spark, seed):
    docs_py = _random_corpus(seed)
    df = spark.createDataFrame(
        [(i, s, t, len(t)) for i, s, t in docs_py],
        "doc_id long, source string, toks array<long>, sz int",
    )
    pairs = _prefix_filter_pairs(df, T_NUM, T_DEN)
    jaccard = F.round(
        F.col("inter").cast("double")
        / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double")
        + 1e-9,
        4,
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in pairs.withColumn("j", jaccard)
        .where(F.col("j") >= THRESH)
        .collect()
    }
    assert got == _brute_pairs(docs_py), f"seed {seed}"


def _brute_containment_pairs(docs, thresh=0.8):
    want = set()
    for (ia, sa, ta), (ib, sb, tb) in itertools.permutations(docs, 2):
        if sa != sb:
            continue
        inter = len(set(ta) & set(tb))
        if len(ta) and round(inter / len(ta) + 1e-9, 4) >= thresh:
            want.add((ia, ib))
    return want


@pytest.mark.parametrize("seed", [7, 42, 1337])
def test_asym_prefix_finds_every_qualifying_containment_pair(spark, seed):
    """Brute-force exactness for the ONE-SIDED prefix join
    (_asym_containment_candidates): the prefix cut on the contained
    side, the |B| >= α prune and the first-shared-token positional
    bound must together keep every ORDERED pair whose rounded
    containment reaches the threshold — including pairs whose jaccard
    is far below any symmetric floor."""
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        _asym_containment_candidates,
    )

    docs_py = _random_corpus(seed)
    df = spark.createDataFrame(
        [(i, s, t, len(t)) for i, s, t in docs_py],
        "doc_id long, source string, toks array<long>, sz int",
    )
    pairs = _asym_containment_candidates(df, 7999, 10000)
    cont = F.round(
        F.col("inter").cast("double") / F.col("sz_a").cast("double") + 1e-9,
        4,
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in pairs.withColumn("c", cont)
        .where(F.col("c") >= 0.8)
        .collect()
    }
    assert got == _brute_containment_pairs(docs_py), f"seed {seed}"


def test_asym_containment_finds_quote_in_article_pair(spark):
    """The VERDICT r9 scope-contract probe: a short doc fully quoted
    inside a much larger one (containment 1.0, jaccard ≈ 0.1) MUST be
    found by dedup_containment_asym and CANNOT be emitted by
    dedup_containment_pairs (whose candidates carry the jaccard >= 0.4
    floor by construction)."""
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        _asym_containment_candidates,
        _prefix_filter_pairs,
    )

    quote = list(range(100, 110))          # 10 tokens
    article = list(range(100, 200))        # 100 tokens, superset
    other = list(range(500, 560))          # unrelated filler
    df = spark.createDataFrame(
        [
            (1, "s0", quote, len(quote)),
            (2, "s0", article, len(article)),
            (3, "s0", other, len(other)),
        ],
        "doc_id long, source string, toks array<long>, sz int",
    )
    asym = {
        (r["doc_a"], r["doc_b"])
        for r in _asym_containment_candidates(df, 7999, 10000)
        .where(F.col("inter") * 10000 >= F.lit(7999) * F.col("sz_a"))
        .collect()
    }
    assert (1, 2) in asym, asym
    sym = _prefix_filter_pairs(df, 3999, 10000)
    sym_pairs = {(r["doc_a"], r["doc_b"]) for r in sym.collect()}
    # jaccard(quote, article) = 10/100 = 0.1 — below the symmetric
    # candidates' floor even BEFORE the final filter
    assert (1, 2) not in sym_pairs and (2, 1) not in sym_pairs, sym_pairs


def test_hamming_band_pigeonhole_is_lossless():
    """The dedup_simhash_hamming recall argument: 4 disjoint 8-bit
    bands of a 32-bit signature — any pair within Hamming distance 3
    must agree on at least one band (pigeonhole: 3 differing bits can
    touch at most 3 of 4 bands). Pure arithmetic, no Spark; randomized
    over signatures and flipped-bit patterns, plus the adversarial
    one-bit-per-band corner at distance 4 showing the bound is tight."""
    rng = random.Random(99)
    for _ in range(2000):
        sig = rng.getrandbits(32)
        flips = rng.sample(range(32), rng.randint(0, 3))
        other = sig
        for f in flips:
            other ^= 1 << f
        bands_equal = any(
            (sig >> (8 * k)) & 255 == (other >> (8 * k)) & 255
            for k in range(4)
        )
        assert bands_equal, (sig, flips)
    # tightness: one flipped bit in EVERY band → distance 4, no band
    # equal — the multi-index genuinely cannot reach distance 4
    sig = 0
    other = (1 << 0) | (1 << 8) | (1 << 16) | (1 << 24)
    assert not any(
        (sig >> (8 * k)) & 255 == (other >> (8 * k)) & 255 for k in range(4)
    )


def test_wide_band_pigeonhole_is_lossless():
    """Same pigeonhole argument for the 4×32-bit wide variant
    (dedup_simhash_hamming_wide): ≤3 flipped bits over 128 leave ≥1 of
    the 4 32-bit bands untouched; one flip per band at distance 4
    shows tightness."""
    rng = random.Random(1234)
    for _ in range(2000):
        sig = rng.getrandbits(128)
        flips = rng.sample(range(128), rng.randint(0, 3))
        other = sig
        for f in flips:
            other ^= 1 << f
        m = (1 << 32) - 1
        assert any(
            (sig >> (32 * k)) & m == (other >> (32 * k)) & m
            for k in range(4)
        ), (sig, flips)
    sig = 0
    other = (1 << 0) | (1 << 32) | (1 << 64) | (1 << 96)
    m = (1 << 32) - 1
    assert not any(
        (sig >> (32 * k)) & m == (other >> (32 * k)) & m for k in range(4)
    )


def test_wide_hamming_matches_quadratic_and_emits_once(spark, sf_dir):
    """dedup_simhash_hamming_wide's exact-recall + once-only contract
    certified in-process: the banded join's output must equal the
    BRUTE-FORCE quadratic pair set over the same _simhash128_bands
    signatures (recall AND precision), and no (doc_a, doc_b) may
    appear twice (the canonical-band rule replaces a distinct())."""
    from pyspark.sql import functions as F

    from landsat_tair_data_pipeline_spark.operators.dedup import (
        _simhash128_bands,
        dedup_simhash_hamming_wide,
    )

    got = dedup_simhash_hamming_wide(spark, sf_dir).collect()
    pairs = [(r["doc_a"], r["doc_b"]) for r in got]
    assert len(pairs) == len(set(pairs)), "canonical-band emitted a dup"

    sigs = _simhash128_bands(spark, sf_dir)
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"band{k}").alias(f"a{k}") for k in range(4)],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"band{k}").alias(f"b{k}") for k in range(4)],
    )
    ham = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}"))).cast("int")
        for k in range(4)
    )
    brute = (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("h", ham)
        .where(F.col("h") <= 3)
        .select("doc_a", "doc_b", "h")
        .collect()
    )
    want = {(r["doc_a"], r["doc_b"], r["h"]) for r in brute}
    assert {(r["doc_a"], r["doc_b"], r["hamming"]) for r in got} == want
    assert len(want) > 0, "vacuous corpus: no qualifying pairs at all"


# ---------------------------------------------------------------------------
# Connected-components overflow path: large-star/small-star must produce
# exactly the same labels as union-find on a graph whose diameter exceeds
# any plausible propagation round budget (VERDICT r6 item 2).
# ---------------------------------------------------------------------------


def _union_find_labels(nodes, und_edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in und_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _long_chain_graph(seed: int = 7, chain_len: int = 61):
    """A 61-node chain (diameter 60 > 25) over PERMUTED ids — so the
    component min sits mid-chain, not at an end — plus a triangle and
    a 2-node component with interleaved ids."""
    rng = random.Random(seed)
    ids = rng.sample(range(1000, 5000), chain_len + 5)
    chain, tri, pair = ids[:chain_len], ids[chain_len:chain_len + 3], ids[chain_len + 3:]
    edges = [(chain[i], chain[i + 1]) for i in range(chain_len - 1)]
    edges += [(tri[0], tri[1]), (tri[1], tri[2]), (tri[0], tri[2])]
    edges += [(pair[0], pair[1])]
    return ids, edges


def test_alternating_star_cc_matches_union_find(spark):
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        _alternating_star_cc,
    )

    nodes, und = _long_chain_graph()
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "doc_a: long, doc_b: long")
    got = {
        (r.doc, r.lbl) for r in _alternating_star_cc(edges).collect()
    }
    want = set(_union_find_labels(nodes, und).items())
    assert got == want


def test_prop_overflow_falls_back_to_star_contraction(spark):
    """The dedup_clusters composition under a deliberately starved
    propagation budget: _min_label_prop reports non-convergence on the
    diameter-60 chain, and the star-contraction fallback still yields
    the exact union-find labels — the path the operator takes if a
    real corpus ever exceeds 25 doubling rounds."""
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        _alternating_star_cc,
        _min_label_prop,
    )

    nodes, und = _long_chain_graph(seed=11)
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "doc_a: long, doc_b: long")
    # 2 rounds of pointer-jumped propagation cover distance ~4 — far
    # short of diameter 60, so the budget must blow
    labels, converged = _min_label_prop(edges, max_rounds=2)
    assert not converged
    got = {
        (r.doc, r.lbl) for r in _alternating_star_cc(edges).collect()
    }
    want = set(_union_find_labels(nodes, und).items())
    assert got == want


def test_min_label_prop_converges_on_long_chain_within_default_budget(spark):
    """Pointer jumping makes the DEFAULT path log-diameter: the same
    chain that breaks a 2-round budget converges well inside 25."""
    from landsat_tair_data_pipeline_spark.operators.dedup import (
        _min_label_prop,
    )

    nodes, und = _long_chain_graph(seed=13)
    sym = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(sym, "doc_a: long, doc_b: long")
    labels, converged = _min_label_prop(edges, max_rounds=25)
    assert converged
    got = {(r.doc, r.lbl) for r in labels.collect()}
    want = set(_union_find_labels(nodes, und).items())
    assert got == want


def test_global_rank_is_order_consistent_permutation(spark):
    """_global_rank must produce exactly the ROW_NUMBER a single-node
    ORDER BY would, independent of input partitioning — including
    heavy TIES on the primary order column, the case that breaks a
    range partitioner keyed on a prefix of the order (equal-key runs
    straddling a partition boundary in the wrong tiebreak order)."""
    from pyspark.sql import functions as F

    from landsat_tair_data_pipeline_spark.operators.dedup import _global_rank

    df = spark.range(5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("k")
    )
    for parts in (1, 13):
        got = {
            r["doc_id"]: r["rn"]
            for r in _global_rank(
                df.repartition(parts), ["k", "doc_id"]
            ).collect()
        }
        want = {
            r["doc_id"]: i + 1
            for i, r in enumerate(
                df.orderBy("k", "doc_id").collect()
            )
        }
        assert got == want


def test_edit_distance_band_is_lossless_for_threshold(spark):
    """The relative length band |Δlen|*MULT <= max(len) must never
    drop a pair the verify cut lev*MULT <= max(len) would keep:
    brute-force all same-prefix pairs of a synthetic corpus WITHOUT
    the band and assert the banded operator's own pipeline returns
    the identical pair set. Built from the OPERATOR'S constants
    (_EDIT_PREFIX/_EDIT_SIM_MULT), so tuning them cannot silently
    stale this pin. The corpus includes a long doc with a large
    insertion — the case a fixed-width band silently loses."""
    from pyspark.sql import functions as F

    from landsat_tair_data_pipeline_spark.operators.dedup import (
        _EDIT_PREFIX,
        _EDIT_SIM_MULT,
    )

    base = "x" * _EDIT_PREFIX + "x" * 400
    gap = 3 * _EDIT_PREFIX  # insertion larger than any fixed band
    docs = [
        (0, base),
        (1, base + "y" * gap),  # same prefix, big insertion: must pass
        (2, base[: len(base) // 2]),  # huge len gap — band prunes
        (3, "x" * _EDIT_PREFIX + "z" * 400),  # lev too high: verify cuts
    ]
    df = spark.createDataFrame(
        [(i, t, len(t)) for i, t in docs],
        "doc_id long, text string, n_chars long",
    )
    p = df.select(
        F.substring("text", 1, _EDIT_PREFIX).alias("p"),
        "doc_id",
        "text",
        "n_chars",
    )
    a, b = p.alias("a"), p.alias("b")
    verify = (
        F.levenshtein(F.col("a.text"), F.col("b.text")) * _EDIT_SIM_MULT
        <= F.greatest(F.col("a.n_chars"), F.col("b.n_chars"))
    )
    band = (
        F.abs(F.col("a.n_chars") - F.col("b.n_chars")) * _EDIT_SIM_MULT
        <= F.greatest(F.col("a.n_chars"), F.col("b.n_chars"))
    )
    same_block = (F.col("a.p") == F.col("b.p")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    pair = [F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")]
    want = {
        (r["a_id"], r["b_id"])
        for r in a.join(b, same_block & verify).select(*pair).collect()
    }
    assert (0, 1) in want  # the big-insertion pair must qualify
    got = {
        (r["a_id"], r["b_id"])
        for r in a.join(b, same_block & band & verify)
        .select(*pair)
        .collect()
    }
    assert got == want
