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
