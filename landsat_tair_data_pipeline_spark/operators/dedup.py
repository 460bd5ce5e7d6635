"""Document deduplication operators (SURVEY §2.12 — driver-mandated
LLM-data-pipeline extensions over the `documents` table).

Exact dedup is a hash-groupBy (one shuffle on the digest — at 100 TB
the digest shuffle moves 32 bytes/row, not the document bodies).
Near-dup comes in three flavors:

- MinHash+LSH (`ext_dedup_near`): shingle → MinHash signature → banded
  bucket join. Uses Spark ML's MinHashLSH (seeded); hash family is
  engine-specific → rows-only check.
- SimHash (`dedup_simhash`): 64-bit signature from xxhash64 token
  hashes, computed with map-side-combinable aggregates; deterministic
  within Spark, rows-only vs the oracle (DuckDB's hash ≠ xxhash64).
- N-gram/word Jaccard (`dedup_jaccard_pairs`): exact set similarity on
  blocked candidate pairs — fully SQL-expressible, hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import QuerySpec
from ..sources.tables import table

# Shared tokenization: lowercase, split on whitespace runs. The oracle
# uses the byte-identical duckdb form (string_split_regex + 'g' flag
# regexp_replace) — keep the two in lockstep when editing. Lazy (a
# function, not a module-level Column) because classic PySpark needs an
# active session to build Column expressions.
def TOKENS():
    return F.split(F.trim(F.lower(F.col("text"))), r"\s+")


_TOKENS_SQL = "string_split_regex(trim(lower(text)), '\\s+')"


def ext_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup by content digest; keeper = lowest doc_id per digest
    (deterministic, unlike dropDuplicates). md5 is identical across
    engines (lowercase hex)."""
    docs = table(spark, sf, "documents")
    return docs.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.max("n_chars").alias("n_chars"),
    )


_EXACT_SQL = """
SELECT md5(text)    AS text_md5,
       MIN(doc_id)  AS keeper_doc_id,
       COUNT(*)     AS n_copies,
       MAX(n_chars) AS n_chars
FROM documents
GROUP BY md5(text)
"""


def dedup_normalized(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup after canonicalization (lowercase + whitespace collapse) —
    catches trivially-reformatted copies exact dedup misses."""
    docs = table(spark, sf, "documents")
    canon = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.groupBy(F.md5(canon).alias("canon_md5")).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


_NORMALIZED_SQL = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS canon_md5,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*)    AS n_copies
FROM documents
GROUP BY 1
"""


def dedup_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact word-set Jaccard over candidate pairs blocked by source
    (blocking keeps the pair space linear-ish at scale; the unblocked
    fallback is MinHash below). Emits pairs with similarity >= 0.4.

    Performance shape:
    - tokens are pre-hashed to int64 (xxhash64) so the hot per-pair
      array_intersect runs on longs, not strings (~5× cheaper; a 64-bit
      collision altering a set size is ~1e-8 per corpus — negligible);
    - an exact integer size-ratio prune (10·min >= 4·max, implied by
      jaccard >= 0.4 since jaccard <= |min|/|max|) drops hopeless pairs
      before the intersect;
    - the blocking key (source) has few distinct values, so a shuffle
      join would collapse to one task per block; broadcasting one side
      gives a hash join parallelized by probe partitions. At 100 TB,
      blocks outgrow the broadcast limit → use ext_dedup_near.
    """
    docs = table(spark, sf, "documents").select(
        "doc_id",
        "source",
        F.array_distinct(F.transform(TOKENS(), lambda t: F.xxhash64(t))).alias("toks"),
    ).withColumn("sz", F.size("toks"))
    a = docs.repartitionByRange(64, "doc_id").alias("a")
    b = docs.alias("b")
    sz_a, sz_b = F.col("a.sz"), F.col("b.sz")
    cand = a.join(
        F.broadcast(b),
        # cheap predicates ONLY — putting the jaccard filter here would
        # let Catalyst order the O(|toks|) intersect ahead of these
        (F.col("a.source") == F.col("b.source"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.least(sz_a, sz_b) * 10 >= F.greatest(sz_a, sz_b) * 4),
    )
    # one intersect per candidate pair. The `+ 0*rand` term is a
    # value-neutral nondeterminism taint: it stops Catalyst from
    # substituting the jaccard filter back through this projection into
    # the join condition, which would re-evaluate the O(|toks|)
    # intersect per probed pair (and again in the output projection) —
    # measured 3 intersect evals/row without it, 1 with it.
    inter = (
        F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
        + (F.rand(0) * 0).cast("int")
    )
    proj = cand.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        inter.alias("inter"),
        (sz_a + sz_b).alias("sz_sum"),
    )
    jaccard = F.round(
        F.col("inter").cast("double")
        / (F.col("sz_sum") - F.col("inter")).cast("double")
        + 1e-9,
        4,
    )
    return (
        proj.withColumn("jaccard", jaccard)
        .where(F.col("jaccard") >= 0.4)
        .select("doc_a", "doc_b", "jaccard")
    )


_JACCARD_SQL = """
WITH t AS (
  SELECT doc_id, source, list_distinct({toks}) AS toks FROM documents
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
               / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
               + 1e-9, 4) AS jaccard
  FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.4
""".format(toks=_TOKENS_SQL)


def ext_dedup_near(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (rows-only: LSH hash family is
    engine-specific). Pipeline: tokens → HashingTF term sets → MinHash
    signatures → banded similarity self-join at Jaccard-distance 0.5.
    At 100 TB the band-bucket join replaces the quadratic pair scan."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = table(spark, sf, "documents").select("doc_id", TOKENS().alias("toks"))
    tf = HashingTF(
        inputCol="toks", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = tf.transform(docs)
    # 16 tables: a jaccard-0.6 pair misses all tables with p=0.4^16≈4e-7
    # (8 tables measurably dropped one 0.62 pair on the test corpus)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=16, seed=42)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.5, distCol="jaccard_dist")
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1 - F.col("jaccard_dist") + 1e-9, 4).alias("jaccard_sim"),
        )
    )


def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """64-bit SimHash signatures. Each token contributes ±1 per bit of
    its xxhash64; the signature is the sign vector re-packed to a long.
    Expressed as 64 conditional sums → fully map-side-combinable, no
    UDF. Deterministic within Spark; rows-only vs the oracle."""
    docs = table(spark, sf, "documents").select("doc_id", TOKENS().alias("toks"))
    tok = docs.select("doc_id", F.explode("toks").alias("tok"))
    h = tok.select("doc_id", F.xxhash64("tok").alias("h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{i}")
        for i in range(64)
    ]
    sums = h.groupBy("doc_id").agg(*bit_sums)
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return sums.select("doc_id", sig.alias("simhash")).orderBy("doc_id")


def dedup_embedding_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (SURVEY §2.12): vectors whose
    cosine similarity >= 0.4 (the testdata's embeddings are random, so
    the threshold sits at the distribution tail — real corpora with
    planted dups would use ~0.95).

    Exact all-pairs baseline as a block matrix product: one side is
    broadcast as a normalized numpy matrix (the "small dim" of the
    join — 5000×64 doubles ≈ 2.5 MB here), the other side streams
    through an Arrow-batched mapInPandas computing a BLAS matmul per
    batch — ~100× the throughput of per-pair boxed JVM dot products
    (measured 11.3s → sub-second at sf0.1). Quadratic by design; the
    100 TB path blocks candidates through sign-LSH buckets first
    (sim_lsh_buckets/sim_lsh_topk) or an IVF coarse quantizer, or
    chunks the broadcast side into block-columns when it outgrows a
    broadcast.
    """
    import numpy as np

    emb = table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    pdf_b = emb.toPandas()
    ids_b = pdf_b["vec_id"].to_numpy(dtype=np.int64)
    M = np.vstack(pdf_b["v"].to_numpy())
    M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
    bc = spark.sparkContext.broadcast((ids_b, M))

    def block(batches):
        import pandas as pd

        b_ids, B = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.vstack(pdf["v"].to_numpy())
            A /= np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            C = A @ B.T
            # upper triangle + pre-filter with slack, exact filter on the
            # rounded value (matching the oracle's predicate)
            i, j = np.nonzero((C >= 0.4 - 1e-6) & (a_ids[:, None] < b_ids[None, :]))
            cos = np.round(C[i, j] + 1e-9, 6)
            keep = cos >= 0.4
            yield pd.DataFrame(
                {
                    "vec_a": a_ids[i][keep],
                    "vec_b": b_ids[j][keep],
                    "cosine": cos[keep],
                }
            )

    src = emb.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(
        block, schema="vec_a bigint, vec_b bigint, cosine double"
    )


_EMB_COSINE_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         ROUND(list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v))) + 1e-9, 6) AS cosine
  FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.4
"""


def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Character-trigram shingle Jaccard (the n-gram flavor; word-set
    jaccard above catches token reorders, char shingles catch small
    edits). Same plan shape as dedup_jaccard_pairs: source-blocked
    candidates, cheap predicates in the join, shingle sets hashed to
    int64, one intersect per pair behind the pushdown barrier."""
    canon = F.trim(F.lower(F.col("text")))
    docs = (
        table(spark, sf, "documents")
        .select(
            "doc_id",
            "source",
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length(canon) - 2, F.lit(1))),
                    lambda i: F.xxhash64(canon.substr(i, F.lit(3))),
                )
            ).alias("shingles"),
        )
        .withColumn("sz", F.size("shingles"))
    )
    a = docs.repartitionByRange(64, "doc_id").alias("a")
    b = docs.alias("b")
    sz_a, sz_b = F.col("a.sz"), F.col("b.sz")
    cand = a.join(
        F.broadcast(b),
        (F.col("a.source") == F.col("b.source"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.least(sz_a, sz_b) * 10 >= F.greatest(sz_a, sz_b) * 6),
    )
    inter = (
        F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
        + (F.rand(0) * 0).cast("int")
    )
    proj = cand.select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        inter.alias("inter"),
        (sz_a + sz_b).alias("sz_sum"),
    )
    jaccard = F.round(
        F.col("inter").cast("double")
        / (F.col("sz_sum") - F.col("inter")).cast("double")
        + 1e-9,
        4,
    )
    return (
        proj.withColumn("jaccard3", jaccard)
        .where(F.col("jaccard3") >= 0.6)
        .select("doc_a", "doc_b", "jaccard3")
    )


_NGRAM_SQL = """
WITH t AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
           generate_series(1, greatest(length(trim(lower(text))) - 2, 1)),
           i -> substring(trim(lower(text)), i, 3))) AS shingles
  FROM documents
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / (len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles)))
               + 1e-9, 4) AS jaccard3
  FROM t a JOIN t b
    ON a.source = b.source AND a.doc_id < b.doc_id
   AND least(len(a.shingles), len(b.shingles)) * 10
       >= greatest(len(a.shingles), len(b.shingles)) * 6
)
SELECT doc_a, doc_b, jaccard3 FROM p WHERE jaccard3 >= 0.6
"""


def dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the
    jaccard pair graph (pairs >= 0.4), cluster id = min doc_id in the
    component — the keeper-selection step that turns pairwise dedup
    into corpus dedup.

    Iterative min-label propagation (the Pregel/GraphX idiom as plain
    DataFrames): each round every node takes the min of its own and
    its neighbors' labels; converged when no label changes. Rounds ~
    graph diameter (dense near-dup clusters → few). localCheckpoint
    per round cuts the growing lineage — without it each iteration
    re-plans the whole history. The oracle is DuckDB's recursive CTE
    computing the same transitive closure, so the iterative execution
    is value-checked end to end.
    """
    pairs = dedup_jaccard_pairs(spark, sf).select("doc_a", "doc_b")
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("doc_a").alias("doc"))
        .distinct()
        .withColumn("lbl", F.col("doc"))
        .localCheckpoint()
    )
    for _ in range(25):
        nbr = edges.join(
            labels.withColumnRenamed("doc", "nbr_doc"),
            edges.doc_b == F.col("nbr_doc"),
        ).select(F.col("doc_a").alias("doc"), "lbl")
        new = (
            labels.unionByName(nbr)
            .groupBy("doc")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        changed = (
            new.join(labels.withColumnRenamed("lbl", "old"), "doc")
            .where(F.col("lbl") != F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "lbl").select(
        F.col("doc").alias("doc_id"),
        F.col("lbl").alias("cluster_id"),
        "cluster_size",
    )


# the jaccard-pair CTEs (t, p) shared with _JACCARD_SQL
_PAIR_CTES = """
t AS (
  SELECT doc_id, source, list_distinct({toks}) AS toks FROM documents
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
               / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
               + 1e-9, 4) AS jaccard
  FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
)
""".format(toks=_TOKENS_SQL)

_CLUSTERS_SQL = """
WITH RECURSIVE {pair_ctes},
sym AS (SELECT doc_a, doc_b FROM p WHERE jaccard >= 0.4
        UNION ALL
        SELECT doc_b, doc_a FROM p WHERE jaccard >= 0.4),
reach(src, dst) AS (
  SELECT doc_a, doc_b FROM sym
  UNION
  SELECT r.src, s.doc_b FROM reach r JOIN sym s ON r.dst = s.doc_a),
lbl AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
  FROM reach GROUP BY src)
SELECT l.doc_id, l.cluster_id, c.cluster_size
FROM lbl l
JOIN (SELECT cluster_id, COUNT(*) AS cluster_size FROM lbl GROUP BY cluster_id) c
  ON l.cluster_id = c.cluster_id
""".format(pair_ctes=_PAIR_CTES.strip())


QUERIES: dict[str, QuerySpec] = {
    "dedup_ngram_jaccard": QuerySpec(
        "dedup_ngram_jaccard", dedup_ngram_jaccard, _NGRAM_SQL
    ),
    "dedup_clusters": QuerySpec("dedup_clusters", dedup_clusters, _CLUSTERS_SQL),
    "dedup_embedding_cosine": QuerySpec(
        "dedup_embedding_cosine", dedup_embedding_cosine, _EMB_COSINE_SQL
    ),
    "ext_dedup_exact": QuerySpec("ext_dedup_exact", ext_dedup_exact, _EXACT_SQL),
    "dedup_normalized": QuerySpec("dedup_normalized", dedup_normalized, _NORMALIZED_SQL),
    "dedup_jaccard_pairs": QuerySpec(
        "dedup_jaccard_pairs", dedup_jaccard_pairs, _JACCARD_SQL
    ),
    "ext_dedup_near": QuerySpec("ext_dedup_near", ext_dedup_near, None),
    "dedup_simhash": QuerySpec("dedup_simhash", dedup_simhash, None),
}
