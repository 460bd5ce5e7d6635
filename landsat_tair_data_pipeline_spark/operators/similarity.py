"""Vector similarity search over the `embeddings` table (SURVEY §2.12
ext_sim_search).

Baseline: brute-force cosine top-k — query set broadcast, candidates
streamed, dot products as JVM higher-order array functions (no Python
in the hot path). Scale path: deterministic sign-LSH bucketing (the
IVF-style coarse quantizer) that prunes the candidate set before the
exact re-rank; both forms are SQL-expressible so both are oracle-
checked.

Ranking determinism across engines: rank on the *rounded* cosine with
vec_id tiebreak, so sub-rounding float noise (different accumulation
order) can never flip a rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import QuerySpec
from ..sources.tables import table


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _round_half_away(x: float, ndigits: int) -> float:
    """Driver-side mirror of F.round on doubles: Spark rounds
    BigDecimal(Double.toString(x)) HALF_UP, which
    Decimal(repr(x)).quantize(…, ROUND_HALF_UP) reproduces (ADVICE
    r15 item 2: the old floor(|x|·10^p + 0.5) recipe disagrees with
    F.round on exact decimal ties, e.g. 0.0002445 → 0.000244 vs
    Spark's 0.000245, because the float product lands an ulp below
    the tie). The numpy KERNELS keep the floor recipe for speed;
    their equivalence rests on the house +1e-9/+1e-10 nudges pushing
    every compared value off exact decimal ties — documented at each
    kernel. Python's built-in round() is banker's and would disagree
    on every exact .5."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-ndigits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _emb(spark: SparkSession, sf: str) -> DataFrame:
    return table(spark, sf, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )


_EMB_SQL = "SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings"
_COS_SQL = (
    "ROUND(list_dot_product({a}.v, {b}.v) / "
    "(sqrt(list_dot_product({a}.v, {a}.v)) * sqrt(list_dot_product({b}.v, {b}.v))) + 1e-9, 6)"
)


def ext_sim_search(spark: SparkSession, sf: str) -> DataFrame:
    """Exact cosine top-10 for query vectors vec_id < 5. The query side
    is broadcast; each candidate partition computes its local scores →
    per-query top-k via window. One pass over the candidate set."""
    return _exact_topk(spark, sf, n_queries=5, k=10)


def _exact_topk(
    spark: SparkSession, sf: str, n_queries: int, k: int, dim: int | None = None
) -> DataFrame:
    """Shared brute-force scan: exact cosine top-k per query
    (vec_id < n_queries), query side broadcast. ``dim`` truncates every
    vector to its first ``dim`` coordinates BEFORE scoring (the
    matryoshka-prefix scan; None = full vectors)."""
    emb = _emb(spark, sf)
    if dim is not None:
        emb = emb.withColumn("v", F.slice("v", 1, dim))
    q = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"))
    cos = _dot(F.col("qv"), F.col("cv")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", F.round(cos + 1e-9, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


_SIM_SEARCH_SQL = """
WITH e AS ({emb}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {cos} AS cosine
  FROM e q JOIN e c ON c.vec_id != q.vec_id
  WHERE q.vec_id < 5
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT query_id, cand_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, cand_id) AS rank
  FROM scored) t
WHERE rank <= 10
""".format(emb=_EMB_SQL, cos=_COS_SQL.format(a="q", b="c"))


def sim_lsh_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic sign-LSH (hyperplane = coordinate axes of the
    first 8 dims): bucket key packs sign bits. The 100 TB path groups
    candidates per bucket so the pair join is bucket-local; here we
    report bucket occupancy + per-bucket centroid norm as the checkable
    surface."""
    emb = _emb(spark, sf)
    bits = [
        F.when(F.element_at("v", i + 1) >= 0, F.lit(1 << i)).otherwise(0)
        for i in range(8)
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return (
        emb.withColumn("bucket", bucket.cast("long"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.countDistinct("label").alias("n_labels"),
            F.round(F.avg(F.sqrt(_dot(F.col("v"), F.col("v")))) + 1e-9, 4).alias(
                "avg_norm"
            ),
        )
    )


_LSH_BUCKETS_SQL = """
WITH e AS ({emb}),
b AS (
  SELECT vec_id, label, v,
         (CASE WHEN v[1] >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN v[2] >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN v[3] >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN v[4] >= 0 THEN 8 ELSE 0 END)
       + (CASE WHEN v[5] >= 0 THEN 16 ELSE 0 END)
       + (CASE WHEN v[6] >= 0 THEN 32 ELSE 0 END)
       + (CASE WHEN v[7] >= 0 THEN 64 ELSE 0 END)
       + (CASE WHEN v[8] >= 0 THEN 128 ELSE 0 END) AS bucket
  FROM e
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       COUNT(*)               AS n_vectors,
       COUNT(DISTINCT label)  AS n_labels,
       ROUND(AVG(sqrt(list_dot_product(v, v))) + 1e-9, 4) AS avg_norm
FROM b
GROUP BY bucket
""".format(emb=_EMB_SQL)


def sim_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """ANN top-k via the sign-LSH buckets: candidates restricted to the
    query's bucket, exact cosine re-rank inside. Same bucket function
    as sim_lsh_buckets → deterministic, oracle-checked recall surface."""
    emb = _emb(spark, sf)
    bits = [
        F.when(F.element_at("v", i + 1) >= 0, F.lit(1 << i)).otherwise(0)
        for i in range(8)
    ]
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    emb = emb.withColumn("bucket", bucket.cast("long"))
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"), "bucket")
    cos = _dot(F.col("qv"), F.col("cv")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", F.round(cos + 1e-9, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
    )


_LSH_TOPK_SQL = """
WITH e AS ({emb}),
b AS (
  SELECT vec_id, v,
         (CASE WHEN v[1] >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN v[2] >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN v[3] >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN v[4] >= 0 THEN 8 ELSE 0 END)
       + (CASE WHEN v[5] >= 0 THEN 16 ELSE 0 END)
       + (CASE WHEN v[6] >= 0 THEN 32 ELSE 0 END)
       + (CASE WHEN v[7] >= 0 THEN 64 ELSE 0 END)
       + (CASE WHEN v[8] >= 0 THEN 128 ELSE 0 END) AS bucket
  FROM e
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {cos} AS cosine
  FROM b q JOIN b c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
  WHERE q.vec_id < 5
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT query_id, cand_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, cand_id) AS rank
  FROM scored) t
WHERE rank <= 5
""".format(emb=_EMB_SQL, cos=_COS_SQL.format(a="q", b="c"))


def emb_label_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label embedding statistics (norm distribution + first-dim
    mean) — the sanity profile a 100 TB embedding sweep starts with."""
    emb = _emb(spark, sf)
    norm = F.sqrt(_dot(F.col("v"), F.col("v")))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(norm) + 1e-9, 4).alias("avg_norm"),
        F.round(F.min(norm) + 1e-9, 4).alias("min_norm"),
        F.round(F.max(norm) + 1e-9, 4).alias("max_norm"),
        F.round(F.avg(F.element_at("v", 1)) + 1e-9, 6).alias("avg_dim0"),
    )


_LABEL_STATS_SQL = """
WITH e AS ({emb})
SELECT label,
       COUNT(*) AS n_vectors,
       ROUND(AVG(sqrt(list_dot_product(v, v))) + 1e-9, 4) AS avg_norm,
       ROUND(MIN(sqrt(list_dot_product(v, v))) + 1e-9, 4) AS min_norm,
       ROUND(MAX(sqrt(list_dot_product(v, v))) + 1e-9, 4) AS max_norm,
       ROUND(AVG(v[1]) + 1e-9, 6) AS avg_dim0
FROM e
GROUP BY label
""".format(emb=_EMB_SQL)


_IVF_TOPK_QUERIES = 5
_IVF_TOPK_K = 5


def sim_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style ANN top-k: coarse-quantize the corpus, probe each
    query's nprobe=2 nearest cells, exact cosine re-rank inside the
    probed cells — the classic inverted-file trade (recall vs fraction
    of cells scanned).

    Since r15 this rides the HOUSE deterministic IVF (VERDICT r14
    item 3): k = max(16, ⌈√n⌉) seeded one-Lloyd-step centroids
    (_ivf_graph_ranked — seeds are the k lowest vec_ids, distances
    rounded at 6dp before the cell rank so float noise can never flip
    a cell choice between engines), the same quantizer that already
    powers sim_knn_graph_ivf, sim_ann_cross_join and
    emb_dedup_incremental — so the op is FULLY HASH-ORACLED instead of
    rows-only: the pre-r15 MLlib KMeans quantizer was the last
    rows-only key whose opacity was an implementation choice (internal
    seeding), not the nature of the op. The MLlib path is retained as
    _ivf_topk for test-side comparison (tests/test_ml_paths.py) and
    sim_ivf_recall's engine-independent recall pin.

    Scale shape: assignment is the O(n^1.5·d) dim-stream join shared
    with the IVF graph family; after it, members SEMI-JOIN against the
    ≤ nq·nprobe probed cells (broadcast — a handful of cell ids), so
    only the probed cells' members shuffle into the BLAS kernel:
    per-query cost nprobe·(n/k_cells)·d, independent of corpus size
    beyond the standing assignment. That is the faiss query path — an
    index probe, not a corpus scan.

    Margin audit (r15): rounded-distance cell ranks tie-break on cid,
    rounded cosines on cand_id (both engines, 6dp half-away-from-zero
    with the +1e-9 nudge); self-pairs excluded on both sides (kernel
    mask ≡ a.vec_id != p.vec_id); a probed cell with zero members
    emits nothing in either engine; each candidate's home cell is
    unique so no (query, cand) pair can arrive twice."""
    return _house_ivf_topk(spark, sf, _IVF_TOPK_QUERIES, _IVF_TOPK_K)


def _house_ivf_topk(
    spark: SparkSession, sf: str, n_queries: int, k: int
) -> DataFrame:
    """Deterministic-IVF top-k probe, parametrized on query-set size
    and k (sim_ivf_topk's body; sim_eval_mrr_ndcg reuses it at the
    wide 50-query/k=10 eval setting). See sim_ivf_topk for semantics
    and the scale argument."""
    from ..util import persist_tracked

    emb = persist_tracked(_emb(spark, sf).select("vec_id", "v"))
    ranked = persist_tracked(_ivf_graph_ranked(spark, sf))
    probers = ranked.where(F.col("vec_id") < n_queries).join(
        emb, "vec_id"
    ).select(
        F.col("cid").alias("cell"), "vec_id", "v", F.lit(0).alias("side")
    )
    probed_cells = probers.select("cell").distinct()
    members = (
        ranked.where(F.col("rk") == 1)
        .join(emb, "vec_id")
        .select(
            F.col("cid").alias("cell"), "vec_id", "v", F.lit(1).alias("side")
        )
        .join(F.broadcast(probed_cells), "cell", "left_semi")
    )
    local = probers.unionByName(members).groupBy("cell").applyInPandas(
        _cell_block_topk(k),
        schema="vec_id bigint, nn_id bigint, cosine double",
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("nn_id").alias("cand_id"),
            "cosine",
            "rank",
        )
    )


def _ivf_topk(spark: SparkSession, sf: str, n_queries: int) -> DataFrame:
    """MLlib-KMeans IVF pipeline — retained since r15 as the
    COMPARISON path only (tests/test_ml_paths.py recall assertions and
    sim_ivf_recall's engine-independent recall-floor surface); the
    registry's sim_ivf_topk now rides the house deterministic IVF.
    Per query (vec_id < n_queries), the top-5 by exact cosine among
    candidates in the query's nprobe=2 nearest KMeans cells."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = _emb(spark, sf).withColumn("vec", array_to_vector("v"))
    km = KMeans(k=16, seed=42, featuresCol="vec", predictionCol="cell")
    model = km.fit(emb)
    assigned = model.transform(emb).select("vec_id", "v", "cell")

    # queries probe their 2 nearest centroids (nprobe=2)
    centers = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    centers_df = spark.createDataFrame(centers, "cell int, center array<double>")
    q = assigned.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    qd = q.crossJoin(F.broadcast(centers_df)).select(
        "query_id",
        "qv",
        "cell",
        _dot(F.col("qv"), F.col("center")).alias("cdot"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cdot"), "cell")
    probed = qd.withColumn("cr", F.row_number().over(wq)).where(F.col("cr") <= 2)

    c = assigned.select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"), "cell"
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    scored = (
        F.broadcast(probed.select("query_id", "qv", "cell"))
        .join(c, "cell")
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", F.round(cos + 1e-9, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
    )


def emb_quantize_int8(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetric per-dimension int8 quantization of the embedding
    corpus — the 4× storage shrink every large vector store applies —
    with reconstruction-error accounting per dimension: scale = corpus
    max|x| per dim, code = floor(x/scale·127 + 0.5 + 1e-9) (explicit
    floor, not round(): HALF_UP on negatives is engine-dependent,
    floor of the shifted value is bit-reproducible).

    Scale shape: one posexplode + per-dim max (64 groups, map-side
    combined), scales rebroadcast to the exploded stream, per-dim
    error aggregate — all linear, no driver collect."""
    emb = _emb(spark, sf)
    ex = emb.select(
        "vec_id", F.posexplode("v").alias("d0", "x")
    ).select((F.col("d0") + 1).alias("d"), "x")
    scales = ex.groupBy("d").agg(F.max(F.abs("x")).alias("s"))
    q = ex.join(F.broadcast(scales), "d").select(
        "d",
        "x",
        "s",
        F.floor(F.col("x") / F.col("s") * 127 + 0.5 + 1e-9)
        .cast("int")
        .alias("code"),
    )
    return q.groupBy("d").agg(
        F.round(F.max("s") + 1e-9, 6).alias("scale"),
        F.min("code").alias("min_code"),
        F.max("code").alias("max_code"),
        F.round(
            F.avg(F.abs(F.col("x") - F.col("code") * F.col("s") / 127))
            + 1e-9,
            6,
        ).alias("avg_abs_err"),
    )


_QUANTIZE_SQL = """
WITH ex AS (
  SELECT generate_subscripts(embedding, 1) AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
scales AS (SELECT d, MAX(ABS(x)) AS s FROM ex GROUP BY d),
q AS (
  SELECT ex.d, ex.x, s.s,
         CAST(FLOOR(ex.x / s.s * 127 + 0.5 + 1e-9) AS INT) AS code
  FROM ex JOIN scales s ON ex.d = s.d)
SELECT d,
       ROUND(MAX(s) + 1e-9, 6) AS scale,
       MIN(code) AS min_code,
       MAX(code) AS max_code,
       ROUND(AVG(ABS(x - code * s / 127)) + 1e-9, 6) AS avg_abs_err
FROM q
GROUP BY d
"""


def emb_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Exact k-per-label sampling over the embedding corpus — the
    eval-set / probe-set carve-out every vector store needs (fixed
    per-class budget, reproducible anywhere). Same declared
    multiplicative-hash permutation as the documents sampler
    (augment._mult_hash_key, Knuth 2654435761 mod 2^32) keyed on
    vec_id, so the oracle checks the SELECTED ROWS, not just counts;
    the rounded L2 norm of each selected vector rides along so the
    check also touches the embedding payload.

    Scale shape: one shuffle on `label` for the window rank; k is
    small so WindowGroupLimit bounds the per-label sort map-side. The
    norm is a JVM higher-order reduce over the already-selected k·L
    rows only (filter first, then the expensive column)."""
    from .augment import _mult_hash_key

    k = 25
    emb = _emb(spark, sf)
    key = _mult_hash_key("vec_id")
    w = Window.partitionBy("label").orderBy(key.asc(), F.col("vec_id").asc())
    picked = (
        emb.select("vec_id", "label", "v", key.alias("sample_key"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )
    return picked.select(
        "label",
        "vec_id",
        "sample_key",
        "rk",
        F.round(F.sqrt(_dot(F.col("v"), F.col("v"))) + 1e-9, 6).alias("norm"),
    )


# composed from augment's canonical DuckDB hash twin — a hand-typed
# copy here would be the one missed by the next hash fix (r7 review)
_EMB_STRATIFIED_SQL = """
WITH keyed AS (
  SELECT label, vec_id, embedding, {hash} AS sample_key
  FROM (SELECT label, vec_id, embedding,
               ((vec_id % 4294967296) + 4294967296) % 4294967296 AS a
        FROM embeddings)),
ranked AS (
  SELECT label, vec_id, sample_key, embedding,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY sample_key ASC, vec_id ASC) AS rk
  FROM keyed)
SELECT label, vec_id, sample_key, rk,
       ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
             + 1e-9, 6) AS norm
FROM ranked WHERE rk <= 25
"""


def emb_nearest_centroid(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-centroid classification over the embedding corpus —
    the kmeans ASSIGNMENT step as a deterministic, oracle-checkable
    operator (centroids are the label means, not a random init, so
    unlike sim_ivf_topk this is hash-checked): per-dim centroids via
    posexplode + avg, every vector scored against all 10 centroids by
    squared L2 computed as a dim-stream join + hash aggregate —
    linear shuffles, no vector×centroid array crossing, the shape
    that survives 10^9 vectors × k centroids. Distances are ROUNDED
    before the argmin (label tiebreak) so sub-rounding float noise
    can never flip a winner between engines. Surface: per true
    label, n / n_correct / accuracy of the prototype classifier."""
    emb = _emb(spark, sf)
    ex = emb.select(
        "vec_id", "label", F.posexplode("v").alias("d0", "x")
    ).select("vec_id", "label", (F.col("d0") + 1).alias("d"), "x")
    cent = ex.groupBy(F.col("label").alias("clabel"), "d").agg(
        F.avg("x").alias("c")
    )
    d2 = (
        ex.join(cent, "d")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.round(
                F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))
                + 1e-9,
                6,
            ).alias("dist")
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("clabel"))
    nearest = d2.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") == 1
    )
    return nearest.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("clabel") == F.col("label"), 1).otherwise(0)
        ).cast("long").alias("n_correct"),
        F.round(
            F.sum(F.when(F.col("clabel") == F.col("label"), 1).otherwise(0))
            / F.count(F.lit(1))
            + 1e-9,
            4,
        ).alias("accuracy"),
    )


_NEAREST_CENTROID_SQL = """
WITH ex AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
cent AS (
  SELECT label AS clabel, d, AVG(x) AS c FROM ex GROUP BY 1, 2),
d2 AS (
  SELECT vec_id, label, clabel,
         ROUND(SUM((x - c) * (x - c)) + 1e-9, 6) AS dist
  FROM ex JOIN cent USING (d)
  GROUP BY 1, 2, 3),
r AS (
  SELECT vec_id, label, clabel,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dist, clabel) AS rk
  FROM d2)
SELECT label,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN clabel = label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct,
       ROUND(SUM(CASE WHEN clabel = label THEN 1 ELSE 0 END)
             / COUNT(*) + 1e-9, 4) AS accuracy
FROM r WHERE rk = 1
GROUP BY label
"""


_RECALL_QUERIES = 50  # 250 exact pairs: binomial margin, see docstring


def sim_ivf_recall(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-ANN recall floor asserted against LIVE data, hash-checked —
    the dedup_near_recall pattern applied to the MLlib IVF comparison
    path (_ivf_topk — KMeans cells, nprobe = 2 of 16; since r15 the
    registry's sim_ivf_topk rides the house deterministic IVF and is
    fully oracled, so this pin is what keeps the MLlib quantizer
    honest): it must recover ≥ 10% of the EXACT cosine top-5 over a
    50-query probe set. The floor is measured over 250 exact pairs:
    at 25 pairs the observed recall sat EXACTLY on a 0.2 floor at
    sf0.01 (5/25 — zero margin; one regeneration flips the driver
    red), while at 250 pairs the measured recall is 0.33-0.35 at all
    three SFs, so a dip below 0.1 is a ~1e-13 binomial event — and
    0.1 is still 10×
    the random-pick baseline (5/N per query), so the pin stays
    meaningful. Surface: the exact-pair count (SQL-expressible) plus
    the recall-floor boolean the oracle pins TRUE. The recall VALUE
    stays out of the surface — MLlib cell assignments are
    engine-specific."""
    from ..util import persist_tracked

    # persist: `exact` feeds BOTH the semi-join and its own count —
    # without it the 50-query brute-force scan + window rank can run
    # twice (same trap dedup_near_recall pins with the same helper)
    exact = persist_tracked(
        _exact_topk(spark, sf, n_queries=_RECALL_QUERIES, k=5)
        .select("query_id", "cand_id")
    )
    ivf = _ivf_topk(spark, sf, n_queries=_RECALL_QUERIES).select(
        "query_id", "cand_id"
    )
    hit = exact.join(ivf, ["query_id", "cand_id"], "left_semi")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_hit = hit.agg(F.count(F.lit(1)).alias("_n_hit"))
    return n_exact.crossJoin(F.broadcast(n_hit)).select(
        "n_exact_pairs",
        (F.col("_n_hit") >= 0.1 * F.col("n_exact_pairs")).alias(
            "recall_floor_met"
        ),
    )


_IVF_RECALL_SQL = """
WITH e AS ({emb}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {cos} AS cosine
  FROM e q JOIN e c ON c.vec_id != q.vec_id
  WHERE q.vec_id < {nq}),
topk AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, cand_id) AS rank
    FROM scored) t
  WHERE rank <= 5)
SELECT COUNT(*) AS n_exact_pairs, TRUE AS recall_floor_met FROM topk
""".format(emb=_EMB_SQL, cos=_COS_SQL.format(a="q", b="c"), nq=_RECALL_QUERIES)


_PCA_ITERS = 3


def emb_pca_power(spark: SparkSession, sf: str) -> DataFrame:
    """Top principal component of the embedding corpus via POWER
    ITERATION — the third iterative-ML primitive (kmeans assignment =
    emb_nearest_centroid, one Lloyd step = emb_kmeans_step, PageRank =
    graph_pagerank; this adds the spectral one), in the only shape
    that survives 10^9×d: the covariance matrix is NEVER materialized
    — each iteration computes w = Xᵀ(X v) as two dim-stream joins
    (u = Xv: join on d, hash-agg per vec; w = Xᵀu: join on vec_id,
    hash-agg per d), then normalizes by a 1-row norm crossJoin. Three
    unrolled iterations from the deterministic 1/√d init, mirrored as
    SQL CTEs for the oracle. X is mean-centered per dim first (that
    makes it PCA, not just a dominant singular vector of raw X).
    Intermediates round at 8dp and the normalized vector at 10dp on
    BOTH engines so accumulation-order noise cannot compound across
    iterations; the surfaced loading rounds at 6dp. Power iteration's
    sign is pinned by the all-positive init (λ > 0), so no
    sign-ambiguity handling is needed.

    Execution shape (optimization r15, guide §2.4/§4.2): one small
    per-dim mean aggregate, then each power iteration is ONE job — an
    Arrow-batched mapInPandas kernel over the raw vector rows
    computes u = round(Σ_d (x−mu)·v + 1e-9, 8) row-locally (the same
    8dp rounding the old per-vec hash aggregate applied) and emits
    per-batch PARTIAL per-dim sums of (x−mu)·u; a d-row aggregate
    reduces them, and the 8dp w-rounding / norm / 10dp v-rounding run
    on the collected d-vector with half-away-from-zero rounding
    mirroring F.round. The pre-r15 shape paid, per iteration, two
    dim-stream shuffle joins + three aggregates over the n·d exploded
    frame (41 Exchange nodes in the printed plan); now the corpus
    crosses no shuffle at all — partials are d rows per task — which
    is the shape that survives 10^9×d. Measured 3.6 s → ~1 s at
    sf0.1 (same machine, min-of-3); accumulation-order noise vs the
    old aggregates is ~1e-15 relative against the 8dp roundings — the
    same cross-order tolerance the DuckDB twin already certifies."""
    import numpy as np

    from ..util import persist_tracked

    emb = persist_tracked(_emb(spark, sf).select("vec_id", "v"))
    n_dims = len(emb.select("v").first()[0])
    ex0 = emb.select("vec_id", F.posexplode("v").alias("d0", "x")).select(
        "vec_id", (F.col("d0") + 1).alias("d"), "x"
    )
    mu_rows = ex0.groupBy("d").agg(F.avg("x").alias("mu")).collect()
    mu = np.zeros(n_dims)
    for r in mu_rows:
        mu[int(r["d"]) - 1] = float(r["mu"])
    v = np.full(n_dims, 1.0 / (n_dims ** 0.5))
    for _ in range(_PCA_ITERS):

        def part_w(batches, mu=mu, v=v):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.vstack(pdf["v"].to_numpy()) - mu[None, :]
                u = X @ v + 1e-9
                u = np.floor(np.abs(u) * 1e8 + 0.5) / 1e8 * np.sign(u)
                pw = X.T @ u  # (d,) partial of Σ_vec (x−mu)·u
                yield pd.DataFrame(
                    {"d": np.arange(1, len(pw) + 1), "w": pw}
                )

        w_rows = (
            emb.mapInPandas(part_w, schema="d int, w double")
            .groupBy("d")
            .agg(F.sum("w").alias("w"))
            .collect()
        )
        w = np.zeros(n_dims)
        for r in w_rows:
            w[int(r["d"]) - 1] = _round_half_away(float(r["w"]) + 1e-9, 8)
        nrm = float(np.sqrt((w * w).sum()))
        v = np.array([_round_half_away(x / nrm + 1e-10, 10) for x in w])
    return spark.createDataFrame(
        [
            (d + 1, _round_half_away(float(v[d]) + 1e-9, 6))
            for d in range(n_dims)
        ],
        "d int, loading double",
    )


def _pca_sql() -> str:
    it = """
u{i} AS (
  SELECT vec_id, ROUND(SUM(x * vv) + 1e-9, 8) AS u
  FROM ex JOIN v{p} USING (d) GROUP BY vec_id),
w{i} AS (
  SELECT d, ROUND(SUM(x * u) + 1e-9, 8) AS w
  FROM ex JOIN u{i} USING (vec_id) GROUP BY d),
v{i} AS (
  SELECT d, ROUND(w / (SELECT sqrt(SUM(w * w)) FROM w{i}) + 1e-10, 10)
           AS vv
  FROM w{i})"""
    iters = ",".join(it.format(i=i + 1, p=i) for i in range(_PCA_ITERS))
    return """
WITH e AS ({emb}),
ex0 AS (
  SELECT vec_id, generate_subscripts(v, 1) AS d, unnest(v) AS x FROM e),
mu AS (SELECT d, AVG(x) AS mu FROM ex0 GROUP BY d),
ex AS (SELECT vec_id, ex0.d, x - mu AS x FROM ex0 JOIN mu USING (d)),
v0 AS (
  SELECT d, 1.0 / sqrt((SELECT COUNT(*) FROM mu)) AS vv FROM mu),
{iters}
SELECT d, ROUND(vv + 1e-9, 6) AS loading FROM v{last}
""".format(emb=_EMB_SQL, iters=iters, last=_PCA_ITERS)


_KMEANS_K = 8


def emb_kmeans_step(spark: SparkSession, sf: str) -> DataFrame:
    """One exact Lloyd iteration of k-means over the embedding corpus
    — the iterative-ML building block, as a deterministic
    hash-checkable operator (a full kmeans differs only by looping
    this step; emb_nearest_centroid covers the assignment half with
    label-mean centroids, this covers assign + UPDATE from a fixed
    init): centroids init to the k = 8 lowest-vec_id vectors (cluster
    id = that seed's vec_id), every vector assigns to its nearest
    centroid by squared L2 — distances ROUNDED before the argmin
    (cid tiebreak) so float noise can't flip a winner between engines
    — and the new centroid is the member mean, surfaced per (cluster,
    dim) with the member count (COUNT(*): ex holds exactly one row per
    (vec_id, d), so distinct would only add a shuffle). All in the dim-stream form (posexplode
    → join on d → hash agg): the assignment join fans each of n·dim
    rows out k ways and reduces immediately — linear shuffles, no
    vector×centroid array crossing, the same shape that survives 10^9
    vectors (see emb_nearest_centroid). The init lookup is a k-row
    broadcast."""
    emb = _emb(spark, sf)
    ex = emb.select("vec_id", F.posexplode("v").alias("d0", "x")).select(
        "vec_id", (F.col("d0") + 1).alias("d"), "x"
    )
    seed_ids = emb.select("vec_id").orderBy("vec_id").limit(_KMEANS_K)
    cent0 = ex.join(F.broadcast(seed_ids), "vec_id").select(
        F.col("vec_id").alias("cid"), "d", F.col("x").alias("c")
    )
    d2 = (
        ex.join(cent0, "d")
        .groupBy("vec_id", "cid")
        .agg(
            F.round(
                F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))
                + 1e-9,
                6,
            ).alias("dist")
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cid"))
    assign = (
        d2.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", F.col("cid").alias("cluster_id"))
    )
    return (
        ex.join(assign, "vec_id")
        .groupBy("cluster_id", "d")
        .agg(
            F.round(F.avg("x") + 1e-9, 6).alias("c_new"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


_KMEANS_STEP_SQL = """
WITH ex AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
seeds AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k}),
cent0 AS (
  SELECT ex.vec_id AS cid, d, x AS c
  FROM ex JOIN seeds ON ex.vec_id = seeds.vec_id),
d2 AS (
  SELECT ex.vec_id, cid,
         ROUND(SUM((x - c) * (x - c)) + 1e-9, 6) AS dist
  FROM ex JOIN cent0 USING (d)
  GROUP BY 1, 2),
assign AS (
  SELECT vec_id, cid AS cluster_id
  FROM (SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rk
        FROM d2)
  WHERE rk = 1)
SELECT cluster_id, d,
       ROUND(AVG(x) + 1e-9, 6) AS c_new,
       COUNT(*) AS n_members
FROM ex JOIN assign ON ex.vec_id = assign.vec_id
GROUP BY 1, 2
""".format(k=_KMEANS_K)


_KMEANS_CONV_CAP = 40
_KMEANS_CONV_RTOL = 3e-4
# per-run inertia trajectory, for the margin-audit tooling and the
# property tests (overwritten by each emb_kmeans_converged call)
_KMEANS_CONV_TRACE: list[float] = []


def emb_kmeans_converged(spark: SparkSession, sf: str) -> DataFrame:
    """Lloyd's k-means run to CONVERGENCE (VERDICT r8 item 7) — the
    data-driven-control-flow companion to emb_kmeans_step's single
    deterministic step. Iterates assign → update until the inertia
    (sum of min squared distances) stops decreasing by more than
    3e-4 relative, or a cap of 40 iterations. The surfaced result is
    the self-certifying bound pattern (agg_hll_vs_exact /
    sim_ivf_recall): model cardinalities the oracle recomputes plus
    two booleans the oracle pins TRUE — `converged` (the loop exited
    on the tolerance, not the cap) and `inertia_monotone` (inertia
    never increased across iterations; Lloyd's theorem, which holds
    here to rounding noise because distances round at 6dp before the
    argmin on a fixed centroid snapshot).

    Scale shape: per iteration one dim-stream assignment join
    (ex ⋈ broadcast centroids on d → hash-agg per (vec, cid) → one
    windowed argmin) and one member-mean hash aggregate — the exact
    emb_kmeans_step machinery looped. Driver-side state is the k×d
    centroid matrix (128 doubles — O(model), independent of corpus
    size; the same driver-resident-centroids design as Spark MLlib's
    own KMeans) plus one scalar inertia per iteration. An emptied
    cluster keeps its previous centroid (standard Lloyd practice;
    keeps k stable for the oracle).

    Margin audit (house rule, measured before fronting — and it BIT:
    the first tolerance tried, 1e-6 relative, hit the cap at sf0.1
    because random embeddings keep per-iteration decreases jittering
    around 1e-4 long after the clustering is effectively stable —
    converged would have gone driver-red). At 3e-4: the loop exits at
    iteration 11 / 9 / 12 (sf0.001 / 0.01 / 0.1, final decreases
    7.5e-5 / 2.2e-4 / 2.8e-4) vs the cap of 40 — a 3× iteration margin —
    and the decreases trend strictly toward zero past the crossing
    (monotone inertia over finitely many assignments guarantees a
    crossing eventually; the cap is a backstop, not the exit). No
    iteration increased inertia at either sf (worst observed
    violation: none; guard allows 1e-9 relative noise). All 8
    clusters stay nonempty at both sfs. The per-run inertia
    trajectory is exposed in _KMEANS_CONV_TRACE for the audit tool
    and property tests.

    Execution shape (optimization r15, guide §2.4/§4.2): each Lloyd
    iteration is ONE job — an Arrow-batched mapInPandas kernel over
    the raw vector rows computes every member's rounded squared
    distance to all k driver-held centroids (the same 6dp-rounded
    formula, argmin with the same lowest-cid tiebreak — numpy argmin
    over cid-sorted columns) and emits per-batch PARTIAL per-cluster
    aggregates (member count, inertia mass, per-dim coordinate sums);
    a k×d-row hash aggregate reduces the partials and one collect
    brings back centroids + inertia together. The pre-r15 shape per
    iteration was a dim-stream broadcast join + an n·k-row hash
    aggregate + a row_number window (a full sort shuffle of n·k rows)
    + TWO collect jobs (stats, then centroid update) — ~5 stages and
    2 jobs per iteration, ~60 jobs per run at the observed 12
    iterations. Now the corpus crosses no shuffle at all (partials
    are k×d rows per task), matching the driver-resident-centroids
    design the docstring already claims; measured 10.4 s → ~2 s at
    sf0.1 (same machine, min-of-3). Values: distances/centroids use
    the identical formulas with half-away-from-zero rounding (the
    house kernel recipe mirroring F.round); summation order inside a
    task differs from the old hash aggregate only at float
    accumulation noise (~1e-15 relative), which the 6dp rounding and
    the 3e-4 convergence tolerance absorb — the same cross-order
    tolerance the Spark-vs-DuckDB twin already relies on."""
    import numpy as np

    from ..util import persist_tracked

    emb = persist_tracked(_emb(spark, sf).select("vec_id", "v"))
    first = emb.select("v").first()
    n_dims = len(first[0])
    seed_rows = (
        emb.select("vec_id", "v").orderBy("vec_id").limit(_KMEANS_K).collect()
    )
    cent = {
        (int(r["vec_id"]), d + 1): float(r["v"][d])
        for r in seed_rows
        for d in range(n_dims)
    }
    n_vectors = None
    prev_inertia = None
    monotone = True
    converged = False
    _KMEANS_CONV_TRACE.clear()
    for _ in range(_KMEANS_CONV_CAP):
        cids = np.array(sorted({c for (c, _) in cent}), dtype=np.int64)
        C = np.array(
            [[cent[(int(c), d)] for d in range(1, n_dims + 1)] for c in cids]
        )

        def part_stats(batches, C=C, cids=cids):
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.vstack(pdf["v"].to_numpy())
                # rounded squared L2 to every centroid; argmin ties
                # break to the lowest cid because cids are sorted
                d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2) + 1e-9
                d2 = np.floor(d2 * 1e6 + 0.5) / 1e6
                j = d2.argmin(axis=1)
                dist = d2[np.arange(len(X)), j]
                out = {"cid": [], "d": [], "s": [], "cnt": [], "sdist": []}
                for jj in range(len(cids)):
                    m = j == jj
                    if not m.any():
                        continue
                    sums = X[m].sum(axis=0)
                    cnt = int(m.sum())
                    sd = float(dist[m].sum())
                    for dd in range(len(sums)):
                        out["cid"].append(int(cids[jj]))
                        out["d"].append(dd + 1)
                        out["s"].append(float(sums[dd]))
                        out["cnt"].append(cnt)
                        out["sdist"].append(sd)
                yield pd.DataFrame(out)

        rows = (
            emb.mapInPandas(
                part_stats,
                schema="cid long, d int, s double, cnt long, sdist double",
            )
            .groupBy("cid", "d")
            .agg(
                F.sum("s").alias("s"),
                F.sum("cnt").alias("cnt"),
                F.sum("sdist").alias("sd"),
            )
            .collect()
        )
        inertia = float(sum(r["sd"] for r in rows if r["d"] == 1))
        n_vectors = int(sum(r["cnt"] for r in rows if r["d"] == 1))
        _KMEANS_CONV_TRACE.append(inertia)
        if prev_inertia is not None:
            if inertia > prev_inertia * (1 + 1e-9) + 1e-9:
                monotone = False
            if prev_inertia - inertia <= _KMEANS_CONV_RTOL * max(
                prev_inertia, 1.0
            ):
                converged = True
                break  # before the centroid update the break discards
        prev_inertia = inertia
        # centroid update from the same collected partials: mean per
        # (cid, d), rounded half-away-from-zero at 6dp — the F.round
        # recipe. Emptied clusters (absent from rows) keep their
        # previous centroid — dict update, not replacement.
        cent.update(
            {
                (int(r["cid"]), int(r["d"])): _round_half_away(
                    r["s"] / r["cnt"] + 1e-9, 6
                )
                for r in rows
            }
        )
    return spark.createDataFrame(
        [(_KMEANS_K, n_dims, n_vectors, converged, monotone)],
        "k long, n_dims long, n_vectors long, "
        "converged boolean, inertia_monotone boolean",
    )


_KMEANS_CONV_SQL = """
SELECT CAST({k} AS BIGINT) AS k,
       (SELECT CAST(len(embedding) AS BIGINT) FROM embeddings LIMIT 1)
         AS n_dims,
       (SELECT COUNT(*) FROM embeddings) AS n_vectors,
       TRUE AS converged,
       TRUE AS inertia_monotone
""".format(k=_KMEANS_K)


def _compose_emb_stratified_sql() -> str:
    from .augment import _MULT_HASH_SQL

    return _EMB_STRATIFIED_SQL.format(hash=_MULT_HASH_SQL)


#: PQ geometry: 64-dim vectors split into 4 subspaces of 16 dims,
#: 16 codes per subspace → a 64x4-byte float vector compresses to 4
#: one-byte codes (64:1 with float32 storage).
_PQ_SUBDIM = 16
_PQ_CODES = 16


def _pq_codebook_block(emb: DataFrame):
    """The deterministic PQ codebook as a driver-held (_PQ_CODES × d)
    numpy block, row c−1 = code c — the SAME bounded frame the
    pre-r16 `_pq_codebook` built distributedly and broadcast (the
    _PQ_CODES corpus vectors ranked first by the house
    multiplicative-hash permutation of vec_id, reproducible in any
    engine unlike KMeans init), pulled once for the assignment/ADC
    kernels (optimization r16, guide §2.4/§4.2 — the _ranked_cells
    recipe applied to the PQ family, VERDICT r15 item 2)."""
    import numpy as np

    from .augment import _mult_hash_key

    seeds = (
        emb.select("vec_id", _mult_hash_key("vec_id").alias("hk"))
        .orderBy(F.asc("hk"), F.asc("vec_id"))
        .limit(_PQ_CODES)
        .collect()
    )
    seeds.sort(key=lambda r: (int(r["hk"]), int(r["vec_id"])))
    ids = [int(r["vec_id"]) for r in seeds]
    vrows = {
        int(r["vec_id"]): np.asarray(r["v"], dtype=np.float64)
        for r in emb.where(F.col("vec_id").isin(ids))
        .select("vec_id", "v")
        .collect()
    }
    return np.vstack([vrows[i] for i in ids])


def _pq_sub_dists(X, C, s):
    """Rounded squared distances of the rows of X to every codebook
    row, within subspace ``s`` — the shared kernel formula: direct
    (x−c)² sum over the subspace dims, +1e-9 nudge, half-away-from-
    zero 6dp (distances are non-negative, so floor(x·1e6+0.5) IS the
    F.round mirror — the house numpy recipe)."""
    import numpy as np

    sl = slice(s * _PQ_SUBDIM, (s + 1) * _PQ_SUBDIM)
    d2 = ((X[:, sl][:, None, :] - C[None, :, sl]) ** 2).sum(axis=2) + 1e-9
    return np.floor(d2 * 1e6 + 0.5) / 1e6


def _pq_best(emb: DataFrame, C) -> DataFrame:
    """(vec_id, sub, b{dist, code}) — nearest codebook entry per
    subspace, as ONE Arrow mapInPandas kernel over the raw vector
    rows against the driver-held codebook block (optimization r16,
    VERDICT r15 item 2). The pre-r16 shape paid, per use, a
    posexplode dim-stream fan-out join (n·|codebook| rows through
    codegen), an n·subs·codes-row hash-aggregate EXCHANGE and a
    min(struct) argmin per assignment; now assignment crosses no
    shuffle at all — an index probe is a map (the faiss shape, same
    argument as _ranked_cells). Values identical: same 6dp-rounded
    direct (x−c)² distance (half-away-from-zero, the house F.round
    mirror), and np.argmin's first-minimum over code-ascending
    columns ≡ the old min(struct(dist, code)) lexicographic argmin;
    accumulation-order noise vs the old hash aggregate is ~1e-15
    against the 6dp rounding, the established cross-engine
    tolerance."""
    import numpy as np

    nsub = C.shape[1] // _PQ_SUBDIM

    def assign(batches, C=C, nsub=nsub):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf["v"].to_numpy())
            vids = pdf["vec_id"].to_numpy(dtype=np.int64)
            n = len(X)
            dist_cols = np.empty((n, nsub))
            code_cols = np.empty((n, nsub), dtype=np.int32)
            for s in range(nsub):
                d2 = _pq_sub_dists(X, C, s)
                b = np.argmin(d2, axis=1)  # first min = lowest code
                dist_cols[:, s] = d2[np.arange(n), b]
                code_cols[:, s] = b + 1  # codes are 1-based hash ranks
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(vids, nsub),
                    "sub": np.tile(np.arange(nsub, dtype=np.int32), n),
                    "dist": dist_cols.ravel(),
                    "code": code_cols.ravel(),
                }
            )

    assigned = emb.select("vec_id", "v").mapInPandas(
        assign, schema="vec_id long, sub int, dist double, code int"
    )
    return assigned.select(
        "vec_id", "sub", F.struct("dist", "code").alias("b")
    )


def emb_pq_codes(spark: SparkSession, sf: str) -> DataFrame:
    """PRODUCT QUANTIZATION code assignment — the third leg of the
    ANN quantization family (emb_quantize_int8 = scalar, sim_ivf_* =
    coarse cells, this = subspace codes; IVF-PQ is the canonical
    10^9-vector recipe). Each 64-dim vector splits into 4 subspaces
    of 16 dims; every subspace is encoded as the id of its nearest
    codebook entry, so a vector stores as 4 bytes and asymmetric
    distance scans read codebook-distance tables instead of floats.

    Kept deterministic so the driver can hash it: codebook + argmin
    discipline in _pq_codebook_block/_pq_best (shared with
    sim_pq_recall).

    Scale shape (optimization r16, VERDICT r15 item 2): the bounded
    16×d codebook is pulled once and assignment is ONE Arrow
    mapInPandas kernel over the raw vectors — zero shuffle before the
    4-row-per-vector subspace aggregate (the pre-r16 dim-stream
    fan-out join + n·subs·codes hash-agg exchange is gone). Surface:
    per subspace, codes_used / avg / max squared quantization error —
    the codebook-quality profile a PQ tuner reads."""
    emb = _emb(spark, sf)
    best = _pq_best(emb, _pq_codebook_block(emb))
    return best.groupBy("sub").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.countDistinct("b.code").cast("bigint").alias("codes_used"),
        F.round(F.avg("b.dist") + 1e-9, 6).alias("avg_sq_err"),
        F.round(F.max("b.dist") + 1e-9, 6).alias("max_sq_err"),
    )


# Shared PQ CTE prefix (SQL twin of the codebook construction +
# per-subspace argmin the _pq_best kernel computes) — composed into
# BOTH PQ oracles so the codebook/argmin text cannot drift between
# them.
_PQ_COMMON_SQL = f"""e AS ({_EMB_SQL}),
ex AS (
  SELECT vec_id,
         generate_subscripts(v, 1) AS d,
         CAST(unnest(v) AS DOUBLE) AS x
  FROM e),
hk AS (
  SELECT vec_id,
         {{hash}} AS hk
  FROM (SELECT vec_id,
               ((vec_id % 4294967296) + 4294967296) % 4294967296 AS a
        FROM e) t),
seeds AS (
  SELECT vec_id AS cvid,
         ROW_NUMBER() OVER (ORDER BY hk, vec_id) AS code
  FROM hk ORDER BY hk, vec_id LIMIT {_PQ_CODES}),
cb AS (
  SELECT s.code, ex.d, ex.x AS c
  FROM seeds s JOIN ex ON ex.vec_id = s.cvid),
d2 AS (
  SELECT ex.vec_id,
         CAST((ex.d - 1) // {_PQ_SUBDIM} AS INT) AS sub,
         cb.code,
         ROUND(SUM((ex.x - cb.c) * (ex.x - cb.c)) + 1e-9, 6) AS dist
  FROM ex JOIN cb USING (d)
  GROUP BY 1, 2, 3),
best AS (
  SELECT vec_id, sub, dist, code,
         ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                            ORDER BY dist, code) AS rn
  FROM d2)"""

_PQ_CODES_SQL = f"""
WITH {_PQ_COMMON_SQL}
SELECT sub,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(COUNT(DISTINCT code) AS BIGINT) AS codes_used,
       ROUND(AVG(dist) + 1e-9, 6) AS avg_sq_err,
       ROUND(MAX(dist) + 1e-9, 6) AS max_sq_err
FROM best WHERE rn = 1
GROUP BY sub
"""


def _compose_pq_sql() -> str:
    from .augment import _MULT_HASH_SQL

    return _PQ_CODES_SQL.format(hash=_MULT_HASH_SQL)


#: ADC probe-set geometry: 20 query vectors, top-10 recall.
_ADC_NQ = 20
_ADC_K = 10


def sim_pq_recall(spark: SparkSession, sf: str) -> DataFrame:
    """PQ ASYMMETRIC-DISTANCE (ADC) top-k recall vs the exact L2
    top-k — the search half of the PQ story (emb_pq_codes profiles
    the codebook; this measures what the 4-byte codes cost in
    ranking quality). For each of the first 20 vectors as queries:
    exact squared-L2 top-10 over the corpus (self excluded) vs the
    ADC top-10, where ADC(q, v) = Σ_sub table[q, sub, code(v, sub)]
    and the table holds the query's squared distance to every
    codebook entry per subspace — the scan reads 4 codes per vector,
    never the floats. Entirely deterministic (hash-ranked codebook,
    rounded distances, vec_id tiebreaks), so unlike sim_ivf_recall
    the recall VALUE itself is oracle-checked, not just a floor.

    Scale shape: the ADC distance tables are (queries × 4 × 16) rows
    — broadcast; the scan is codes ⋈ broadcast-table + one hash agg
    per (query, vec) — linear in corpus size, the shape that makes
    PQ worth it at 10^9 vectors. The exact side is the dim-stream
    join against the broadcast probe dims (bounded query count)."""
    exk, adck = _pq_search_ranked(spark, sf)
    exk = exk.select("query_id", "vec_id")
    adck = adck.select("query_id", "vec_id")
    hits = exk.join(adck, ["query_id", "vec_id"], "left_semi").agg(
        F.count(F.lit(1)).alias("_n_hits")
    )
    totals = exk.agg(
        F.countDistinct("query_id").cast("bigint").alias("n_queries"),
        F.count(F.lit(1)).cast("bigint").alias("_n_exact"),
    )
    return totals.crossJoin(F.broadcast(hits)).select(
        "n_queries",
        F.col("_n_exact").alias("n_exact_pairs"),
        F.col("_n_hits").cast("bigint").alias("n_hits"),
        F.round(F.col("_n_hits") / F.col("_n_exact") + 1e-9, 4).alias("recall"),
    )


def _pq_partial_topk_pdf(dmat, vids, qids, k, col="dist"):
    """Per-batch partial top-k: for each query column j of ``dmat``
    (already-rounded distances), the k smallest rows under the strict
    (dist asc, vec_id asc) total order, self-pairs excluded. A
    batch's local top-k is a superset of its members in the GLOBAL
    top-k and preserves their relative order, so the downstream
    row_number merge window computes ranks identical to a window over
    the full n×nq frame — while the kernel emits ≤ k·nq rows per
    batch instead of n·nq."""
    import numpy as np
    import pandas as pd

    qs, vs, ds = [], [], []
    for j in range(dmat.shape[1]):
        idx = np.nonzero(vids != qids[j])[0]
        order = np.lexsort((vids[idx], dmat[idx, j]))[:k]
        sel = idx[order]
        qs.append(np.full(len(sel), qids[j], dtype=np.int64))
        vs.append(vids[sel])
        ds.append(dmat[sel, j])
    return pd.DataFrame(
        {
            "query_id": np.concatenate(qs),
            "vec_id": np.concatenate(vs),
            col: np.concatenate(ds),
        }
    )


def _pq_search_ranked(
    spark: SparkSession, sf: str
) -> tuple[DataFrame, DataFrame]:
    """Shared ADC probe machinery (sim_pq_recall and
    sim_eval_pq_mrr_ndcg): per probe query (vec_id < _ADC_NQ), the
    exact squared-L2 ranking and the ADC ranking, both truncated at
    _ADC_K — (query_id, vec_id, rn) frames. Mirrored by
    _PQ_SEARCH_CTES.

    Execution shape (optimization r16, VERDICT r15 item 2 — the
    _ranked_cells recipe): the 16×d codebook and the ≤ _ADC_NQ probe
    vectors are BOUNDED pulls (the same frames the pre-r16 plan
    broadcast), the ADC distance tables (nq × subs × codes rounded
    entries — the exact values the old pex⋈cb aggregate produced) are
    built driver-side in numpy, and each ranking is ONE Arrow
    mapInPandas kernel over the raw vectors emitting per-batch
    partial top-k rows, merged by a row_number window over ≤
    k·nq·batches rows. The pre-r16 shape paid a dim-stream fan-out
    join + n·nq hash-agg exchange (exact side), the full code
    assignment subtree + an n·nq ADC aggregate (ADC side), and ran
    the merge windows over n·nq rows. Values identical: same rounded
    formulas (6dp half-away-from-zero + 1e-9 nudges), same strict
    (dist, vec_id) total order, same self-exclusion; per-subspace /
    per-pair float accumulation order vs the old hash aggregates is
    ~1e-15 noise against the 6dp rounding — the established
    cross-engine tolerance."""
    import numpy as np

    from ..util import persist_tracked

    emb = persist_tracked(_emb(spark, sf))
    C = _pq_codebook_block(emb)
    nsub = C.shape[1] // _PQ_SUBDIM
    probes = (
        emb.where(F.col("vec_id") < _ADC_NQ).select("vec_id", "v").collect()
    )
    probes.sort(key=lambda r: int(r["vec_id"]))
    qids = np.array([int(r["vec_id"]) for r in probes], dtype=np.int64)
    Q = np.vstack([np.asarray(r["v"], dtype=np.float64) for r in probes])

    def exact_partials(batches, Q=Q, qids=qids):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf["v"].to_numpy())
            vids = pdf["vec_id"].to_numpy(dtype=np.int64)
            d2 = ((X[:, None, :] - Q[None, :, :]) ** 2).sum(axis=2) + 1e-9
            d2 = np.floor(d2 * 1e6 + 0.5) / 1e6
            yield _pq_partial_topk_pdf(d2, vids, qids, _ADC_K)

    exd = emb.select("vec_id", "v").mapInPandas(
        exact_partials, schema="query_id long, vec_id long, dist double"
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    exk = persist_tracked(
        exd.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _ADC_K)
        .select("query_id", "vec_id", "rn")
    )

    # ADC tables driver-side: pdist[q, sub, code] — the same rounded
    # per-subspace query→codebook distances the old broadcast aggregate
    # computed (formula shared with the assignment kernel)
    tab = np.empty((len(qids), nsub, C.shape[0]))
    for s in range(nsub):
        tab[:, s, :] = _pq_sub_dists(Q, C, s)

    def adc_partials(batches, C=C, tab=tab, qids=qids, nsub=nsub):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf["v"].to_numpy())
            vids = pdf["vec_id"].to_numpy(dtype=np.int64)
            n = len(X)
            ad = np.zeros((n, len(qids)))
            for s in range(nsub):
                codes0 = np.argmin(_pq_sub_dists(X, C, s), axis=1)
                # table lookup: (nq, n) slice of this sub's pdist rows
                ad += tab[:, s, :][:, codes0].T
            # 4 already-6dp-rounded terms: re-round so last-ULP
            # summation noise can't diverge between engines
            ad = np.floor((ad + 1e-9) * 1e6 + 0.5) / 1e6
            yield _pq_partial_topk_pdf(ad, vids, qids, _ADC_K, col="adist")

    adcd = emb.select("vec_id", "v").mapInPandas(
        adc_partials, schema="query_id long, vec_id long, adist double"
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("vec_id")
    )
    adck = (
        adcd.withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") <= _ADC_K)
        .select("query_id", "vec_id", "rn")
    )
    return exk, adck


def sim_eval_pq_mrr_ndcg(spark: SparkSession, sf: str) -> DataFrame:
    """Graded retrieval metrics for the PQ/ADC ranking — the second
    half of VERDICT r14 item 6 ("the IVF (and PQ/ADC) rankings"):
    MRR@10 and nDCG@10 of the 4-byte-code asymmetric-distance ranking
    against the exact squared-L2 top-10 over the 20-query ADC probe
    set, via the shared _graded_metrics block (gains keyed on the
    exact-L2 rank, the ground truth PQ approximates). Where
    sim_pq_recall publishes the set-overlap number, this grades the
    ORDER the scan returns — the difference between "the neighbor is
    somewhere in the shortlist" and "the shortlist is usable without
    a re-rank pass".

    Fully deterministic end to end (hash-ranked codebook, 6dp-rounded
    distances, vec_id tiebreaks — the sim_pq_recall discipline), so
    per-query VALUES hash-check. Scale shape inherits
    _pq_search_ranked: ADC tables broadcast, codes scan linear, exact
    side bounded by the probe set.

    Margin audit (r15): same structural-nonzero denominators as
    sim_eval_mrr_ndcg; measured at sf0.01 — MRR spans 0-1.0 mean
    0.253, nDCG 0-0.571 mean 0.114 (set-recall 0.095 per
    sim_pq_recall): 4 subspaces × 16 codes is a BRUTALLY lossy code
    on 64-dim random vectors, and the graded metrics say so louder
    than the recall number — which is the op's point (a real PQ tuner
    would read this and widen the codebook). Exactly the opposite
    profile of the IVF eval (MRR 1.0 / nDCG 0.645): IVF keeps exact
    distances on a candidate subset, ADC keeps all candidates under
    approximate distances. Both metric columns non-constant; both
    verdict classes non-vacuous."""
    exk, adck = _pq_search_ranked(spark, sf)
    exact = exk.select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        F.col("rn").cast("long").alias("exact_rank"),
    )
    approx = adck.select(
        "query_id",
        F.col("vec_id").alias("cand_id"),
        F.col("rn").cast("long").alias("approx_rank"),
    )
    return _graded_metrics(exact, approx, _ADC_K)


# Shared ADC search CTE chain (SQL twin of _pq_search_ranked) —
# composed into BOTH the recall and the graded-metric oracles so the
# exact/ADC ranking text cannot drift between them.
_PQ_SEARCH_CTES = f""",
codes AS (SELECT vec_id, sub, code FROM best WHERE rn = 1),
pex AS (
  SELECT vec_id AS query_id, d, x AS qx FROM ex WHERE vec_id < {_ADC_NQ}),
exd AS (
  SELECT pex.query_id, ex.vec_id,
         ROUND(SUM((ex.x - pex.qx) * (ex.x - pex.qx)) + 1e-9, 6) AS dist
  FROM ex JOIN pex USING (d)
  WHERE ex.vec_id != pex.query_id
  GROUP BY 1, 2),
exkr AS (
  SELECT query_id, vec_id, rn FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY dist, vec_id) AS rn
    FROM exd) t
  WHERE rn <= {_ADC_K}),
adc AS (
  SELECT pex.query_id,
         CAST((cb.d - 1) // {_PQ_SUBDIM} AS INT) AS sub,
         cb.code,
         ROUND(SUM((pex.qx - cb.c) * (pex.qx - cb.c)) + 1e-9, 6) AS pdist
  FROM pex JOIN cb USING (d)
  GROUP BY 1, 2, 3),
adcd AS (
  SELECT adc.query_id, codes.vec_id,
         ROUND(SUM(pdist) + 1e-9, 6) AS adist
  FROM codes JOIN adc USING (sub, code)
  WHERE codes.vec_id != adc.query_id
  GROUP BY 1, 2),
adckr AS (
  SELECT query_id, vec_id, rn FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adist, vec_id) AS rn
    FROM adcd) t
  WHERE rn <= {_ADC_K})"""

_PQ_RECALL_SQL = f"""
WITH {_PQ_COMMON_SQL}{_PQ_SEARCH_CTES},
exk AS (SELECT query_id, vec_id FROM exkr),
adck AS (SELECT query_id, vec_id FROM adckr),
hits AS (
  SELECT COUNT(*) AS n_hits
  FROM exk JOIN adck USING (query_id, vec_id))
SELECT (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) FROM exk)
           AS n_queries,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM exk) AS n_exact_pairs,
       CAST(n_hits AS BIGINT) AS n_hits,
       ROUND(n_hits / (SELECT COUNT(*) FROM exk) + 1e-9, 4) AS recall
FROM hits
"""


def _compose_pq_recall_sql() -> str:
    from .augment import _MULT_HASH_SQL

    return _PQ_RECALL_SQL.format(hash=_MULT_HASH_SQL)


def _compose_pq_eval_sql() -> str:
    from .augment import _MULT_HASH_SQL

    head = f"""
WITH {_PQ_COMMON_SQL}{_PQ_SEARCH_CTES},
exact AS (SELECT query_id, vec_id AS cand_id,
                 CAST(rn AS BIGINT) AS exact_rank FROM exkr),
approxr AS (SELECT query_id, vec_id AS cand_id,
                   CAST(rn AS BIGINT) AS rank FROM adckr)"""
    return head.format(hash=_MULT_HASH_SQL) + _graded_tail_sql(_ADC_K)


#: Radius-NN geometry: neighbors within euclidean 0.02 in the first
#: two embedding dims; grid cell edge = the radius, so the 3x3
#: neighborhood is a lossless candidate superset.
_NN_R = 0.02


def join_nn_radius_2d(spark: SparkSession, sf: str) -> DataFrame:
    """GRID-BINNED RADIUS NEAREST NEIGHBOR — the spatial-join
    primitive (geo points, 2D projections of embeddings): for every
    point, the nearest other point within radius R in the (dim1,
    dim2) plane, found by snapping points to an R-edge grid and
    joining each point's 3x3 cell neighborhood — an EQUI join on the
    cell key, never an all-pairs distance cross. The 3x3 ring is
    lossless for radius R (any point within R lies in an adjacent
    cell), and each candidate pair arises from exactly ONE offset
    (the offset is determined by the two cells), so no dedup pass is
    needed. floor() (not int cast) bins negative coordinates
    correctly in both engines; distances round at 6dp before the
    radius cut and the argmin (nn_id tiebreak), the house ranking
    discipline. Points with no in-radius neighbor drop out
    (424-435/500 match at sf0.01, measured non-trivial).

    Scale shape: one equi-shuffle on the cell key; the 9x fan-out is
    a constant; per-cell candidate counts are density-bounded. This
    is the same binned-equi recipe as join_range_interval (1D time)
    and join_interval_overlap (intervals), extended to 2D."""
    emb = _emb(spark, sf)
    pts = emb.select(
        "vec_id",
        F.element_at("v", 1).alias("x"),
        F.element_at("v", 2).alias("y"),
    ).select(
        "vec_id",
        "x",
        "y",
        F.floor(F.col("x") / F.lit(_NN_R)).cast("int").alias("cx"),
        F.floor(F.col("y") / F.lit(_NN_R)).cast("int").alias("cy"),
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = pts.select(
        "vec_id", "x", "y", "cx", "cy", F.explode(offs).alias("o")
    ).select(
        "vec_id",
        "x",
        "y",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    b = pts.select(
        F.col("vec_id").alias("nn_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    d2 = F.round(
        (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
        + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by"))
        + 1e-9,
        6,
    )
    scored = (
        a.join(b, ["jx", "jy"])
        .where(F.col("nn_id") != F.col("vec_id"))
        .select("vec_id", "nn_id", d2.alias("d2"))
        .where(F.col("d2") <= F.lit(_NN_R * _NN_R))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("nn_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", "nn_id", F.col("d2").alias("nn_dist2"))
    )


_NN_RADIUS_SQL = f"""
WITH e AS ({_EMB_SQL}),
p AS (
  SELECT vec_id, CAST(v[1] AS DOUBLE) AS x, CAST(v[2] AS DOUBLE) AS y
  FROM e),
c AS (
  SELECT vec_id, x, y,
         CAST(floor(x / {_NN_R}) AS INT) AS cx,
         CAST(floor(y / {_NN_R}) AS INT) AS cy
  FROM p),
a AS (
  SELECT c.vec_id, c.x, c.y,
         c.cx + dx.o AS jx, c.cy + dy.o AS jy
  FROM c, (VALUES (-1), (0), (1)) dx(o), (VALUES (-1), (0), (1)) dy(o)),
cand AS (
  SELECT a.vec_id, b.vec_id AS nn_id,
         ROUND((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
               + 1e-9, 6) AS d2
  FROM a JOIN c b ON b.cx = a.jx AND b.cy = a.jy
                 AND b.vec_id != a.vec_id)
SELECT vec_id, nn_id, d2 AS nn_dist2 FROM (
  SELECT vec_id, nn_id, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY d2, nn_id) AS rk
  FROM cand WHERE d2 <= {_NN_R * _NN_R}) t
WHERE rk = 1
"""


#: matryoshka probe shape: 20 query vectors, top-10, 16-dim prefix of 64
_MRL_QUERIES = 20
_MRL_K = 10
_MRL_DIM = 16


def emb_matryoshka_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Matryoshka-prefix retrieval quality (Kusupati et al., MRL): how
    much of the exact full-dimension cosine top-10 survives when the
    scan uses only each vector's FIRST 16 of 64 coordinates — the
    4×-cheaper truncated-embedding retrieval modern embedding models
    are trained to support. Per-query n_hit and recall@10 over a
    20-query probe set; fully deterministic (both scans round cosines
    at 6dp with cand_id tiebreak), so the recall VALUES are
    oracle-checked, not a floor — the sim_pq_recall discipline.

    Scale shape: two broadcast-query brute scans (each linear in the
    corpus, the exact-baseline recipe of ext_sim_search) joined on
    (query, candidate); the prefix scan reads 4× fewer floats per
    candidate, which is the whole MRL trade being measured."""
    full = _exact_topk(spark, sf, _MRL_QUERIES, _MRL_K).select(
        "query_id", "cand_id"
    )
    pref = (
        _exact_topk(spark, sf, _MRL_QUERIES, _MRL_K, dim=_MRL_DIM)
        .select("query_id", "cand_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        full.join(pref, ["query_id", "cand_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_hit"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))) / F.lit(float(_MRL_K))
                + 1e-9,
                4,
            ).alias("recall_at_10"),
        )
    )


_MRL_TOPK_TMPL = """
SELECT query_id, cand_id FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         {cos} AS cosine,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY {cos} DESC, c.vec_id) AS rank
  FROM {src} q JOIN {src} c ON c.vec_id != q.vec_id
  WHERE q.vec_id < {nq}) t
WHERE rank <= {k}
"""

_MRL_SQL = """
WITH e AS ({emb}),
p AS (SELECT vec_id, label, v[1:{dim}] AS v FROM e),
fullk AS ({fullk}),
prefk AS ({prefk})
SELECT f.query_id,
       CAST(SUM(CASE WHEN pr.cand_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       ROUND(SUM(CASE WHEN pr.cand_id IS NOT NULL THEN 1 ELSE 0 END)
             / {k}.0 + 1e-9, 4) AS recall_at_10
FROM fullk f
LEFT JOIN prefk pr
  ON pr.query_id = f.query_id AND pr.cand_id = f.cand_id
GROUP BY 1
""".format(
    emb=_EMB_SQL,
    dim=_MRL_DIM,
    k=_MRL_K,
    fullk=_MRL_TOPK_TMPL.format(
        src="e", cos=_COS_SQL.format(a="q", b="c"), nq=_MRL_QUERIES, k=_MRL_K
    ),
    prefk=_MRL_TOPK_TMPL.format(
        src="p", cos=_COS_SQL.format(a="q", b="c"), nq=_MRL_QUERIES, k=_MRL_K
    ),
)


#: kNN-graph shape: top-3 exact cosine neighbors for EVERY vector
_KNN_K = 3


def sim_knn_graph(spark: SparkSession, sf: str) -> DataFrame:
    """Exact k-NN GRAPH construction (k=3 cosine neighbors for EVERY
    vector) — the batch building block under graph-based ANN indexes
    (HNSW/NSG ground truth), embedding-cluster audits, and
    label-propagation over nearest-neighbor edges; ext_sim_search
    answers a probe set, this materializes the whole graph.

    Distributed shape — the dedup_embedding_cosine square grid,
    specialized for ordered pairs + top-k:
    - every ORDERED (query, candidate) pair meets in exactly one of
      the P² block groups (query block p replicated across columns,
      candidate block q across rows);
    - each group runs ONE BLAS matmul, then keeps only its BLOCK-LOCAL
      top-k per query under the global total order (rounded cosine
      desc, nn_id asc — candidate columns pre-sorted by id so a stable
      argsort inherits the tie-break). A block's local top-k is a
      superset of its members in the global top-k, so correctness is
      preserved while each group emits k rows per query instead of a
      full score row — the shuffle after the matmul is n·P·k rows,
      not n²;
    - one per-query window over P·k candidate rows merges to the
      global top-k.
    Compute stays exact-quadratic by design (this IS the ground-truth
    oracle); the approximate 10⁹-scale path is sim_knn_graph_ivf
    (built r12 — IVF-cell-blocked, recall-pinned against this op by
    sim_knn_graph_ivf_recall, 34 s where this took 503 s at 200k
    vectors) with IVF/PQ probes (sim_ivf_topk, sim_pq_recall) as the
    point-query forms.

    Measured handoff (r11 100× probe, artifacts/scale_probe_r11.json):
    2k vectors 1.2 s → 200k vectors 503 s on 32 cores (4.3× per input
    at 100× input — the n² contract visible once overheads wash out),
    output rows exactly n·k. Extrapolating n²: ~1M vectors ≈ 3.5 h,
    so on this hardware class the exact graph stops being an
    interactive tool around n ≈ 10⁵–10⁶ — that is the handoff point
    to sim_knn_graph_ivf (built r12); beyond it this op remains the
    sampled ground-truth recall oracle (run on a stratified subset,
    exactly how sim_knn_graph_ivf_recall consumes it), not the
    production path. The
    probe's kernel split shows the cost is in-worker compute
    (matmul + the stable full-row argsort), not the Arrow exchange —
    the n·P·k emit keeps the post-matmul shuffle negligible."""
    import math
    import os

    emb = _emb(spark, sf).select("vec_id", "v")
    dp = spark.sparkContext.defaultParallelism
    # Block count: enough groups for the cores, AND a hard cap on
    # block ROW size — each group materializes an (n/P)² float64
    # cosine matrix, so P must grow LINEARLY with n beyond the point
    # where sqrt(2·cores) blocks leave >4096 rows per block (4096² ×
    # 8 B ≈ 134 MB per task; the r10 sqrt-only sizing would have built
    # a 5 GB matrix per task at the 100× probe's 200k vectors). The
    # count() is parquet-metadata-cheap and keeps the sizing
    # data-driven rather than config-guessed. Group count grows as
    # (n/4096)² — the exact-quadratic compute is this op's stated
    # ground-truth contract; see the 100× probe + IVF/PQ handoff note
    # below.
    n = emb.count()
    P = int(os.environ.get("SPARK_GRAFT_COSINE_BLOCKS", 0)) or max(
        2, round(math.sqrt(2 * dp)), math.ceil(n / 4096)
    )
    blk = F.pmod(F.col("vec_id"), F.lit(P)).cast("int")
    grid = F.explode(F.sequence(F.lit(0), F.lit(P - 1)))
    q = emb.select(
        "vec_id", "v", blk.alias("bq"), grid.alias("bc"), F.lit(0).alias("side")
    )
    c = emb.select(
        "vec_id", "v", grid.alias("bq"), blk.alias("bc"), F.lit(1).alias("side")
    )
    both = q.unionByName(c)
    k = _KNN_K

    def block(pdf):
        import numpy as np
        import pandas as pd

        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1]
        empty = pd.DataFrame(
            {
                "vec_id": np.array([], dtype=np.int64),
                "nn_id": np.array([], dtype=np.int64),
                "cosine": np.array([], dtype=np.float64),
            }
        )
        if len(a) == 0 or len(b) == 0:
            return empty
        # candidate columns ordered by id: a STABLE descending-cosine
        # argsort then breaks ties by ascending nn_id, the global order
        b = b.sort_values("vec_id")
        A = np.vstack(a["v"].to_numpy())
        A /= np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
        B = np.vstack(b["v"].to_numpy())
        B /= np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-300)
        a_ids = a["vec_id"].to_numpy(dtype=np.int64)
        b_ids = b["vec_id"].to_numpy(dtype=np.int64)
        # half-away-from-zero to 6 dp, matching Spark ROUND / DuckDB
        # ROUND (ADVICE r10: np.round is banker's half-to-even — the
        # one rounding mode in the repo that differed from its oracle;
        # cosines here are in [-1, 1] so the sign split is exact)
        raw = A @ B.T + 1e-9
        cos = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
        cos[a_ids[:, None] == b_ids[None, :]] = -2.0  # exclude self
        kk = min(k, cos.shape[1])
        order = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(a_ids, kk)
        nn = b_ids[order].ravel()
        cs = np.take_along_axis(cos, order, axis=1).ravel()
        keep = cs > -2.0
        return pd.DataFrame(
            {"vec_id": rows[keep], "nn_id": nn[keep], "cosine": cs[keep]}
        )

    local = both.groupBy("bq", "bc").applyInPandas(
        block, schema="vec_id bigint, nn_id bigint, cosine double"
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("vec_id", "nn_id", "rank", "cosine")
    )


_KNN_GRAPH_SQL = """
WITH e AS ({emb}),
scored AS (
  SELECT q.vec_id AS vec_id, c.vec_id AS nn_id, {cos} AS cosine
  FROM e q JOIN e c ON c.vec_id != q.vec_id)
SELECT vec_id, nn_id, rank, cosine FROM (
  SELECT vec_id, nn_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, nn_id) AS BIGINT) AS rank
  FROM scored) t
WHERE rank <= {k}
""".format(emb=_EMB_SQL, cos=_COS_SQL.format(a="q", b="c"), k=_KNN_K)


_IVF_GRAPH_CELLS_FLOOR = 16
_IVF_GRAPH_NPROBE = 2

# DuckDB-side mirror of _ivf_cells(): GREATEST(floor, CEIL(SQRT(n)))
# over the live seed-corpus count. CAST-to-DOUBLE is exact below 2^53,
# SQRT is IEEE-754 correctly rounded in both engines (hardware sqrt /
# libm), CEIL is exact — so the derived cell count can never differ
# between Spark and the oracle. {seed_where} restricts the seed corpus
# (empty for the self-graph; a side predicate for the cross join).
_IVF_CELLS_SQL_T = (
    "GREATEST({floor}, CAST(CEIL(SQRT((SELECT COUNT(*) FROM embeddings"
    "{{seed_where}}))) AS BIGINT))"
).format(floor=_IVF_GRAPH_CELLS_FLOOR)
_IVF_CELLS_SQL = _IVF_CELLS_SQL_T.format(seed_where="")


def _ivf_cells(n: int) -> int:
    """Cell count for the IVF graph family: max(16, ⌈√n⌉) — the faiss
    sizing rule IS the default (VERDICT r12 item 2: the former fixed
    k=16 default was O(n²) by the builder's own ×100 probe — ×10,040
    candidate volume; a default that needs an env var to be scale-safe
    ships quadratic jobs). Derived from the live corpus count and
    mirrored exactly in the DuckDB oracles via _IVF_CELLS_SQL, so the
    driver hash check covers the derived-k path. math.sqrt is IEEE
    correctly rounded, matching the oracle's SQRT bit-for-bit.
    SPARK_GRAFT_IVF_CELLS still overrides for scale probes (engine
    side only — probes never compare against the oracle)."""
    import math
    import os

    env = int(os.environ.get("SPARK_GRAFT_IVF_CELLS", 0))
    return env or max(_IVF_GRAPH_CELLS_FLOOR, math.ceil(math.sqrt(n)))


def _ivf_graph_ranked(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic coarse-quantizer cell ranks for the IVF graph:
    every vector's distance to the k = max(16, ⌈√n⌉) SEEDED
    one-Lloyd-step centroids (seeds = the k lowest vec_ids — the
    emb_kmeans_step recipe, which unlike MLlib KMeans is
    byte-reproducible in DuckDB), rounded at 6dp before the rank so
    float noise can never flip a cell choice between engines. Returns
    (vec_id, cid, rk) for rk ≤ nprobe; rk=1 is the vector's HOME cell
    (its assignment), rk=2 its second probe.

    Shape: one driver-scalar corpus count (parquet-footer-dominated —
    sizes k), then one posexplode dim-stream join against a broadcast
    k×d centroid frame → hash agg per (vec, cid) → one window rank —
    the emb_nearest_centroid shape, linear in n·d·k; with k ~ √n the
    assignment scan is O(n^1.5·d) and the broadcast frame is √n·d
    rows (10⁹ vectors × 64 dims → ~32k×64 ≈ 2M doubles — still a
    comfortable broadcast)."""
    emb = _emb(spark, sf)
    return _ranked_cells(emb, emb)


def _ranked_cells(emb: DataFrame, seed_src: DataFrame) -> DataFrame:
    """Core of _ivf_graph_ranked, parametrized on the seed source so
    the cross-corpus join can seed centroids from the INDEX side only
    (sim_ann_cross_join) while ranking EVERY vector in ``emb``. Cell
    count derives from |seed_src| via _ivf_cells.

    Execution shape (optimization r15, guide §2.4/§4.2): the k×d seed
    centroid block is pulled once (bounded — the SAME k×d frame the
    pre-r15 plan broadcast to every task; √n·d rows, the docstring
    bound the family already publishes) and the whole rank is ONE
    Arrow-batched mapInPandas kernel over the raw vector rows: rounded
    squared distances to all k centroids chunk-wise, stable argsort
    over cid-ascending columns → the nprobe nearest cells per vector.
    The pre-r15 plan paid, per use, a posexplode dim-stream fan-out
    join (n·k·d rows through codegen), an n·k-row hash-aggregate
    EXCHANGE, and a row_number window (second exchange + sort) — per
    assignment, on every one of the ~8 IVF-family keys that call this.
    Now the corpus crosses no shuffle at all for assignment, which is
    the faiss shape: an index probe is a map, not a shuffle. Values
    identical: same 6dp-rounded distance formula (half-away-from-zero,
    the house F.round mirror), same (dist, cid) total order — numpy
    stable argsort over cid-sorted columns ≡ ORDER BY dist, cid;
    accumulation-order noise vs the old hash aggregate is ~1e-15
    against the 6dp rounding, the established cross-engine
    tolerance."""
    import numpy as np

    k_cells = _ivf_cells(seed_src.count())
    seed_ids = seed_src.select("vec_id").orderBy("vec_id").limit(k_cells)
    seed_rows = (
        emb.join(F.broadcast(seed_ids), "vec_id").select("vec_id", "v").collect()
    )
    seed_rows.sort(key=lambda r: int(r["vec_id"]))
    cids = np.array([int(r["vec_id"]) for r in seed_rows], dtype=np.int64)
    C = np.array([[float(x) for x in r["v"]] for r in seed_rows])
    nprobe = _IVF_GRAPH_NPROBE

    # Chunk rows by a BYTE budget, not a fixed row count (optimization
    # r16, VERDICT r15 item 3): the (rows × k × d) float64 diff tensor
    # is the kernel's peak allocation, and k = √n by the family's
    # sizing rule — a fixed 1024-row chunk is ~16 GB per chunk at
    # n = 10⁹, d = 64. rows ≈ 64 MB / (k·d·8) keeps the tensor at
    # ~64 MB regardless of k; each chunk is also YIELDED as its own
    # frame so the (rows × k) distance matrix never accumulates
    # batch-wide (ADVICE r15 item 4). Values unchanged: the argsort is
    # per row, so chunking the rows cannot reorder anything.
    rows_per_chunk = _kernel_rows_per_chunk(len(cids), C.shape[1])

    def rank_cells(batches, C=C, cids=cids, nprobe=nprobe, rpc=rows_per_chunk):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf["v"].to_numpy())
            all_vids = pdf["vec_id"].to_numpy(dtype=np.int64)
            m = min(nprobe, len(cids))
            # same direct (x−c)² formula as the old aggregate (no
            # sum-of-squares expansion — keeps the cancellation
            # profile identical-class)
            for lo in range(0, len(X), rpc):
                hi = min(lo + rpc, len(X))
                d2 = ((X[lo:hi, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                d2 = d2 + 1e-9
                d2 = np.floor(d2 * 1e6 + 0.5) / 1e6
                order = np.argsort(d2, axis=1, kind="stable")[:, :m]
                yield pd.DataFrame(
                    {
                        "vec_id": np.repeat(all_vids[lo:hi], m),
                        "cid": cids[order].ravel(),
                        "rk": np.tile(
                            np.arange(1, m + 1, dtype=np.int32), hi - lo
                        ),
                    }
                )

    return emb.select("vec_id", "v").mapInPandas(
        rank_cells, schema="vec_id long, cid long, rk int"
    )


def _kernel_rows_per_chunk(k: int, d: int, budget_bytes: int = 64 << 20) -> int:
    """Row count per kernel chunk so the (rows × k × d) float64 diff
    tensor stays within ``budget_bytes`` (≥ 1 row always — a single
    row's k×d tensor is the irreducible minimum). Shared sizing for
    the distance kernels whose cell count k grows with the corpus
    (VERDICT r15 item 3)."""
    return max(1, budget_bytes // (max(1, k) * max(1, d) * 8))


def _cell_block_topk(k: int):
    """Shared per-cell BLAS kernel for the IVF family (sim_knn_graph_ivf
    and sim_ann_cross_join): queries are the rows with side=0, members
    side=1; one normalized matmul per cell group, emitting each query's
    block-local top-k by rounded cosine (6dp half-away-from-zero with
    the +1e-9 nudge — np.round is banker's, the ADVICE r10 lesson),
    tie-broken by ascending member id via a stable argsort over
    id-sorted columns. Self-pairs (same id on both sides) are excluded;
    cross-corpus callers have disjoint ids, so the mask is a no-op
    there."""

    def block(pdf):
        import numpy as np
        import pandas as pd

        a = pdf[pdf["side"] == 0]
        b = pdf[pdf["side"] == 1]
        empty = pd.DataFrame(
            {
                "vec_id": np.array([], dtype=np.int64),
                "nn_id": np.array([], dtype=np.int64),
                "cosine": np.array([], dtype=np.float64),
            }
        )
        if len(a) == 0 or len(b) == 0:
            return empty
        # candidate columns ordered by id: a STABLE descending-cosine
        # argsort then breaks ties by ascending nn_id (global order)
        b = b.sort_values("vec_id")
        A = np.vstack(a["v"].to_numpy())
        A /= np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
        B = np.vstack(b["v"].to_numpy())
        B /= np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-300)
        a_ids = a["vec_id"].to_numpy(dtype=np.int64)
        b_ids = b["vec_id"].to_numpy(dtype=np.int64)
        # half-away-from-zero at 6dp (np.round is banker's — ADVICE r10)
        raw = A @ B.T + 1e-9
        cos = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
        cos[a_ids[:, None] == b_ids[None, :]] = -2.0  # exclude self
        kk = min(k, cos.shape[1])
        order = np.argsort(-cos, axis=1, kind="stable")[:, :kk]
        rows = np.repeat(a_ids, kk)
        nn = b_ids[order].ravel()
        cs = np.take_along_axis(cos, order, axis=1).ravel()
        keep = cs > -2.0
        return pd.DataFrame(
            {"vec_id": rows[keep], "nn_id": nn[keep], "cosine": cs[keep]}
        )

    return block


def sim_knn_graph_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """APPROXIMATE k-NN graph via IVF-cell-blocked candidates — the
    10⁵–10⁶-vector handoff the r11 100× probe priced for the
    exact-quadratic sim_knn_graph (VERDICT r11 item 3: 503 s at 200k
    vectors, ~3.5 h extrapolated at 1M — the exact graph stays the
    sampled ground-truth oracle; THIS op is the production path).

    Semantics: each vector probes its nprobe=2 nearest of
    k = max(16, ⌈√n⌉) deterministic coarse-quantizer cells (seeded
    one-Lloyd-step centroids — _ivf_graph_ranked; the faiss sizing
    rule is the DEFAULT since r13, derived from the live corpus count
    and mirrored in the oracle) and takes its exact-cosine top-3
    among the vectors ASSIGNED to those cells. FULLY ORACLED (as is
    sim_ivf_topk since its r15 graduation onto this same quantizer):
    the seeded centroids, rounded
    distances, and id tiebreaks reproduce byte-identically in DuckDB,
    so the driver hash checks the whole approximate graph, not just a
    recall summary (that bound lives in sim_knn_graph_ivf_recall).

    Scale shape: candidate generation is cell-blocked — members
    shuffle once (n rows), probers nprobe× (2n rows), and each cell
    group runs ONE BLAS matmul over |probers(cell)| × |members(cell)|
    emitting only its block-local top-k per prober (the sim_knn_graph
    kernel, minus the P² grid): compute is Σ_cell p_c·m_c ≈
    nprobe·n²/k_cells — and because k_cells = max(16, ⌈√n⌉) BY
    DEFAULT (r13: the faiss rule moved from the SPARK_GRAFT_IVF_CELLS
    env knob into the code path the oracle certifies), the scan is
    O(n^1.5) out of the box, with the post-matmul shuffle at
    n·nprobe·k rows. The final window merges each vector's ≤ nprobe·k
    block-local rows.

    Margin audit (r12): rounded-distance cell ranks tie-break on cid
    and rounded cosines on nn_id (both engines); a rank-2-probed cell
    with zero assigned members contributes no candidates in either
    engine (inner join vs empty member frame); vectors in a singleton
    cell with no second-probe candidates emit < k rows identically.
    Measured recall vs the exact graph: see sim_knn_graph_ivf_recall
    (pinned with ~3× margin)."""
    from ..util import persist_tracked

    emb = persist_tracked(_emb(spark, sf).select("vec_id", "v"))
    ranked = persist_tracked(_ivf_graph_ranked(spark, sf))
    members = (
        ranked.where(F.col("rk") == 1)
        .join(emb, "vec_id")
        .select(
            F.col("cid").alias("cell"), "vec_id", "v", F.lit(1).alias("side")
        )
    )
    probers = ranked.join(emb, "vec_id").select(
        F.col("cid").alias("cell"), "vec_id", "v", F.lit(0).alias("side")
    )
    both = probers.unionByName(members)
    local = both.groupBy("cell").applyInPandas(
        _cell_block_topk(_KNN_K),
        schema="vec_id bigint, nn_id bigint, cosine double",
    )
    k = _KNN_K
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("vec_id", "nn_id", "rank", "cosine")
    )


_IVF_RANKED_TEMPLATE = """
ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings),
seeds AS (SELECT vec_id FROM embeddings{seed_where}
          ORDER BY vec_id LIMIT {cells}),
cent0 AS (
  SELECT ex.vec_id AS cid, d, x AS c
  FROM ex JOIN seeds ON ex.vec_id = seeds.vec_id),
dist2 AS (
  SELECT ex.vec_id, cid, ROUND(SUM((x - c) * (x - c)) + 1e-9, 6) AS dist
  FROM ex JOIN cent0 USING (d) GROUP BY 1, 2),
ranked AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
  FROM dist2)
"""
_IVF_GRAPH_RANKED_SQL = _IVF_RANKED_TEMPLATE.format(
    seed_where="", cells=_IVF_CELLS_SQL
)
# Cross-corpus variant (sim_ann_cross_join): centroids seeded from —
# and sized by — the INDEX side (even vec_ids) only; ranks still cover
# every vector so the query side gets its probes from the same frame.
_IVF_CROSS_SEED_WHERE = " WHERE vec_id % 2 = 0"
_IVF_CROSS_RANKED_SQL = _IVF_RANKED_TEMPLATE.format(
    seed_where=_IVF_CROSS_SEED_WHERE,
    cells=_IVF_CELLS_SQL_T.format(seed_where=_IVF_CROSS_SEED_WHERE),
)


_KNN_GRAPH_IVF_SQL = """
WITH e AS ({emb}),
{ranked},
assign AS (SELECT vec_id, cid AS cell FROM ranked WHERE rk = 1),
probes AS (SELECT vec_id, cid AS cell FROM ranked WHERE rk <= {nprobe}),
cand AS (
  SELECT p.vec_id AS query_id, a.vec_id AS cand_id
  FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id != p.vec_id),
scored AS (
  SELECT cand.query_id AS vec_id, cand.cand_id AS nn_id, {cos} AS cosine
  FROM cand JOIN e q ON q.vec_id = cand.query_id
            JOIN e c ON c.vec_id = cand.cand_id)
SELECT vec_id, nn_id, rank, cosine FROM (
  SELECT vec_id, nn_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, nn_id) AS BIGINT) AS rank
  FROM scored) t
WHERE rank <= {k}
""".format(
    emb=_EMB_SQL,
    ranked=_IVF_GRAPH_RANKED_SQL,
    nprobe=_IVF_GRAPH_NPROBE,
    cos=_COS_SQL.format(a="q", b="c"),
    k=_KNN_K,
)


# sim_ivf_topk (r15, house deterministic IVF): same ranked-cell CTEs
# as the graph oracle, probes restricted to the query set. The CTE
# chain is a template shared with sim_eval_mrr_ndcg's oracle
# (compose-don't-copy): it yields `ivf` = (query_id, cand_id,
# cosine, rank ≤ k).
def _ivf_topk_ctes(nq: int, k: int) -> str:
    return """{ranked},
assign AS (SELECT vec_id, cid AS cell FROM ranked WHERE rk = 1),
probes AS (SELECT vec_id, cid AS cell FROM ranked
           WHERE rk <= {nprobe} AND vec_id < {nq}),
cand AS (
  SELECT p.vec_id AS query_id, a.vec_id AS cand_id
  FROM probes p JOIN assign a ON a.cell = p.cell AND a.vec_id != p.vec_id),
scored AS (
  SELECT cand.query_id, cand.cand_id, {cos} AS cosine
  FROM cand JOIN e q ON q.vec_id = cand.query_id
            JOIN e c ON c.vec_id = cand.cand_id),
ivf AS (
  SELECT query_id, cand_id, cosine, rank FROM (
    SELECT query_id, cand_id, cosine,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, cand_id) AS BIGINT)
             AS rank
    FROM scored) t
  WHERE rank <= {k})""".format(
        ranked=_IVF_GRAPH_RANKED_SQL,
        nprobe=_IVF_GRAPH_NPROBE,
        cos=_COS_SQL.format(a="q", b="c"),
        nq=nq,
        k=k,
    )


_IVF_TOPK_SQL = (
    "WITH e AS ({emb}),\n".format(emb=_EMB_SQL)
    + _ivf_topk_ctes(_IVF_TOPK_QUERIES, _IVF_TOPK_K)
    + "\nSELECT query_id, cand_id, cosine, rank FROM ivf"
)


_EVAL_K = 10


def sim_eval_mrr_ndcg(spark: SparkSession, sf: str) -> DataFrame:
    """Graded retrieval metrics for the IVF index (VERDICT r14 item
    6): MRR@10 and nDCG@10 of the house deterministic-IVF ranking
    (_house_ivf_topk at the wide 50-query probe set) against the
    exact-cosine ground truth (_exact_topk, k=10) — recall floors say
    whether a neighbor was FOUND; these say whether the ranking is
    USABLE, the eval a real ANN user runs next. Exact and
    deterministic end to end (6dp-rounded cosines + id tie-breaks on
    both sides), so the VALUES oracle-check — unlike the recall pins,
    which only pin a boolean floor.

    Definitions (standard graded formulation, Järvelin & Kekäläinen
    2002): relevance of candidate c for query q = 11 − exact_rank(q,c)
    if c is in q's exact top-10, else 0; DCG@10 = Σ_i gain(i)/log2(i+1)
    over the IVF ranking positions i; IDCG@10 = the same sum over the
    exact ranking itself (per query, so a short exact list degrades
    gracefully); nDCG = DCG/IDCG. MRR@10 = 1/(first IVF position whose
    candidate is exact-relevant), 0 if none. log2 spelled ln(x)/ln(2)
    on BOTH engines (DuckDB's log2 and Spark's log(2,x) need not share
    last-ulp behavior; the quotient of the same two libm calls does,
    and the 6dp round + 1e-9 nudge absorbs any residual ulp).

    Scale shape: the IVF side is the index-probe path (see
    sim_ivf_topk); the exact side is the ground-truth scan the eval
    REQUIRES (nq·n, query side broadcast — the _exact_topk shape,
    bounded by the 50-query probe set, never corpus×corpus); the
    metric join is ≤ nq·k rows. Margin audit (r15): every division's
    denominator is structurally nonzero (idcg ≥ gain(1)/1 > 0
    whenever the query emits rows; first_hit ≥ 1; ln(rank+1) ≥ ln 2);
    a query whose probed cells hold only itself emits no IVF rows and
    drops from BOTH engines identically; measured at sf0.01: 50
    queries, MRR@10 = 1.0 for every query (the exact-best neighbor
    shares a probed cell — the √n-cell index keeps rank-1 recall
    perfect here) while nDCG@10 spans 0.033-1.0, mean 0.645 (the TAIL
    of the exact top-10 is what 2-probe IVF misses on a random
    corpus) — both verdict classes non-vacuous, values pinned
    exactly."""
    from ..util import persist_tracked

    exact = persist_tracked(
        _exact_topk(spark, sf, n_queries=_RECALL_QUERIES, k=_EVAL_K).select(
            "query_id", "cand_id", F.col("rank").alias("exact_rank")
        )
    )
    approx = _house_ivf_topk(spark, sf, _RECALL_QUERIES, _EVAL_K).select(
        "query_id", "cand_id", F.col("rank").alias("approx_rank")
    )
    return _graded_metrics(exact, approx, _EVAL_K)


def _graded_metrics(
    exact: DataFrame, approx: DataFrame, k: int
) -> DataFrame:
    """Shared MRR@k / nDCG@k block (sim_eval_mrr_ndcg and
    sim_eval_pq_mrr_ndcg): ``exact`` = (query_id, cand_id,
    exact_rank ≤ k), ``approx`` = (query_id, cand_id, approx_rank ≤
    k). Mirrored by _GRADED_TAIL_SQL — keep the two in lockstep."""
    kp1 = float(k + 1)
    gain = F.lit(kp1) - F.col("exact_rank")
    log2_ap = F.log(F.col("approx_rank") + 1) / F.log(F.lit(2.0))
    j = approx.join(exact, ["query_id", "cand_id"], "left")
    perq = j.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_retrieved"),
        F.sum(
            F.when(F.col("exact_rank").isNotNull(), gain / log2_ap).otherwise(
                0.0
            )
        ).alias("dcg"),
        F.min(
            F.when(F.col("exact_rank").isNotNull(), F.col("approx_rank"))
        ).alias("first_hit"),
    )
    idcg = exact.groupBy("query_id").agg(
        F.sum(
            (F.lit(kp1) - F.col("exact_rank"))
            / (F.log(F.col("exact_rank") + 1) / F.log(F.lit(2.0)))
        ).alias("idcg")
    )
    return perq.join(idcg, "query_id").select(
        "query_id",
        "n_retrieved",
        F.round(
            F.when(
                F.col("first_hit").isNotNull(), 1.0 / F.col("first_hit")
            ).otherwise(0.0)
            + 1e-9,
            6,
        ).alias(f"mrr_at{k}"),
        F.round(F.col("dcg") / F.col("idcg") + 1e-9, 6).alias(f"ndcg_at{k}"),
    )


def _graded_tail_sql(k: int) -> str:
    """SQL twin of _graded_metrics: expects CTEs ``exact`` =
    (query_id, cand_id, exact_rank) and ``approxr`` = (query_id,
    cand_id, rank)."""
    return """,
j AS (
  SELECT ar.query_id, ar.rank AS approx_rank, ex.exact_rank
  FROM approxr ar LEFT JOIN exact ex
    ON ex.query_id = ar.query_id AND ex.cand_id = ar.cand_id),
perq AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_retrieved,
         SUM(CASE WHEN exact_rank IS NOT NULL
                  THEN ({kp1} - exact_rank) / (ln(approx_rank + 1) / ln(2))
                  ELSE 0.0 END) AS dcg,
         MIN(CASE WHEN exact_rank IS NOT NULL THEN approx_rank END)
           AS first_hit
  FROM j GROUP BY 1),
idcg AS (
  SELECT query_id,
         SUM(({kp1} - exact_rank) / (ln(exact_rank + 1) / ln(2))) AS idcg
  FROM exact GROUP BY 1)
SELECT p.query_id, p.n_retrieved,
       ROUND(CASE WHEN p.first_hit IS NOT NULL THEN 1.0 / p.first_hit
                  ELSE 0.0 END + 1e-9, 6) AS mrr_at{k},
       ROUND(p.dcg / i.idcg + 1e-9, 6) AS ndcg_at{k}
FROM perq p JOIN idcg i ON i.query_id = p.query_id
""".format(kp1=float(k + 1), k=k)


_EVAL_MRR_SQL = (
    "WITH e AS ({emb}),\n".format(emb=_EMB_SQL)
    + _ivf_topk_ctes(_RECALL_QUERIES, _EVAL_K)
    + """,
exact AS (
  SELECT query_id, cand_id, rank AS exact_rank FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {cos} DESC, c.vec_id) AS BIGINT)
             AS rank
    FROM e q JOIN e c ON c.vec_id != q.vec_id
    WHERE q.vec_id < {nq}) t
  WHERE rank <= {k}),
approxr AS (SELECT query_id, cand_id, rank FROM ivf)""".format(
        cos=_COS_SQL.format(a="q", b="c"),
        nq=_RECALL_QUERIES,
        k=_EVAL_K,
    )
    + _graded_tail_sql(_EVAL_K)
)


_SEMDEDUP_TAU = 0.4


def dedup_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style SEMANTIC dedup (Abbas et al. 2023, arXiv
    2303.09540 — cluster the embedding space, then drop near-identical
    members within each cluster; VERDICT r11 item 6b): vectors are
    clustered by the deterministic 16-cell coarse quantizer
    (_ivf_graph_ranked rk=1 — the paper uses converged k-means; the
    seeded one-step form keeps the whole op byte-reproducible in
    DuckDB, and emb_kmeans_converged remains the converged
    reference), and within each cell a vector is DROPPED when a
    LOWER-id cell-mate sits at cosine ≥ 0.4 (the keep-lowest-id
    one-pass rule; the paper keeps one random member per ε-ball,
    which is equally non-transitive — determinism is what makes this
    oracle-able). τ = 0.4 matches dedup_embedding_cosine's
    distribution-tail cut on this synthetic corpus (real corpora run
    ~0.95+). Since r13 the cell count is k = max(16, ⌈√n⌉) by default
    (_ivf_cells — derived in-query in both engines), not fixed 16.

    Surface: one row per DROPPED vector — (vec_id, cell, witness_id =
    its lowest-id qualifying cell-mate, cosine to that witness) — the
    drop list a pipeline anti-joins against (llm_data_pipeline_v5
    does exactly that).

    Scale shape: the pair work is CELL-BLOCKED (the SemDeDup point —
    never corpus×corpus): members shuffle ONCE on cell (n array
    rows), then each cell group runs one BLAS gram matmul and the
    vectorized first-qualifying-witness scan in-kernel — pair volume
    Σ_c m_c²/2 ≈ n²/(2·k_cells) never crosses a shuffle at all, and
    k_cells = max(16, ⌈√n⌉) by default (r13 — the faiss sizing rule
    is the code path, SPARK_GRAFT_IVF_CELLS now only overrides for
    probes) making compute O(n^1.5). The kernel replaced an earlier JVM zip_with
    pair join after the r12 100× probe priced that at ~5.6 µs/pair
    (191 s at 200k vectors) vs the BLAS shape's ~6× less — and it
    kills the pair-row shuffle entirely.

    Margin audit (r12, re-measured r13 under derived √n cells):
    output is non-vacuous at every sf (12 / 10 / 143 dropped at
    sf0.001/0.01/0.1);
    cosine rounds half-away-from-zero at 6dp with the +1e-9 nudge
    before BOTH the τ cut and the surface (np.round is banker's —
    the ADVICE r10 lesson, same kernel recipe as sim_knn_graph);
    witness ties cannot occur (first index over distinct sorted
    vec_ids); a singleton cell emits nothing in either engine; the
    kernel was cross-checked row-identical against the original
    JVM pair-join form at all three sfs before the swap."""
    from ..util import persist_tracked

    emb = _emb(spark, sf).select("vec_id", "v")
    cells = _ivf_graph_ranked(spark, sf).where(F.col("rk") == 1).select(
        "vec_id", F.col("cid").alias("cell")
    )
    m = persist_tracked(cells.join(emb, "vec_id"))
    tau = _SEMDEDUP_TAU

    def block(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "vec_id": np.array([], dtype=np.int64),
                "cell": np.array([], dtype=np.int64),
                "witness_id": np.array([], dtype=np.int64),
                "cosine": np.array([], dtype=np.float64),
            }
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        A = np.vstack(pdf["v"].to_numpy())
        A /= np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
        raw = A @ A.T + 1e-9
        cos = np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6
        # qualifying witness = STRICTLY EARLIER (lower-id) member at
        # cosine >= tau; ids are sorted, so mask[w, v] with w < v is
        # the strict upper triangle of the thresholded gram matrix
        mask = np.triu(cos >= tau, k=1)
        hit = mask.any(axis=0)
        if not hit.any():
            return empty
        w_idx = np.argmax(mask, axis=0)  # FIRST qualifying row per col
        cols = np.nonzero(hit)[0]
        rows = w_idx[cols]
        return pd.DataFrame(
            {
                "vec_id": ids[cols],
                "cell": pdf["cell"].to_numpy(dtype=np.int64)[cols],
                "witness_id": ids[rows],
                "cosine": cos[rows, cols],
            }
        )

    return m.groupBy("cell").applyInPandas(
        block,
        schema="vec_id bigint, cell bigint, witness_id bigint, cosine double",
    )


_SEMDEDUP_SQL = """
WITH e AS ({emb}),
{ranked},
assign AS (SELECT vec_id, cid AS cell FROM ranked WHERE rk = 1),
m AS (SELECT a.vec_id, a.cell, e.v FROM assign a JOIN e USING (vec_id)),
pairs AS (
  SELECT a.cell, a.vec_id AS vec_a, b.vec_id AS vec_b, {cos} AS cosine
  FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id < b.vec_id),
q AS (SELECT * FROM pairs WHERE cosine >= {tau}),
drops AS (
  SELECT vec_b AS vec_id, cell, vec_a AS witness_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY vec_b ORDER BY vec_a ASC) AS rk
  FROM q)
SELECT vec_id, cell, witness_id, cosine FROM drops WHERE rk = 1
""".format(
    emb=_EMB_SQL,
    ranked=_IVF_GRAPH_RANKED_SQL,
    cos=_COS_SQL.format(a="a", b="b"),
    tau=_SEMDEDUP_TAU,
)


def sim_knn_graph_ivf_recall(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-graph recall floor asserted against LIVE data, hash-checked
    — the sim_ivf_recall / dedup_near_recall pattern closing VERDICT
    r11 item 3's "recall pin vs sim_knn_graph": the approximate graph
    (sim_knn_graph_ivf's exact code path) must recover ≥ 25% of the
    EXACT cosine top-3 edges over a 50-query probe set (150 exact
    pairs — the binomial-margin size the r8 review established).

    Floor derivation (r12 margin audit, re-measured r13 under the
    derived √n cell default): measured recall 0.567 / 0.620 / 0.880
    at sf0.001 / 0.01 / 0.1 (UP from 0.513/0.560/0.560 at fixed 16 —
    smaller cells make the 2 probed ones tighter fits) — the 0.25 pin
    carries ≥ 2.3× headroom (a dip below it at true p≈0.57 over 150
    pairs is a < 1e-13 binomial event), and 0.25 is ≥ 2.9× the
    random-candidate baseline (nprobe/k_cells ≤ 2/23 of the corpus
    lands in probed cells), so the pin stays meaningful. Unlike sim_ivf_recall the
    graph under test is itself fully oracled — this key pins the
    APPROXIMATION QUALITY (cells are a good index), the graph key
    pins the SEMANTICS (cells compute what they claim).

    Scale shape: exact side is a broadcast-query brute-force scan —
    linear in corpus × 50 queries, the sampled-ground-truth protocol
    the exact sim_knn_graph docstring prescribes at 10⁹ vectors."""
    from ..util import persist_tracked

    # persist: `exact` feeds BOTH the semi-join and its own count
    exact = persist_tracked(
        _exact_topk(spark, sf, n_queries=_RECALL_QUERIES, k=_KNN_K)
        .select("query_id", "cand_id")
    )
    approx = sim_knn_graph_ivf(spark, sf).where(
        F.col("vec_id") < _RECALL_QUERIES
    ).select(
        F.col("vec_id").alias("query_id"), F.col("nn_id").alias("cand_id")
    )
    hit = exact.join(approx, ["query_id", "cand_id"], "left_semi")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_hit = hit.agg(F.count(F.lit(1)).alias("_n_hit"))
    return n_exact.crossJoin(F.broadcast(n_hit)).select(
        "n_exact_pairs",
        (F.col("_n_hit") >= 0.25 * F.col("n_exact_pairs")).alias(
            "recall_floor_met"
        ),
    )


_KNN_GRAPH_IVF_RECALL_SQL = """
WITH e AS ({emb}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {cos} AS cosine
  FROM e q JOIN e c ON c.vec_id != q.vec_id
  WHERE q.vec_id < {nq}),
topk AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, cand_id) AS rank
    FROM scored) t
  WHERE rank <= {k})
SELECT COUNT(*) AS n_exact_pairs, TRUE AS recall_floor_met FROM topk
""".format(
    emb=_EMB_SQL,
    cos=_COS_SQL.format(a="q", b="c"),
    nq=_RECALL_QUERIES,
    k=_KNN_K,
)


_DECONTAM_EVAL_N = 50
_DECONTAM_TAU = 0.35


def sim_ann_cross_join(spark: SparkSession, sf: str) -> DataFrame:
    """CROSS-CORPUS approximate-nearest-neighbor JOIN (VERDICT r12
    item 4) — the retrieval shape every prior op lacked: corpus B's
    queries joined to corpus A's nearest neighbors, where BOTH sides
    are large (no broadcast side). This is the semantic-level
    eval-contamination scan, the RAG index build, and the
    train/test-embedding-overlap audit in one operator. The two
    corpora are carved deterministically from the embeddings table
    (index side A = even vec_ids, query side B = odd — in production
    they are two tables; the carve keeps the op oracle-able on the
    fixed testdata without a second fixture).

    Semantics: coarse-quantizer cells are seeded from — and √n-sized
    by — the INDEX side only (k = max(16, ⌈√n_A⌉) lowest even ids;
    an index's cell structure must not depend on who queries it).
    A-side vectors are ASSIGNED to their nearest cell (rk=1); each
    B-side query probes its nprobe=2 nearest cells and takes its
    exact-cosine top-3 among the A-members of those cells. Fully
    oracled: seeded centroids, 6dp-rounded distances/cosines, and id
    tiebreaks reproduce byte-identically in DuckDB.

    Scale shape: identical to sim_knn_graph_ivf's — members shuffle
    once (n_A rows), probers nprobe× (2·n_B rows), one BLAS matmul
    per cell emitting block-local top-k, final window merges ≤
    nprobe·k rows per query. Compute ≈ nprobe·n_A·n_B/k_cells =
    O(n^1.5) under the √n default; NOTHING is broadcast-joined on the
    data path (the centroid frame is √n_A·d — the only broadcast).
    At 10⁹×10⁹ this is the faiss-on-Spark sharded-index recipe.

    Margin audit (r13): cells/rounding/tiebreak discipline inherited
    from sim_knn_graph_ivf verbatim (the shared _cell_block_topk
    kernel + _ranked_cells helper); disjoint sides make the kernel's
    self-pair mask a no-op; a probed cell with zero A-members emits
    no candidates in either engine; output non-vacuous at every sf
    (each odd query meets ≥ 1 even member through its probes on this
    data — verified 750/750/3000 rows at sf0.001/0.01/0.1)."""
    from ..util import persist_tracked

    emb = persist_tracked(_emb(spark, sf).select("vec_id", "v"))
    idx_side = emb.where(F.col("vec_id") % 2 == 0)
    ranked = persist_tracked(_ranked_cells(emb, idx_side))
    members = (
        ranked.where((F.col("rk") == 1) & (F.col("vec_id") % 2 == 0))
        .join(emb, "vec_id")
        .select(
            F.col("cid").alias("cell"), "vec_id", "v", F.lit(1).alias("side")
        )
    )
    probers = (
        ranked.where(F.col("vec_id") % 2 == 1)
        .join(emb, "vec_id")
        .select(
            F.col("cid").alias("cell"), "vec_id", "v", F.lit(0).alias("side")
        )
    )
    local = probers.unionByName(members).groupBy("cell").applyInPandas(
        _cell_block_topk(_KNN_K),
        schema="vec_id bigint, nn_id bigint, cosine double",
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _KNN_K)
        .select(
            F.col("vec_id").alias("query_id"), "nn_id", "rank", "cosine"
        )
    )


_ANN_CROSS_SQL = """
WITH e AS ({emb}),
{ranked},
assign AS (SELECT vec_id, cid AS cell FROM ranked
           WHERE vec_id % 2 = 0 AND rk = 1),
probes AS (SELECT vec_id, cid AS cell FROM ranked
           WHERE vec_id % 2 = 1 AND rk <= {nprobe}),
cand AS (
  SELECT p.vec_id AS query_id, a.vec_id AS cand_id
  FROM probes p JOIN assign a ON a.cell = p.cell),
scored AS (
  SELECT cand.query_id, cand.cand_id AS nn_id, {cos} AS cosine
  FROM cand JOIN e q ON q.vec_id = cand.query_id
            JOIN e c ON c.vec_id = cand.cand_id)
SELECT query_id, nn_id, rank, cosine FROM (
  SELECT query_id, nn_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, nn_id) AS BIGINT) AS rank
  FROM scored) t
WHERE rank <= {k}
""".format(
    emb=_EMB_SQL,
    ranked=_IVF_CROSS_RANKED_SQL,
    nprobe=_IVF_GRAPH_NPROBE,
    cos=_COS_SQL.format(a="q", b="c"),
    k=_KNN_K,
)


_CROSS_RECALL_QBOUND = 400  # odd ids < 400 → 200 probe queries


def sim_ann_cross_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-corpus ANN-join recall floor asserted against LIVE data,
    hash-checked (the sim_knn_graph_ivf_recall pattern, closing the
    VERDICT r12 item 4 done-bar): the approximate cross join must
    recover ≥ 12.5% of the EXACT cosine top-3 (query side vs the FULL
    index side) over a 200-query probe set (600 exact pairs — larger
    than the 50-query self-graph set because cross-corpus recall runs
    lower: no self-similar near-twin sits in the query's own cell).

    Floor derivation (r13 margin audit): measured recall 0.325 /
    0.285 / 0.220 at sf0.001/0.01/0.1 under the √n cell default — the
    0.125 pin has z ≤ −5.6 (≲1e-8 binomial tail per testdata
    regeneration) at every sf, and equals 2× the random-candidate
    baseline (nprobe/k_cells = 2/32) at the sf where k actually
    derives from √n; at the k=16-floor-clamped small sfs the pin
    coincides with the random baseline and the 2.3–2.6× measured
    margin is the meaningful number.

    Scale shape: exact side is a broadcast-query brute-force scan over
    the index side — linear in n_A × 200; the approximate side is the
    production operator filtered to the probe set."""
    from ..util import persist_tracked

    emb = _emb(spark, sf).select("vec_id", "v")
    q = emb.where(
        (F.col("vec_id") % 2 == 1) & (F.col("vec_id") < _CROSS_RECALL_QBOUND)
    ).select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    c = emb.where(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv")
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv")))
        * F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id", "cand_id", F.round(cos + 1e-9, 6).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    exact = persist_tracked(
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _KNN_K)
        .select("query_id", "cand_id")
    )
    approx = sim_ann_cross_join(spark, sf).where(
        F.col("query_id") < _CROSS_RECALL_QBOUND
    ).select("query_id", F.col("nn_id").alias("cand_id"))
    hit = exact.join(approx, ["query_id", "cand_id"], "left_semi")
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_hit = hit.agg(F.count(F.lit(1)).alias("_n_hit"))
    return n_exact.crossJoin(F.broadcast(n_hit)).select(
        "n_exact_pairs",
        (F.col("_n_hit") >= 0.125 * F.col("n_exact_pairs")).alias(
            "recall_floor_met"
        ),
    )


_ANN_CROSS_RECALL_SQL = """
WITH e AS ({emb}),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {cos} AS cosine
  FROM e q JOIN e c ON c.vec_id % 2 = 0
  WHERE q.vec_id % 2 = 1 AND q.vec_id < {qb}),
topk AS (
  SELECT query_id, cand_id FROM (
    SELECT query_id, cand_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, cand_id) AS rank
    FROM scored) t
  WHERE rank <= {k})
SELECT COUNT(*) AS n_exact_pairs, TRUE AS recall_floor_met FROM topk
""".format(
    emb=_EMB_SQL,
    cos=_COS_SQL.format(a="q", b="c"),
    qb=_CROSS_RECALL_QBOUND,
    k=_KNN_K,
)


def sim_semantic_decontam(spark: SparkSession, sf: str) -> DataFrame:
    """SEMANTIC decontamination flags — the embedding-level twin of
    text_contamination's 5-gram scan (VERDICT r12 item 4's composition
    target): a training document is CONTAMINATED when its embedding
    sits at cosine ≥ 0.35 of any eval-set embedding, even if no
    n-gram matches (paraphrased benchmark leakage — the failure mode
    the text-level scan cannot see). Eval set = vec_id < 50 (the
    engine's standing deterministic probe-set convention,
    _RECALL_QUERIES); τ = 0.35 is this corpus's ~p90 of best-match
    cosine (measured 44/450, 48/450, 202/1950 flagged at
    sf0.001/0.01/0.1 — non-vacuous, non-total at every sf; real
    corpora run ~0.8+). Surface: one row per contaminated train doc —
    (doc_id, eval_id = its BEST eval match with lowest-id tiebreak,
    cosine) — the drop list llm_data_pipeline_v7 anti-joins.

    Scale shape: the eval set is SMALL BY NATURE (benchmarks are
    thousands of rows, the corpus is billions), so this is an EXACT
    broadcast scan, not an ANN: eval broadcasts, one pass over the
    train side computes |eval| cosines per doc map-side and keeps the
    argmax — linear in n_train·|eval|·d, zero shuffle beyond the
    final filter. No recall caveat: unlike the IVF ops this flags
    EVERY doc over τ, which is what a decontamination contract needs
    (a missed contaminated doc is a silent eval leak). When the eval
    side outgrows broadcast (~10⁷+), sim_ann_cross_join is the
    handoff.

    Margin audit (r13): max-cosine per doc is unique-argmax-safe via
    the (cosine DESC, eval_id ASC) window tiebreak on the 6dp-rounded
    value in BOTH engines; τ compares on the rounded cosine so the
    boundary cannot flip on last-ulp drift; docs with best < τ emit
    nothing in either engine; vec_id ≡ doc_id is the established
    embeddings↔documents join convention (llm_data_pipeline_v5/v6)."""
    emb = _emb(spark, sf)
    ev = emb.where(F.col("vec_id") < _DECONTAM_EVAL_N).select(
        F.col("vec_id").alias("eval_id"), F.col("v").alias("qv")
    )
    tr = emb.where(F.col("vec_id") >= _DECONTAM_EVAL_N).select(
        F.col("vec_id").alias("doc_id"), F.col("v").alias("cv")
    )
    cos = _dot(F.col("qv"), F.col("cv")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv")))
        * F.sqrt(_dot(F.col("cv"), F.col("cv")))
    )
    scored = tr.crossJoin(F.broadcast(ev)).select(
        "doc_id", "eval_id", F.round(cos + 1e-9, 6).alias("cosine")
    )
    # argmax as a map-side-combinable max(struct) aggregate instead of
    # a row_number window (optimization r15, guide §2.3/§2.4): the
    # window hash-shuffled AND sorted every (doc, eval) scored row;
    # the aggregate reduces each task's rows to one candidate per doc
    # before the (tiny) exchange. Winner identity is unchanged —
    # lexicographic max of (cosine, −eval_id) ≡ ORDER BY cosine DESC,
    # eval_id ASC on the same rounded values with the same double
    # comparator.
    best = scored.groupBy("doc_id").agg(
        F.max(
            F.struct(
                F.col("cosine"), (-F.col("eval_id")).alias("_ne"), "eval_id"
            )
        ).alias("b")
    )
    return best.where(F.col("b.cosine") >= _DECONTAM_TAU).select(
        "doc_id",
        F.col("b.eval_id").alias("eval_id"),
        F.col("b.cosine").alias("cosine"),
    )


_SEM_DECONTAM_SQL = """
WITH e AS ({emb}),
scored AS (
  SELECT t.vec_id AS doc_id, q.vec_id AS eval_id, {cos} AS cosine
  FROM e t JOIN e q ON q.vec_id < {n_eval}
  WHERE t.vec_id >= {n_eval}),
best AS (
  SELECT doc_id, eval_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY cosine DESC, eval_id) AS rk
  FROM scored)
SELECT doc_id, eval_id, cosine FROM best WHERE rk = 1 AND cosine >= {tau}
""".format(
    emb=_EMB_SQL,
    cos=_COS_SQL.format(a="t", b="q"),
    n_eval=_DECONTAM_EVAL_N,
    tau=_DECONTAM_TAU,
)


# incoming-shard carve for the incremental semantic dedup — mirrors
# dedup_incremental_shard's doc carve (the two ops are the same
# operational moment at two grains: a new crawl shard lands and is
# checked against the standing corpus before ingestion)
_INCR_SEM_SHARD_MOD = 10


def emb_dedup_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """INCREMENTAL semantic dedup — the embedding-grain member of the
    incremental family (dedup_incremental_shard = exact fingerprints,
    stream_dedup_shard = the ingest drain, and now the SemDeDup
    question asked incrementally): when a new shard of embeddings
    lands (vec_id % 10 = 9, the family's carve), find each shard
    vector's best match in the STANDING corpus via the corpus's own
    IVF index and flag it a semantic duplicate at cosine ≥ 0.4
    (dedup_semdedup's τ) — without ever re-running semantic dedup
    over the corpus.

    Semantics: cells are seeded from — and √n-sized by — the CORPUS
    side only (the sim_ann_cross_join index discipline: an index's
    structure must not depend on who queries it); corpus vectors are
    ASSIGNED (rk = 1), shard vectors PROBE their nprobe = 2 nearest
    cells and take their exact-cosine best among the corpus members
    there (the shared _cell_block_topk BLAS kernel at k = 1). A shard
    vector whose probed cells hold no corpus member emits no row —
    identical in the oracle, which reproduces seeded centroids,
    6dp-rounded distances/cosines, and id tiebreaks byte-for-byte.

    Margin audit (r14): the is_dup comparison runs on the kernel's
    6dp-ROUNDED cosine, identical in both engines, so the flag cannot
    flip cross-engine (its VALUE tracks each regeneration — min
    |cosine − τ| measured 0.0023/0.0055/0.0012); both verdicts occur
    at every sf (dups/kept 4/46, 1/49, 36/164 at sf0.001/0.01/0.1);
    side-disjointness makes the kernel's self-pair mask a no-op;
    output rows = shard size at every sf (every probed cell pair
    held ≥ 1 corpus member — 50/50/200 rows).

    Scale shape: identical to sim_ann_cross_join's O(n^1.5) contract
    with |query| = |shard| ≪ |corpus| — the per-arrival cost is
    nprobe·|shard|·(n/k_cells) kernel work plus the corpus's one-time
    assignment, and NOTHING corpus-sized broadcasts. At 10⁹-corpus ×
    10⁶-shard this is the faiss-style probe-the-standing-index
    recipe, the semantic twin of the fingerprint ledger probe."""
    from ..util import persist_tracked

    emb = persist_tracked(_emb(spark, sf).select("vec_id", "v"))
    shard_pred = F.col("vec_id") % _INCR_SEM_SHARD_MOD == (
        _INCR_SEM_SHARD_MOD - 1
    )
    corpus = emb.where(~shard_pred)
    ranked = persist_tracked(_ranked_cells(emb, corpus))
    members = (
        ranked.where((F.col("rk") == 1) & ~shard_pred)
        .join(emb, "vec_id")
        .select(
            F.col("cid").alias("cell"), "vec_id", "v", F.lit(1).alias("side")
        )
    )
    probers = (
        ranked.where(shard_pred)
        .join(emb, "vec_id")
        .select(
            F.col("cid").alias("cell"), "vec_id", "v", F.lit(0).alias("side")
        )
    )
    local = probers.unionByName(members).groupBy("cell").applyInPandas(
        _cell_block_topk(1),
        schema="vec_id bigint, nn_id bigint, cosine double",
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (
        local.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            F.col("vec_id").alias("shard_vec_id"),
            F.col("nn_id").alias("best_corpus_id"),
            "cosine",
            (F.col("cosine") >= _SEMDEDUP_TAU).alias("is_dup"),
        )
    )


_IVF_INCR_SEED_WHERE = " WHERE vec_id % {m} != {m} - 1".format(
    m=_INCR_SEM_SHARD_MOD
)
_IVF_INCR_RANKED_SQL = _IVF_RANKED_TEMPLATE.format(
    seed_where=_IVF_INCR_SEED_WHERE,
    cells=_IVF_CELLS_SQL_T.format(seed_where=_IVF_INCR_SEED_WHERE),
)

_INCR_SEM_SQL = """
WITH e AS ({emb}),
{ranked},
assign AS (SELECT vec_id, cid AS cell FROM ranked
           WHERE vec_id % {m} != {m} - 1 AND rk = 1),
probes AS (SELECT vec_id, cid AS cell FROM ranked
           WHERE vec_id % {m} = {m} - 1 AND rk <= {nprobe}),
cand AS (
  SELECT p.vec_id AS shard_vec_id, a.vec_id AS cand_id
  FROM probes p JOIN assign a ON a.cell = p.cell),
scored AS (
  SELECT cand.shard_vec_id, cand.cand_id AS best_corpus_id,
         {cos} AS cosine
  FROM cand JOIN e q ON q.vec_id = cand.shard_vec_id
            JOIN e c ON c.vec_id = cand.cand_id),
best AS (
  SELECT shard_vec_id, best_corpus_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY shard_vec_id
                            ORDER BY cosine DESC, best_corpus_id) AS rk
  FROM scored)
SELECT shard_vec_id, best_corpus_id, cosine,
       cosine >= {tau} AS is_dup
FROM best WHERE rk = 1
""".format(
    emb=_EMB_SQL,
    ranked=_IVF_INCR_RANKED_SQL,
    m=_INCR_SEM_SHARD_MOD,
    nprobe=_IVF_GRAPH_NPROBE,
    cos=_COS_SQL.format(a="q", b="c"),
    tau=_SEMDEDUP_TAU,
)


QUERIES: dict[str, QuerySpec] = {
    # r14: incremental family, semantic grain
    "emb_dedup_incremental": QuerySpec(
        "emb_dedup_incremental", emb_dedup_incremental, _INCR_SEM_SQL
    ),
    "emb_quantize_int8": QuerySpec(
        "emb_quantize_int8", emb_quantize_int8, _QUANTIZE_SQL
    ),
    "sim_ivf_topk": QuerySpec("sim_ivf_topk", sim_ivf_topk, _IVF_TOPK_SQL),
    "ext_sim_search": QuerySpec("ext_sim_search", ext_sim_search, _SIM_SEARCH_SQL),
    "sim_lsh_buckets": QuerySpec("sim_lsh_buckets", sim_lsh_buckets, _LSH_BUCKETS_SQL),
    "sim_lsh_topk": QuerySpec("sim_lsh_topk", sim_lsh_topk, _LSH_TOPK_SQL),
    "emb_label_stats": QuerySpec("emb_label_stats", emb_label_stats, _LABEL_STATS_SQL),
    "emb_sample_stratified": QuerySpec(
        "emb_sample_stratified",
        emb_sample_stratified,
        _compose_emb_stratified_sql(),
    ),
    "emb_nearest_centroid": QuerySpec(
        "emb_nearest_centroid", emb_nearest_centroid, _NEAREST_CENTROID_SQL
    ),
    # round-8 additions (fronted in registry._ROUND8_FRONT on arrival)
    "emb_kmeans_step": QuerySpec(
        "emb_kmeans_step", emb_kmeans_step, _KMEANS_STEP_SQL
    ),
    # round-15 graded retrieval evals (VERDICT r14 item 6: IVF + PQ/ADC)
    "sim_eval_mrr_ndcg": QuerySpec(
        "sim_eval_mrr_ndcg", sim_eval_mrr_ndcg, _EVAL_MRR_SQL
    ),
    "sim_eval_pq_mrr_ndcg": QuerySpec(
        "sim_eval_pq_mrr_ndcg", sim_eval_pq_mrr_ndcg, _compose_pq_eval_sql()
    ),
    "sim_ivf_recall": QuerySpec(
        "sim_ivf_recall", sim_ivf_recall, _IVF_RECALL_SQL
    ),
    # post-front r8 addition: the r8 window is full (50), so this key's
    # first driver row lands in r9 — NOTES "ROUND 9 FRONT" lists it
    # first (hash-green locally at sf0.001/0.01/0.1 meanwhile)
    "emb_pca_power": QuerySpec(
        "emb_pca_power", emb_pca_power, _pca_sql()
    ),
    # round-9 addition (fronted in registry._ROUND9_FRONT on arrival)
    "emb_kmeans_converged": QuerySpec(
        "emb_kmeans_converged", emb_kmeans_converged, _KMEANS_CONV_SQL
    ),
    "emb_pq_codes": QuerySpec("emb_pq_codes", emb_pq_codes, _compose_pq_sql()),
    "sim_pq_recall": QuerySpec(
        "sim_pq_recall", sim_pq_recall, _compose_pq_recall_sql()
    ),
    "join_nn_radius_2d": QuerySpec(
        "join_nn_radius_2d", join_nn_radius_2d, _NN_RADIUS_SQL
    ),
    # round-10 additions (fronted in registry._ROUND10_FRONT on arrival)
    "emb_matryoshka_recall": QuerySpec(
        "emb_matryoshka_recall", emb_matryoshka_recall, _MRL_SQL
    ),
    "sim_knn_graph": QuerySpec(
        "sim_knn_graph", sim_knn_graph, _KNN_GRAPH_SQL
    ),
    # r12 addition (VERDICT r11 item 3): the IVF-cell-blocked
    # approximate graph handoff, fully oracled via deterministic
    # seeded cells
    "sim_knn_graph_ivf": QuerySpec(
        "sim_knn_graph_ivf", sim_knn_graph_ivf, _KNN_GRAPH_IVF_SQL
    ),
    "sim_knn_graph_ivf_recall": QuerySpec(
        "sim_knn_graph_ivf_recall",
        sim_knn_graph_ivf_recall,
        _KNN_GRAPH_IVF_RECALL_SQL,
    ),
    # r12 addition (VERDICT r11 item 6b): semantic dedup drop list
    "dedup_semdedup": QuerySpec(
        "dedup_semdedup", dedup_semdedup, _SEMDEDUP_SQL
    ),
    # r13 additions (VERDICT r12 item 4): the cross-corpus retrieval
    # pair — large×large ANN join + broadcast-exact eval decontam
    "sim_ann_cross_join": QuerySpec(
        "sim_ann_cross_join", sim_ann_cross_join, _ANN_CROSS_SQL
    ),
    "sim_ann_cross_recall": QuerySpec(
        "sim_ann_cross_recall", sim_ann_cross_recall, _ANN_CROSS_RECALL_SQL
    ),
    "sim_semantic_decontam": QuerySpec(
        "sim_semantic_decontam", sim_semantic_decontam, _SEM_DECONTAM_SQL
    ),
}
