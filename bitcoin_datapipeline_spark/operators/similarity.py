"""Similarity search over the `embeddings` table (array<float>, 64-dim).

Three tiers, mirroring what a 100 TB training-data pipeline needs:

1. :func:`cosine_pairs` — brute-force all-pairs WITH BLOCKING (label
   equality here; in production any coarse cluster id).  The O(n²) baseline
   that anchors recall measurements.
2. :func:`knn` — exact top-k for a bounded query set.
3. :func:`ann_lsh` — random-hyperplane-style sign-bucket LSH: queries only
   meet candidates in the same bucket.  The scale path: one shuffle on the
   bucket key, per-bucket work bounded, recall traded for a ~buckets×
   speedup.

All dot products run through JVM higher-order functions
(``zip_with``/``aggregate``) in double precision — sequential left-fold,
bit-identical to DuckDB's list_* kernels, no Python in the loop.  A
Pandas-UDF + numpy variant would hand the reduction to BLAS, whose SIMD
summation order is NOT bit-reproducible against the sequential oracle —
the HOF form is chosen for exactness first; swap to numpy batches only
behind an approximate (tolerance-compared) interface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import r6

COSINE_THRESHOLD = 0.3
KNN_QUERIES = 20
KNN_K = 3
LSH_DIMS = 8  # sign-bucket on the first 8 dimensions → 256 buckets
ANN_QUERY_MOD = 25  # vec_id % 25 == 0 → deterministic query subset


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        "cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm(col: str):
    return F.sqrt(
        F.expr(
            f"aggregate({col}, cast(0.0 as double), "
            f"(acc, v) -> acc + cast(v as double) * cast(v as double))"
        )
    )


def with_norm(embeddings: DataFrame) -> DataFrame:
    return embeddings.withColumn("norm", _norm("embedding"))


def cosine_pairs(embeddings: DataFrame, threshold: float = COSINE_THRESHOLD) -> DataFrame:
    """Within-label cosine pairs above threshold (embedding near-dup).

    Label equality is the blocking predicate — the join never materializes
    cross-block pairs, so cost is Σ|block|² not n²."""
    e = with_norm(embeddings)
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("label"),
        F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("label"),
        F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    j = a.join(b, ["label"]).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot("emb_a", "emb_b") / (F.col("norm_a") * F.col("norm_b"))
    return (
        j.withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= threshold)
        .select(
            "label",
            "id_a",
            "id_b",
            r6(F.col("cos_raw")).alias("cosine"),
        )
    )


COSINE_PAIRS_ORACLE = f"""
SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {COSINE_THRESHOLD}"""


def knn(embeddings: DataFrame, n_queries: int = KNN_QUERIES, k: int = KNN_K) -> DataFrame:
    """Exact top-k neighbors for the first `n_queries` vectors — brute force
    scored in one pass, ranked with a deterministic (cosine desc, id)
    tiebreak on the ROUNDED score so ranking agrees cross-engine."""
    e = with_norm(embeddings)
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("emb_q"),
        F.col("norm").alias("norm_q"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("emb_c"),
        F.col("norm").alias("norm_c"),
    )
    j = q.join(c, F.col("query_id") != F.col("neighbor_id"))
    cos6 = r6(_dot("emb_q", "emb_c") / (F.col("norm_q") * F.col("norm_c")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        j.withColumn("cosine", cos6)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cosine")
    )


KNN_ORACLE = f"""
WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6) AS cosine
  FROM embeddings a
  JOIN embeddings b ON a.vec_id < {KNN_QUERIES} AND a.vec_id != b.vec_id
)
SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= {KNN_K}"""


def ann_lsh(embeddings: DataFrame) -> DataFrame:
    """Approximate NN via sign-bucket LSH: bucket key = concatenated signs
    of the first LSH_DIMS dimensions (a fixed axis-aligned hyperplane set —
    deterministic without a random-projection matrix; production would use
    seeded random hyperplanes, same plan shape).  Each query meets only
    same-bucket candidates → the all-pairs blowup disappears."""
    sign_bits = F.concat_ws(
        "",
        *[
            F.when(F.expr(f"cast(embedding[{i}] as double)") >= 0, "1").otherwise("0")
            for i in range(LSH_DIMS)
        ],
    )
    e = with_norm(embeddings).withColumn("bucket", sign_bits)
    q = e.filter(F.col("vec_id") % ANN_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("bucket"),
        F.col("embedding").alias("emb_q"),
        F.col("norm").alias("norm_q"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("bucket"),
        F.col("embedding").alias("emb_c"),
        F.col("norm").alias("norm_c"),
    )
    j = q.join(c, ["bucket"]).filter(F.col("query_id") != F.col("neighbor_id"))
    cos6 = r6(_dot("emb_q", "emb_c") / (F.col("norm_q") * F.col("norm_c")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        j.withColumn("cosine", cos6)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 1)
        .select("query_id", "bucket", "neighbor_id", "cosine")
    )


_SIGN_SQL = " || ".join(
    f"(CASE WHEN CAST(embedding[{i + 1}] AS DOUBLE) >= 0 THEN '1' ELSE '0' END)"
    for i in range(LSH_DIMS)
)
ANN_LSH_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding, {_SIGN_SQL} AS bucket FROM embeddings
),
j AS (
  SELECT q.vec_id AS query_id, q.bucket, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])), 6) AS cosine
  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
  WHERE q.vec_id % {ANN_QUERY_MOD} = 0
)
SELECT query_id, bucket, neighbor_id, cosine
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM j
)
WHERE rank <= 1"""


IVF_NPROBE_QUERY_MOD = 25  # same deterministic query subset as ann_lsh


def ann_ivf(embeddings: DataFrame) -> DataFrame:
    """IVF-style ANN (inverted file index, nprobe=1).

    Coarse quantizer: per-label centroids (the `label` column stands in for
    a k-means assignment — production trains real centroids, the plan shape
    is identical).  Each query searches ONLY its nearest centroid's posting
    list: one small broadcast (centroids), one equi-join on the list id —
    the all-pairs scan is gone, which is the entire point of IVF at 100 TB.

    Determinism notes: centroid components are means of float columns —
    summation order differs across engines, so centroids are ROUNDED to 6 dp
    before the query→centroid distance; queries are assigned by rounded
    cosine with a centroid-id tiebreak, then ranked in-list by rounded
    cosine with a neighbor-id tiebreak.
    """
    # exploded (vec_id, label, pos, val) for centroid computation
    pos = embeddings.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("pos", "val"),
    )
    centroids = (
        pos.groupBy("label", "pos")
        .agg(r6(F.avg(F.col("val").cast("double"))).alias("cval"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "cval"))
            ).alias("pairs")
        )
        .select(
            F.col("label").alias("c_label"),
            F.expr("transform(pairs, p -> p.cval)").alias("centroid"),
        )
    )
    q = with_norm(embeddings).filter(F.col("vec_id") % IVF_NPROBE_QUERY_MOD == 0)
    # assign each query to its nearest centroid (rounded cosine, id tiebreak)
    qc = q.crossJoin(F.broadcast(centroids))
    c_norm = F.sqrt(
        F.expr("aggregate(centroid, cast(0.0 as double), (acc, v) -> acc + v * v)")
    )
    qc_cos = r6(_dot("embedding", "centroid") / (F.col("norm") * c_norm))
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), F.col("c_label"))
    assigned = (
        qc.withColumn("c_cos", qc_cos)
        .withColumn("c_rank", F.row_number().over(w_assign))
        .filter(F.col("c_rank") == 1)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("emb_q"),
            F.col("norm").alias("norm_q"),
            F.col("c_label").alias("probe_label"),
        )
    )
    # search only the probed list
    cands = with_norm(embeddings).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("probe_label"),
        F.col("embedding").alias("emb_c"),
        F.col("norm").alias("norm_c"),
    )
    j = assigned.join(cands, ["probe_label"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos6 = r6(_dot("emb_q", "emb_c") / (F.col("norm_q") * F.col("norm_c")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        j.withColumn("cosine", cos6)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
        .select(
            "query_id",
            F.col("probe_label").cast("int").alias("probe_label"),
            F.col("rank").cast("int").alias("rank"),
            "neighbor_id",
            "cosine",
        )
    )


ANN_IVF_ORACLE = f"""
WITH pos AS (
  SELECT vec_id, label, unnest(CAST(embedding AS DOUBLE[])) AS val,
         generate_subscripts(embedding, 1) AS pos
  FROM embeddings
),
centroids AS (
  SELECT label AS c_label,
         list(round(cval, 6) ORDER BY pos) AS centroid
  FROM (SELECT label, pos, avg(val) AS cval FROM pos GROUP BY label, pos)
  GROUP BY label
),
q AS (SELECT * FROM embeddings WHERE vec_id % {IVF_NPROBE_QUERY_MOD} = 0),
assigned AS (
  SELECT vec_id AS query_id, c_label AS probe_label
  FROM (
    SELECT q.vec_id, c.c_label,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                   c.centroid), 6) DESC,
                      c.c_label) AS c_rank
    FROM q CROSS JOIN centroids c
  )
  WHERE c_rank = 1
),
j AS (
  SELECT a.query_id, a.probe_label, e.vec_id AS neighbor_id,
         round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])), 6) AS cosine
  FROM assigned a
  JOIN embeddings qe ON qe.vec_id = a.query_id
  JOIN embeddings e ON e.label = a.probe_label AND e.vec_id != a.query_id
)
SELECT query_id, CAST(probe_label AS INTEGER) AS probe_label,
       CAST(rank AS INTEGER) AS rank, neighbor_id, cosine
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM j
)
WHERE rank <= {KNN_K}"""
