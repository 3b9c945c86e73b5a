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
bit-identical to DuckDB's list_* kernels, no Python in the loop.  (At
cluster scale the same expressions vectorize under codegen; a Pandas-UDF
+numpy variant only wins when batch sizes are large enough to amortize
Arrow transfer — measured slower at this data size.)
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
