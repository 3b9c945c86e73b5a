"""Gold training-set assembly — the complete silver→gold path (SURVEY §3.3
extension / §7.2.6; reference spec: docs/architecture/DATA_PIPELINE.md:539-563
daily gold job, docs/schemas/S3_SCHEMA.md:520-736 feature vector + labels +
time split).

One composition over the bars series:
  bars (A4) → per-bar features (returns W2, rolling volatility W7, cyclic
  time P8) ⋈ forward labels (W3) → leakage-free time split → gold rows.

Plan shape: the entire per-symbol analytic block (returns, volatility,
labels) runs over ONE `partitionBy(symbol) ORDER BY bucket` sort, the split
boundary is a broadcast scalar, and the feature⋈label join is co-located
(same keys) — on a cluster this is a single exchange end-to-end after the
bars aggregation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import r6
from ..operators.windows import DIRECTION_EPS
from . import pipeline

TWO_PI = 2.0 * math.pi


def gold_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    bars = pipeline.bars_pipeline(spark, sf_dir)
    w = Window.partitionBy("symbol").orderBy("bucket")
    fwd = w.rowsBetween(1, 10)

    hour = (F.expr("bucket div 60") % 24).cast("int")
    target = F.lead("close", 10).over(w)
    ret_label = F.log(target / F.col("close"))

    enriched = bars.select(
        "symbol",
        "bucket",
        "close",
        "volume",
        "vwap",
        "volume_imbalance",
        "trade_count",
        # features: backward-looking only
        r6(F.log(F.col("close") / F.lag("close", 1).over(w))).alias("ret_1"),
        r6(F.log(F.col("close") / F.lag("close", 5).over(w))).alias("ret_5"),
        r6(F.stddev_samp("close").over(w.rowsBetween(-9, 0))).alias("volatility_10"),
        r6(F.sin(F.lit(TWO_PI) * hour / F.lit(24.0))).alias("hour_sin"),
        r6(F.cos(F.lit(TWO_PI) * hour / F.lit(24.0))).alias("hour_cos"),
        # labels: strictly forward-looking
        r6(ret_label).alias("return_10"),
        F.when(ret_label > DIRECTION_EPS, 1)
        .when(ret_label < -DIRECTION_EPS, -1)
        .otherwise(F.when(ret_label.isNull(), None).otherwise(0))
        .cast("int")
        .alias("direction"),
        (F.count("close").over(fwd) == 10).alias("label_valid"),
    ).filter(F.col("label_valid"))

    rng = enriched.groupBy().agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    j = enriched.join(F.broadcast(rng))
    span = F.col("hi") - F.col("lo")
    return j.select(
        enriched["*"],
        F.when(F.col("bucket") <= F.col("lo") + F.floor(span * 0.7), "train")
        .when(F.col("bucket") <= F.col("lo") + F.floor(span * 0.85), "val")
        .otherwise("test")
        .alias("split"),
    ).drop("label_valid")


GOLD_ORACLE_BODY = f"""
,enriched AS (
  SELECT symbol, bucket, close, volume, vwap, volume_imbalance, trade_count,
         round(ln(close / lag(close, 1) OVER w), 6) AS ret_1,
         round(ln(close / lag(close, 5) OVER w), 6) AS ret_5,
         round(stddev_samp(close) OVER (PARTITION BY symbol ORDER BY bucket
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS volatility_10,
         round(sin(2*pi() * ((bucket // 60) % 24) / 24.0), 6) AS hour_sin,
         round(cos(2*pi() * ((bucket // 60) % 24) / 24.0), 6) AS hour_cos,
         round(ln(lead(close, 10) OVER w / close), 6) AS return_10,
         CAST(CASE WHEN ln(lead(close, 10) OVER w / close) > {DIRECTION_EPS} THEN 1
                   WHEN ln(lead(close, 10) OVER w / close) < -{DIRECTION_EPS} THEN -1
                   WHEN lead(close, 10) OVER w IS NULL THEN NULL
                   ELSE 0 END AS INTEGER) AS direction,
         count(close) OVER (PARTITION BY symbol ORDER BY bucket
               ROWS BETWEEN 1 FOLLOWING AND 10 FOLLOWING) = 10 AS label_valid
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket)
),
valid_gold AS (SELECT * FROM enriched WHERE label_valid),
rng AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM valid_gold)
SELECT symbol, bucket, close, volume, vwap, volume_imbalance, trade_count,
       ret_1, ret_5, volatility_10, hour_sin, hour_cos, return_10, direction,
       CASE WHEN bucket <= lo + floor((hi - lo) * 0.7) THEN 'train'
            WHEN bucket <= lo + floor((hi - lo) * 0.85) THEN 'val'
            ELSE 'test' END AS split
FROM valid_gold CROSS JOIN rng"""
