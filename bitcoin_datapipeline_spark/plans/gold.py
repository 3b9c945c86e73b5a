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

from ..functions import normalize
from ..operators import r6
from ..operators import grid as grid_ops
from ..operators.windows import DIRECTION_EPS
from ..tables import table
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

    # r11 note: pinning `enriched` (operators.pin_subtree) to share one
    # subtree between rng and the row stream was tried and REVERTED — it
    # collapsed the duplicate dedup→bars cascade (4 scans → 3) but
    # serialized the two branches through one AQE stage chain, and the
    # measured wall-clock got WORSE (exec 1.4 s → 2.2 s at sf0.1): the
    # pruned rng branch is cheap and runs concurrently with the main
    # stream, so recomputing it costs idle cores, not time.
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


# ---------------------------------------------------------------------------
# The full documented gold feature vector, at true fixed-second grain
# (docs/schemas/S3_SCHEMA.md:520-609 — ~60 columns on the feature grid).
# ---------------------------------------------------------------------------

GOLD_SLICE_S = 21_600  # 6 h grid slice — test-size decision, not semantic

# stddev of a constant window is exactly 0 in Spark but ~1e-18 in DuckDB
# (segment-tree accumulation) — an epsilon guard keeps the two engines'
# "no volatility" branches aligned; real volatility is orders of magnitude above
VOLAT_EPS = 1e-9


def gold_vector(spark: SparkSession, sf_dir: str, slice_s: int = GOLD_SLICE_S) -> DataFrame:
    """The reference's complete gold feature vector (S3_SCHEMA.md:520-609) on
    a 1-second LOCF grid: price/returns, multi-window volumes + imbalances,
    order-book features joined from the BBA and depth streams, trade-flow,
    VWAP deviations, momentum/volatility, second-order ("advanced") features,
    cyclic temporal encodings, interaction terms, and the quality block
    (completeness / data_age_ms / gap_indicator / source_quality).

    The reference documents a 2 s grid; the engine uses 1 s so every
    documented {1,5,10,30,60} s window is an exact whole number of grid steps
    (1 s is the grain DATA_PIPELINE.md's Redis feature cache itself uses).

    Plan shape (scale audit): three per-tick pre-aggregations (trades via
    locf_resample, BBA, depth) each shuffle once on (symbol, tick); the grid
    joins are co-partitioned on the same keys; every analytic window —
    LOCF fills, trailing sums, lags — shares ONE
    ``partitionBy(symbol) ORDER BY tick`` sort, so Catalyst stacks the
    Window operators after a single exchange.  Nothing here is O(ticks²) and
    the grid bound (86 400 rows/symbol/day) caps the window state no matter
    how many raw ticks fed it.
    """
    step_ms = 1000
    g = pipeline.locf_grid(spark, sf_dir, step_s=1, slice_s=slice_s)
    ev = table(spark, sf_dir, "events")

    bba_tick = normalize.bba(ev).groupBy(
        "symbol", F.expr(f"event_ts div {step_ms}").cast("long").alias("tick")
    ).agg(
        F.max_by("bid_px", "event_ts").alias("o_bid_px"),
        F.max_by("ask_px", "event_ts").alias("o_ask_px"),
        F.max_by("bid_sz", "event_ts").alias("o_bid_sz"),
        F.max_by("ask_sz", "event_ts").alias("o_ask_sz"),
    )

    book_value = "aggregate({0}, cast(0.0 as double), (acc, x) -> acc + x.price * x.qty)"
    dep_tick = (
        normalize.depth(ev)
        .select(
            "symbol",
            "event_ts",
            F.expr(f"event_ts div {step_ms}").cast("long").alias("tick"),
            F.expr(book_value.format("bids")).alias("bv"),
            F.expr(book_value.format("asks")).alias("av"),
        )
        .groupBy("symbol", "tick")
        .agg(
            F.max_by("bv", "event_ts").alias("o_bid_value"),
            F.max_by("av", "event_ts").alias("o_ask_value"),
        )
    )

    j = g.join(bba_tick, ["symbol", "tick"], "left").join(
        dep_tick, ["symbol", "tick"], "left"
    )

    w = Window.partitionBy("symbol").orderBy("tick")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)

    def locf(c):
        return F.last(c, ignorenulls=True).over(cum)

    base = j.select(
        "symbol",
        "tick",
        "feature_ts",
        "price",
        "volume",
        "buy_volume",
        "sell_volume",
        "notional",
        "trades",
        "has_obs",
        "data_age_ms",
        "gap_indicator",
        "source",
        locf("o_bid_px").alias("bid_px"),
        locf("o_ask_px").alias("ask_px"),
        locf("o_bid_sz").alias("bid_sz"),
        locf("o_ask_sz").alias("ask_sz"),
        locf("o_bid_value").alias("bid_value"),
        locf("o_ask_value").alias("ask_value"),
    )

    def trail(col, k):
        return F.sum(col).over(w.rowsBetween(-(k - 1), 0))

    mid = (F.col("bid_px") + F.col("ask_px")) / 2.0
    s1 = base.select(
        "symbol",
        "tick",
        "feature_ts",
        "price",
        "volume",
        "trades",
        "data_age_ms",
        "gap_indicator",
        "source",
        mid.alias("mid"),
        ((F.col("ask_px") - F.col("bid_px")) / mid * 10000.0).alias("spread_bp_r"),
        (
            (F.col("bid_sz") - F.col("ask_sz")) / (F.col("bid_sz") + F.col("ask_sz"))
        ).alias("ob_imb_r"),
        F.col("bid_value").alias("bid_strength_r"),
        F.col("ask_value").alias("ask_strength_r"),
        (F.col("bid_sz") / F.col("ask_sz")).alias("bid_ask_ratio_r"),
        (
            (F.col("bid_px") * F.col("ask_sz") + F.col("ask_px") * F.col("bid_sz"))
            / (F.col("bid_sz") + F.col("ask_sz"))
        ).alias("weighted_mid_r"),
        F.log(F.col("price") / F.lag("price", 1).over(w)).alias("ret_1s_r"),
        F.log(F.col("price") / F.lag("price", 5).over(w)).alias("ret_5s_r"),
        F.log(F.col("price") / F.lag("price", 10).over(w)).alias("ret_10s_r"),
        F.log(F.col("price") / F.lag("price", 30).over(w)).alias("ret_30s_r"),
        F.log(F.col("price") / F.lag("price", 60).over(w)).alias("ret_60s_r"),
        trail("volume", 5).alias("vol_5"),
        trail("volume", 10).alias("vol_10"),
        trail("volume", 30).alias("vol_30"),
        trail("buy_volume", 5).alias("buy_5"),
        trail("buy_volume", 10).alias("buy_10"),
        trail("sell_volume", 5).alias("sell_5"),
        trail("sell_volume", 10).alias("sell_10"),
        F.col("buy_volume").alias("buy_1"),
        F.col("sell_volume").alias("sell_1"),
        trail("trades", 5).alias("trades_5"),
        F.col("notional").alias("dollar_1"),
        trail("notional", 5).alias("dollar_5"),
        trail("notional", 10).alias("dollar_10"),
        F.stddev_samp("price").over(w.rowsBetween(-59, 0)).alias("volat_r"),
        (F.col("price") - F.lag("price", 5).over(w)).alias("momentum_r"),
        F.avg(F.col("has_obs").cast("int")).over(w.rowsBetween(-29, 0)).alias(
            "completeness_r"
        ),
    )

    def safe_div(num, den):
        return F.when(den > 0, num / den)

    hour = (F.expr("feature_ts div 3600") % 24).cast("int")
    minute = (F.expr("feature_ts div 60") % 60).cast("int")
    s2 = s1.select(
        "*",
        (F.col("momentum_r") - F.lag("momentum_r", 5).over(w)).alias("accel_r"),
        (F.col("vol_5") - F.lag("vol_5", 5).over(w)).alias("vol_mom_r"),
        (F.col("volume") - F.lag("volume", 5).over(w)).alias("vol_chg_r"),
        safe_div(F.col("volume"), F.col("trades")).alias("avg_sz_1_r"),
        safe_div(F.col("vol_5"), F.col("trades_5")).alias("avg_sz_5_r"),
        (safe_div(F.col("dollar_1"), F.col("volume")) - F.col("mid")).alias("vwap_dev_1_r"),
        (safe_div(F.col("dollar_5"), F.col("vol_5")) - F.col("mid")).alias("vwap_dev_5_r"),
        (safe_div(F.col("dollar_10"), F.col("vol_10")) - F.col("mid")).alias("vwap_dev_10_r"),
        hour.alias("hh"),
        minute.alias("mm"),
    )

    return s2.select(
        "symbol",
        "feature_ts",
        (F.col("feature_ts") * 1000).cast("long").alias("feature_ts_ms"),
        r6(F.col("price")).alias("price"),
        r6(F.col("mid")).alias("mid_price"),
        r6(F.col("ret_1s_r")).alias("ret_1s"),
        r6(F.col("ret_5s_r")).alias("ret_5s"),
        r6(F.col("ret_10s_r")).alias("ret_10s"),
        r6(F.col("ret_30s_r")).alias("ret_30s"),
        r6(F.col("ret_60s_r")).alias("ret_60s"),
        r6(F.col("volume")).alias("volume_1s"),
        r6(F.col("vol_5")).alias("volume_5s"),
        r6(F.col("vol_10")).alias("volume_10s"),
        r6(F.col("vol_30")).alias("volume_30s"),
        r6(
            (F.col("buy_1") - F.col("sell_1")) / F.greatest(F.col("volume"), F.lit(1.0))
        ).alias("vol_imbalance_1s"),
        r6(
            (F.col("buy_5") - F.col("sell_5")) / F.greatest(F.col("vol_5"), F.lit(1.0))
        ).alias("vol_imbalance_5s"),
        r6(
            (F.col("buy_10") - F.col("sell_10")) / F.greatest(F.col("vol_10"), F.lit(1.0))
        ).alias("vol_imbalance_10s"),
        r6(F.col("spread_bp_r")).alias("spread_bp"),
        r6(F.col("ob_imb_r")).alias("ob_imbalance"),
        r6(F.col("bid_strength_r")).alias("bid_strength"),
        r6(F.col("ask_strength_r")).alias("ask_strength"),
        r6(F.col("bid_ask_ratio_r")).alias("bid_ask_ratio"),
        r6(F.col("weighted_mid_r")).alias("weighted_mid"),
        r6(F.col("trades").cast("double")).alias("trade_intensity_1s"),
        r6(F.col("trades_5") / 5.0).alias("trade_intensity_5s"),
        r6(F.col("avg_sz_1_r")).alias("avg_trade_size_1s"),
        r6(F.col("avg_sz_5_r")).alias("avg_trade_size_5s"),
        r6(F.col("dollar_1")).alias("dollar_volume_1s"),
        r6(F.col("dollar_5")).alias("dollar_volume_5s"),
        r6(F.col("vwap_dev_1_r")).alias("vwap_dev_1s"),
        r6(F.col("vwap_dev_5_r")).alias("vwap_dev_5s"),
        r6(F.col("vwap_dev_10_r")).alias("vwap_dev_10s"),
        r6(F.col("volat_r")).alias("price_volatility"),
        r6(F.col("momentum_r")).alias("momentum"),
        r6(F.col("accel_r")).alias("acceleration"),
        r6(F.col("vol_mom_r")).alias("volume_momentum"),
        r6(F.when(F.col("volat_r") > VOLAT_EPS, F.col("ret_1s_r") / F.col("volat_r"))).alias(
            "vol_adj_ret_1s"
        ),
        r6(F.when(F.col("volat_r") > VOLAT_EPS, F.col("ret_5s_r") / F.col("volat_r"))).alias(
            "vol_adj_ret_5s"
        ),
        r6(F.col("vol_chg_r")).alias("volume_change_5s"),
        r6(F.col("dollar_5") / 5.0).alias("dollar_intensity"),
        r6(F.col("avg_sz_1_r") - F.col("avg_sz_5_r")).alias("trade_size_trend"),
        r6(F.col("ob_imb_r") / (F.lit(1.0) + F.col("spread_bp_r"))).alias(
            "spread_adj_imbalance"
        ),
        r6(F.col("mid") - F.col("price")).alias("mid_last_diff"),
        r6(F.sin(F.lit(TWO_PI) * F.col("hh") / F.lit(24.0))).alias("hour_sin"),
        r6(F.cos(F.lit(TWO_PI) * F.col("hh") / F.lit(24.0))).alias("hour_cos"),
        r6(F.sin(F.lit(TWO_PI) * F.col("mm") / F.lit(60.0))).alias("minute_sin"),
        r6(F.cos(F.lit(TWO_PI) * F.col("mm") / F.lit(60.0))).alias("minute_cos"),
        ((F.col("hh") >= 14) & (F.col("hh") < 21)).cast("int").alias("is_us_hours"),
        ((F.col("hh") >= 0) & (F.col("hh") < 7)).cast("int").alias("is_asia_hours"),
        ((F.col("hh") >= 7) & (F.col("hh") < 14)).cast("int").alias("is_europe_hours"),
        r6(F.col("ret_1s_r") * F.col("volume")).alias("price_volume_int"),
        r6(F.col("spread_bp_r") * F.col("momentum_r")).alias("spread_momentum_int"),
        r6(
            (F.col("buy_5") - F.col("sell_5"))
            / F.greatest(F.col("vol_5"), F.lit(1.0))
            * F.col("ob_imb_r")
        ).alias("vol_imbalance_int"),
        r6(F.col("volat_r") * F.col("trades_5") / 5.0).alias("volatility_intensity_int"),
        r6(F.col("completeness_r")).alias("completeness"),
        "data_age_ms",
        "gap_indicator",
        F.when(F.col("gap_indicator"), F.lit("degraded"))
        .otherwise(F.col("source"))
        .alias("source_quality"),
    )


# DuckDB twin of gold_vector() — same CTE cascade: per-tick BBA/depth
# pre-aggregation → LOCF onto the trade grid → one-pass windowed features →
# second-order features → rounded final vector.
GOLD_VECTOR_ORACLE_BODY = """
,bba_tick AS (
  SELECT symbol, event_ts // 1000 AS tick,
         arg_max(bid_px, event_ts) AS o_bid_px,
         arg_max(ask_px, event_ts) AS o_ask_px,
         arg_max(bid_sz, event_ts) AS o_bid_sz,
         arg_max(ask_sz, event_ts) AS o_ask_sz
  FROM bba GROUP BY 1, 2
),
dep_tick AS (
  SELECT symbol, event_ts // 1000 AS tick,
         arg_max(list_sum(list_transform(bids, x -> x.price * x.qty)), event_ts)
             AS o_bid_value,
         arg_max(list_sum(list_transform(asks, x -> x.price * x.qty)), event_ts)
             AS o_ask_value
  FROM depth GROUP BY 1, 2
),
gbase AS (
  SELECT l.*,
         last_value(b.o_bid_px IGNORE NULLS) OVER cum AS bid_px,
         last_value(b.o_ask_px IGNORE NULLS) OVER cum AS ask_px,
         last_value(b.o_bid_sz IGNORE NULLS) OVER cum AS bid_sz,
         last_value(b.o_ask_sz IGNORE NULLS) OVER cum AS ask_sz,
         last_value(d.o_bid_value IGNORE NULLS) OVER cum AS bid_value,
         last_value(d.o_ask_value IGNORE NULLS) OVER cum AS ask_value
  FROM locf l
  LEFT JOIN bba_tick b ON l.symbol = b.symbol AND l.tick = b.tick
  LEFT JOIN dep_tick d ON l.symbol = d.symbol AND l.tick = d.tick
  WINDOW cum AS (PARTITION BY l.symbol ORDER BY l.tick
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
g1 AS (
  SELECT symbol, tick, feature_ts, price, volume, trades, data_age_ms,
         gap_indicator, source,
         (bid_px + ask_px) / 2.0 AS mid,
         (ask_px - bid_px) / ((bid_px + ask_px) / 2.0) * 10000.0 AS spread_bp_r,
         (bid_sz - ask_sz) / (bid_sz + ask_sz) AS ob_imb_r,
         bid_value AS bid_strength_r,
         ask_value AS ask_strength_r,
         bid_sz / ask_sz AS bid_ask_ratio_r,
         (bid_px * ask_sz + ask_px * bid_sz) / (bid_sz + ask_sz) AS weighted_mid_r,
         ln(price / lag(price, 1)  OVER w) AS ret_1s_r,
         ln(price / lag(price, 5)  OVER w) AS ret_5s_r,
         ln(price / lag(price, 10) OVER w) AS ret_10s_r,
         ln(price / lag(price, 30) OVER w) AS ret_30s_r,
         ln(price / lag(price, 60) OVER w) AS ret_60s_r,
         sum(volume) OVER t5  AS vol_5,
         sum(volume) OVER t10 AS vol_10,
         sum(volume) OVER t30 AS vol_30,
         sum(buy_volume) OVER t5  AS buy_5,
         sum(buy_volume) OVER t10 AS buy_10,
         sum(sell_volume) OVER t5  AS sell_5,
         sum(sell_volume) OVER t10 AS sell_10,
         buy_volume AS buy_1,
         sell_volume AS sell_1,
         sum(trades) OVER t5 AS trades_5,
         notional AS dollar_1,
         sum(notional) OVER t5  AS dollar_5,
         sum(notional) OVER t10 AS dollar_10,
         stddev_samp(price) OVER t60 AS volat_r,
         price - lag(price, 5) OVER w AS momentum_r,
         avg(CAST(has_obs AS INTEGER)) OVER t30 AS completeness_r
  FROM gbase
  WINDOW w   AS (PARTITION BY symbol ORDER BY tick),
         t5  AS (PARTITION BY symbol ORDER BY tick ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         t10 AS (PARTITION BY symbol ORDER BY tick ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
         t30 AS (PARTITION BY symbol ORDER BY tick ROWS BETWEEN 29 PRECEDING AND CURRENT ROW),
         t60 AS (PARTITION BY symbol ORDER BY tick ROWS BETWEEN 59 PRECEDING AND CURRENT ROW)
),
g2 AS (
  SELECT *,
         momentum_r - lag(momentum_r, 5) OVER w AS accel_r,
         vol_5 - lag(vol_5, 5) OVER w AS vol_mom_r,
         volume - lag(volume, 5) OVER w AS vol_chg_r,
         CASE WHEN trades > 0 THEN volume / trades END AS avg_sz_1_r,
         CASE WHEN trades_5 > 0 THEN vol_5 / trades_5 END AS avg_sz_5_r,
         CASE WHEN volume > 0 THEN dollar_1 / volume END - mid AS vwap_dev_1_r,
         CASE WHEN vol_5 > 0 THEN dollar_5 / vol_5 END - mid AS vwap_dev_5_r,
         CASE WHEN vol_10 > 0 THEN dollar_10 / vol_10 END - mid AS vwap_dev_10_r,
         CAST((feature_ts // 3600) % 24 AS INTEGER) AS hh,
         CAST((feature_ts // 60) % 60 AS INTEGER) AS mm
  FROM g1
  WINDOW w AS (PARTITION BY symbol ORDER BY tick)
),
gold_vec AS (
SELECT symbol, tick, feature_ts,
       CAST(feature_ts * 1000 AS BIGINT) AS feature_ts_ms,
       round(price, 6) AS price,
       round(mid, 6) AS mid_price,
       round(ret_1s_r, 6)  AS ret_1s,
       round(ret_5s_r, 6)  AS ret_5s,
       round(ret_10s_r, 6) AS ret_10s,
       round(ret_30s_r, 6) AS ret_30s,
       round(ret_60s_r, 6) AS ret_60s,
       round(volume, 6) AS volume_1s,
       round(vol_5, 6)  AS volume_5s,
       round(vol_10, 6) AS volume_10s,
       round(vol_30, 6) AS volume_30s,
       round((buy_1 - sell_1) / greatest(volume, 1.0), 6)  AS vol_imbalance_1s,
       round((buy_5 - sell_5) / greatest(vol_5, 1.0), 6)   AS vol_imbalance_5s,
       round((buy_10 - sell_10) / greatest(vol_10, 1.0), 6) AS vol_imbalance_10s,
       round(spread_bp_r, 6) AS spread_bp,
       round(ob_imb_r, 6) AS ob_imbalance,
       round(bid_strength_r, 6) AS bid_strength,
       round(ask_strength_r, 6) AS ask_strength,
       round(bid_ask_ratio_r, 6) AS bid_ask_ratio,
       round(weighted_mid_r, 6) AS weighted_mid,
       round(CAST(trades AS DOUBLE), 6) AS trade_intensity_1s,
       round(trades_5 / 5.0, 6) AS trade_intensity_5s,
       round(avg_sz_1_r, 6) AS avg_trade_size_1s,
       round(avg_sz_5_r, 6) AS avg_trade_size_5s,
       round(dollar_1, 6) AS dollar_volume_1s,
       round(dollar_5, 6) AS dollar_volume_5s,
       round(vwap_dev_1_r, 6)  AS vwap_dev_1s,
       round(vwap_dev_5_r, 6)  AS vwap_dev_5s,
       round(vwap_dev_10_r, 6) AS vwap_dev_10s,
       round(volat_r, 6) AS price_volatility,
       round(momentum_r, 6) AS momentum,
       round(accel_r, 6) AS acceleration,
       round(vol_mom_r, 6) AS volume_momentum,
       round(CASE WHEN volat_r > 1e-9 THEN ret_1s_r / volat_r END, 6) AS vol_adj_ret_1s,
       round(CASE WHEN volat_r > 1e-9 THEN ret_5s_r / volat_r END, 6) AS vol_adj_ret_5s,
       round(vol_chg_r, 6) AS volume_change_5s,
       round(dollar_5 / 5.0, 6) AS dollar_intensity,
       round(avg_sz_1_r - avg_sz_5_r, 6) AS trade_size_trend,
       round(ob_imb_r / (1.0 + spread_bp_r), 6) AS spread_adj_imbalance,
       round(mid - price, 6) AS mid_last_diff,
       round(sin(2 * pi() * hh / 24.0), 6) AS hour_sin,
       round(cos(2 * pi() * hh / 24.0), 6) AS hour_cos,
       round(sin(2 * pi() * mm / 60.0), 6) AS minute_sin,
       round(cos(2 * pi() * mm / 60.0), 6) AS minute_cos,
       CAST(hh >= 14 AND hh < 21 AS INTEGER) AS is_us_hours,
       CAST(hh >= 0 AND hh < 7 AS INTEGER)   AS is_asia_hours,
       CAST(hh >= 7 AND hh < 14 AS INTEGER)  AS is_europe_hours,
       round(ret_1s_r * volume, 6) AS price_volume_int,
       round(spread_bp_r * momentum_r, 6) AS spread_momentum_int,
       round((buy_5 - sell_5) / greatest(vol_5, 1.0) * ob_imb_r, 6) AS vol_imbalance_int,
       round(volat_r * trades_5 / 5.0, 6) AS volatility_intensity_int,
       round(completeness_r, 6) AS completeness,
       data_age_ms, gap_indicator,
       CASE WHEN gap_indicator THEN 'degraded' ELSE source END AS source_quality
FROM g2
)"""

# plain gold-vector oracle: everything except the internal tick key
GOLD_VECTOR_ORACLE_SELECT = """
SELECT * EXCLUDE (tick) FROM gold_vec"""


# ---------------------------------------------------------------------------
# The reference's documented 2-second feature cadence
# (ARCHITECTURE.md:236-244 — features aggregated every 2 s).
# ---------------------------------------------------------------------------

GOLD2S_STEP_S = 2


def gold_vector_2s(
    spark: SparkSession, sf_dir: str, slice_s: int | None = GOLD_SLICE_S
) -> DataFrame:
    """Compact gold feature vector at the reference's documented 2-second
    cadence (ARCHITECTURE.md:236-244): the 1 s vector's family restricted to
    horizons that are whole numbers of 2 s steps — returns {2,10,30,60} s,
    volumes/imbalances {2,10,30} s, 60 s volatility, 10 s momentum, book
    features LOCF'd from BBA, cyclic temporal encodings, and the quality
    block.  Same three-shuffle plan shape as :func:`gold_vector`: per-tick
    pre-aggregations on (symbol, tick), co-partitioned grid joins, one
    per-symbol sort shared by the whole analytic block.
    """
    step_ms = GOLD2S_STEP_S * 1000
    g = pipeline.locf_grid(spark, sf_dir, step_s=GOLD2S_STEP_S, slice_s=slice_s)
    ev = table(spark, sf_dir, "events")
    bba_tick = normalize.bba(ev).groupBy(
        "symbol", F.expr(f"event_ts div {step_ms}").cast("long").alias("tick")
    ).agg(
        F.max_by("bid_px", "event_ts").alias("o_bid_px"),
        F.max_by("ask_px", "event_ts").alias("o_ask_px"),
        F.max_by("bid_sz", "event_ts").alias("o_bid_sz"),
        F.max_by("ask_sz", "event_ts").alias("o_ask_sz"),
    )

    j = g.join(bba_tick, ["symbol", "tick"], "left")
    w = Window.partitionBy("symbol").orderBy("tick")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)

    def locf(c):
        return F.last(c, ignorenulls=True).over(cum)

    base = j.select(
        "symbol",
        "tick",
        "feature_ts",
        "price",
        "volume",
        "buy_volume",
        "sell_volume",
        "notional",
        "trades",
        "has_obs",
        "data_age_ms",
        "gap_indicator",
        "source",
        locf("o_bid_px").alias("bid_px"),
        locf("o_ask_px").alias("ask_px"),
        locf("o_bid_sz").alias("bid_sz"),
        locf("o_ask_sz").alias("ask_sz"),
    )

    def trail(col, rows):
        return F.sum(col).over(w.rowsBetween(-(rows - 1), 0))

    mid = (F.col("bid_px") + F.col("ask_px")) / 2.0
    # row offsets: k rows ≡ k·2 s on this grid
    s1 = base.select(
        "symbol",
        "tick",
        "feature_ts",
        "price",
        "volume",
        "buy_volume",
        "sell_volume",
        "notional",
        "trades",
        "data_age_ms",
        "gap_indicator",
        "source",
        mid.alias("mid"),
        ((F.col("ask_px") - F.col("bid_px")) / mid * 10000.0).alias("spread_bp_r"),
        (
            (F.col("bid_sz") - F.col("ask_sz")) / (F.col("bid_sz") + F.col("ask_sz"))
        ).alias("ob_imb_r"),
        (F.col("bid_sz") / F.col("ask_sz")).alias("bid_ask_ratio_r"),
        F.log(F.col("price") / F.lag("price", 1).over(w)).alias("ret_2s_r"),
        F.log(F.col("price") / F.lag("price", 5).over(w)).alias("ret_10s_r"),
        F.log(F.col("price") / F.lag("price", 15).over(w)).alias("ret_30s_r"),
        F.log(F.col("price") / F.lag("price", 30).over(w)).alias("ret_60s_r"),
        trail("volume", 5).alias("vol_10"),
        trail("volume", 15).alias("vol_30"),
        trail("buy_volume", 5).alias("buy_10"),
        trail("sell_volume", 5).alias("sell_10"),
        trail("trades", 5).alias("trades_10"),
        trail("notional", 5).alias("dollar_10"),
        F.stddev_samp("price").over(w.rowsBetween(-29, 0)).alias("volat_r"),
        (F.col("price") - F.lag("price", 5).over(w)).alias("momentum_r"),
        F.avg(F.col("has_obs").cast("int")).over(w.rowsBetween(-14, 0)).alias(
            "completeness_r"
        ),
    )

    hour = (F.expr("feature_ts div 3600") % 24).cast("int")
    s2 = s1.select(
        "*",
        (F.col("momentum_r") - F.lag("momentum_r", 5).over(w)).alias("accel_r"),
        hour.alias("hh"),
    )

    return s2.select(
        "symbol",
        "feature_ts",
        (F.col("feature_ts") * 1000).cast("long").alias("feature_ts_ms"),
        r6(F.col("price")).alias("price"),
        r6(F.col("mid")).alias("mid_price"),
        r6(F.col("ret_2s_r")).alias("ret_2s"),
        r6(F.col("ret_10s_r")).alias("ret_10s"),
        r6(F.col("ret_30s_r")).alias("ret_30s"),
        r6(F.col("ret_60s_r")).alias("ret_60s"),
        r6(F.col("volume")).alias("volume_2s"),
        r6(F.col("vol_10")).alias("volume_10s"),
        r6(F.col("vol_30")).alias("volume_30s"),
        r6(
            (F.col("buy_volume") - F.col("sell_volume"))
            / F.greatest(F.col("volume"), F.lit(1.0))
        ).alias("vol_imbalance_2s"),
        r6(
            (F.col("buy_10") - F.col("sell_10")) / F.greatest(F.col("vol_10"), F.lit(1.0))
        ).alias("vol_imbalance_10s"),
        r6(F.col("spread_bp_r")).alias("spread_bp"),
        r6(F.col("ob_imb_r")).alias("ob_imbalance"),
        r6(F.col("bid_ask_ratio_r")).alias("bid_ask_ratio"),
        r6(F.col("trades") / F.lit(2.0)).alias("trade_intensity_2s"),
        r6(F.col("trades_10") / F.lit(10.0)).alias("trade_intensity_10s"),
        r6(
            F.when(F.col("trades") > 0, F.col("volume") / F.col("trades"))
        ).alias("avg_trade_size_2s"),
        r6(F.col("notional")).alias("dollar_volume_2s"),
        r6(F.col("dollar_10")).alias("dollar_volume_10s"),
        r6(
            F.when(F.col("vol_10") > 0, F.col("dollar_10") / F.col("vol_10")) - F.col("mid")
        ).alias("vwap_dev_10s"),
        r6(F.col("volat_r")).alias("price_volatility"),
        r6(F.col("momentum_r")).alias("momentum"),
        r6(F.col("accel_r")).alias("acceleration"),
        r6(F.sin(F.lit(TWO_PI) * F.col("hh") / F.lit(24.0))).alias("hour_sin"),
        r6(F.cos(F.lit(TWO_PI) * F.col("hh") / F.lit(24.0))).alias("hour_cos"),
        ((F.col("hh") >= 14) & (F.col("hh") < 21)).cast("int").alias("is_us_hours"),
        ((F.col("hh") >= 0) & (F.col("hh") < 7)).cast("int").alias("is_asia_hours"),
        ((F.col("hh") >= 7) & (F.col("hh") < 14)).cast("int").alias("is_europe_hours"),
        r6(F.col("completeness_r")).alias("completeness"),
        "data_age_ms",
        "gap_indicator",
        F.when(F.col("gap_indicator"), F.lit("degraded"))
        .otherwise(F.col("source"))
        .alias("source_quality"),
    )


# DuckDB twin of gold_vector_2s — compose with
# OD.locf_grid_cte(step_s=2, slice_s=GOLD_SLICE_S) and OD.BBA_CTE.
GOLD_VECTOR_2S_ORACLE_BODY = """
,bba_tick AS (
  SELECT symbol, event_ts // 2000 AS tick,
         arg_max(bid_px, event_ts) AS o_bid_px,
         arg_max(ask_px, event_ts) AS o_ask_px,
         arg_max(bid_sz, event_ts) AS o_bid_sz,
         arg_max(ask_sz, event_ts) AS o_ask_sz
  FROM bba GROUP BY 1, 2
),
gbase AS (
  SELECT l.*,
         last_value(b.o_bid_px IGNORE NULLS) OVER cum AS bid_px,
         last_value(b.o_ask_px IGNORE NULLS) OVER cum AS ask_px,
         last_value(b.o_bid_sz IGNORE NULLS) OVER cum AS bid_sz,
         last_value(b.o_ask_sz IGNORE NULLS) OVER cum AS ask_sz
  FROM locf l
  LEFT JOIN bba_tick b ON l.symbol = b.symbol AND l.tick = b.tick
  WINDOW cum AS (PARTITION BY l.symbol ORDER BY l.tick
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
g1 AS (
  SELECT symbol, tick, feature_ts, price, volume, buy_volume, sell_volume,
         notional, trades, data_age_ms, gap_indicator, source,
         (bid_px + ask_px) / 2.0 AS mid,
         (ask_px - bid_px) / ((bid_px + ask_px) / 2.0) * 10000.0 AS spread_bp_r,
         (bid_sz - ask_sz) / (bid_sz + ask_sz) AS ob_imb_r,
         bid_sz / ask_sz AS bid_ask_ratio_r,
         ln(price / lag(price, 1)  OVER w) AS ret_2s_r,
         ln(price / lag(price, 5)  OVER w) AS ret_10s_r,
         ln(price / lag(price, 15) OVER w) AS ret_30s_r,
         ln(price / lag(price, 30) OVER w) AS ret_60s_r,
         sum(volume) OVER t5  AS vol_10,
         sum(volume) OVER t15 AS vol_30,
         sum(buy_volume) OVER t5  AS buy_10,
         sum(sell_volume) OVER t5 AS sell_10,
         sum(trades) OVER t5 AS trades_10,
         sum(notional) OVER t5 AS dollar_10,
         stddev_samp(price) OVER t30 AS volat_r,
         price - lag(price, 5) OVER w AS momentum_r,
         avg(CAST(has_obs AS INTEGER)) OVER t15 AS completeness_r
  FROM gbase
  WINDOW w   AS (PARTITION BY symbol ORDER BY tick),
         t5  AS (PARTITION BY symbol ORDER BY tick ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         t15 AS (PARTITION BY symbol ORDER BY tick ROWS BETWEEN 14 PRECEDING AND CURRENT ROW),
         t30 AS (PARTITION BY symbol ORDER BY tick ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
),
g2 AS (
  SELECT *,
         momentum_r - lag(momentum_r, 5) OVER w AS accel_r,
         CAST((feature_ts // 3600) % 24 AS INTEGER) AS hh
  FROM g1
  WINDOW w AS (PARTITION BY symbol ORDER BY tick)
)
SELECT symbol, feature_ts,
       CAST(feature_ts * 1000 AS BIGINT) AS feature_ts_ms,
       round(price, 6) AS price,
       round(mid, 6) AS mid_price,
       round(ret_2s_r, 6)  AS ret_2s,
       round(ret_10s_r, 6) AS ret_10s,
       round(ret_30s_r, 6) AS ret_30s,
       round(ret_60s_r, 6) AS ret_60s,
       round(volume, 6) AS volume_2s,
       round(vol_10, 6) AS volume_10s,
       round(vol_30, 6) AS volume_30s,
       round((buy_volume - sell_volume) / greatest(volume, 1.0), 6) AS vol_imbalance_2s,
       round((buy_10 - sell_10) / greatest(vol_10, 1.0), 6) AS vol_imbalance_10s,
       round(spread_bp_r, 6) AS spread_bp,
       round(ob_imb_r, 6) AS ob_imbalance,
       round(bid_ask_ratio_r, 6) AS bid_ask_ratio,
       round(trades / 2.0, 6) AS trade_intensity_2s,
       round(trades_10 / 10.0, 6) AS trade_intensity_10s,
       round(CASE WHEN trades > 0 THEN volume / trades END, 6) AS avg_trade_size_2s,
       round(notional, 6) AS dollar_volume_2s,
       round(dollar_10, 6) AS dollar_volume_10s,
       round(CASE WHEN vol_10 > 0 THEN dollar_10 / vol_10 END - mid, 6) AS vwap_dev_10s,
       round(volat_r, 6) AS price_volatility,
       round(momentum_r, 6) AS momentum,
       round(accel_r, 6) AS acceleration,
       round(sin(2 * pi() * hh / 24.0), 6) AS hour_sin,
       round(cos(2 * pi() * hh / 24.0), 6) AS hour_cos,
       CAST(hh >= 14 AND hh < 21 AS INTEGER) AS is_us_hours,
       CAST(hh >= 0 AND hh < 7 AS INTEGER)   AS is_asia_hours,
       CAST(hh >= 7 AND hh < 14 AS INTEGER)  AS is_europe_hours,
       round(completeness_r, 6) AS completeness,
       data_age_ms, gap_indicator,
       CASE WHEN gap_indicator THEN 'degraded' ELSE source END AS source_quality
FROM g2"""


def gold_training_set_1s(spark: SparkSession, sf_dir: str, slice_s: int = GOLD_SLICE_S) -> DataFrame:
    """The complete training dataset at the reference's true gold grain
    (S3_SCHEMA.md §3 "Training Datasets" over the §1/§2 feature + label
    schemas): the ~60-column 1-second feature vector joined with its
    10-second-ahead labels, filtered to valid horizons, with the
    leakage-free time split.

    Leakage control is structural, as in gold_training_set: every feature is
    backward-looking (trailing windows/LOCF), every label strictly forward
    (lead/forward frames), the join is on the grid timestamp itself, and the
    split is a time quantile — nothing depends on call-site discipline.

    Plan shape: the feature and label branches share the same
    (symbol, tick) grid keys, so the join is co-partitioned; the split
    boundary is a broadcast scalar."""
    feats = gold_vector(spark, sf_dir, slice_s)
    labels = grid_ops.grid_labels(
        pipeline.locf_grid(spark, sf_dir, step_s=1, slice_s=slice_s)
    ).select(
        "symbol",
        "feature_ts",
        "target_price",
        "return_10s",
        "direction",
        # the feature vector already carries a TRAILING volume_10s; the
        # label's FORWARD 10s volume gets a label_ prefix
        F.col("volume_10s").alias("label_volume_10s"),
        "gap_in_window",
        "is_valid",
    )
    j = feats.join(labels, ["symbol", "feature_ts"]).filter(F.col("is_valid")).drop(
        "is_valid"
    )
    rng = j.groupBy().agg(
        F.min("feature_ts").alias("lo"), F.max("feature_ts").alias("hi")
    )
    span = F.col("hi") - F.col("lo")
    out = j.join(F.broadcast(rng)).select(
        j["*"],
        F.when(F.col("feature_ts") <= F.col("lo") + F.floor(span * 0.7), "train")
        .when(F.col("feature_ts") <= F.col("lo") + F.floor(span * 0.85), "val")
        .otherwise("test")
        .alias("split"),
    )
    return out


GOLD_TRAINING_1S_ORACLE_TAIL = f"""
,lab AS (
  SELECT symbol, feature_ts,
         round(lead(price, 10) OVER w, 6) AS target_price,
         round(ln(lead(price, 10) OVER w / price), 6) AS return_10s,
         CAST(CASE WHEN ln(lead(price, 10) OVER w / price) > {DIRECTION_EPS} THEN 1
                   WHEN ln(lead(price, 10) OVER w / price) < -{DIRECTION_EPS} THEN -1
                   WHEN lead(price, 10) OVER w IS NULL THEN NULL
                   ELSE 0 END AS INTEGER) AS direction,
         round(sum(volume) OVER fwd, 6) AS volume_10s,
         max(CASE WHEN gap_indicator THEN 1 ELSE 0 END) OVER fwd = 1 AS gap_in_window,
         count(price) OVER fwd = 10 AS is_valid
  FROM locf
  WINDOW w AS (PARTITION BY symbol ORDER BY tick),
         fwd AS (PARTITION BY symbol ORDER BY tick
                 ROWS BETWEEN 1 FOLLOWING AND 10 FOLLOWING)
),
joined AS (
  SELECT g.* EXCLUDE (tick),
         l.target_price, l.return_10s, l.direction,
         l.volume_10s AS label_volume_10s, l.gap_in_window
  FROM gold_vec g JOIN lab l ON g.symbol = l.symbol AND g.feature_ts = l.feature_ts
  WHERE l.is_valid
),
rng AS (SELECT min(feature_ts) AS lo, max(feature_ts) AS hi FROM joined)
SELECT joined.*,
       CASE WHEN feature_ts <= lo + floor((hi - lo) * 0.7) THEN 'train'
            WHEN feature_ts <= lo + floor((hi - lo) * 0.85) THEN 'val'
            ELSE 'test' END AS split
FROM joined CROSS JOIN rng"""


def gold_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data governance audit over the gold training set: per
    (split, symbol) — row count, direction-class counts and shares,
    feature NULL rates (the lag features are legitimately NULL at each
    symbol's head; anything beyond that is a pipeline bug), and the mean
    absolute label.  The pre-training checklist an ML pipeline runs
    before fitting anything: class imbalance, split sizes, and
    missingness in ONE table.

    Determinism: every count is an exact BIGINT; shares divide exact
    integers; the mean |label| sums the 6-dp-rounded label column as
    exact DECIMAL(18,6) before one double division.

    Plan shape: the declared gold plan (bars → one symbol sort →
    broadcast split boundary) + ONE calendar-bounded (split, symbol)
    aggregate on top.

    cf. reference: extends the surface (the audit consumer of the
    trainer's dataset; the reference trains without one)."""
    g = gold_training_set(spark, sf_dir)
    c = g.groupBy("split", "symbol").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("direction") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_up"),
        F.sum(F.when(F.col("direction") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_down"),
        F.sum(F.when(F.col("direction") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_flat"),
        F.sum(F.when(F.col("ret_1").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_ret_1"),
        F.sum(F.when(F.col("ret_5").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_ret_5"),
        F.sum(F.when(F.col("volatility_10").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_volatility_10"),
        F.sum(F.abs(F.col("return_10")).cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .alias("sabs"),
    )
    n = F.col("n_rows").cast("double")
    return c.select(
        "split",
        "symbol",
        "n_rows",
        "n_up",
        "n_down",
        "n_flat",
        r6(F.col("n_up") / n).alias("share_up"),
        r6(F.col("n_down") / n).alias("share_down"),
        r6(F.col("n_flat") / n).alias("share_flat"),
        "null_ret_1",
        "null_ret_5",
        "null_volatility_10",
        r6(F.col("sabs").cast("double") / n).alias("mean_abs_return_10"),
    )


# wrap the gold oracle's final SELECT as one more CTE, then aggregate —
# the audit's oracle IS the declared gold oracle plus a GROUP BY
_GOLD_CTES, _GOLD_FINAL = GOLD_ORACLE_BODY.rsplit("\nSELECT ", 1)
GOLD_BALANCE_ORACLE_BODY = (
    _GOLD_CTES
    + ",\ngold_rows AS (SELECT "
    + _GOLD_FINAL
    + """)
SELECT split, symbol,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN direction = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_up,
       CAST(sum(CASE WHEN direction = -1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_down,
       CAST(sum(CASE WHEN direction = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_flat,
       round(sum(CASE WHEN direction = 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS share_up,
       round(sum(CASE WHEN direction = -1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS share_down,
       round(sum(CASE WHEN direction = 0 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS share_flat,
       CAST(sum(CASE WHEN ret_1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_ret_1,
       CAST(sum(CASE WHEN ret_5 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_ret_5,
       CAST(sum(CASE WHEN volatility_10 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_volatility_10,
       round(CAST(CAST(sum(CAST(abs(return_10) AS DECIMAL(18,6)))
                       AS DECIMAL(38,6)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS mean_abs_return_10
FROM gold_rows
GROUP BY split, symbol"""
)


GOLD_SCREEN_FEATURES = (
    "ret_1",
    "ret_5",
    "volatility_10",
    "volume",
    "volume_imbalance",
    "trade_count",
    "hour_sin",
    "hour_cos",
)


def gold_feature_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Univariate feature screen over the gold training set: for every
    candidate feature, the Pearson correlation with the ``return_10``
    label and the usable-pair count — the first table an ML pipeline
    reads before fitting anything (a feature whose |corr| sits at noise
    level is a drop candidate; one that suddenly jumps between rounds is
    leakage).  Uses the SAME declared gold plan the trainer consumes.

    Plan shape: the gold subtree once, a map-side `stack` fan-out
    (n_features× — a constant), one (feature)-keyed partial-combinable
    aggregate.  Engine `corr` == DuckDB `corr` at the 6-dp grain (the
    q_corr parity).

    cf. reference: extends the surface (the audit consumer of the
    trainer's dataset; the reference trains without one)."""
    g = gold_training_set(spark, sf_dir)
    stack_args = ", ".join(
        f"'{f}', CAST({f} AS DOUBLE)" for f in GOLD_SCREEN_FEATURES
    )
    s = g.select(
        F.col("return_10").alias("y"),
        F.expr(
            f"stack({len(GOLD_SCREEN_FEATURES)}, {stack_args}) "
            "AS (feature, x)"
        ),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    g2 = s.groupBy("feature").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_pairs").cast("double")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        varx * vary
    )
    # explicit moments + a zero-variance guard: ANSI-mode F.corr raises
    # DIVIDE_BY_ZERO on a constant feature (tiny-SF gold slices hit it);
    # DuckDB's corr returns NULL there — the guard pins NULL on both sides
    return g2.select(
        "feature",
        "n_pairs",
        F.when((varx > 0) & (vary > 0), r6(corr)).alias("corr_with_label"),
        F.when((varx > 0) & (vary > 0), r6(F.abs(corr))).alias("abs_corr"),
    )


# the gold oracle's final SELECT wrapped as gold_rows (the
# GOLD_BALANCE pattern), then one UNION ALL fan-out + corr per feature
GOLD_SCREEN_ORACLE_BODY = (
    _GOLD_CTES
    + ",\ngold_rows AS (SELECT "
    + _GOLD_FINAL
    + """),
screen AS (
"""
    + "\n  UNION ALL\n".join(
        f"  SELECT '{f}' AS feature, CAST({f} AS DOUBLE) AS x,"
        f" return_10 AS y FROM gold_rows"
        for f in GOLD_SCREEN_FEATURES
    )
    + """
)
SELECT feature, n_pairs,
       CASE WHEN CAST(n_pairs AS DOUBLE) * sxx - sx * sx > 0
             AND CAST(n_pairs AS DOUBLE) * syy - sy * sy > 0
            THEN round((CAST(n_pairs AS DOUBLE) * sxy - sx * sy)
                 / sqrt((CAST(n_pairs AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n_pairs AS DOUBLE) * syy - sy * sy)), 6)
       END AS corr_with_label,
       CASE WHEN CAST(n_pairs AS DOUBLE) * sxx - sx * sx > 0
             AND CAST(n_pairs AS DOUBLE) * syy - sy * sy > 0
            THEN round(abs((CAST(n_pairs AS DOUBLE) * sxy - sx * sy)
                 / sqrt((CAST(n_pairs AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n_pairs AS DOUBLE) * syy - sy * sy))), 6)
       END AS abs_corr
FROM (
  SELECT feature,
         CAST(count(*) AS BIGINT) AS n_pairs,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM screen
  WHERE x IS NOT NULL AND y IS NOT NULL
  GROUP BY feature
)"""
)
