"""Join operators (SURVEY §2.6, J1-J5).

The reference has no general join executor — joins appear in its documented
SQL layer (as-of outcome fill, RDS_SCHEMA.md:703-756) and implicitly in
feature assembly (multi-hash gather, services/inference + aggregator
READMEs).  This module expresses them Spark-first:

- **As-of join** (J1): Spark has no native as-of.  The scalable pattern used
  here is the UNION + LOCF trick: interleave query rows and reference rows
  into one stream, sort per key, and carry the last reference value forward
  with ``last(..., ignorenulls=True)``.  One shuffle + one sort per key —
  O(n log n) total, no range-join blowup, works at 100 TB.  (The naive
  range join + row_number is O(n·m) per key; `pd.merge_asof` via
  applyInPandas would serialize every group through Python.)
- **Feature/label alignment** (J2) and **interval containment** (J4) are
  equi-joins after bucketing — the bucketing rewrite turns a theta range
  join into a hash join (SURVEY §4).
- **Dim enrichment** (J5): broadcast hash joins, see operators/relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import r6

ASOF_TOLERANCE_MS = 6 * 3_600_000


def asof_purchase_click(events: DataFrame, tolerance_ms: int = ASOF_TOLERANCE_MS) -> DataFrame:
    """J1: as-of lookup — each `purchase` event gets the most recent `click`
    value for the same user at-or-before its event time, NULLed when staler
    than `tolerance_ms` (reference: nearest-price fill with a ±30 s validity
    window, RDS_SCHEMA.md:719-732).

    Right side is pre-aggregated to one row per (user_id, ms) so the as-of
    tie semantics are well-defined in both engines.
    """
    ms = F.expr("ts div 1000")
    base = events.select(
        F.col("event_id"),
        F.col("user_id"),
        ms.cast("long").alias("ms"),
        F.col("event_type"),
        F.col("value"),
    )
    purchases = base.filter(F.col("event_type") == "purchase")
    clicks = (
        base.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ms")
        .agg(F.max_by("value", "event_id").alias("click_value"))
    )

    u = purchases.select(
        "user_id",
        "ms",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
        F.lit(None).cast("double").alias("click_value"),
        F.lit(None).cast("long").alias("click_src_ms"),
        F.lit(1).alias("is_q"),
    ).unionByName(
        clicks.select(
            "user_id",
            "ms",
            F.lit(None).cast("long").alias("purchase_id"),
            F.lit(None).cast("double").alias("purchase_value"),
            "click_value",
            F.col("ms").alias("click_src_ms"),
            F.lit(0).alias("is_q"),
        )
    )
    # clicks (is_q=0) sort before purchases at the same ms → at-or-before.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "is_q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # LOCF a single struct so (ms, value) always travel TOGETHER — carrying
    # them in separate last(ignorenulls) calls would pair a stale value with
    # a fresher timestamp whenever a click's value is NULL, diverging from
    # as-of semantics (match the row; its value may legitimately be NULL).
    click_row = F.when(
        F.col("is_q") == 0,
        F.struct(F.col("click_src_ms").alias("ms"), F.col("click_value").alias("v")),
    )
    locf = F.last(click_row, ignorenulls=True).over(w)
    out = (
        u.withColumn("lv", locf.getField("v"))
        .withColumn("lm", locf.getField("ms"))
        .filter(F.col("is_q") == 1)
    )
    fresh = F.col("lm").isNotNull() & ((F.col("ms") - F.col("lm")) <= tolerance_ms)
    return out.select(
        "user_id",
        "purchase_id",
        F.col("ms").alias("purchase_ms"),
        "purchase_value",
        F.when(fresh, F.col("lm")).alias("click_ms"),
        r6(F.when(fresh, F.col("lv"))).alias("click_value"),
        F.when(fresh, F.col("ms") - F.col("lm")).cast("long").alias("age_ms"),
    )


ASOF_ORACLE = f"""
WITH base AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ms, event_type, value FROM events
),
purchases AS (SELECT * FROM base WHERE event_type = 'purchase'),
clicks AS (
  SELECT user_id, ms, arg_max(value, event_id) AS click_value
  FROM base WHERE event_type = 'click' GROUP BY user_id, ms
),
j AS (
  SELECT p.user_id, p.event_id AS purchase_id, p.ms AS purchase_ms,
         p.value AS purchase_value, c.ms AS cms, c.click_value AS cval
  FROM purchases p
  ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ms >= c.ms
)
SELECT user_id, purchase_id, purchase_ms, purchase_value,
       CASE WHEN cms IS NOT NULL AND purchase_ms - cms <= {ASOF_TOLERANCE_MS}
            THEN cms END AS click_ms,
       round(CASE WHEN cms IS NOT NULL AND purchase_ms - cms <= {ASOF_TOLERANCE_MS}
            THEN cval END, 6) AS click_value,
       CAST(CASE WHEN cms IS NOT NULL AND purchase_ms - cms <= {ASOF_TOLERANCE_MS}
            THEN purchase_ms - cms END AS BIGINT) AS age_ms
FROM j"""


def feature_label_join(bars: DataFrame, labels: DataFrame) -> DataFrame:
    """J2: feature ⋈ label alignment on (symbol, bucket) — the training-set
    assembly (labels carry the feature key, S3_SCHEMA.md:629-631).  Inner
    join restricted to valid labels: time-aligned, leakage-free rows."""
    feats = bars.select(
        "symbol", "bucket", "close", "volume", "vwap", "volume_imbalance", "trade_count"
    )
    lbl = labels.filter(F.col("is_valid")).select(
        "symbol", "bucket", "target_price", "return_10", "direction"
    )
    return feats.join(lbl, ["symbol", "bucket"], "inner")


def interval_join(trades: DataFrame, bars: DataFrame) -> DataFrame:
    """J4: interval containment — each trade joined to its enclosing 1-minute
    bar (`open_time <= t < close_time`, RDS_SCHEMA.md:721-723) rewritten as
    an equi-join on the floor bucket: hash join instead of a theta range
    join, broadcast/shuffle chosen by AQE."""
    t = trades.withColumn("bucket", F.expr("event_ts div 60000").cast("long"))
    b = bars.select("symbol", "bucket", "vwap", "volume")
    out = t.join(b, ["symbol", "bucket"], "inner")
    return out.select(
        "symbol",
        "trade_id",
        "event_ts",
        "bucket",
        "price",
        "vwap",
        r6(F.col("price") - F.col("vwap")).alias("vwap_deviation"),
        r6((F.col("price") - F.col("vwap")) / F.col("vwap") * 10000.0).alias(
            "vwap_deviation_bp"
        ),
    )


def feature_assembly(
    trade_feats: DataFrame, bba_feats: DataFrame, depth_feats: DataFrame
) -> DataFrame:
    """J3: multi-source feature assembly — the engine analog of the
    reference's parallel Redis hgetall gather (`ob:` + `tr:` + `feat:` per
    symbol, aggregator/README.md, inference/README.md 4-way gather).

    trade ⋈ bba on (symbol, bucket); the per-symbol depth snapshot is a tiny
    dimension → broadcast (no shuffle for the third input)."""
    tf = trade_feats.select(
        "symbol", "bucket", "latest_price", "vwap", "volume_imbalance",
        "trades_per_second", "price_volatility",
    )
    bf = bba_feats.select(
        "symbol", "bucket", "latest_bid", "latest_ask", "latest_spread_bp",
        "size_imbalance",
    )
    df = depth_feats.select(
        "symbol", "bid_depth_5", "ask_depth_5", "depth_imbalance",
    )
    return tf.join(bf, ["symbol", "bucket"], "inner").join(
        F.broadcast(df), ["symbol"], "left"
    )


LR_QUOTE_MAX_AGE_MS = 30_000  # quote staleness bound, mirrors the as-of window


def lee_ready(trades: DataFrame, quotes: DataFrame) -> DataFrame:
    """Lee–Ready trade-side classification (Lee & Ready 1991) — the
    canonical microstructure algorithm for inferring aggressor side when
    the feed has no taker flag: the QUOTE RULE signs each trade against
    the prevailing mid (above → buy, below → sell), and the TICK TEST
    breaks mid ties against the last DIFFERENT trade price.  This corpus
    carries ground truth (``is_buyer_maker``), so the output doubles as a
    per-symbol classifier audit: rule mix and accuracy vs truth — exactly
    how a desk validates the classifier before trusting it on flagless
    history.

    Plan shape: the prevailing mid is the union+LOCF as-of idiom (one
    (symbol)-keyed sort shared with the tick-test windows — no range
    join); quotes pre-aggregate to one row per (symbol, ms); the tick
    test is a conditional LOCF over the deduped trade sequence; one
    partial-combinable aggregate per symbol at the end.

    cf. reference: extends the surface (the reference always has the SBE
    taker flag, `feature_builder.py` trusts it; this reconstructs it)."""
    q = quotes.groupBy("symbol", "event_ts").agg(
        F.max("bid_px").alias("bid"), F.max("ask_px").alias("ask")
    )
    t = trades.select(
        "symbol",
        "event_ts",
        "trade_id",
        "price",
        "is_buyer_maker",
        F.lit(1).alias("is_t"),
        F.lit(None).cast("double").alias("bid"),
        F.lit(None).cast("double").alias("ask"),
    ).unionByName(
        q.select(
            "symbol",
            "event_ts",
            F.lit(None).cast("long").alias("trade_id"),
            F.lit(None).cast("double").alias("price"),
            F.lit(None).cast("boolean").alias("is_buyer_maker"),
            F.lit(0).alias("is_t"),
            "bid",
            "ask",
        )
    )
    # quotes sort before trades at the same ms -> at-or-before semantics
    w = (
        Window.partitionBy("symbol")
        .orderBy("event_ts", "is_t", "trade_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    quote_row = F.when(
        F.col("is_t") == 0,
        F.struct(
            F.col("event_ts").alias("qts"),
            ((F.col("bid") + F.col("ask")) / 2.0).alias("mid"),
        ),
    )
    lq = F.last(quote_row, ignorenulls=True).over(w)
    tr = (
        t.withColumn("mid", lq.getField("mid"))
        .withColumn("qts", lq.getField("qts"))
        .filter(F.col("is_t") == 1)
    )
    fresh = F.col("qts").isNotNull() & (
        (F.col("event_ts") - F.col("qts")) <= LR_QUOTE_MAX_AGE_MS
    )
    # tick test state: last DIFFERENT price strictly before this trade
    tw = (
        Window.partitionBy("symbol")
        .orderBy("event_ts", "trade_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev = F.lag("price").over(
        Window.partitionBy("symbol").orderBy("event_ts", "trade_id")
    )
    tr = tr.withColumn(
        "ldp",
        F.last(
            F.when(F.col("price") != prev, prev), ignorenulls=True
        ).over(tw),
    )
    quote_side = F.when(F.col("price") > F.col("mid"), 1).when(
        F.col("price") < F.col("mid"), -1
    )
    tick_side = F.when(F.col("price") > F.col("ldp"), 1).when(
        F.col("price") < F.col("ldp"), -1
    )
    side = F.when(fresh & quote_side.isNotNull(), quote_side).otherwise(
        tick_side
    )
    method = (
        F.when(fresh & quote_side.isNotNull(), F.lit("quote"))
        .when(tick_side.isNotNull(), F.lit("tick"))
        .otherwise(F.lit("none"))
    )
    truth = F.when(F.col("is_buyer_maker"), -1).otherwise(1)
    classified = tr.select(
        "symbol",
        method.alias("method"),
        (side == truth).alias("correct"),
    )
    n_classified = F.sum(F.when(F.col("method") != "none", 1).otherwise(0))
    return classified.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_trades"),
        F.sum(F.when(F.col("method") == "quote", 1).otherwise(0))
        .cast("long")
        .alias("n_quote_rule"),
        F.sum(F.when(F.col("method") == "tick", 1).otherwise(0))
        .cast("long")
        .alias("n_tick_test"),
        F.sum(F.when(F.col("method") == "none", 1).otherwise(0))
        .cast("long")
        .alias("n_unclassified"),
        # zero guard: a symbol with NO classifiable trade (no fresh quote,
        # no prior different price) must emit NULL, not 0/0 — Spark gives
        # NaN there while DuckDB's round() may disagree cross-engine.
        F.when(
            n_classified > 0,
            r6(F.sum(F.when(F.col("correct"), 1).otherwise(0)) / n_classified),
        ).alias("accuracy"),
    )


LEE_READY_ORACLE_BODY = f"""
q AS (
  SELECT symbol, event_ts, max(bid_px) AS bid, max(ask_px) AS ask
  FROM bba GROUP BY symbol, event_ts
),
u AS (
  SELECT symbol, event_ts, trade_id, price, is_buyer_maker, 1 AS is_t,
         CAST(NULL AS DOUBLE) AS bid, CAST(NULL AS DOUBLE) AS ask
  FROM dedup_trades
  UNION ALL
  SELECT symbol, event_ts, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
         CAST(NULL AS BOOLEAN), 0, bid, ask
  FROM q
),
l AS (
  SELECT *, last_value(
      CASE WHEN is_t = 0
           THEN {{'qts': event_ts, 'mid': (bid + ask) / 2.0}} END
      IGNORE NULLS) OVER (
        PARTITION BY symbol ORDER BY event_ts, is_t, trade_id
        ROWS UNBOUNDED PRECEDING) AS lq
  FROM u
),
tr AS (
  SELECT symbol, event_ts, trade_id, price, is_buyer_maker,
         lq.mid AS mid, lq.qts AS qts
  FROM l WHERE is_t = 1
),
tt AS (
  SELECT *, last_value(
      CASE WHEN price != prev THEN prev END IGNORE NULLS) OVER (
        PARTITION BY symbol ORDER BY event_ts, trade_id
        ROWS UNBOUNDED PRECEDING) AS ldp
  FROM (
    SELECT *, lag(price) OVER (
        PARTITION BY symbol ORDER BY event_ts, trade_id) AS prev
    FROM tr)
),
c AS (
  SELECT symbol,
         CASE WHEN qts IS NOT NULL AND event_ts - qts <= {{max_age}}
                   AND (price > mid OR price < mid) THEN 'quote'
              WHEN price > ldp OR price < ldp THEN 'tick'
              ELSE 'none' END AS method,
         CASE WHEN qts IS NOT NULL AND event_ts - qts <= {{max_age}}
                   AND (price > mid OR price < mid)
              THEN CASE WHEN price > mid THEN 1 ELSE -1 END
              WHEN price > ldp THEN 1 WHEN price < ldp THEN -1 END AS side,
         CASE WHEN is_buyer_maker THEN -1 ELSE 1 END AS truth
  FROM tt
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_trades,
       CAST(sum(CASE WHEN method = 'quote' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_quote_rule,
       CAST(sum(CASE WHEN method = 'tick' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_tick_test,
       CAST(sum(CASE WHEN method = 'none' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unclassified,
       CASE WHEN sum(CASE WHEN method != 'none' THEN 1 ELSE 0 END) > 0
            THEN round(sum(CASE WHEN side = truth THEN 1 ELSE 0 END) * 1.0
                       / sum(CASE WHEN method != 'none' THEN 1 ELSE 0 END), 6)
       END AS accuracy
FROM c GROUP BY symbol"""


LEE_READY_BODY = LEE_READY_ORACLE_BODY.replace(
    "{max_age}", str(LR_QUOTE_MAX_AGE_MS)
)
