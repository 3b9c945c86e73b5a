"""Aggregation operators (SURVEY §2.4, A1-A12).

Each is a declarative groupBy/agg so Catalyst plans a partial (map-side)
aggregate before the shuffle — the scale-critical property: at 100 TB the
shuffle carries one partial row per (symbol, bucket) per input partition,
not raw ticks.  No Python UDFs anywhere in this module.

References for the semantics are cited per function (reference repo paths,
see SURVEY.md §2.4).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import r6
from .skew import HOT_KEY_SHARE_THRESHOLD, hot_key_share
from .. import oracle_defs as _OD

def _buy():
    return F.when(~F.col("is_buyer_maker"), F.col("qty")).otherwise(F.lit(0.0))


def _sell():
    return F.when(F.col("is_buyer_maker"), F.col("qty")).otherwise(F.lit(0.0))


def _bucket(ms_per_bucket: int):
    return F.expr(f"event_ts div {ms_per_bucket}")


def bars_1m(dedup_trades: DataFrame) -> DataFrame:
    """A4 flagship: 1-minute OHLCV bars with VWAP + volume imbalance.

    Semantics: docs/schemas/S3_SCHEMA.md:316-360 (silver 1-minute bar);
    VWAP = notional/volume (transformer.py:134-135); buy/sell split by
    is_buyer_maker with maker-sell == taker-buy (feature_builder.py:119-123).

    open/close use min_by/max_by(price, event_ts) — no sort, no window, one
    shuffle on (symbol, bucket); map-side partial aggregation handles the
    100 TB case (SURVEY §2.7 O1: prefer min_by/max_by over orderBy-first).
    """
    g = dedup_trades.groupBy(
        "symbol", _bucket(60000).cast("long").alias("bucket")
    ).agg(
        F.min_by("price", "event_ts").alias("open_raw"),
        F.max("price").alias("high_raw"),
        F.min("price").alias("low_raw"),
        F.max_by("price", "event_ts").alias("close_raw"),
        F.sum("qty").alias("volume_raw"),
        # price*qty lives on a 0.01 grid: sum in DECIMAL so the result is
        # bit-identical across engines (double sums are order-dependent and
        # grid values concentrate on rounding boundaries — see relational.py)
        F.sum((F.col("price") * F.col("qty")).cast("decimal(20,4)"))
        .cast("double")
        .alias("notional_raw"),
        F.count("*").alias("trade_count"),
        F.sum(_buy()).alias("buy_volume_raw"),
        F.sum(_sell()).alias("sell_volume_raw"),
        F.sum(F.when(~F.col("is_buyer_maker"), 1).otherwise(0))
        .cast("long")
        .alias("buy_trade_count"),
        F.sum(F.when(F.col("is_buyer_maker"), 1).otherwise(0))
        .cast("long")
        .alias("sell_trade_count"),
    )
    return g.select(
        "symbol",
        "bucket",
        r6(F.col("open_raw")).alias("open"),
        r6(F.col("high_raw")).alias("high"),
        r6(F.col("low_raw")).alias("low"),
        r6(F.col("close_raw")).alias("close"),
        r6(F.col("volume_raw")).alias("volume"),
        r6(F.col("notional_raw")).alias("notional"),
        "trade_count",
        "buy_trade_count",
        "sell_trade_count",
        r6(F.col("buy_volume_raw")).alias("buy_volume"),
        r6(F.col("sell_volume_raw")).alias("sell_volume"),
        r6(F.col("notional_raw") / F.col("volume_raw")).alias("vwap"),
        r6(
            (F.col("buy_volume_raw") - F.col("sell_volume_raw"))
            / F.greatest(F.col("volume_raw"), F.lit(1.0))
        ).alias("volume_imbalance"),
        r6(F.col("high_raw") - F.col("low_raw")).alias("price_range"),
        r6(F.col("close_raw") - F.col("open_raw")).alias("price_change"),
        r6((F.col("close_raw") - F.col("open_raw")) / F.col("open_raw") * 100.0).alias(
            "price_change_pct"
        ),
    )


def max_ts(trades: DataFrame) -> DataFrame:
    """A6: incremental high-watermark — resume point per (symbol, source)
    (db_writer.py:287-302: MAX(timestamp) WHERE symbol=? AND data_type=?)."""
    return trades.groupBy("symbol", "source").agg(
        F.max("event_ts").cast("long").alias("max_event_ts")
    )


def counts(trades: DataFrame) -> DataFrame:
    """A7: record counts per symbol (db_writer.py:304-320)."""
    return trades.groupBy("symbol").agg(F.count("*").cast("long").alias("n"))


def trade_features(dedup_trades: DataFrame, bucket_ms: int = 3_600_000) -> DataFrame:
    """A1: micro-batch trade feature aggregation.

    Reference computes these over each sorted micro-batch
    (services/aggregator/src/feature_builder.py:88-185): latest price, sum
    volume, count, min/max/avg price, VWAP (:141-143), buy/sell split
    (:119-123), trades_per_second = n/max(span,1), price change first→last,
    price stddev (:157-158), volume imbalance (:160-161), avg trade size.

    The engine's "micro-batch" is an event-time bucket (default 1 h — the
    testdata is ~14 trades/hour; production would use 1 s like the ref).
    first/last are min_by/max_by — no sort, map-side partials, one shuffle.
    """
    g = dedup_trades.groupBy(
        "symbol", F.expr(f"event_ts div {bucket_ms}").cast("long").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.sum("qty").alias("volume_raw"),
        F.sum((F.col("price") * F.col("qty")).cast("decimal(20,4)"))
        .cast("double")
        .alias("notional_raw"),
        F.min("price").alias("min_price_raw"),
        F.max("price").alias("max_price_raw"),
        (F.sum(F.col("price").cast("decimal(20,4)")).cast("double") / F.count("*"))
        .alias("avg_price_raw"),
        F.stddev_samp("price").alias("price_std_raw"),
        F.min_by("price", "event_ts").alias("first_price"),
        F.max_by("price", "event_ts").alias("latest_price_raw"),
        F.min("event_ts").alias("min_ts"),
        F.max("event_ts").alias("max_ts"),
        F.sum(_buy()).alias("buy_volume_raw"),
        F.sum(_sell()).alias("sell_volume_raw"),
    )
    span_s = (F.col("max_ts") - F.col("min_ts")) / F.lit(1000.0)
    return g.select(
        "symbol",
        "bucket",
        F.col("n").cast("long").alias("trade_count"),
        r6(F.col("latest_price_raw")).alias("latest_price"),
        r6(F.col("volume_raw")).alias("volume"),
        r6(F.col("min_price_raw")).alias("min_price"),
        r6(F.col("max_price_raw")).alias("max_price"),
        r6(F.col("avg_price_raw")).alias("avg_price"),
        r6(F.col("notional_raw") / F.col("volume_raw")).alias("vwap"),
        r6(F.col("price_std_raw")).alias("price_volatility"),
        r6(F.col("latest_price_raw") - F.col("first_price")).alias("price_change"),
        r6(
            (F.col("latest_price_raw") - F.col("first_price"))
            / F.col("first_price")
            * 100.0
        ).alias("price_change_pct"),
        r6(F.col("buy_volume_raw")).alias("buy_volume"),
        r6(F.col("sell_volume_raw")).alias("sell_volume"),
        r6(
            (F.col("buy_volume_raw") - F.col("sell_volume_raw"))
            / F.greatest(F.col("volume_raw"), F.lit(1.0))
        ).alias("volume_imbalance"),
        r6(F.col("n") / F.greatest(span_s, F.lit(1.0))).alias("trades_per_second"),
        r6(F.col("volume_raw") / F.col("n")).alias("avg_trade_size"),
    )


def bba_features(bba: DataFrame, bucket_ms: int = 3_600_000) -> DataFrame:
    """A2 + P9: best-bid/ask window features (feature_builder.py:187-286).

    Spread/mid arithmetic per :220-225, :264-266; the `latest_bid_size`
    NameError at :274-275 is implemented as intended (last observed sizes
    via max_by) per SURVEY §7.4.
    """
    spread = F.col("ask_px") - F.col("bid_px")
    mid = (F.col("ask_px") + F.col("bid_px")) / 2.0
    b = bba.withColumn("spread", spread).withColumn("mid", mid)
    g = b.groupBy(
        "symbol", F.expr(f"event_ts div {bucket_ms}").cast("long").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.max_by("bid_px", "event_ts").alias("latest_bid_raw"),
        F.max_by("ask_px", "event_ts").alias("latest_ask_raw"),
        F.max_by("bid_sz", "event_ts").alias("latest_bid_size_raw"),
        F.max_by("ask_sz", "event_ts").alias("latest_ask_size_raw"),
        # px/spread/mid sit on 1e-6 / 5e-7 grids (value × (1 + j/1e4)):
        # decimal sums keep cross-engine bit-identity
        (F.sum(F.col("bid_px").cast("decimal(24,6)")).cast("double") / F.count("*"))
        .alias("avg_bid_raw"),
        (F.sum(F.col("ask_px").cast("decimal(24,6)")).cast("double") / F.count("*"))
        .alias("avg_ask_raw"),
        (F.sum(F.col("spread").cast("decimal(24,6)")).cast("double") / F.count("*"))
        .alias("avg_spread_raw"),
        F.min("spread").alias("min_spread_raw"),
        F.max("spread").alias("max_spread_raw"),
        F.stddev_samp("spread").alias("spread_std_raw"),
        (F.sum(F.col("mid").cast("decimal(24,7)")).cast("double") / F.count("*"))
        .alias("avg_mid_raw"),
        F.min_by("mid", "event_ts").alias("first_mid"),
        F.max_by("mid", "event_ts").alias("last_mid"),
        F.sum(F.col("bid_sz").cast("decimal(20,2)")).cast("double").alias("total_bid_size_raw"),
        F.sum(F.col("ask_sz").cast("decimal(20,2)")).cast("double").alias("total_ask_size_raw"),
    )
    latest_mid = (F.col("latest_ask_raw") + F.col("latest_bid_raw")) / 2.0
    return g.select(
        "symbol",
        "bucket",
        F.col("n").cast("long").alias("quote_count"),
        r6(F.col("latest_bid_raw")).alias("latest_bid"),
        r6(F.col("latest_ask_raw")).alias("latest_ask"),
        r6(F.col("latest_bid_size_raw")).alias("latest_bid_size"),
        r6(F.col("latest_ask_size_raw")).alias("latest_ask_size"),
        r6(F.col("latest_ask_raw") - F.col("latest_bid_raw")).alias("latest_spread"),
        r6(
            (F.col("latest_ask_raw") - F.col("latest_bid_raw")) / latest_mid * 10000.0
        ).alias("latest_spread_bp"),
        r6(F.col("avg_bid_raw")).alias("avg_bid"),
        r6(F.col("avg_ask_raw")).alias("avg_ask"),
        r6(F.col("avg_spread_raw")).alias("avg_spread"),
        r6(F.col("min_spread_raw")).alias("min_spread"),
        r6(F.col("max_spread_raw")).alias("max_spread"),
        r6(F.col("spread_std_raw")).alias("spread_std"),
        r6(F.col("avg_mid_raw")).alias("avg_mid"),
        r6(F.col("last_mid") - F.col("first_mid")).alias("mid_change"),
        r6(F.col("total_bid_size_raw")).alias("total_bid_size"),
        r6(F.col("total_ask_size_raw")).alias("total_ask_size"),
        r6(
            (F.col("total_bid_size_raw") - F.col("total_ask_size_raw"))
            / F.greatest(
                F.col("total_bid_size_raw") + F.col("total_ask_size_raw"), F.lit(1.0)
            )
        ).alias("size_imbalance"),
    )


def depth_features(depth: DataFrame) -> DataFrame:
    """A3: latest-depth-snapshot features (feature_builder.py:288-354).

    Latest record per symbol (max_by over the full struct — latest-per-key
    without a sort), then array higher-order functions over the book:
    top-5 qty sums (:320-331), depth-weighted average prices, imbalance.
    All JVM-side (`slice`/`aggregate`) — no Python, arrays never explode.
    """
    latest = depth.groupBy("symbol").agg(
        F.max_by(
            F.struct("event_ts", "last_update_id", "bids", "asks"), F.col("event_ts")
        ).alias("s")
    ).select("symbol", "s.event_ts", "s.last_update_id", "s.bids", "s.asks")

    def qty_sum(col, n):
        return F.expr(
            f"aggregate(slice({col}, 1, {n}), cast(0.0 as double), (acc, x) -> acc + x.qty)"
        )

    def wavg(col, n):
        return F.expr(
            f"aggregate(slice({col}, 1, {n}), cast(0.0 as double), (acc, x) -> acc + x.price * x.qty)"
        ) / qty_sum(col, n)

    bid5, ask5 = qty_sum("bids", 5), qty_sum("asks", 5)
    bid10, ask10 = qty_sum("bids", 10), qty_sum("asks", 10)
    return latest.select(
        "symbol",
        "event_ts",
        "last_update_id",
        r6(F.expr("bids[0].price")).alias("best_bid"),
        r6(F.expr("asks[0].price")).alias("best_ask"),
        r6(F.expr("bids[0].qty")).alias("best_bid_qty"),
        r6(F.expr("asks[0].qty")).alias("best_ask_qty"),
        r6(bid5).alias("bid_depth_5"),
        r6(ask5).alias("ask_depth_5"),
        r6(wavg("bids", 10)).alias("bid_weighted_price"),
        r6(wavg("asks", 10)).alias("ask_weighted_price"),
        r6((bid10 - ask10) / F.greatest(bid10 + ask10, F.lit(1.0))).alias(
            "depth_imbalance"
        ),
    )


def daily_summary(dedup_trades: DataFrame) -> DataFrame:
    """A8: per (symbol, day) trading summary (docs/schemas/RDS_SCHEMA.md:445-502)."""
    g = dedup_trades.groupBy(
        "symbol", F.expr("event_ts div 86400000").cast("long").alias("day")
    ).agg(
        F.min_by("price", "event_ts").alias("open_raw"),
        F.max("price").alias("high_raw"),
        F.min("price").alias("low_raw"),
        F.max_by("price", "event_ts").alias("close_raw"),
        F.sum("qty").alias("volume_raw"),
        F.sum((F.col("price") * F.col("qty")).cast("decimal(20,4)"))
        .cast("double")
        .alias("notional_raw"),
        F.count("*").alias("total_trades"),
        F.avg("qty").alias("avg_trade_size_raw"),
        F.max("qty").alias("largest_trade_raw"),
        F.stddev_samp("price").alias("volatility_raw"),
        F.countDistinct("source").alias("n_sources"),
    )
    return g.select(
        "symbol",
        "day",
        r6(F.col("open_raw")).alias("open"),
        r6(F.col("high_raw")).alias("high"),
        r6(F.col("low_raw")).alias("low"),
        r6(F.col("close_raw")).alias("close"),
        r6(F.col("volume_raw")).alias("volume"),
        F.col("total_trades").cast("long").alias("total_trades"),
        r6(F.col("avg_trade_size_raw")).alias("avg_trade_size"),
        r6(F.col("largest_trade_raw")).alias("largest_trade"),
        r6(F.col("volatility_raw")).alias("volatility"),
        r6(F.col("notional_raw") / F.col("volume_raw")).alias("vwap"),
        r6(F.col("close_raw") - F.col("open_raw")).alias("price_change"),
        r6(F.col("high_raw") - F.col("low_raw")).alias("price_range"),
        F.col("n_sources").cast("long").alias("n_sources"),
    )


SLOW_LATENCY_MS = 200

# percentile_approx accuracy: relative error ≤ 1/accuracy; at 10k the sketch
# tracks the exact quantile within a few ms on the 0..250 ms latency range
# (gated by tests/test_plans.py::test_approx_percentile_tracks_exact)
PCTL_ACCURACY = 10_000


def _pctl(col: str, p: float, approx: bool, accuracy: int):
    """Exact `percentile` or the mergeable `percentile_approx` sketch for
    the 100 TB path.  Cross-engine note: DuckDB quantile_cont matches
    Spark's exact percentile only up to a last-ulp difference when the
    two bracketing values are EQUAL (Spark shortcuts, DuckDB lerps) —
    harmless for r6-rounded outputs, fatal for membership compares;
    oracles that compare against the unrounded quantile replicate
    Spark's branch structure via oracle_defs.spark_percentile_sql."""
    if approx:
        return F.percentile_approx(col, p, accuracy)
    return F.expr(f"percentile({col}, {p})")


def latency_percentiles(
    trades: DataFrame, approx: bool = False, accuracy: int = PCTL_ACCURACY
) -> DataFrame:
    """A9: ingest-latency distribution per symbol (RDS_SCHEMA.md:610-629,
    :761-788 — PERCENTILE_CONT, AVG, RMSE via sqrt(avg(x^2)), boolean rate).

    ``approx=False`` (the oracle/default path) uses exact `percentile`
    (== DuckDB quantile_cont), whose partial buffer holds every value in
    the group — fine per symbol-day, not mergeable in bounded memory.  At
    100 TB pass ``approx=True``: `percentile_approx` keeps a bounded
    quantile sketch per partial, merges map-side, and tracks exact within
    1/accuracy relative error — same schema, so callers flip the knob
    without editing the operator (api.register_views exposes it)."""
    lat = (F.col("ingest_ts") - F.col("event_ts")).cast("double")
    t = trades.withColumn("lat", lat)
    return t.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n"),
        r6(_pctl("lat", 0.5, approx, accuracy)).alias("p50_latency_ms"),
        r6(_pctl("lat", 0.95, approx, accuracy)).alias("p95_latency_ms"),
        r6(_pctl("lat", 0.99, approx, accuracy)).alias("p99_latency_ms"),
        r6(F.avg("lat")).alias("avg_latency_ms"),
        r6(F.sqrt(F.avg(F.col("lat") * F.col("lat")))).alias("rms_latency_ms"),
        r6(
            F.avg(F.when(F.col("lat") > SLOW_LATENCY_MS, 1.0).otherwise(0.0))
        ).alias("slow_rate"),
    )


def price_qty_corr(trades: DataFrame) -> DataFrame:
    """A10: Pearson correlation per symbol (RDS_SCHEMA.md:781 — CORR)."""
    return trades.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n"),
        r6(F.corr("price", "qty")).alias("price_qty_corr"),
        r6(F.covar_samp("price", "qty")).alias("price_qty_covar"),
    )


TRAILING_7D_MS = 7 * 86_400_000


def group_compare(trades: DataFrame) -> DataFrame:
    """A11: grouped source comparison over a trailing-7-day predicate
    (RDS_SCHEMA.md:635-662 — model_version GROUP BY over NOW()-7d; here the
    anchor is the dataset's max event_ts so the query is deterministic).

    The global max is a scalar aggregate broadcast back (tiny), NOT an
    unbounded window — an `over ()` max would funnel every row through one
    partition at 100 TB.
    """
    mx = trades.groupBy().agg(F.max("event_ts").alias("mx"))
    recent = trades.join(F.broadcast(mx)).filter(
        F.col("event_ts") >= F.col("mx") - F.lit(TRAILING_7D_MS)
    )
    return recent.groupBy("symbol", "source").agg(
        F.count("*").cast("long").alias("n"),
        r6(F.sum(F.col("price").cast("decimal(20,4)")).cast("double") / F.count("*"))
        .alias("avg_price"),
        r6(F.min("price")).alias("min_price"),
        r6(F.max("price")).alias("max_price"),
        r6(F.sum("qty")).alias("volume"),
    )


ACTIVE_DAY_MIN_VOLUME = 500.0


def health_rollup(dedup_trades: DataFrame) -> DataFrame:
    """A12: conditional-array roll-up (RDS_SCHEMA.md:794-840 — ARRAY_AGG of
    names matching a predicate).  Engine analog: per symbol, the sorted list
    of days whose volume cleared a threshold, joined to a deterministic
    string (collect_list order is nondeterministic → sort_array first)."""
    daily = dedup_trades.groupBy(
        "symbol", F.expr("event_ts div 86400000").cast("long").alias("day")
    ).agg(F.sum("qty").alias("volume"))
    active = daily.filter(F.col("volume") > ACTIVE_DAY_MIN_VOLUME)
    return active.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_active_days"),
        F.array_join(
            F.expr("transform(sort_array(collect_list(day)), x -> cast(x as string))"),
            ",",
        ).alias("active_days"),
    )


def distinct_counts(
    trades: DataFrame, approx: bool = False, rsd: float = 0.02
) -> DataFrame:
    """Distinct-cardinality stats per symbol (the dedup-observability
    numbers the reference tracks in its dedup caches,
    utils/deduplication.py:42-48 + s3_writer dedup stats).

    ``approx=False`` (default, the oracle-compared path): exact
    ``countDistinct`` — at 100 TB that is the expand + two-phase distinct
    aggregate, one extra shuffle per distinct column.  ``approx=True``:
    ``approx_count_distinct`` (HyperLogLog++ at relative error ``rsd``) —
    mergeable sketch partials, single aggregation pass, the scale default
    for observability counters where ±2% is fine.  Same schema either way;
    tests/test_plans.py gates the approx path's plan (no Expand) and its
    accuracy envelope, mirroring the percentile_approx knob pattern."""
    if approx:
        cd = lambda c: F.approx_count_distinct(c, rsd)  # noqa: E731
    else:
        cd = F.countDistinct
    return trades.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_rows"),
        cd("trade_id").cast("long").alias("n_distinct_ids"),
        cd("price").cast("long").alias("n_distinct_prices"),
        cd("source").cast("long").alias("n_sources"),
    )


def resample_bars(bars: DataFrame, from_ms: int = 60_000, to_ms: int = 3_600_000) -> DataFrame:
    """Bar resampling (1m → 1h by default): the silver-layer roll-up that
    turns fine bars into coarse ones without revisiting ticks
    (docs/schemas/S3_SCHEMA.md silver hierarchy; kline 1m bars are the
    REST-path input, s3_writer.py:150-175).

    OHLC composition rules: open = first bar's open, close = last bar's
    close (arg_min/arg_max on the fine bucket), high/low = extrema, sums for
    volume/notional/counts, VWAP recomputed from the exact notional.  One
    shuffle on the coarse key; at 100 TB this is how every coarser grain is
    served — ticks are aggregated exactly once.
    """
    factor = to_ms // from_ms
    g = bars.groupBy(
        "symbol", F.expr(f"bucket div {factor}").cast("long").alias("bucket")
    ).agg(
        F.min_by("open", "bucket").alias("open_raw"),
        F.max("high").alias("high_raw"),
        F.min("low").alias("low_raw"),
        F.max_by("close", "bucket").alias("close_raw"),
        F.sum("volume").alias("volume_raw"),
        F.sum(F.col("notional").cast("decimal(24,6)")).cast("double").alias("notional_raw"),
        F.sum("trade_count").cast("long").alias("trade_count"),
        F.count("*").cast("long").alias("n_source_bars"),
    )
    return g.select(
        "symbol",
        "bucket",
        r6(F.col("open_raw")).alias("open"),
        r6(F.col("high_raw")).alias("high"),
        r6(F.col("low_raw")).alias("low"),
        r6(F.col("close_raw")).alias("close"),
        r6(F.col("volume_raw")).alias("volume"),
        r6(F.col("notional_raw")).alias("notional"),
        r6(F.col("notional_raw") / F.col("volume_raw")).alias("vwap"),
        "trade_count",
        "n_source_bars",
    )


def profile_trades(trades: DataFrame) -> DataFrame:
    """Data-contract profiling over the normalized trade stream — the
    health/quality pass an ingestion pipeline publishes per run (null
    rates, cardinalities, ranges, out-of-contract counts).  One wide
    aggregate, map-side combinable; the distinct counts are the exact
    per-column cardinalities (production at 100 TB would flip these to
    approx_count_distinct — same plan shape, sketch partials)."""
    return trades.groupBy().agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct("symbol").cast("long").alias("n_symbols"),
        F.countDistinct("trade_id").cast("long").alias("n_trade_ids"),
        F.sum(F.when(F.col("price").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_price"),
        F.sum(F.when(F.col("qty").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_qty"),
        F.sum(F.when(F.col("price") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("nonpositive_price"),
        F.min("event_ts").cast("long").alias("min_event_ts"),
        F.max("event_ts").cast("long").alias("max_event_ts"),
        r6(F.min("price")).alias("min_price"),
        r6(F.max("price")).alias("max_price"),
        F.sum(F.when(F.col("ingest_ts") < F.col("event_ts"), 1).otherwise(0))
        .cast("long")
        .alias("ingest_before_event"),
    )


PROFILE_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT symbol) AS BIGINT) AS n_symbols,
       CAST(count(DISTINCT trade_id) AS BIGINT) AS n_trade_ids,
       CAST(sum(CASE WHEN price IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_price,
       CAST(sum(CASE WHEN qty IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
       CAST(sum(CASE WHEN price <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price,
       CAST(min(event_ts) AS BIGINT) AS min_event_ts,
       CAST(max(event_ts) AS BIGINT) AS max_event_ts,
       round(min(price), 6) AS min_price,
       round(max(price), 6) AS max_price,
       CAST(sum(CASE WHEN ingest_ts < event_ts THEN 1 ELSE 0 END) AS BIGINT)
           AS ingest_before_event
FROM trades"""


def volatility_estimators(bars: DataFrame) -> DataFrame:
    """Daily range-based volatility estimators over the 1-minute bars —
    the quant extensions a user of the reference's daily summary reaches
    for next: Parkinson (high/low range) and Garman-Klass (OHLC) per
    (symbol, day), alongside the close-to-close realized vol.  One
    combinable aggregate over the bar stream; every term is a per-bar
    scalar, so the shuffle carries partial sums only."""
    day = F.expr("bucket div 1440").cast("long")
    hl2 = F.pow(F.log(F.col("high") / F.col("low")), 2.0)
    co2 = F.pow(F.log(F.col("close") / F.col("open")), 2.0)
    g = bars.groupBy("symbol", day.alias("day")).agg(
        F.count("*").cast("long").alias("n_bars"),
        F.sum(hl2).alias("s_hl2"),
        F.sum(co2).alias("s_co2"),
        F.stddev_samp(F.log(F.col("close") / F.col("open"))).alias("sd_ret"),
    )
    ln2 = 0.6931471805599453
    return g.select(
        "symbol",
        "day",
        "n_bars",
        r6(F.sqrt(F.col("s_hl2") / (4.0 * ln2 * F.col("n_bars")))).alias(
            "parkinson_vol"
        ),
        r6(
            F.sqrt(
                F.greatest(
                    (0.5 * F.col("s_hl2") - (2.0 * ln2 - 1.0) * F.col("s_co2"))
                    / F.col("n_bars"),
                    F.lit(0.0),
                )
            )
        ).alias("garman_klass_vol"),
        r6(F.col("sd_ret")).alias("realized_vol"),
    )


FUNNEL_STAGES = ("view", "click", "purchase")


def conversion_funnel(events: DataFrame) -> DataFrame:
    """Ordered user-journey funnel over the raw event stream: a user
    reaches a stage only if their FIRST event of that stage is at-or-after
    the first event of the previous stage (view → click → purchase).

    Spark shape: one conditional-min groupBy per user (map-side
    combinable), then a single global roll-up — two shuffles total, the
    second over one row per user.  No window functions and no self-joins:
    at 100 TB the per-user state is three timestamps.

    Reference analog: the click→purchase attribution the as-of join serves
    (operators/joins.py), rolled up to cohort conversion rates."""
    ms = F.expr("ts div 1000")
    per_user = (
        events.filter(F.col("event_type").isin(*FUNNEL_STAGES))
        .groupBy("user_id")
        .agg(
            *[
                F.min(F.when(F.col("event_type") == s, ms)).alias(f"t_{s}")
                for s in FUNNEL_STAGES
            ]
        )
    )
    reached_view = F.col("t_view").isNotNull()
    reached_click = (
        reached_view
        & F.col("t_click").isNotNull()
        & (F.col("t_click") >= F.col("t_view"))
    )
    reached_purchase = (
        reached_click
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_click"))
    )
    g = per_user.groupBy().agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum(reached_view.cast("int")).cast("long").alias("n_view"),
        F.sum(reached_click.cast("int")).cast("long").alias("n_click"),
        F.sum(reached_purchase.cast("int")).cast("long").alias("n_purchase"),
    )

    def rate(num, den):
        return r6(F.when(F.col(den) > 0, F.col(num) / F.col(den)))

    return g.select(
        "n_users",
        "n_view",
        "n_click",
        "n_purchase",
        rate("n_click", "n_view").alias("view_to_click"),
        rate("n_purchase", "n_click").alias("click_to_purchase"),
        rate("n_purchase", "n_view").alias("view_to_purchase"),
    )


CONVERSION_FUNNEL_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END)     AS t_view,
         min(CASE WHEN event_type = 'click' THEN epoch_ms(ts) END)    AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS t_purchase
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
  GROUP BY user_id
),
flags AS (
  SELECT t_view IS NOT NULL AS rv,
         t_view IS NOT NULL AND t_click IS NOT NULL AND t_click >= t_view AS rc,
         t_view IS NOT NULL AND t_click IS NOT NULL AND t_click >= t_view
           AND t_purchase IS NOT NULL AND t_purchase >= t_click AS rp
  FROM per_user
),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(CASE WHEN rv THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
         CAST(sum(CASE WHEN rc THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         CAST(sum(CASE WHEN rp THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
  FROM flags
)
SELECT n_users, n_view, n_click, n_purchase,
       round(CASE WHEN n_view > 0 THEN n_click * 1.0 / n_view END, 6)     AS view_to_click,
       round(CASE WHEN n_click > 0 THEN n_purchase * 1.0 / n_click END, 6) AS click_to_purchase,
       round(CASE WHEN n_view > 0 THEN n_purchase * 1.0 / n_view END, 6)  AS view_to_purchase
FROM g"""


def source_consistency(valid_trades: DataFrame) -> DataFrame:
    """Cross-source validation (the reference ingests the same market from
    SBE websocket AND REST backfill): per (symbol, hour), VWAP and coverage
    per source plus their divergence in basis points — the consistency
    check that catches a degraded feed before it poisons features.
    Only buckets observed by BOTH sources are emitted.

    One groupBy with conditional decimal-exact sums (source pivot folded
    into the aggregate — no join between per-source subqueries)."""
    bucket = F.expr("event_ts div 3600000").cast("long")
    dec = "decimal(20,4)"

    def side(src, col):
        return F.sum(
            F.when(F.col("source") == src, col).otherwise(F.lit(0.0)).cast(dec)
        )

    g = valid_trades.groupBy("symbol", bucket.alias("bucket")).agg(
        side("sbe", F.col("price") * F.col("qty")).alias("sbe_notional"),
        side("sbe", F.col("qty")).alias("sbe_qty"),
        F.sum(F.when(F.col("source") == "sbe", 1).otherwise(0))
        .cast("long")
        .alias("sbe_trades"),
        side("rest", F.col("price") * F.col("qty")).alias("rest_notional"),
        side("rest", F.col("qty")).alias("rest_qty"),
        F.sum(F.when(F.col("source") == "rest", 1).otherwise(0))
        .cast("long")
        .alias("rest_trades"),
    )
    sbe_vwap = F.col("sbe_notional").cast("double") / F.col("sbe_qty").cast("double")
    rest_vwap = F.col("rest_notional").cast("double") / F.col("rest_qty").cast("double")
    return (
        g.filter((F.col("sbe_trades") > 0) & (F.col("rest_trades") > 0))
        .select(
            "symbol",
            "bucket",
            "sbe_trades",
            "rest_trades",
            r6(sbe_vwap).alias("sbe_vwap"),
            r6(rest_vwap).alias("rest_vwap"),
            r6((sbe_vwap - rest_vwap) / rest_vwap * 10000.0).alias(
                "vwap_divergence_bp"
            ),
        )
    )


SOURCE_CONSISTENCY_ORACLE = """
SELECT symbol, bucket, sbe_trades, rest_trades,
       round(CAST(sbe_notional AS DOUBLE) / CAST(sbe_qty AS DOUBLE), 6) AS sbe_vwap,
       round(CAST(rest_notional AS DOUBLE) / CAST(rest_qty AS DOUBLE), 6) AS rest_vwap,
       round((CAST(sbe_notional AS DOUBLE) / CAST(sbe_qty AS DOUBLE)
              - CAST(rest_notional AS DOUBLE) / CAST(rest_qty AS DOUBLE))
             / (CAST(rest_notional AS DOUBLE) / CAST(rest_qty AS DOUBLE))
             * 10000.0, 6) AS vwap_divergence_bp
FROM (
  SELECT symbol, event_ts // 3600000 AS bucket,
         sum(CAST(CASE WHEN source = 'sbe' THEN price * qty ELSE 0.0 END
                  AS DECIMAL(20,4))) AS sbe_notional,
         sum(CAST(CASE WHEN source = 'sbe' THEN qty ELSE 0.0 END
                  AS DECIMAL(20,4))) AS sbe_qty,
         CAST(sum(CASE WHEN source = 'sbe' THEN 1 ELSE 0 END) AS BIGINT)
             AS sbe_trades,
         sum(CAST(CASE WHEN source = 'rest' THEN price * qty ELSE 0.0 END
                  AS DECIMAL(20,4))) AS rest_notional,
         sum(CAST(CASE WHEN source = 'rest' THEN qty ELSE 0.0 END
                  AS DECIMAL(20,4))) AS rest_qty,
         CAST(sum(CASE WHEN source = 'rest' THEN 1 ELSE 0 END) AS BIGINT)
             AS rest_trades
  FROM valid_trades
  GROUP BY 1, 2
)
WHERE sbe_trades > 0 AND rest_trades > 0"""


def higher_moments(bars: DataFrame) -> DataFrame:
    """Daily skewness and excess kurtosis of 1-minute log returns — the
    higher-moment distribution features a risk/regime model consumes next
    to the variance estimators.

    Moments are combined from raw power sums of the RETURNS (magnitude
    ~1e-3, so the cancellation in the central-moment algebra stays far from
    double noise — this would NOT be safe on raw prices), with explicit
    formulas instead of engine ``skewness``/``kurtosis`` builtins: Spark's
    are population moments, DuckDB's are sample-adjusted, and the explicit
    algebra is the only form both engines reproduce bit-for-bit under r6."""
    w = Window.partitionBy("symbol").orderBy("bucket")
    r = bars.select(
        "symbol",
        (F.expr("bucket div 1440")).cast("long").alias("day"),
        F.log(F.col("close") / F.lag("close").over(w)).alias("ret"),
    ).filter(F.col("ret").isNotNull())
    g = r.groupBy("symbol", "day").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("ret").alias("s1"),
        F.sum(F.col("ret") * F.col("ret")).alias("s2"),
        F.sum(F.col("ret") * F.col("ret") * F.col("ret")).alias("s3"),
        F.sum(F.col("ret") * F.col("ret") * F.col("ret") * F.col("ret")).alias("s4"),
    )
    mu = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n") - mu * mu
    m3 = F.col("s3") / F.col("n") - 3 * mu * (F.col("s2") / F.col("n")) + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / F.col("n")
        - 4 * mu * (F.col("s3") / F.col("n"))
        + 6 * mu * mu * (F.col("s2") / F.col("n"))
        - 3 * mu * mu * mu * mu
    )
    return g.filter((F.col("n") >= 3) & (m2 > 0)).select(
        "symbol",
        "day",
        "n",
        r6(mu).alias("mean_ret"),
        r6(F.sqrt(m2)).alias("std_ret"),
        r6(m3 / F.pow(m2, 1.5)).alias("skewness"),
        r6(m4 / (m2 * m2) - 3.0).alias("excess_kurtosis"),
    )


HIGHER_MOMENTS_ORACLE_BODY = """
,r AS (
  SELECT symbol, CAST(bucket // 1440 AS BIGINT) AS day,
         ln(close / lag(close) OVER (PARTITION BY symbol ORDER BY bucket)) AS ret
  FROM bars
  QUALIFY ret IS NOT NULL
),
g AS (
  SELECT symbol, day, CAST(count(*) AS BIGINT) AS n,
         sum(ret) AS s1, sum(ret*ret) AS s2,
         sum(ret*ret*ret) AS s3, sum(ret*ret*ret*ret) AS s4
  FROM r GROUP BY 1, 2
)
SELECT symbol, day, n,
       round(s1/n, 6) AS mean_ret,
       round(sqrt(s2/n - (s1/n)*(s1/n)), 6) AS std_ret,
       round((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
             / pow(s2/n - (s1/n)*(s1/n), 1.5), 6) AS skewness,
       round((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
              - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
             / pow(s2/n - (s1/n)*(s1/n), 2.0) - 3.0, 6) AS excess_kurtosis
FROM g
WHERE n >= 3 AND s2/n - (s1/n)*(s1/n) > 0"""


WINSOR_LO = 0.01
WINSOR_HI = 0.99


def winsorize_volumes(
    bars: DataFrame,
    lo: float = WINSOR_LO,
    hi: float = WINSOR_HI,
    approx: bool = False,
    accuracy: int = PCTL_ACCURACY,
) -> DataFrame:
    """Percentile winsorization of bar volumes — the outlier-clipping
    preprocessing a feature pipeline applies before scaling: per symbol,
    volumes are clipped into [p01, p99] and the clip is flagged so the
    mass of affected rows stays auditable.

    The percentile bounds come from ONE per-symbol aggregate broadcast
    back onto the rows (the DuckDB twin replicates Spark's exact
    percentile branch structure — see oracle_defs.spark_percentile_sql —
    because the unrounded bounds feed the clip compares) —
    no window, no per-row sort.  ``approx=True`` swaps the bound estimate
    to the mergeable `percentile_approx` sketch (see latency_percentiles)
    — at 100 TB the clip bounds don't need interpolated exactness."""
    bounds = bars.groupBy("symbol").agg(
        _pctl("volume", lo, approx, accuracy).alias("p_lo"),
        _pctl("volume", hi, approx, accuracy).alias("p_hi"),
    )
    j = bars.join(F.broadcast(bounds), "symbol")
    clipped = F.least(F.greatest(F.col("volume"), F.col("p_lo")), F.col("p_hi"))
    return j.select(
        "symbol",
        "bucket",
        r6(F.col("volume")).alias("volume"),
        r6(clipped).alias("volume_winsorized"),
        (F.col("volume") < F.col("p_lo")).alias("clipped_low"),
        (F.col("volume") > F.col("p_hi")).alias("clipped_high"),
        r6(F.col("p_lo")).alias("p_lo"),
        r6(F.col("p_hi")).alias("p_hi"),
    )


WINSORIZE_ORACLE_BODY = f"""
,wz_l AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         list(volume ORDER BY volume) AS vs
  FROM bars GROUP BY symbol
),
bounds AS (
  SELECT symbol,
         {_OD.spark_percentile_sql(WINSOR_LO)} AS p_lo,
         {_OD.spark_percentile_sql(WINSOR_HI)} AS p_hi
  FROM wz_l
)
SELECT b.symbol, b.bucket,
       round(b.volume, 6) AS volume,
       round(least(greatest(b.volume, p_lo), p_hi), 6) AS volume_winsorized,
       b.volume < p_lo AS clipped_low,
       b.volume > p_hi AS clipped_high,
       round(p_lo, 6) AS p_lo,
       round(p_hi, 6) AS p_hi
FROM bars b JOIN bounds USING (symbol)"""


KYLE_BUCKET_MS = 60_000  # price-impact regression grain: 1-minute buckets


def kyle_lambda(dedup_trades: DataFrame) -> DataFrame:
    """Kyle's lambda (Kyle 1985) — per-symbol price impact: the OLS slope
    of per-bucket price change on per-bucket signed (aggressor) volume,
    the canonical liquidity/impact measure a desk computes from the same
    tape Lee-Ready classifies.  Aggressor sign comes from the feed's
    taker flag (buy = NOT is_buyer_maker), matching `bars_1m`'s
    buy/sell split.

    Cross-engine determinism: the regression is NOT `regr_slope` (whose
    internal double accumulation is summation-order-dependent) — the four
    moments Σx, Σy, Σxy, Σx² are DECIMAL-exact sums (signed qty and
    bucket open/close live on decimal grids), cast to double once, and
    the slope/intercept arithmetic is the same scalar expression in both
    engines, so the division sees bit-identical operands.

    Plan shape: one partial-combinable aggregate to buckets, one K-row
    aggregate to symbols — two shuffles, second over symbol count only.
    A symbol whose signed volume is constant across buckets (zero
    variance) emits NULL slope/intercept, not 0/0.

    cf. reference: extends the surface (same aggressor-sign convention as
    `feature_builder.py:119-123`'s buy/sell split; the reference computes
    imbalance but no impact regression)."""
    ordk = F.struct("event_ts", "trade_id")
    sgn = F.when(~F.col("is_buyer_maker"), F.col("qty")).otherwise(-F.col("qty"))
    b = dedup_trades.groupBy(
        "symbol", F.expr(f"event_ts div {KYLE_BUCKET_MS}").cast("long").alias("bucket")
    ).agg(
        F.sum(sgn.cast("decimal(18,4)")).alias("sv"),
        (
            F.max_by("price", ordk).cast("decimal(18,4)")
            - F.min_by("price", ordk).cast("decimal(18,4)")
        ).alias("dp_oc"),
    )
    # NB: max_by/min_by keyed on (event_ts, trade_id) are LAST/FIRST in
    # event order — dp_oc is the open→close move, not high−low
    g = b.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum("sv").cast("double").alias("sx"),
        F.sum("dp_oc").cast("double").alias("sy"),
        F.sum((F.col("sv") * F.col("dp_oc")).cast("decimal(38,8)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("sv") * F.col("sv")).cast("decimal(38,8)"))
        .cast("double")
        .alias("sxx"),
    )
    den = F.col("n_buckets") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (F.col("n_buckets") * F.col("sxy") - F.col("sx") * F.col("sy")) / den
    return g.select(
        "symbol",
        "n_buckets",
        F.when(den != 0, r6(slope)).alias("kyle_lambda"),
        F.when(den != 0, r6((F.col("sy") - slope * F.col("sx")) / F.col("n_buckets"))).alias(
            "impact_intercept"
        ),
    )


KYLE_LAMBDA_ORACLE_BODY = f"""
,kb AS (
  SELECT symbol, event_ts // {KYLE_BUCKET_MS} AS bucket,
         sum(CAST(CASE WHEN NOT is_buyer_maker THEN qty ELSE -qty END
                  AS DECIMAL(18,4))) AS sv,
         CAST(last(price ORDER BY event_ts, trade_id) AS DECIMAL(18,4))
           - CAST(first(price ORDER BY event_ts, trade_id) AS DECIMAL(18,4))
             AS dp_oc
  FROM dedup_trades GROUP BY 1, 2
),
kg AS (
  SELECT symbol,
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(sv) AS DOUBLE) AS sx,
         CAST(sum(dp_oc) AS DOUBLE) AS sy,
         CAST(sum(CAST(sv * dp_oc AS DECIMAL(38,8))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(sv * sv AS DECIMAL(38,8))) AS DOUBLE) AS sxx
  FROM kb GROUP BY symbol
)
SELECT symbol, n_buckets,
       CASE WHEN n_buckets * sxx - sx * sx != 0
            THEN round((n_buckets * sxy - sx * sy)
                       / (n_buckets * sxx - sx * sx), 6) END AS kyle_lambda,
       CASE WHEN n_buckets * sxx - sx * sx != 0
            THEN round((sy - (n_buckets * sxy - sx * sy)
                             / (n_buckets * sxx - sx * sx) * sx)
                       / n_buckets, 6) END AS impact_intercept
FROM kg"""


VPIN_BUCKET_VOLUME = 2_000  # volume per bucket (volume clock)
VPIN_WINDOW = 10  # trailing buckets averaged into the VPIN estimate


def vpin(
    dedup_trades: DataFrame,
    bucket_volume: int = VPIN_BUCKET_VOLUME,
    window: int = VPIN_WINDOW,
) -> DataFrame:
    """VPIN — Volume-synchronized Probability of INformed trading
    (Easley, López de Prado, O'Hara 2012): trades sequence onto a VOLUME
    clock (each bucket holds ``bucket_volume`` units), each bucket's
    order-flow imbalance is |buy − sell| aggressor volume, and VPIN is
    the volume-weighted imbalance over the trailing ``window`` buckets —
    the flow-toxicity gauge that spikes before liquidity events.

    Discrete convention (documented, oracle-replicated): each trade
    belongs wholly to the bucket where its cumulative volume STARTS
    (cum_before div V) — no trade splitting, so buckets carry
    slightly unequal realized volume and the estimate divides by the
    realized sum, not the nominal V.  The cumulative volume is a
    DECIMAL-exact keyed window cumsum; the bucket id is derived in EXACT
    integer arithmetic — the decimal(.,4) cumsum scaled to 1e-4 units
    (the same integer clock streaming/vpin.py keeps) and integer-divided
    by bucket_volume*10^4 — never through a double cast, whose half-ulp
    rounding near a bucket boundary could flip floor() once a symbol's
    cumulative units approach 2^53.  cum_excl >= 0 always, so truncating
    and flooring division agree across engines.

    Plan shape: ONE partitionBy(symbol) sort shared by the cumsum, then a
    partial-combinable bucket aggregate and a bounded ROWS window over
    buckets (state = ``window`` rows) — the same single-exchange
    discipline as the rolling families in operators/windows.py.

    cf. reference: extends the surface (volume-clock form of the
    wall-clock volume imbalance `feature_builder.py:160-161` computes)."""
    qd = F.col("qty").cast("decimal(20,4)")
    w = (
        Window.partitionBy("symbol")
        .orderBy("event_ts", "trade_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_excl = F.sum(qd).over(w) - qd
    # exact 1e-4-unit integer clock (streaming/vpin.py UNITS): decimal
    # scale-4 * 10^4 is integral by construction, so the long cast is
    # lossless; `div` is integer division (== floor for cum_excl >= 0)
    b = (
        dedup_trades.withColumn(
            "cum_units", (cum_excl * F.lit(10_000)).cast("long")
        )
        .withColumn(
            "bucket", F.expr(f"cum_units div {bucket_volume * 10_000}L")
        )
        .drop("cum_units")
        .groupBy("symbol", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_trades"),
            F.sum(
                F.when(~F.col("is_buyer_maker"), F.col("qty"))
                .otherwise(F.lit(0.0))
                .cast("decimal(20,4)")
            ).alias("buy_v"),
            F.sum(
                F.when(F.col("is_buyer_maker"), F.col("qty"))
                .otherwise(F.lit(0.0))
                .cast("decimal(20,4)")
            ).alias("sell_v"),
            F.sum(qd).alias("vol"),
        )
    )
    imb = F.abs(F.col("buy_v") - F.col("sell_v"))
    wb = (
        Window.partitionBy("symbol")
        .orderBy("bucket")
        .rowsBetween(-(window - 1), 0)
    )
    return b.select(
        "symbol",
        "bucket",
        "n_trades",
        F.col("vol").cast("double").alias("bucket_volume"),
        imb.cast("double").alias("imbalance"),
        F.count("*").over(wb).cast("long").alias("n_in_window"),
        r6(
            F.sum(imb).over(wb).cast("double")
            / F.sum(F.col("vol")).over(wb).cast("double")
        ).alias("vpin"),
    )


VPIN_ORACLE_BODY = f"""
,vc AS (
  SELECT symbol, event_ts, trade_id, qty, is_buyer_maker,
         sum(CAST(qty AS DECIMAL(20,4))) OVER (
             PARTITION BY symbol ORDER BY event_ts, trade_id
             ROWS UNBOUNDED PRECEDING) - CAST(qty AS DECIMAL(20,4))
             AS cum_excl
  FROM dedup_trades
),
vb AS (
  SELECT symbol,
         -- exact integer clock: scale-4 decimal * 10^4 is integral, so
         -- the BIGINT cast is lossless; // == floor for cum_excl >= 0
         (CAST(cum_excl * 10000 AS BIGINT) // {VPIN_BUCKET_VOLUME * 10_000})
             AS bucket,
         CAST(count(*) AS BIGINT) AS n_trades,
         sum(CAST(CASE WHEN NOT is_buyer_maker THEN qty ELSE 0.0 END
                  AS DECIMAL(20,4))) AS buy_v,
         sum(CAST(CASE WHEN is_buyer_maker THEN qty ELSE 0.0 END
                  AS DECIMAL(20,4))) AS sell_v,
         sum(CAST(qty AS DECIMAL(20,4))) AS vol
  FROM vc GROUP BY 1, 2
)
SELECT symbol, bucket, n_trades,
       CAST(vol AS DOUBLE) AS bucket_volume,
       CAST(abs(buy_v - sell_v) AS DOUBLE) AS imbalance,
       CAST(count(*) OVER tw AS BIGINT) AS n_in_window,
       round(CAST(sum(abs(buy_v - sell_v)) OVER tw AS DOUBLE)
             / CAST(sum(vol) OVER tw AS DOUBLE), 6) AS vpin
FROM vb
WINDOW tw AS (PARTITION BY symbol ORDER BY bucket
              ROWS BETWEEN {VPIN_WINDOW - 1} PRECEDING AND CURRENT ROW)"""


def roll_spread(dedup_trades: DataFrame) -> DataFrame:
    """Roll's implied effective spread (Roll 1984): under the bid-ask
    bounce model, consecutive trade-price changes are negatively
    serially correlated and the effective half-spread is
    √(−cov(Δp_t, Δp_{t−1})) — the classic spread estimate for a tape
    with no quote data (complements `lee_ready`, which needs quotes).

    Determinism: Δp pairs live on the price grid — the covariance
    moments Σx, Σy, Σxy are DECIMAL-exact sums (same discipline as
    :func:`kyle_lambda`), so the final double arithmetic sees identical
    operands in both engines.  A positive serial covariance (trending
    tape — the model's failure mode) yields NULL spread, with the raw
    covariance always reported so the caller can see why.

    Plan shape: the Δp lags ride ONE partitionBy(symbol) sort, then one
    partial-combinable aggregate per symbol.

    cf. reference: extends the surface (the reference reads the spread
    directly from the BBA stream, `feature_builder.py:220-225`; this
    recovers it from trades alone — the audit pair for that feed)."""
    wl = Window.partitionBy("symbol").orderBy("event_ts", "trade_id")
    pd_ = F.col("price").cast("decimal(18,4)")
    dp = pd_ - F.lag(pd_).over(wl)
    t = (
        dedup_trades.withColumn("dp", dp)
        .withColumn("dp_prev", F.lag("dp").over(wl))
        .filter(F.col("dp").isNotNull() & F.col("dp_prev").isNotNull())
    )
    g = t.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("dp").cast("double").alias("sx"),
        F.sum("dp_prev").cast("double").alias("sy"),
        F.sum((F.col("dp") * F.col("dp_prev")).cast("decimal(38,8)"))
        .cast("double")
        .alias("sxy"),
    )
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n_pairs")) / F.col(
        "n_pairs"
    )
    return g.select(
        "symbol",
        "n_pairs",
        r6(cov).alias("serial_cov"),
        F.when(cov < 0, r6(2.0 * F.sqrt(-cov))).alias("roll_spread"),
    )


ROLL_SPREAD_ORACLE_BODY = """
,rl0 AS (
  SELECT symbol, event_ts, trade_id,
         CAST(price AS DECIMAL(18,4))
           - lag(CAST(price AS DECIMAL(18,4))) OVER w AS dp
  FROM dedup_trades
  WINDOW w AS (PARTITION BY symbol ORDER BY event_ts, trade_id)
),
rl AS (
  SELECT symbol, dp,
         lag(dp) OVER (PARTITION BY symbol ORDER BY event_ts, trade_id)
             AS dp_prev
  FROM rl0
),
rg AS (
  SELECT symbol,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(dp) AS DOUBLE) AS sx,
         CAST(sum(dp_prev) AS DOUBLE) AS sy,
         CAST(sum(CAST(dp * dp_prev AS DECIMAL(38,8))) AS DOUBLE) AS sxy
  FROM rl WHERE dp IS NOT NULL AND dp_prev IS NOT NULL
  GROUP BY symbol
)
SELECT symbol, n_pairs,
       round((sxy - sx * sy / n_pairs) / n_pairs, 6) AS serial_cov,
       CASE WHEN (sxy - sx * sy / n_pairs) / n_pairs < 0
            THEN round(2.0 * sqrt(-((sxy - sx * sy / n_pairs) / n_pairs)), 6)
       END AS roll_spread
FROM rg"""


OFI_BUCKET_MS = 60_000  # order-flow-imbalance aggregation grain: 1 minute


def order_flow_imbalance(
    bba: DataFrame, bucket_ms: int = OFI_BUCKET_MS
) -> DataFrame:
    """OFI — Order Flow Imbalance (Cont, Kukanov & Stoikov 2014): per
    best-bid/ask update, the signed queue-size increment

        e_n = 1{b_n ≥ b_{n−1}}·qb_n − 1{b_n ≤ b_{n−1}}·qb_{n−1}
            − 1{a_n ≤ a_{n−1}}·qa_n + 1{a_n ≥ a_{n−1}}·qa_{n−1}

    summed per (symbol, minute) — the quote-side impact driver whose
    per-bucket sum is the regressor CKS show explains mid-price moves
    better than signed trade volume (the trade-side twin is
    :func:`kyle_lambda`'s signed-volume regressor).

    Cross-engine determinism: queue sizes are cast to DECIMAL(18,6)
    BEFORE the CASE arithmetic (sizes live on a ≤5 dp grid — the
    FIXTURES qty grid times the 0.1-grid size multiplier — so the cast
    is exact, same argument as the VPIN integer-unit state), making
    each increment and therefore the per-bucket sum order-independent
    decimals.  The update ordering is pinned by the deterministic key
    (event_ts, ingest_ts, bid_px, ask_px, bid_sz, ask_sz): rows tying
    on the full key are identical, and identical adjacent rows produce
    the same increments in either order.

    Plan shape: the four lags ride ONE partitionBy(symbol) sort, then
    one partial-combinable aggregate to (symbol, bucket) — the
    kyle/roll shuffle discipline.  Each symbol's first update has no
    predecessor and contributes no increment.

    cf. reference: extends the surface (the reference computes
    spread/mid from the same BBA stream, `feature_builder.py:220-225`,
    but no flow-imbalance measure)."""
    wl = Window.partitionBy("symbol").orderBy(
        "event_ts", "ingest_ts", "bid_px", "ask_px", "bid_sz", "ask_sz"
    )
    qb = F.col("bid_sz").cast("decimal(18,6)")
    qa = F.col("ask_sz").cast("decimal(18,6)")
    b = bba.select(
        "symbol",
        "event_ts",
        "bid_px",
        "ask_px",
        qb.alias("qb"),
        qa.alias("qa"),
        F.lag("bid_px").over(wl).alias("bp"),
        F.lag("ask_px").over(wl).alias("ap"),
        F.lag(qb).over(wl).alias("qbp"),
        F.lag(qa).over(wl).alias("qap"),
    ).filter(F.col("bp").isNotNull())
    zero = F.lit(0).cast("decimal(18,6)")
    e = (
        F.when(F.col("bid_px") >= F.col("bp"), F.col("qb")).otherwise(zero)
        - F.when(F.col("bid_px") <= F.col("bp"), F.col("qbp")).otherwise(zero)
        - F.when(F.col("ask_px") <= F.col("ap"), F.col("qa")).otherwise(zero)
        + F.when(F.col("ask_px") >= F.col("ap"), F.col("qap")).otherwise(zero)
    )
    return (
        b.groupBy(
            "symbol",
            F.expr(f"event_ts div {bucket_ms}").cast("long").alias("bucket"),
        )
        .agg(
            F.count("*").cast("long").alias("n_updates"),
            F.sum(e).alias("ofi_raw"),
        )
        .select(
            "symbol",
            "bucket",
            "n_updates",
            r6(F.col("ofi_raw").cast("double")).alias("ofi"),
        )
    )


# oracle body over the bba CTE (oracle_defs.BBA_CTE); same decimal casts,
# same deterministic window key, same CASE arithmetic
OFI_ORACLE_BODY = f"""
,lagged AS (
  SELECT symbol, event_ts, bid_px, ask_px,
         CAST(bid_sz AS DECIMAL(18,6)) AS qb,
         CAST(ask_sz AS DECIMAL(18,6)) AS qa,
         lag(bid_px) OVER w AS bp,
         lag(ask_px) OVER w AS ap,
         lag(CAST(bid_sz AS DECIMAL(18,6))) OVER w AS qbp,
         lag(CAST(ask_sz AS DECIMAL(18,6))) OVER w AS qap
  FROM bba
  WINDOW w AS (PARTITION BY symbol
               ORDER BY event_ts, ingest_ts, bid_px, ask_px, bid_sz, ask_sz)
)
SELECT symbol,
       event_ts // {OFI_BUCKET_MS} AS bucket,
       CAST(count(*) AS BIGINT) AS n_updates,
       round(CAST(sum(
           (CASE WHEN bid_px >= bp THEN qb ELSE CAST(0 AS DECIMAL(18,6)) END)
         - (CASE WHEN bid_px <= bp THEN qbp ELSE CAST(0 AS DECIMAL(18,6)) END)
         - (CASE WHEN ask_px <= ap THEN qa ELSE CAST(0 AS DECIMAL(18,6)) END)
         + (CASE WHEN ask_px >= ap THEN qap ELSE CAST(0 AS DECIMAL(18,6)) END)
       ) AS DOUBLE), 6) AS ofi
FROM lagged WHERE bp IS NOT NULL
GROUP BY 1, 2"""


AMIHUD_SCALE = 1_000_000.0  # report ILLIQ per million notional units


def amihud_illiquidity(bars: DataFrame) -> DataFrame:
    """Amihud (2002) illiquidity — per (symbol, day), the mean of
    |bar return| / bar notional over consecutive 1-minute bars, scaled
    per million notional units: the price move a unit of traded value
    buys, the standard low-frequency liquidity proxy (the coarse
    companion of :func:`kyle_lambda`'s per-bucket impact regression).

    Intra-day convention (documented, oracle-replicated): returns are
    close-to-close between consecutive bars of the SAME day — each
    day's first bar has no predecessor and contributes no term, so a
    day boundary never manufactures an overnight pseudo-return.

    Determinism: each term |ret|/notional is computed from identical
    double operands in both engines (bar close/notional are the
    6-dp-rounded bar outputs), and the final mean is rounded to 6 dp —
    the perplexity-family precedent for non-grid double averages.

    Plan shape: the close lag rides ONE partitionBy(symbol) sort over
    bars (already thousands-to-1 reduced from ticks), then one
    partial-combinable aggregate to (symbol, day).

    cf. reference: extends the surface (complements the reference's
    per-bucket liquidity features, `feature_builder.py:119-123`)."""
    wl = Window.partitionBy("symbol").orderBy("bucket")
    b = bars.select(
        "symbol",
        "bucket",
        F.expr("(bucket * 60000) div 86400000").cast("long").alias("day"),
        "close",
        "notional",
        F.lag("close").over(wl).alias("prev_close"),
        F.expr("(lag(bucket) over (partition by symbol order by bucket)"
               " * 60000) div 86400000").cast("long").alias("prev_day"),
    ).filter(
        F.col("prev_close").isNotNull() & (F.col("day") == F.col("prev_day"))
    )
    term = (
        F.abs(F.col("close") / F.col("prev_close") - 1.0)
        / F.col("notional")
        * F.lit(AMIHUD_SCALE)
    )
    return b.groupBy("symbol", "day").agg(
        F.count("*").cast("long").alias("n_returns"),
        r6(F.avg(term)).alias("amihud_illiq"),
    )


# oracle body over the bars CTE (oracle_defs.BARS_1M_CTE); same intra-day
# lag convention and scale
AMIHUD_ORACLE_BODY = f"""
,ab AS (
  SELECT symbol, bucket,
         (bucket * 60000) // 86400000 AS day,
         close, notional,
         lag(close) OVER w AS prev_close,
         (lag(bucket) OVER w * 60000) // 86400000 AS prev_day
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket)
)
SELECT symbol, day,
       CAST(count(*) AS BIGINT) AS n_returns,
       round(avg(abs(close / prev_close - 1.0) / notional
                 * {AMIHUD_SCALE}), 6) AS amihud_illiq
FROM ab
WHERE prev_close IS NOT NULL AND day = prev_day
GROUP BY 1, 2"""


def effective_spread(trades: DataFrame, bba: DataFrame) -> DataFrame:
    """Effective vs quoted spread per (symbol, minute) — the execution-cost
    measure TAQ-style studies compute: each trade is matched to the
    PREVAILING quote (latest best bid/ask strictly BEFORE the trade, so a
    quote update caused by the trade itself can never price it), then

        effective_bps = 2 · |price − mid| / mid · 1e4
        quoted_bps    = (ask − bid) / mid · 1e4

    are averaged per (symbol, minute).  Effective ≥ quoted gaps flag
    trades walking the book; effective < quoted flags price improvement.

    As-of discipline (the :func:`~.joins.asof_purchase_click` pattern,
    single-sort form): quotes become available at ``event_ts + 1`` and the
    union of quotes (is_q=0) and trades (is_q=1) is LOCF-scanned on ONE
    partitionBy(symbol) sort — no join, no per-key range search.  Quote
    ties at one availability instant resolve to the lexicographic MAX of
    (ingest_ts, bid_px, ask_px, bid_sz, ask_sz): ascending sort puts that
    row last, and the DuckDB twin takes ``max(struct(...))`` per instant
    before its ASOF join — same row, both engines.  Trades before any
    quote are dropped (no prevailing quote to price against).

    Plan shape: one symbol-sort window pass over the union, then one
    partial-combinable aggregate to (symbol, minute).  At 100 TB the sort
    keys on (symbol, ts) — the partition layout the whole microstructure
    family already rides.

    cf. reference: extends the surface (the reference derives quoted
    spread/mid on the BBA stream alone, `feature_builder.py:220-225`; it
    never prices trades against prevailing quotes)."""
    return _effective_spread_agg(asof_quote_match(trades, bba))


def effective_spread_sliced(
    trades: DataFrame, bba: DataFrame, slice_ms: int | None = None
) -> DataFrame:
    """Hot-key-safe :func:`effective_spread` — identical output (same
    DuckDB oracle), built on :func:`asof_quote_match_sliced` so one
    dominant symbol cannot serialize the as-of sort.  See that function's
    docstring for the carry-in repair that makes the slicing exact."""
    kw = {} if slice_ms is None else {"slice_ms": slice_ms}
    return _effective_spread_agg(asof_quote_match_sliced(trades, bba, **kw))


def effective_spread_adaptive(
    trades: DataFrame,
    bba: DataFrame,
    hot_share: float | None = None,
    threshold: float = HOT_KEY_SHARE_THRESHOLD,
) -> DataFrame:
    """Skew-adaptive :func:`effective_spread` (round 10, VERDICT r9 item
    1): gauge the tape's hottest-symbol share and run the single-sort
    form when the keyspace is balanced (it is ~2x cheaper there — 2.08 s
    vs 4.37 s at sf1) but the time-sliced rewrite when one symbol
    dominates (the single sort measured 4.05x/decade under the
    90%-one-symbol tape vs the sliced form's 1.49x —
    BENCH_SCALE_r09.json `skew`).  Both forms share ONE DuckDB oracle:
    the dispatch is a pure physical-plan choice.

    ``hot_share`` skips the gauge when the caller already profiled the
    tape (the production pattern: `q_key_skew_profile` persisted once
    per ingest); by default one bounded gauge action
    (:func:`~.skew.hot_key_share` on the trade leg — trades and quotes
    derive from the same tape, so one leg's profile stands for both)
    picks the plan at DataFrame-construction time, the same
    eager-driver-decision class as IVF quantizer training."""
    if hot_share is None:
        hot_share = hot_key_share(trades)
    if hot_share >= threshold:
        return effective_spread_sliced(trades, bba)
    return effective_spread(trades, bba)


def _effective_spread_agg(m: DataFrame) -> DataFrame:
    mid = (F.col("bid_px") + F.col("ask_px")) / 2.0
    eff = 2.0 * F.abs(F.col("price") - mid) / mid * 10000.0
    quoted = (F.col("ask_px") - F.col("bid_px")) / mid * 10000.0
    return (
        m.groupBy(
            "symbol",
            F.expr("event_ts div 60000").cast("long").alias("bucket"),
        )
        .agg(
            F.count("*").cast("long").alias("n_trades"),
            r6(F.avg(eff)).alias("eff_spread_bps"),
            r6(F.avg(quoted)).alias("quoted_spread_bps"),
        )
    )


def asof_quote_match(trades: DataFrame, bba: DataFrame) -> DataFrame:
    """Per-trade prevailing-quote match (the :func:`effective_spread`
    matching stage, exposed for direct testing): each trade row with the
    bid/ask of the latest quote strictly BEFORE it — single symbol-sort
    union-LOCF scan, lexicographic-max tie resolution, trades before any
    quote dropped.  Output: (symbol, event_ts, price, bid_px, ask_px)."""
    w = (
        Window.partitionBy("symbol")
        .orderBy(*_ASOF_ORDER)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        _asof_union(trades, bba)
        .withColumn("pq", F.last(_asof_quote_struct(), ignorenulls=True).over(w))
        .filter((F.col("is_q") == 1) & F.col("pq").isNotNull())
        .select(
            "symbol",
            "event_ts",
            "price",
            F.col("pq.b").alias("bid_px"),
            F.col("pq.a").alias("ask_px"),
        )
    )


def _asof_union(trades: DataFrame, bba: DataFrame) -> DataFrame:
    """The quotes+trades sort frame shared by :func:`asof_quote_match` and
    its time-sliced twin: quotes become available at event_ts+1 (is_q=0
    sorts before a trade at the same availability instant)."""
    q = bba.select(
        "symbol",
        (F.col("event_ts") + F.lit(1)).cast("long").alias("sort_ts"),
        F.lit(0).alias("is_q"),
        "ingest_ts",
        "bid_px",
        "ask_px",
        "bid_sz",
        "ask_sz",
        F.lit(None).cast("long").alias("event_ts"),
        F.lit(None).cast("double").alias("price"),
    )
    t = trades.select(
        "symbol",
        F.col("event_ts").cast("long").alias("sort_ts"),
        F.lit(1).alias("is_q"),
        "ingest_ts",
        F.lit(None).cast("double").alias("bid_px"),
        F.lit(None).cast("double").alias("ask_px"),
        F.lit(None).cast("double").alias("bid_sz"),
        F.lit(None).cast("double").alias("ask_sz"),
        "event_ts",
        "price",
    )
    return q.unionByName(t)


_ASOF_ORDER = [
    "sort_ts", "is_q", "ingest_ts", "bid_px", "ask_px", "bid_sz", "ask_sz",
]

# one calendar day: the hot-key slice grain (SKEW_SLICE_MS below); any
# width yields identical results — it only sets the parallelism of the
# hot symbol's sort (partitions = symbols x occupied slices)
SKEW_SLICE_MS = 86_400_000


def _asof_quote_struct():
    return F.when(
        F.col("is_q") == 0,
        F.struct(F.col("bid_px").alias("b"), F.col("ask_px").alias("a")),
    )


def _asof_quote_tuple():
    """Quote SORT-TUPLE struct for the range-frame as-of form (r12).

    ``max()`` of this struct over a window frame selects exactly the
    quote row an ascending ``_ASOF_ORDER`` sort puts last within that
    frame: struct comparison is lexicographic in field order, which
    leads with sort_ts (newest availability instant wins) and breaks
    availability ties by (ingest_ts, bid_px, ask_px, bid_sz, ask_sz) —
    the same tuple, same direction, as the sort keys; NULL fields order
    first under both (sort ASC NULLS FIRST ⟺ struct comparison treats
    NULL as smallest), and probe rows contribute NULL to the aggregate
    (max ignores them).  This is also the DuckDB oracle's QUALIFY
    row_number() tie collapse — all three agree on every frame."""
    return F.when(
        F.col("is_q") == 0,
        F.struct(
            F.col("sort_ts").alias("ts"),
            F.col("ingest_ts").alias("i"),
            F.col("bid_px").alias("b"),
            F.col("ask_px").alias("a"),
            F.col("bid_sz").alias("bs"),
            F.col("ask_sz").alias("asz"),
        ),
    )


def asof_quote_match_sliced(
    trades: DataFrame, bba: DataFrame, slice_ms: int = SKEW_SLICE_MS
) -> DataFrame:
    """Hot-key-safe :func:`asof_quote_match`: identical rows, but the LOCF
    scan sorts on (symbol, time-slice) instead of (symbol), so a symbol
    that carries 90 % of the tape still spreads over ~span/slice_ms sort
    partitions — ``Window.partitionBy("symbol")`` cannot split a key, and
    the measured skew decade row for the single-sort form is 5.08x/decade
    vs 1.09x balanced (BENCH_SCALE_r09.json `skew`).

    Boundary repair (what makes it a pure physical rewrite): a trade
    before any quote IN ITS SLICE must see the newest quote of an earlier
    slice.  Per (symbol, slice) the carry-out quote (the LOCF value at
    slice end = lexicographic max over the slice's quotes in sort order)
    is a ONE-ROW summary; a prefix-LOCF window over that tiny frame
    (symbols x occupied slices rows) yields each slice's carry-in, which a
    broadcast join patches into the slice-local nulls.  Two extra
    shuffles, both over key-count-sized frames — O(rows) work unchanged."""
    return _sliced_locf_resolve(_asof_union(trades, bba), slice_ms).select(
        "symbol",
        "event_ts",
        "price",
        F.col("pq.b").alias("bid_px"),
        F.col("pq.a").alias("ask_px"),
    )


def _sliced_locf_resolve(u: DataFrame, slice_ms: int) -> DataFrame:
    """The (symbol, time-slice) LOCF + carry-in boundary repair shared by
    every sliced rewrite (:func:`asof_quote_match_sliced`,
    :func:`markout_sliced`): slice the union frame on sort_ts, LOCF the
    prevailing quote WITHIN each (symbol, slice), summarize each slice's
    carry-out quote to one row, prefix-LOCF those summaries to each
    slice's carry-in, and broadcast-patch the slice-local nulls.  Returns
    the probe rows (is_q = 1) that resolved a quote, with every input
    column plus the resolved ``pq`` struct — callers select their own
    output shape."""
    u = u.withColumn("slice", F.expr(f"sort_ts div {slice_ms}").cast("long"))
    wl = (
        Window.partitionBy("symbol", "slice")
        .orderBy(*_ASOF_ORDER)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = u.withColumn(
        "pq_local", F.last(_asof_quote_struct(), ignorenulls=True).over(wl)
    )

    # r11 optimization: the per-slice carry-out (sort-order-last QUOTE of
    # the slice) is a SECOND window function over the same (symbol, slice)
    # partitioning — full frame instead of running frame — so the ONE
    # carry leg references the window output instead of re-planning two
    # separate union subtrees.  The previous form derived the carry from
    # qsum (groupBy + max_by) ⟕ slices (distinct) — neither referenced
    # the window output, so Catalyst pruned the window away, the
    # canonical subtrees diverged, and the union's tape scans were
    # repeated once per carry leg.  Measured executed plans at sf0.1:
    # q_markout_sliced 10 parquet scans -> 8 (11 -> 10 shuffle stages),
    # q_effective_spread_sliced 10 -> 8 (7 -> 6 shuffle stages).  At
    # 100 TB that is two fewer full passes over the tape and one fewer
    # carry-side exchange (guide §2.4).
    #
    # Equivalence: last(quote-struct ignorenulls) over the slice's FULL
    # frame in _ASOF_ORDER is the max_by of the quote sort tuple the old
    # aggregate computed (ties agree on every struct field), and it is
    # constant across the slice's rows, so distinct(symbol, slice,
    # carry_out) is exactly the old slices ⟕ qsum frame — including the
    # NULL carry_out of quote-empty slices.
    wf = (
        Window.partitionBy("symbol", "slice")
        .orderBy(*_ASOF_ORDER)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    local = local.withColumn(
        "slice_carry_out", F.last(_asof_quote_struct(), ignorenulls=True).over(wf)
    )
    # carry-in per every OCCUPIED (symbol, slice): newest carry_out of any
    # strictly earlier slice — a prefix-LOCF over the tiny summary frame
    wc = (
        Window.partitionBy("symbol")
        .orderBy("slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        local.select(
            "symbol", "slice", F.col("slice_carry_out").alias("carry_out")
        )
        .distinct()
        .withColumn("carry_in", F.last("carry_out", ignorenulls=True).over(wc))
        .select("symbol", "slice", "carry_in")
    )

    return (
        local.join(F.broadcast(carry), ["symbol", "slice"], "left")
        .withColumn("pq", F.coalesce(F.col("pq_local"), F.col("carry_in")))
        .filter((F.col("is_q") == 1) & F.col("pq").isNotNull())
    )


# oracle body appended after DEDUP_TRADES_CTE + BBA_CTE: quote ties at one
# availability instant collapse to the lexicographic max tuple (the Spark
# sort's last row) via a window dedup — NOT max(STRUCT), whose DuckDB 1.0
# hash-aggregate state explodes past the memory limit at ~1M groups
# (measured: OOM at sf1, 2.3 s as a window) — then a DuckDB ASOF join
# replays the LOCF scan
EFFECTIVE_SPREAD_ORACLE_BODY = """
,quotes AS (
  SELECT symbol, avail_ts,
         {'i': ingest_ts, 'b': bid_px, 'a': ask_px,
          'bs': bid_sz, 'asz': ask_sz} AS s
  FROM (SELECT symbol, event_ts + 1 AS avail_ts, ingest_ts,
               bid_px, ask_px, bid_sz, ask_sz FROM bba)
  QUALIFY row_number() OVER (PARTITION BY symbol, avail_ts
      ORDER BY ingest_ts DESC, bid_px DESC, ask_px DESC,
               bid_sz DESC, ask_sz DESC) = 1
),
matched AS (
  SELECT t.symbol, t.event_ts, t.price,
         struct_extract(q.s, 'b') AS bid_px,
         struct_extract(q.s, 'a') AS ask_px
  FROM dedup_trades t
  ASOF JOIN quotes q ON t.symbol = q.symbol AND t.event_ts >= q.avail_ts
)
SELECT symbol, event_ts // 60000 AS bucket,
       CAST(count(*) AS BIGINT) AS n_trades,
       round(avg(2.0 * abs(price - (bid_px + ask_px) / 2.0)
                 / ((bid_px + ask_px) / 2.0) * 10000.0), 6) AS eff_spread_bps,
       round(avg((ask_px - bid_px) / ((bid_px + ask_px) / 2.0) * 10000.0), 6)
           AS quoted_spread_bps
FROM matched GROUP BY 1, 2"""


def realized_variance(bars: DataFrame) -> DataFrame:
    """Realized variance vs bipower variation per (symbol, day) — the
    Barndorff-Nielsen & Shephard (2004) jump decomposition over 1-minute
    bar log-returns:

        RV  = Σ r_i²                   (quadratic variation incl. jumps)
        BV  = (π/2) · Σ |r_i|·|r_{i−1}|  (jump-robust continuous part)
        jump_share = max(0, 1 − BV/RV)

    Intra-day convention (the :func:`amihud_illiquidity` precedent):
    r_i = ln(close_i / close_{i−1}) only between consecutive bars of the
    SAME day, so day boundaries contribute neither a pseudo-return nor a
    cross-day bipower term (|r_i|·|r_{i−1}| is non-NULL only when three
    consecutive bars share the day — NULL propagation enforces it).

    Determinism: log-returns are computed from identical 6-dp-rounded bar
    closes in both engines; sums are rounded to 6 dp (the non-grid double
    average precedent); the jump share guards RV > 0 and BV non-NULL with
    explicit CASE arms on both sides (Spark's ``greatest`` skips NULLs,
    DuckDB's does not — neither is used).

    Plan shape: both lags ride ONE partitionBy(symbol) sort over bars
    (window specs share the sort, Spark collapses them into one Window
    node), then one partial-combinable aggregate to (symbol, day).

    cf. reference: extends the surface (the reference's daily summary
    stops at close-to-close volatility, `feature_builder.py:119-123`)."""
    wl = Window.partitionBy("symbol").orderBy("bucket")
    day = F.expr("(bucket * 60000) div 86400000").cast("long")
    b = bars.select(
        "symbol",
        "bucket",
        day.alias("day"),
        "close",
        F.lag("close").over(wl).alias("prev_close"),
        F.lag(day).over(wl).alias("prev_day"),
    )
    r = F.when(
        F.col("prev_day") == F.col("day"),
        F.log(F.col("close") / F.col("prev_close")),
    )
    b2 = b.select(
        "symbol", "bucket", "day", r.alias("r")
    ).withColumn("pr", F.lag("r").over(wl))
    rv = F.sum(F.col("r") * F.col("r"))
    bv = F.lit(math.pi / 2.0) * F.sum(F.abs(F.col("r")) * F.abs(F.col("pr")))
    ratio = F.lit(1.0) - bv / rv
    jump = F.when(
        (rv > 0) & bv.isNotNull(),
        F.when(ratio < 0, F.lit(0.0)).otherwise(ratio),
    )
    return b2.groupBy("symbol", "day").agg(
        F.count("r").cast("long").alias("n_returns"),
        r6(rv).alias("rv"),
        r6(bv).alias("bv"),
        r6(jump).alias("jump_share"),
    )


# oracle body over the bars CTE; same intra-day lag + NULL-propagation
# conventions, explicit CASE jump guard (no greatest() — NULL semantics
# differ between engines)
REALIZED_VAR_ORACLE_BODY = f"""
,lb AS (
  SELECT symbol, bucket,
         (bucket * 60000) // 86400000 AS day,
         close,
         lag(close) OVER w AS prev_close,
         (lag(bucket) OVER w * 60000) // 86400000 AS prev_day
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket)
),
lr AS (
  SELECT symbol, bucket, day,
         CASE WHEN prev_day = day THEN ln(close / prev_close) END AS r
  FROM lb
),
lr2 AS (
  SELECT symbol, day, r, lag(r) OVER w AS pr
  FROM lr
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket)
)
SELECT symbol, day,
       CAST(count(r) AS BIGINT) AS n_returns,
       round(sum(r * r), 6) AS rv,
       round({math.pi / 2.0!r} * sum(abs(r) * abs(pr)), 6) AS bv,
       round(CASE WHEN sum(r * r) > 0
                   AND sum(abs(r) * abs(pr)) IS NOT NULL
                  THEN CASE WHEN 1.0 - {math.pi / 2.0!r} * sum(abs(r) * abs(pr))
                                  / sum(r * r) < 0
                            THEN 0.0
                            ELSE 1.0 - {math.pi / 2.0!r} * sum(abs(r) * abs(pr))
                                 / sum(r * r) END
             END, 6) AS jump_share
FROM lr2 GROUP BY 1, 2"""


def microprice(bba: DataFrame) -> DataFrame:
    """Microprice premium per (symbol, minute) — Stoikov (2018): the
    imbalance-weighted mid

        micro = (qb·ask + qa·bid) / (qb + qa)

    (more size on the bid pushes the fair price TOWARD the ask), reported
    as the average premium over the plain mid in bps plus its average
    magnitude — the short-horizon fair-value signal the plain mid hides.

    Map-only per-update arithmetic over the BBA scan, then ONE
    partial-combinable aggregate to (symbol, minute) — no window, no
    sort: the cheapest microstructure query in the family (the 100 TB
    shape is a pure scan+agg).  Doubles with the 6-dp average precedent
    (:func:`amihud_illiquidity`).

    cf. reference: extends the surface (the reference computes spread/mid
    from the same stream, `feature_builder.py:220-225`; no imbalance
    weighting)."""
    mid = (F.col("bid_px") + F.col("ask_px")) / 2.0
    micro = (
        F.col("bid_sz") * F.col("ask_px") + F.col("ask_sz") * F.col("bid_px")
    ) / (F.col("bid_sz") + F.col("ask_sz"))
    # zero-depth guard: an empty book (qb + qa = 0) has no microprice.
    # Spark's x/0 yields NULL (avg skips the row) but DuckDB's float
    # division yields inf/NaN and poisons the bucket average — the CASE
    # pins one convention (skip the update) on BOTH sides.
    prem = F.when(
        F.col("bid_sz") + F.col("ask_sz") > 0,
        (micro - mid) / mid * 10000.0,
    )
    return (
        bba.groupBy(
            "symbol",
            F.expr("event_ts div 60000").cast("long").alias("bucket"),
        )
        .agg(
            F.count("*").cast("long").alias("n_updates"),
            r6(F.avg(prem)).alias("micro_prem_bps"),
            r6(F.avg(F.abs(prem))).alias("micro_prem_abs_bps"),
        )
    )


# oracle body over the bba CTE: identical per-update arithmetic, same
# zero-depth CASE (NULL, skipped by avg) as the engine
MICROPRICE_ORACLE_BODY = """
SELECT symbol,
       event_ts // 60000 AS bucket,
       CAST(count(*) AS BIGINT) AS n_updates,
       round(avg(CASE WHEN bid_sz + ask_sz > 0 THEN
                 ((bid_sz * ask_px + ask_sz * bid_px) / (bid_sz + ask_sz)
                  - (bid_px + ask_px) / 2.0)
                 / ((bid_px + ask_px) / 2.0) * 10000.0 END), 6)
           AS micro_prem_bps,
       round(avg(abs(CASE WHEN bid_sz + ask_sz > 0 THEN
                     ((bid_sz * ask_px + ask_sz * bid_px) / (bid_sz + ask_sz)
                      - (bid_px + ask_px) / 2.0)
                     / ((bid_px + ask_px) / 2.0) * 10000.0 END)), 6)
           AS micro_prem_abs_bps
FROM bba
GROUP BY 1, 2"""


REALIZED_SPREAD_DELTA_MS = 300_000  # post-trade reversion horizon: 5 min


def realized_spread(
    trades: DataFrame, bba: DataFrame, delta_ms: int = REALIZED_SPREAD_DELTA_MS
) -> DataFrame:
    """Realized spread and price impact per (symbol, minute) — the
    post-trade decomposition of the effective spread (Huang & Stoll
    1996): with d = +1 for buyer-initiated trades (taker bought,
    ``is_buyer_maker = false``) and m_t / m_{t+Δ} the prevailing mids at
    the trade and Δ=5 min later,

        effective_bps = 2·d·(p − m_t)     / m_t     · 1e4
        realized_bps  = 2·d·(p − m_{t+Δ}) / m_{t+Δ} · 1e4
        impact_bps    = 2·d·(m_{t+Δ} − m_t) / m_t   · 1e4

    realized is what the liquidity provider actually keeps after the
    price moves against the quote (effective ≈ realized + impact up to
    the denominator difference — kept as the literature defines each
    term, not forced to an identity).  Signing uses the feed's aggressor
    flag, not Lee-Ready inference.

    Plan shape: TWO union-LOCF as-of scans (the :func:`asof_quote_match`
    single-sort discipline) — one at the trade instant, one at the
    shifted instant t+Δ (same operator, trades carried with event_ts+Δ as
    the sort key: a quote strictly before t+Δ is exactly the prevailing
    quote at the horizon) — joined back on the (symbol, event_ts, price)
    trade identity, then one partial-combinable aggregate.  Trades
    lacking either mid (before the first quote, or within Δ of stream
    end there is always a prior quote so only the leading edge drops)
    are excluded from all three averages symmetrically.

    Grain note: the join key (symbol, event_ts, price) makes SAME-PRICED
    trades at one instant indistinguishable — they carry identical mids
    and spreads, so the join multiplicity is collapsed by a pre-join
    distinct to keep per-trade weighting exact (the oracle twin does the
    same).

    cf. reference: extends the surface (no post-trade reversion measure
    in the reference; complements :func:`effective_spread`).

    r11 optimization (pure physical rewrite, same oracle): the two
    separate union-LOCF scans became ONE multi-horizon scan on the
    :func:`markout` skeleton with horizons {0, Δ}; 9 parquet scans / 7
    shuffle stages → 4 / 6; 2.18 s → ~1.2 s at sf0.1.

    r12: rides the markout range-frame rewrite (:func:`_markout_mids`)
    — quotes and the distinct trade identity each enter the symbol sort
    ONCE (Q+T rows instead of Q+2T) and the per-trade (mid_now,
    mid_fwd) pivot groupBy disappears; equivalence argument at
    _markout_mids (a quote available at ≤ t+Δ under the range bound is
    exactly the prevailing quote the shifted probe's running LOCF
    matched; a trade with a mid at t always has a mid at t+Δ, so
    filtering on mid_now alone drops the same rows the old inner joins
    dropped)."""
    # one shared identity aggregate — the dedup window executes once
    tid, sides = _trade_identity(trades)
    hs = [0, delta_ms]
    mids = _markout_mids(_markout_union(tid, bba), hs).select(
        "symbol",
        "event_ts",
        "price",
        F.col("mid_0").alias("mid_now"),
        F.col(f"mid_{delta_ms}").alias("mid_fwd"),
    )
    m = sides.join(mids, ["symbol", "event_ts", "price"])
    d = F.when(F.col("is_buyer_maker"), F.lit(-1.0)).otherwise(F.lit(1.0))
    eff = 2.0 * d * (F.col("price") - F.col("mid_now")) / F.col("mid_now") * 10000.0
    rea = 2.0 * d * (F.col("price") - F.col("mid_fwd")) / F.col("mid_fwd") * 10000.0
    imp = 2.0 * d * (F.col("mid_fwd") - F.col("mid_now")) / F.col("mid_now") * 10000.0
    return m.groupBy(
        "symbol",
        F.expr("event_ts div 60000").cast("long").alias("bucket"),
    ).agg(
        F.count("*").cast("long").alias("n_trades"),
        r6(F.avg(eff)).alias("eff_spread_bps"),
        r6(F.avg(rea)).alias("realized_spread_bps"),
        r6(F.avg(imp)).alias("impact_bps"),
    )


# oracle body after DEDUP_TRADES_CTE + BBA_CTE: two ASOF joins (trade
# instant and the +delta horizon), same distinct-collapsed trade identity;
# quote-tie collapse is the window dedup (see EFFECTIVE_SPREAD note)
REALIZED_SPREAD_ORACLE_BODY = f"""
,quotes AS (
  SELECT symbol, avail_ts,
         {{'i': ingest_ts, 'b': bid_px, 'a': ask_px,
          'bs': bid_sz, 'asz': ask_sz}} AS s
  FROM (SELECT symbol, event_ts + 1 AS avail_ts, ingest_ts,
               bid_px, ask_px, bid_sz, ask_sz FROM bba)
  QUALIFY row_number() OVER (PARTITION BY symbol, avail_ts
      ORDER BY ingest_ts DESC, bid_px DESC, ask_px DESC,
               bid_sz DESC, ask_sz DESC) = 1
),
t0 AS (
  SELECT DISTINCT symbol, event_ts, price, is_buyer_maker
  FROM dedup_trades
),
now_m AS (
  SELECT DISTINCT t.symbol, t.event_ts, t.price,
         (struct_extract(q.s, 'b') + struct_extract(q.s, 'a')) / 2.0 AS mid_now
  FROM t0 t
  ASOF JOIN quotes q ON t.symbol = q.symbol AND t.event_ts >= q.avail_ts
),
fwd_m AS (
  SELECT DISTINCT t.symbol, t.event_ts, t.price,
         (struct_extract(q.s, 'b') + struct_extract(q.s, 'a')) / 2.0 AS mid_fwd
  FROM t0 t
  ASOF JOIN quotes q
    ON t.symbol = q.symbol AND t.event_ts + {REALIZED_SPREAD_DELTA_MS} >= q.avail_ts
),
m AS (
  SELECT t.symbol, t.event_ts, t.price,
         CASE WHEN t.is_buyer_maker THEN -1.0 ELSE 1.0 END AS d,
         n.mid_now, f.mid_fwd
  FROM t0 t
  JOIN now_m n USING (symbol, event_ts, price)
  JOIN fwd_m f USING (symbol, event_ts, price)
)
SELECT symbol, event_ts // 60000 AS bucket,
       CAST(count(*) AS BIGINT) AS n_trades,
       round(avg(2.0 * d * (price - mid_now) / mid_now * 10000.0), 6)
           AS eff_spread_bps,
       round(avg(2.0 * d * (price - mid_fwd) / mid_fwd * 10000.0), 6)
           AS realized_spread_bps,
       round(avg(2.0 * d * (mid_fwd - mid_now) / mid_now * 10000.0), 6)
           AS impact_bps
FROM m GROUP BY 1, 2"""


def twa_spread(bba: DataFrame) -> DataFrame:
    """TIME-weighted quoted spread per (symbol, minute) — the TAQ
    convention: each quote's spread is weighted by its LIFETIME (until
    the next update), not its arrival count, so one flickering quote
    can't dominate a minute it occupied for 2 ms.  A quote alive across
    minute boundaries contributes to EVERY minute it spans, pro-rated by
    overlap.

    Lifetime: lead(event_ts) over the full deterministic quote order
    (event_ts, ingest_ts, bid_px, ask_px, bid_sz, ask_sz); same-instant
    duplicates get zero lifetime and drop out of the weighting naturally
    (only the instant's last quote, the lexicographic max — the
    :func:`effective_spread` tie convention — carries time).  Each
    symbol's final quote closes at its own last update (the stream end;
    it contributes nothing, the same right-open convention as the
    duplicate rule).

    Plan shape: ONE partitionBy(symbol) sort for the lead, then the
    interval→minute explode (`sequence` of spanned buckets — output rows
    = quote count + number of boundary crossings, linear in the stream),
    then one partial-combinable aggregate.  The weighted sums are
    doubles under the 6-dp average precedent; weights are exact integer
    milliseconds.

    cf. reference: extends the surface (the reference's BBA features are
    arrival-weighted, `feature_builder.py:220-225`)."""
    wl = Window.partitionBy("symbol").orderBy(
        "event_ts", "ingest_ts", "bid_px", "ask_px", "bid_sz", "ask_sz"
    )
    q = bba.select(
        "symbol",
        "event_ts",
        "bid_px",
        "ask_px",
        F.lead("event_ts").over(wl).alias("next_ts"),
    ).filter(F.col("next_ts").isNotNull() & (F.col("next_ts") > F.col("event_ts")))
    return _twa_spread_agg(q)


def twa_spread_sliced(bba: DataFrame, slice_ms: int = SKEW_SLICE_MS) -> DataFrame:
    """Hot-key-safe :func:`twa_spread` — identical output (same DuckDB
    oracle), with the lifetime lead computed per (symbol, time-slice) so a
    dominant symbol spreads over ~span/slice_ms sort partitions (measured
    single-sort skew decade row: 4.54x vs 1.10x balanced —
    BENCH_SCALE_r09.json `skew`).

    Boundary repair: the sort-order-last quote of a slice has no local
    lead; its true successor is the FIRST quote of the next occupied
    slice, whose event_ts is that slice's min(event_ts) (event_ts leads
    the sort order and slices are event_ts ranges).  A lead over the
    per-(symbol, slice) min-summary (symbols x occupied slices rows)
    supplies it via a broadcast join; the final quote of the final slice
    stays NULL and drops — the same right-open stream-end convention as
    the single-sort form."""
    q0 = bba.withColumn("slice", F.expr(f"event_ts div {slice_ms}").cast("long"))
    wl = Window.partitionBy("symbol", "slice").orderBy(
        "event_ts", "ingest_ts", "bid_px", "ask_px", "bid_sz", "ask_sz"
    )
    local = q0.select(
        "symbol",
        "slice",
        "event_ts",
        "bid_px",
        "ask_px",
        F.lead("event_ts").over(wl).alias("next_local"),
    )
    nxt = (
        q0.groupBy("symbol", "slice")
        .agg(F.min("event_ts").alias("first_ts"))
        .withColumn(
            "next_slice_first",
            F.lead("first_ts").over(Window.partitionBy("symbol").orderBy("slice")),
        )
        .select("symbol", "slice", "next_slice_first")
    )
    q = (
        local.join(F.broadcast(nxt), ["symbol", "slice"], "left")
        .withColumn(
            "next_ts", F.coalesce(F.col("next_local"), F.col("next_slice_first"))
        )
        .filter(F.col("next_ts").isNotNull() & (F.col("next_ts") > F.col("event_ts")))
        .select("symbol", "event_ts", "bid_px", "ask_px", "next_ts")
    )
    return _twa_spread_agg(q)


def twa_spread_adaptive(
    bba: DataFrame,
    hot_share: float | None = None,
    threshold: float = HOT_KEY_SHARE_THRESHOLD,
) -> DataFrame:
    """Skew-adaptive :func:`twa_spread` — the
    :func:`effective_spread_adaptive` dispatch applied to the quote
    lifetime plan (single-sort skew decade 4.15x vs the sliced form's
    1.40x, BENCH_SCALE_r09.json `skew`; same oracle either way).  The
    gauge runs on the quote leg itself."""
    if hot_share is None:
        hot_share = hot_key_share(bba)
    if hot_share >= threshold:
        return twa_spread_sliced(bba)
    return twa_spread(bba)


def _twa_spread_agg(q: DataFrame) -> DataFrame:
    """(symbol, event_ts, bid_px, ask_px, next_ts) intervals → minute
    TWA aggregate (the :func:`twa_spread` explode + weighting stage)."""
    spread_bps = (
        (F.col("ask_px") - F.col("bid_px"))
        / ((F.col("bid_px") + F.col("ask_px")) / 2.0)
        * 10000.0
    )
    e = q.select(
        "symbol",
        "event_ts",
        "next_ts",
        spread_bps.alias("spread_bps"),
        F.explode(
            F.expr("sequence(event_ts div 60000, (next_ts - 1) div 60000)")
        ).alias("bucket"),
    )
    overlap = (
        F.least(F.col("next_ts"), (F.col("bucket") + 1) * 60000)
        - F.greatest(F.col("event_ts"), F.col("bucket") * 60000)
    ).cast("long")
    return (
        e.select("symbol", "bucket", "spread_bps", overlap.alias("w"))
        .groupBy("symbol", F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_intervals"),
            F.sum("w").cast("long").alias("quoted_ms"),
            r6(F.sum(F.col("spread_bps") * F.col("w")) / F.sum("w")).alias(
                "twa_spread_bps"
            ),
        )
    )


# oracle body over the bba CTE: same deterministic lead order, same
# interval->bucket explode and overlap arithmetic
TWA_SPREAD_ORACLE_BODY = """
,ql AS (
  SELECT symbol, event_ts, bid_px, ask_px,
         lead(event_ts) OVER w AS next_ts
  FROM bba
  WINDOW w AS (PARTITION BY symbol
               ORDER BY event_ts, ingest_ts, bid_px, ask_px, bid_sz, ask_sz)
),
iv AS (
  SELECT symbol, event_ts, next_ts,
         (ask_px - bid_px) / ((bid_px + ask_px) / 2.0) * 10000.0 AS spread_bps,
         unnest(generate_series(event_ts // 60000, (next_ts - 1) // 60000))
             AS bucket
  FROM ql
  WHERE next_ts IS NOT NULL AND next_ts > event_ts
)
SELECT symbol, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(least(next_ts, (bucket + 1) * 60000)
                - greatest(event_ts, bucket * 60000)) AS BIGINT) AS quoted_ms,
       round(sum(spread_bps * (least(next_ts, (bucket + 1) * 60000)
                               - greatest(event_ts, bucket * 60000)))
             / sum(least(next_ts, (bucket + 1) * 60000)
                   - greatest(event_ts, bucket * 60000)), 6) AS twa_spread_bps
FROM iv GROUP BY 1, 2"""


ACF_MAX_LAG = 5  # autocorrelation lags reported per symbol


def acf_price_changes(bars: DataFrame, max_lag: int = ACF_MAX_LAG) -> DataFrame:
    """Autocorrelation function of 1-minute bar close-to-close price
    changes at lags 1..max_lag per symbol — the standard serial-dependence
    diagnostic behind :func:`roll_spread` (whose model PREDICTS a negative
    lag-1 value and ~zero beyond): one report that shows whether the tape
    looks like bid-ask bounce (big negative lag-1 only), momentum
    (positive short lags), or a random walk (all ~0).

    Clock convention (documented, oracle-replicated): lags are in BAR
    SEQUENCE order per symbol (trade-time clock) — bars exist only for
    minutes that traded, and a gap does not break the sequence.  This is
    the same convention :func:`amihud_illiquidity`'s close-to-close lag
    uses, minus its same-day restriction (ACF is a whole-tape statistic).

    Determinism: Δclose lives on the 6-dp bar grid → cast to
    DECIMAL(12,6); all five Pearson moments Σx, Σy, Σxy, Σx², Σy² are
    DECIMAL-exact sums cast to double once (the :func:`kyle_lambda`
    discipline), so the correlation arithmetic sees bit-identical
    operands in both engines.  Degenerate symbols (either margin
    zero-variance, n<2) emit NULL, not 0/0.

    Plan shape: Δclose and all lagged copies ride ONE
    partitionBy(symbol) sort over bars (already thousands-to-1 reduced
    from ticks); `stack` fans each pair row out max_lag× map-side; one
    partial-combinable aggregate to (symbol, lag) — K·max_lag rows.
    Scale-safe: no self-join, fan-out is the constant max_lag.

    cf. reference: extends the surface (the reference computes per-batch
    imbalance/returns but no serial-dependence diagnostics,
    feature_builder.py:119-150)."""
    wl = Window.partitionBy("symbol").orderBy("bucket")
    cd = F.col("close").cast("decimal(12,6)")
    dp = (cd - F.lag(cd).over(wl)).cast("decimal(12,6)")
    b = bars.select("symbol", "bucket", dp.alias("dp"))
    lag_cols = [
        F.lag("dp", k).over(wl).alias(f"dp_l{k}") for k in range(1, max_lag + 1)
    ]
    stacked = b.select("symbol", "dp", *lag_cols).select(
        "symbol",
        "dp",
        F.expr(
            "stack({n}, {args}) AS (lag, dp_lag)".format(
                n=max_lag,
                args=", ".join(
                    f"{k}, dp_l{k}" for k in range(1, max_lag + 1)
                ),
            )
        ),
    ).filter(F.col("dp").isNotNull() & F.col("dp_lag").isNotNull())
    g = stacked.groupBy("symbol", "lag").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("dp").cast("double").alias("sx"),
        F.sum("dp_lag").cast("double").alias("sy"),
        F.sum((F.col("dp") * F.col("dp_lag")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("dp") * F.col("dp")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("dp_lag") * F.col("dp_lag")).cast("decimal(38,12)"))
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n_pairs")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(varx * vary)
    return g.select(
        "symbol",
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        F.when((varx > 0) & (vary > 0), r6(corr)).alias("acf"),
    )


ACF_ORACLE_BODY = f"""
,acf_dp AS (
  SELECT symbol, bucket,
         CAST(CAST(close AS DECIMAL(12,6))
              - lag(CAST(close AS DECIMAL(12,6))) OVER w AS DECIMAL(12,6))
             AS dp
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket)
),
acf_lagged AS (
  SELECT symbol, dp, lag_k.lag,
         CASE lag_k.lag
           {" ".join(f"WHEN {k} THEN lag(dp, {k}) OVER (PARTITION BY symbol, lag_k.lag ORDER BY bucket)" for k in range(1, ACF_MAX_LAG + 1))}
         END AS dp_lag
  FROM acf_dp
  CROSS JOIN (SELECT unnest(generate_series(1, {ACF_MAX_LAG})) AS lag) lag_k
),
acf_g AS (
  SELECT symbol, lag,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(dp) AS DOUBLE) AS sx,
         CAST(sum(dp_lag) AS DOUBLE) AS sy,
         CAST(sum(CAST(CAST(dp AS DECIMAL(19,6)) * CAST(dp_lag AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(CAST(dp AS DECIMAL(19,6)) * CAST(dp AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(CAST(dp_lag AS DECIMAL(19,6)) * CAST(dp_lag AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS syy
  FROM acf_lagged
  WHERE dp IS NOT NULL AND dp_lag IS NOT NULL
  GROUP BY symbol, lag
)
SELECT symbol, CAST(lag AS INT) AS lag, n_pairs,
       CASE WHEN n_pairs * sxx - sx * sx > 0
             AND n_pairs * syy - sy * sy > 0
            THEN round((n_pairs * sxy - sx * sy)
                       / sqrt((n_pairs * sxx - sx * sx)
                              * (n_pairs * syy - sy * sy)), 6)
       END AS acf
FROM acf_g"""


VR_HORIZON = 5  # variance-ratio aggregation horizon (bars per long period)


def variance_ratio(bars: DataFrame, q: int = VR_HORIZON) -> DataFrame:
    """Lo-MacKinlay variance ratio VR(q) per symbol over 1-minute bar
    close-to-close price changes: Var of the q-bar overlapping sums over
    q x Var of the 1-bar changes.  VR ~ 1 is a random walk, VR < 1 mean
    reversion (bid-ask bounce — :func:`roll_spread`'s regime), VR > 1
    momentum.  The plug-in estimator (population variances, overlapping
    q-sums, no heteroskedasticity correction) — convention documented
    and oracle-replicated.

    Clock convention: bar-sequence (trade-time) lags, same as
    :func:`acf_price_changes`.

    Determinism: Δclose and its q-sums live on the 6-dp decimal grid —
    every moment (Σx, Σx² for both margins) is a DECIMAL-exact sum cast
    to double once, so the final ratio sees bit-identical operands in
    both engines.  Symbols with zero short-horizon variance or fewer
    than q+1 bars emit NULL.

    Plan shape: Δclose and the ROWS-frame q-sum ride ONE
    partitionBy(symbol) sort over bars; one partial-combinable aggregate
    to K symbol rows.  Scale-safe: window state is q rows.

    cf. reference: extends the surface (companion of
    :func:`acf_price_changes`; the reference has no horizon-scaling
    diagnostics)."""
    wl = Window.partitionBy("symbol").orderBy("bucket")
    wq = wl.rowsBetween(-(q - 1), 0)
    cd = F.col("close").cast("decimal(12,6)")
    dp = (cd - F.lag(cd).over(wl)).cast("decimal(12,6)")
    b = (
        bars.select("symbol", "bucket", dp.alias("dp"))
        .withColumn("qsum", F.sum("dp").over(wq).cast("decimal(18,6)"))
        .withColumn("q_n", F.count("dp").over(wq))
    )
    # qsum is a valid q-period change only once the frame holds q deltas
    g = b.groupBy("symbol").agg(
        F.count("dp").cast("long").alias("n_short"),
        F.sum("dp").cast("double").alias("sx"),
        F.sum((F.col("dp") * F.col("dp")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.when(F.col("q_n") == q, 1).otherwise(0))
        .cast("long")
        .alias("n_long"),
        F.sum(F.when(F.col("q_n") == q, F.col("qsum")))
        .cast("double")
        .alias("sq"),
        F.sum(
            F.when(
                F.col("q_n") == q, (F.col("qsum") * F.col("qsum")).cast("decimal(38,12)")
            )
        )
        .cast("double")
        .alias("sqq"),
    )
    var1 = (F.col("n_short") * F.col("sxx") - F.col("sx") * F.col("sx")) / (
        F.col("n_short") * F.col("n_short")
    )
    varq = (F.col("n_long") * F.col("sqq") - F.col("sq") * F.col("sq")) / (
        F.col("n_long") * F.col("n_long")
    )
    ok = (F.col("n_short") > 0) & (F.col("n_long") > 0) & (var1 > 0)
    return g.select(
        "symbol",
        "n_short",
        "n_long",
        F.when(ok, r6(var1)).alias("var_1"),
        F.when(ok, r6(varq)).alias("var_q"),
        F.when(ok, r6(varq / (q * var1))).alias("variance_ratio"),
    )


VR_ORACLE_BODY = f"""
,vr_dp AS (
  SELECT symbol, bucket,
         CAST(CAST(close AS DECIMAL(12,6))
              - lag(CAST(close AS DECIMAL(12,6))) OVER w AS DECIMAL(12,6))
             AS dp
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket)
),
vr_q AS (
  SELECT symbol, dp,
         CAST(sum(dp) OVER wq AS DECIMAL(18,6)) AS qsum,
         count(dp) OVER wq AS q_n
  FROM vr_dp
  WINDOW wq AS (PARTITION BY symbol ORDER BY bucket
                ROWS BETWEEN {VR_HORIZON - 1} PRECEDING AND CURRENT ROW)
),
vr_g AS (
  SELECT symbol,
         CAST(count(dp) AS BIGINT) AS n_short,
         CAST(sum(dp) AS DOUBLE) AS sx,
         CAST(sum(CAST(CAST(dp AS DECIMAL(19,6)) * CAST(dp AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
         CAST(sum(CASE WHEN q_n = {VR_HORIZON} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_long,
         CAST(sum(CASE WHEN q_n = {VR_HORIZON} THEN qsum END) AS DOUBLE) AS sq,
         CAST(sum(CASE WHEN q_n = {VR_HORIZON}
                       THEN CAST(CAST(qsum AS DECIMAL(19,6)) * CAST(qsum AS DECIMAL(19,6)) AS DECIMAL(38,12)) END) AS DOUBLE)
             AS sqq
  FROM vr_q
  GROUP BY symbol
)
SELECT symbol, n_short, n_long,
       CASE WHEN ok THEN round(var_1, 6) END AS var_1,
       CASE WHEN ok THEN round(var_q, 6) END AS var_q,
       CASE WHEN ok THEN round(var_q / ({VR_HORIZON} * var_1), 6) END
           AS variance_ratio
FROM (
  SELECT symbol, n_short, n_long,
         (n_short * sxx - sx * sx) / (CAST(n_short AS DOUBLE) * n_short)
             AS var_1,
         (n_long * sqq - sq * sq) / (CAST(n_long AS DOUBLE) * n_long) AS var_q,
         n_short > 0 AND n_long > 0
           AND (n_short * sxx - sx * sx)
               / (CAST(n_short AS DOUBLE) * n_short) > 0 AS ok
  FROM vr_g
)"""


XCORR_MAX_LAG = 2  # lead-lag horizon in 1-minute buckets (k in -2..2)


def leadlag_xcorr(bars: DataFrame, max_lag: int = XCORR_MAX_LAG) -> DataFrame:
    """Cross-symbol lead-lag correlation (Hoffmann-Rosenbaum-style price
    discovery diagnostic): for every unordered symbol pair (a < b) and
    lag k in [-max_lag, +max_lag], the Pearson correlation of a's
    1-minute close-to-close change at bucket t with b's at bucket t+k.
    An asymmetric profile (|xcorr| peaking at k>0) means a LEADS b —
    which venue/asset moves first, the cross-asset complement of
    :func:`acf_price_changes`'s own-lag profile.

    Clock convention: CALENDAR buckets (not bar sequence) — a lead-lag
    statement is only meaningful on a shared clock, so pairs form only
    where BOTH symbols traded in the respective minutes (co-observed
    buckets; gaps simply produce no pair, documented and
    oracle-replicated).

    Determinism: Δclose on the 6-dp decimal grid, all five moments
    DECIMAL-exact (the :func:`kyle_lambda` discipline); degenerate
    margins (zero variance, n<2) emit NULL.

    Plan shape: bars → Δclose rides one partitionBy(symbol) sort; the
    lag explode fans ONE side (2·max_lag+1)× map-side; the self-join is
    a hash equi-join on the shifted bucket (both sides shuffle on
    bucket — time-partitioned, never a cross join; the a<b predicate
    is a join filter); one partial-combinable aggregate to
    pairs×lags rows.  At 100 TB the join carries one row per
    (symbol, minute) per side — already thousands-to-1 reduced from
    ticks — and fan-out is the constant lag window.

    cf. reference: extends the surface (the reference joins multi-source
    features per symbol, feature_builder.py:214-276, but computes no
    cross-symbol statistics)."""
    wl = Window.partitionBy("symbol").orderBy("bucket")
    cd = F.col("close").cast("decimal(12,6)")
    d = (
        bars.select(
            "symbol", "bucket", (cd - F.lag(cd).over(wl)).cast("decimal(12,6)").alias("dp")
        )
        .filter(F.col("dp").isNotNull())
    )
    lags = F.array(*[F.lit(k) for k in range(-max_lag, max_lag + 1)])
    b = (
        d.select(
            F.col("symbol").alias("symbol_b"),
            F.col("bucket").alias("bucket_b"),
            F.col("dp").alias("dp_b"),
        )
        .withColumn("lag", F.explode(lags))
        .withColumn("bucket_a", F.col("bucket_b") - F.col("lag"))
    )
    pairs = d.alias("a").join(
        b,
        (F.col("a.bucket") == F.col("bucket_a"))
        & (F.col("a.symbol") < F.col("symbol_b")),
    )
    g = pairs.groupBy(
        F.col("a.symbol").alias("symbol_a"), "symbol_b", "lag"
    ).agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("a.dp").cast("double").alias("sx"),
        F.sum("dp_b").cast("double").alias("sy"),
        F.sum((F.col("a.dp") * F.col("dp_b")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("a.dp") * F.col("a.dp")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("dp_b") * F.col("dp_b")).cast("decimal(38,12)"))
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n_pairs")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(varx * vary)
    return g.select(
        "symbol_a",
        "symbol_b",
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        F.when((varx > 0) & (vary > 0), r6(corr)).alias("xcorr"),
    )


XCORR_ORACLE_BODY = f"""
,xc_dp AS (
  SELECT symbol, bucket,
         CAST(CAST(close AS DECIMAL(12,6))
              - lag(CAST(close AS DECIMAL(12,6))) OVER w AS DECIMAL(12,6))
             AS dp
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket)
),
xc AS (SELECT * FROM xc_dp WHERE dp IS NOT NULL),
-- shift the bucket BEFORE the join (mirrors the engine plan): a 3-table
-- join condition (a.bucket = b.bucket - k.lag) defeats the hash-join
-- planner and degrades to a nested loop over a x (k x b)
xc_b AS (
  SELECT b.symbol AS symbol_b, k.lag AS lag,
         b.bucket - k.lag AS bucket_a, b.dp AS dp_b
  FROM xc b
  CROSS JOIN (SELECT unnest(generate_series(-{XCORR_MAX_LAG},
                                            {XCORR_MAX_LAG})) AS lag) k
),
xc_pairs AS (
  SELECT a.symbol AS symbol_a, xb.symbol_b, xb.lag,
         a.dp AS dp_a, xb.dp_b
  FROM xc a
  JOIN xc_b xb ON a.bucket = xb.bucket_a AND a.symbol < xb.symbol_b
),
xc_g AS (
  SELECT symbol_a, symbol_b, lag,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(dp_a) AS DOUBLE) AS sx,
         CAST(sum(dp_b) AS DOUBLE) AS sy,
         CAST(sum(CAST(CAST(dp_a AS DECIMAL(19,6)) * CAST(dp_b AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(CAST(dp_a AS DECIMAL(19,6)) * CAST(dp_a AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(CAST(dp_b AS DECIMAL(19,6)) * CAST(dp_b AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS syy
  FROM xc_pairs
  GROUP BY 1, 2, 3
)
SELECT symbol_a, symbol_b, CAST(lag AS INT) AS lag, n_pairs,
       CASE WHEN n_pairs * sxx - sx * sx > 0
             AND n_pairs * syy - sy * sy > 0
            THEN round((n_pairs * sxy - sx * sy)
                       / sqrt((n_pairs * sxx - sx * sx)
                              * (n_pairs * syy - sy * sy)), 6)
       END AS xcorr
FROM xc_g"""


DEPTH_SLOPE_LEVELS = 10
# OLS-over-levels weights, precomputed so BOTH engines consume identical
# integer literals: regressing cumulative qty cq_i on level index i=1..n
# needs S1 = Σ cq_i = Σ_j qty_j·(n−j+1) and S2 = Σ i·cq_i =
# Σ_j qty_j·(Σ_{i=j..n} i) — two fixed-order weighted folds over the raw
# qty array, no intermediate cumulative array.
_DS_N = DEPTH_SLOPE_LEVELS
_DS_W1 = [_DS_N - (j - 1) for j in range(1, _DS_N + 1)]
_DS_W2 = [
    _DS_N * (_DS_N + 1) // 2 - ((j - 1) * j) // 2 for j in range(1, _DS_N + 1)
]
_DS_SI = _DS_N * (_DS_N + 1) // 2                      # Σ i   = 55
_DS_DEN = _DS_N * (_DS_N * (_DS_N + 1) * (2 * _DS_N + 1) // 6) - _DS_SI**2
# n·Σi² − (Σi)² = 825

DEPTH_SLOPE_BUCKET_MS = 3_600_000  # hourly roll-up


def depth_slope(depth: DataFrame) -> DataFrame:
    """Order-book liquidity slope per (symbol, hour): for each depth
    snapshot, the OLS slope of CUMULATIVE quantity against level index
    over the top-10 book levels, per side — how fast liquidity
    accumulates as you walk away from the touch (a steep slope = a deep,
    resilient book; the cross-sectional complement of
    :func:`microprice`'s top-of-book imbalance) — then the hourly mean
    of each side's slope plus a book-imbalance ratio.

    Determinism: each snapshot's slope is two FIXED-ORDER weighted folds
    (`aggregate` in Spark, `list_reduce` in DuckDB — both left-to-right
    over the same 10 products of qty and a shared integer weight
    literal), so per-snapshot slopes are bit-identical cross-engine; the
    hourly mean is rounded to 6 dp (the documented non-grid-average
    precedent, cf. :func:`amihud_illiquidity`).

    Plan shape: the fold is map-side array math on the normalized depth
    stream — the only shuffle is the final (symbol, hour)
    partial-combinable aggregate.  Scale-safe: per-row work is O(levels).

    cf. reference: the reference maintains the same top-10 book in Redis
    (docs/architecture/DATA_PIPELINE.md:73-107) and reads top-of-book
    features from it (feature_builder.py:220-276); this adds the
    level-structure statistic it never computes."""
    w1 = "array(" + ", ".join(str(w) for w in _DS_W1) + ")"
    w2 = "array(" + ", ".join(str(w) for w in _DS_W2) + ")"

    def fold(side: str, weights: str) -> str:
        return (
            f"aggregate(zip_with({side}, {weights},"
            " (s, w) -> s.qty * w), 0D, (a, x) -> a + x)"
        )

    def slope(side: str) -> str:
        return (
            f"({_DS_N} * {fold(side, w2)} - {_DS_SI} * {fold(side, w1)})"
            f" / {_DS_DEN}.0"
        )

    snap = depth.select(
        "symbol",
        F.expr(f"event_ts div {DEPTH_SLOPE_BUCKET_MS}").cast("long").alias("hour"),
        F.expr(slope("bids")).alias("bid_slope"),
        F.expr(slope("asks")).alias("ask_slope"),
        F.expr(fold("bids", w1)).alias("bid_s1"),
        F.expr(fold("asks", w1)).alias("ask_s1"),
    )
    return snap.groupBy("symbol", "hour").agg(
        F.count("*").cast("long").alias("n_snapshots"),
        r6(F.avg("bid_slope")).alias("avg_bid_slope"),
        r6(F.avg("ask_slope")).alias("avg_ask_slope"),
        r6(
            F.avg(
                (F.col("bid_s1") - F.col("ask_s1"))
                / (F.col("bid_s1") + F.col("ask_s1"))
            )
        ).alias("avg_book_imbalance"),
    )


def _ds_oracle() -> str:
    w1 = "[" + ", ".join(str(w) for w in _DS_W1) + "]"
    w2 = "[" + ", ".join(str(w) for w in _DS_W2) + "]"

    def fold(side: str, weights: str) -> str:
        return (
            f"list_reduce([{side}[i].qty * ({weights})[i]"
            " for i in generate_series(1, 10)], (a, b) -> a + b)"
        )

    def slope(side: str) -> str:
        return (
            f"({_DS_N} * {fold(side, w2)} - {_DS_SI} * {fold(side, w1)})"
            f" / {_DS_DEN}.0"
        )

    return f"""
,ds AS (
  SELECT symbol, event_ts // {DEPTH_SLOPE_BUCKET_MS} AS hour,
         {slope('bids')} AS bid_slope,
         {slope('asks')} AS ask_slope,
         {fold('bids', w1)} AS bid_s1,
         {fold('asks', w1)} AS ask_s1
  FROM depth
)
SELECT symbol, CAST(hour AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n_snapshots,
       round(avg(bid_slope), 6) AS avg_bid_slope,
       round(avg(ask_slope), 6) AS avg_ask_slope,
       round(avg((bid_s1 - ask_s1) / (bid_s1 + ask_s1)), 6)
           AS avg_book_imbalance
FROM ds GROUP BY 1, 2"""


DEPTH_SLOPE_ORACLE_BODY = _ds_oracle()


QTR_BUCKET_MS = 3_600_000  # quote-to-trade ratio grain: 1 hour


def quote_trade_ratio(
    bba: DataFrame, dedup_trades: DataFrame, bucket_ms: int = QTR_BUCKET_MS
) -> DataFrame:
    """Quote-to-trade ratio per (symbol, hour) — the market-quality /
    messaging-intensity metric surveillance desks track (SEC MIDAS
    convention): quote updates per executed trade, with both raw counts
    kept.  High ratios flag quote-stuffing regimes; the hourly grain
    matches :func:`depth_slope`'s book-structure roll-up.

    Determinism: pure integer counts; the ratio is one double division
    of identical operands, NULL when the hour has no trades (ratio is
    undefined, not infinite).

    Plan shape: two partial-combinable count aggregates (quote stream,
    trade stream) to the same (symbol, hour) key, then a full outer
    join on K·hours rows — both sides already thousands-to-1 reduced.
    Hours with quotes but no trades (ratio NULL) and trades but no
    quotes (ratio 0-quote row) both survive the outer join: silence on
    either stream is exactly what the metric audits.

    cf. reference: extends the surface (the reference counts trades per
    batch, feature_builder.py:96-100, but never relates the two message
    streams)."""
    q = bba.groupBy(
        "symbol",
        F.expr(f"event_ts div {bucket_ms}").cast("long").alias("hour"),
    ).agg(F.count("*").cast("long").alias("n_quotes"))
    t = dedup_trades.groupBy(
        "symbol",
        F.expr(f"event_ts div {bucket_ms}").cast("long").alias("hour"),
    ).agg(F.count("*").cast("long").alias("n_trades"))
    j = q.join(t, ["symbol", "hour"], "full_outer")
    nq = F.coalesce(F.col("n_quotes"), F.lit(0)).cast("long")
    nt = F.coalesce(F.col("n_trades"), F.lit(0)).cast("long")
    return j.select(
        "symbol",
        "hour",
        nq.alias("n_quotes"),
        nt.alias("n_trades"),
        F.when(nt > 0, r6(nq.cast("double") / nt.cast("double"))).alias(
            "quote_trade_ratio"
        ),
    )


QTR_ORACLE_BODY = f"""
,qtr_q AS (
  SELECT symbol, event_ts // {QTR_BUCKET_MS} AS hour,
         CAST(count(*) AS BIGINT) AS n_quotes
  FROM bba GROUP BY 1, 2
),
qtr_t AS (
  SELECT symbol, event_ts // {QTR_BUCKET_MS} AS hour,
         CAST(count(*) AS BIGINT) AS n_trades
  FROM dedup_trades GROUP BY 1, 2
)
SELECT coalesce(q.symbol, t.symbol) AS symbol,
       CAST(coalesce(q.hour, t.hour) AS BIGINT) AS hour,
       CAST(coalesce(q.n_quotes, 0) AS BIGINT) AS n_quotes,
       CAST(coalesce(t.n_trades, 0) AS BIGINT) AS n_trades,
       CASE WHEN coalesce(t.n_trades, 0) > 0
            THEN round(CAST(coalesce(q.n_quotes, 0) AS DOUBLE)
                       / CAST(t.n_trades AS DOUBLE), 6)
       END AS quote_trade_ratio
FROM qtr_q q FULL OUTER JOIN qtr_t t
  ON q.symbol = t.symbol AND q.hour = t.hour"""


INTRADAY_HOURS = 24


def intraday_volume_profile(bars: DataFrame) -> DataFrame:
    """Intraday volume seasonality per (symbol, hour-of-day): each day's
    hourly share of that day's total volume, averaged across days — the
    U-shape curve execution schedulers (VWAP strategies) are built on.

    Determinism: bar volumes live on the 6-dp grid → hourly and daily
    sums are DECIMAL-exact; each day's share divides identical decimal-
    derived doubles; the cross-day mean is the documented
    rounded-average convention (cf. :func:`amihud_illiquidity`).

    Plan shape: bars → one (symbol, day, hod) partial-combinable
    aggregate; the day total rides a window over the (symbol, day)
    partition (hours-per-day rows each); one final (symbol, hod)
    aggregate to K·24 rows.

    cf. reference: extends the surface (the reference's daily summary
    has no time-of-day structure, S3_SCHEMA.md:568)."""
    hb = bars.groupBy(
        "symbol",
        F.expr("(bucket * 60000) div 86400000").cast("long").alias("day"),
        F.expr("(bucket * 60000) % 86400000 div 3600000")
        .cast("int")
        .alias("hod"),
    ).agg(F.sum(F.col("volume").cast("decimal(18,6)")).alias("vol_h"))
    wd = Window.partitionBy("symbol", "day")
    sh = hb.withColumn(
        "day_total", F.sum("vol_h").over(wd).cast("decimal(28,6)")
    ).withColumn(
        "share", F.col("vol_h").cast("double") / F.col("day_total").cast("double")
    )
    return sh.groupBy("symbol", "hod").agg(
        F.count("*").cast("long").alias("n_days"),
        r6(F.avg("share")).alias("avg_volume_share"),
    )


INTRADAY_ORACLE_BODY = """
,ivp_h AS (
  SELECT symbol,
         (bucket * 60000) // 86400000 AS day,
         CAST((bucket * 60000) % 86400000 // 3600000 AS INT) AS hod,
         sum(CAST(volume AS DECIMAL(18,6))) AS vol_h
  FROM bars GROUP BY 1, 2, 3
),
ivp_s AS (
  SELECT symbol, day, hod,
         CAST(vol_h AS DOUBLE)
           / CAST(CAST(sum(vol_h) OVER (PARTITION BY symbol, day)
                       AS DECIMAL(28,6)) AS DOUBLE) AS share
  FROM ivp_h
)
SELECT symbol, hod,
       CAST(count(*) AS BIGINT) AS n_days,
       round(avg(share), 6) AS avg_volume_share
FROM ivp_s GROUP BY 1, 2"""


def realized_beta(bars: DataFrame) -> DataFrame:
    """Market-model realized beta per symbol: the OLS slope of the
    symbol's 1-minute Δclose on the MARKET Δclose (the cross-sectional
    sum of all symbols' Δcloses in that minute — the equal-notional
    market-move index), plus the regression R².  The market-model
    companion of :func:`leadlag_xcorr`'s pairwise profile: one number
    per symbol for "how much of this move is market, how much is
    idiosyncratic".

    Index convention (documented, oracle-replicated): the market factor
    is the SUM of per-symbol Δcloses over symbols observed in BOTH
    minutes (Δ needs a previous bar), not the mean — a sum of
    DECIMAL(12,6) grid values stays on the grid, so every regression
    moment is DECIMAL-exact (dividing by a varying symbol count would
    leave the grid); the slope absorbs the scale.  Minutes where the
    symbol itself has no Δclose contribute nothing to its regression.

    Determinism: the :func:`kyle_lambda` discipline — decimal moments
    cast to double once, NULL on zero market variance.

    Plan shape: Δclose rides the ONE partitionBy(symbol) sort; the
    market factor is a (bucket)-keyed partial-combinable aggregate over
    the same Δp rows; one broadcast-sized join back on bucket (minute
    count is calendar-bounded) and one K-row moment aggregate.

    cf. reference: extends the surface (the reference has no
    cross-sectional factor model)."""
    wl = Window.partitionBy("symbol").orderBy("bucket")
    cd = F.col("close").cast("decimal(12,6)")
    d = (
        bars.select(
            "symbol",
            "bucket",
            (cd - F.lag(cd).over(wl)).cast("decimal(12,6)").alias("dp"),
        )
        .filter(F.col("dp").isNotNull())
    )
    mkt = d.groupBy("bucket").agg(
        F.sum("dp").cast("decimal(18,6)").alias("dm")
    )
    j = d.join(mkt, "bucket")
    g = j.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_minutes"),
        F.sum("dp").cast("double").alias("sy"),
        F.sum("dm").cast("double").alias("sx"),
        F.sum((F.col("dm") * F.col("dp")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("dm") * F.col("dm")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("dp") * F.col("dp")).cast("decimal(38,12)"))
        .cast("double")
        .alias("syy"),
    )
    n = F.col("n_minutes")
    varx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = n * F.col("syy") - F.col("sy") * F.col("sy")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    beta = cov / varx
    r2 = (cov * cov) / (varx * vary)
    return g.select(
        "symbol",
        "n_minutes",
        F.when(varx > 0, r6(beta)).alias("beta"),
        F.when((varx > 0) & (vary > 0), r6(r2)).alias("r2"),
    )


REALIZED_BETA_ORACLE_BODY = """
,rb_dp AS (
  SELECT symbol, bucket,
         CAST(CAST(close AS DECIMAL(12,6))
              - lag(CAST(close AS DECIMAL(12,6))) OVER w AS DECIMAL(12,6))
             AS dp
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket)
),
rb AS (SELECT * FROM rb_dp WHERE dp IS NOT NULL),
rb_mkt AS (
  SELECT bucket, CAST(sum(dp) AS DECIMAL(18,6)) AS dm
  FROM rb GROUP BY bucket
),
rb_g AS (
  SELECT r.symbol,
         CAST(count(*) AS BIGINT) AS n_minutes,
         CAST(sum(r.dp) AS DOUBLE) AS sy,
         CAST(sum(m.dm) AS DOUBLE) AS sx,
         CAST(sum(CAST(CAST(m.dm AS DECIMAL(19,6)) * CAST(r.dp AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(CAST(m.dm AS DECIMAL(19,6)) * CAST(m.dm AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(CAST(r.dp AS DECIMAL(19,6)) * CAST(r.dp AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS DOUBLE) AS syy
  FROM rb r JOIN rb_mkt m ON r.bucket = m.bucket
  GROUP BY r.symbol
)
SELECT symbol, n_minutes,
       CASE WHEN n_minutes * sxx - sx * sx > 0
            THEN round((n_minutes * sxy - sx * sy)
                       / (n_minutes * sxx - sx * sx), 6)
       END AS beta,
       CASE WHEN n_minutes * sxx - sx * sx > 0
             AND n_minutes * syy - sy * sy > 0
            THEN round(((n_minutes * sxy - sx * sy)
                        * (n_minutes * sxy - sx * sy))
                       / ((n_minutes * sxx - sx * sx)
                          * (n_minutes * syy - sy * sy)), 6)
       END AS r2
FROM rb_g"""


GAP_REPORT_THRESHOLD_MS = 60_000  # "stale feed" gap threshold: 1 minute


def trade_gap_report(
    dedup_trades: DataFrame, threshold_ms: int = GAP_REPORT_THRESHOLD_MS
) -> DataFrame:
    """Batch inter-trade-gap data-quality report per symbol: count, mean,
    p50/p90/max of the inter-arrival gaps, and how many exceeded the
    staleness threshold — the batch audit twin of the STREAMING gap
    detector (`streaming/ops.stream_gap_detect` flags them live; this
    summarizes the whole tape for the data-quality dashboard).

    Determinism: gaps are integer ms; exact `percentile` interpolation
    (the engine's pinned symmetric-lerp convention == DuckDB
    quantile_cont) over integers; the mean is an integer-sum / count
    division of identical operands.

    Plan shape: the gap lag rides ONE partitionBy(symbol) sort; one
    K-row aggregate.  Exact percentiles don't partial-combine — the
    same documented trade as `q_latency_percentiles`, with the
    `percentile_approx` knob as the 100 TB path.

    cf. reference: the reference documents gap detection as a service
    (services/gap_detector/README.md) with wall-clock staleness; this
    is the event-time batch audit over the same semantics."""
    wl = Window.partitionBy("symbol").orderBy("event_ts", "trade_id")
    g = (
        dedup_trades.select(
            "symbol",
            (F.col("event_ts") - F.lag("event_ts").over(wl)).alias("gap_ms"),
        )
        .filter(F.col("gap_ms").isNotNull())
    )
    return g.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_gaps"),
        r6(F.sum("gap_ms").cast("double") / F.count("*")).alias("mean_gap_ms"),
        r6(F.expr("percentile(gap_ms, 0.5)")).alias("p50_gap_ms"),
        r6(F.expr("percentile(gap_ms, 0.9)")).alias("p90_gap_ms"),
        F.max("gap_ms").cast("long").alias("max_gap_ms"),
        F.sum(F.when(F.col("gap_ms") > threshold_ms, 1).otherwise(0))
        .cast("long")
        .alias("n_stale"),
    )


GAP_REPORT_ORACLE_BODY = f"""
,gr AS (
  SELECT symbol,
         event_ts - lag(event_ts) OVER (
             PARTITION BY symbol ORDER BY event_ts, trade_id) AS gap_ms
  FROM dedup_trades
)
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n_gaps,
       round(CAST(sum(gap_ms) AS DOUBLE) / count(*), 6) AS mean_gap_ms,
       round(quantile_cont(gap_ms, 0.5), 6) AS p50_gap_ms,
       round(quantile_cont(gap_ms, 0.9), 6) AS p90_gap_ms,
       CAST(max(gap_ms) AS BIGINT) AS max_gap_ms,
       CAST(sum(CASE WHEN gap_ms > {GAP_REPORT_THRESHOLD_MS}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_stale
FROM gr WHERE gap_ms IS NOT NULL
GROUP BY symbol"""


HURST_QS = (1, 2, 4, 8)  # aggregation horizons for the variance-time fit


def hurst_exponent(bars: DataFrame) -> DataFrame:
    """Variance-time scaling exponent (aggregated-variance Hurst
    estimator): per symbol, the population variance of overlapping q-bar
    Δclose sums for q ∈ {1,2,4,8}, and H = slope/2 of ln Var(q) on
    ln q.  H ≈ 0.5 is a random walk, < 0.5 mean reversion (bounce),
    > 0.5 trending — the multi-horizon closure of
    :func:`variance_ratio`'s single-q test.

    Determinism: every per-q moment is a DECIMAL-exact sum (the
    :func:`variance_ratio` machinery at four horizons in ONE aggregate);
    the ln-ln regression is a CLOSED-FORM fixed-order expression over
    the four variance doubles (x-values are the constants 0, ln2, 2ln2,
    3ln2), so both engines evaluate identical scalar arithmetic.  Any
    non-positive variance or missing horizon emits NULL H with the
    variances still reported.

    Plan shape: the four overlapping q-sum windows ride ONE
    partitionBy(symbol) sort (window state ≤ 8 rows); one
    partial-combinable aggregate to K rows.

    cf. reference: extends the surface (multi-horizon companion of
    q_acf / q_variance_ratio)."""
    wl = Window.partitionBy("symbol").orderBy("bucket")
    cd = F.col("close").cast("decimal(12,6)")
    dp = (cd - F.lag(cd).over(wl)).cast("decimal(12,6)")
    b = bars.select("symbol", "bucket", dp.alias("dp"))
    for q_ in HURST_QS:
        if q_ == 1:
            b = b.withColumn("qs_1", F.col("dp")).withColumn(
                "qn_1", F.when(F.col("dp").isNotNull(), 1).otherwise(0)
            )
        else:
            wq = wl.rowsBetween(-(q_ - 1), 0)
            b = b.withColumn(
                f"qs_{q_}", F.sum("dp").over(wq).cast("decimal(18,6)")
            ).withColumn(f"qn_{q_}", F.count("dp").over(wq))
    aggs = []
    for q_ in HURST_QS:
        ok = F.col(f"qn_{q_}") == q_
        aggs += [
            F.sum(F.when(ok, 1).otherwise(0)).cast("long").alias(f"n_{q_}"),
            F.sum(F.when(ok, F.col(f"qs_{q_}"))).cast("double").alias(f"s_{q_}"),
            F.sum(
                F.when(
                    ok,
                    (F.col(f"qs_{q_}") * F.col(f"qs_{q_}")).cast(
                        "decimal(38,12)"
                    ),
                )
            )
            .cast("double")
            .alias(f"ss_{q_}"),
        ]
    g = b.groupBy("symbol").agg(*aggs)
    var_cols = {}
    for q_ in HURST_QS:
        n = F.col(f"n_{q_}")
        v = (n * F.col(f"ss_{q_}") - F.col(f"s_{q_}") * F.col(f"s_{q_}")) / (
            n * n
        )
        var_cols[q_] = v
    ok_all = None
    for q_ in HURST_QS:
        c = (F.col(f"n_{q_}") > 0) & (var_cols[q_] > 0)
        ok_all = c if ok_all is None else (ok_all & c)
    # closed-form OLS of ln(var_q) on ln(q): x = (0, ln2, 2ln2, 3ln2),
    # x̄ = 1.5·ln2, Σ(x−x̄)² = 5·ln2²; fixed-order numerator
    ln2 = math.log(2.0)
    num = (
        (F.lit(0.0) - F.lit(1.5 * ln2)) * F.log(var_cols[1])
        + (F.lit(ln2) - F.lit(1.5 * ln2)) * F.log(var_cols[2])
        + (F.lit(2 * ln2) - F.lit(1.5 * ln2)) * F.log(var_cols[4])
        + (F.lit(3 * ln2) - F.lit(1.5 * ln2)) * F.log(var_cols[8])
    )
    slope = num / F.lit(5.0 * ln2 * ln2)
    sel = ["symbol"]
    for q_ in HURST_QS:
        sel.append(
            F.when(F.col(f"n_{q_}") > 0, r6(var_cols[q_])).alias(f"var_{q_}")
        )
    sel.append(F.when(ok_all, r6(slope / 2.0)).alias("hurst"))
    return g.select(*sel)


def _hurst_oracle() -> str:
    ln2 = math.log(2.0)
    qcols = []
    for q_ in HURST_QS:
        if q_ == 1:
            qcols.append(
                "dp AS qs_1, CASE WHEN dp IS NOT NULL THEN 1 ELSE 0 END AS qn_1"
            )
        else:
            qcols.append(
                f"CAST(sum(dp) OVER (PARTITION BY symbol ORDER BY bucket "
                f"ROWS BETWEEN {q_ - 1} PRECEDING AND CURRENT ROW) "
                f"AS DECIMAL(18,6)) AS qs_{q_}, "
                f"count(dp) OVER (PARTITION BY symbol ORDER BY bucket "
                f"ROWS BETWEEN {q_ - 1} PRECEDING AND CURRENT ROW) AS qn_{q_}"
            )
    moms = []
    for q_ in HURST_QS:
        moms.append(
            f"CAST(sum(CASE WHEN qn_{q_} = {q_} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_{q_},"
            f" CAST(sum(CASE WHEN qn_{q_} = {q_} THEN qs_{q_} END) AS DOUBLE)"
            f" AS s_{q_},"
            f" CAST(sum(CASE WHEN qn_{q_} = {q_} THEN"
            f" CAST(CAST(qs_{q_} AS DECIMAL(19,6)) * CAST(qs_{q_} AS DECIMAL(19,6)) AS DECIMAL(38,12)) END) AS DOUBLE)"
            f" AS ss_{q_}"
        )
    vexprs = {
        q_: f"(n_{q_} * ss_{q_} - s_{q_} * s_{q_})"
            f" / (CAST(n_{q_} AS DOUBLE) * n_{q_})"
        for q_ in HURST_QS
    }
    ok = " AND ".join(f"n_{q_} > 0 AND {vexprs[q_]} > 0" for q_ in HURST_QS)
    xs = {1: 0.0, 2: ln2, 4: 2 * ln2, 8: 3 * ln2}
    num = " + ".join(
        f"(CAST({xs[q_]!r} AS DOUBLE) - CAST({1.5 * ln2!r} AS DOUBLE))"
        f" * ln({vexprs[q_]})"
        for q_ in HURST_QS
    )
    vsel = ",\n       ".join(
        f"CASE WHEN n_{q_} > 0 THEN round({vexprs[q_]}, 6) END AS var_{q_}"
        for q_ in HURST_QS
    )
    return f"""
,hu_dp AS (
  SELECT symbol, bucket,
         CAST(CAST(close AS DECIMAL(12,6))
              - lag(CAST(close AS DECIMAL(12,6))) OVER w AS DECIMAL(12,6))
             AS dp
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket)
),
hu_q AS (
  SELECT symbol, {', '.join(qcols)}
  FROM hu_dp
),
hu_g AS (
  SELECT symbol, {', '.join(moms)}
  FROM hu_q GROUP BY symbol
)
SELECT symbol,
       {vsel},
       CASE WHEN {ok}
            THEN round(({num}) / CAST({5.0 * ln2 * ln2!r} AS DOUBLE) / 2.0, 6)
       END AS hurst
FROM hu_g"""


HURST_ORACLE_BODY = _hurst_oracle()


FANO_BUCKET_MS = 60_000  # burstiness grain: per-minute trade counts


def fano_factor(dedup_trades: DataFrame, bucket_ms: int = FANO_BUCKET_MS) -> DataFrame:
    """Trade-arrival burstiness per symbol: the Fano factor (variance /
    mean) of per-minute trade counts over the symbol's ACTIVE SPAN
    (first to last traded minute, empty minutes counted as zero —
    dropping them would bias the variance down exactly where gaps make
    arrivals bursty).  F ≈ 1 is Poisson, > 1 clustered/bursty (the
    arrival-process complement of :func:`trade_gap_report`'s gap sizes).

    Determinism: counts are integers; Σn and Σn² are exact integer
    sums; span = max−min+1 bucket indices; mean and variance divide
    identical operands in both engines.  Single-minute spans emit NULL
    (variance of one observation).

    Plan shape: one (symbol, bucket) partial-combinable count, one K-row
    aggregate over the bucket counts — absent minutes need no rows
    (they contribute zero to both sums; only the span matters).

    cf. reference: extends the surface (trades_per_second at batch
    grain, feature_builder.py:151-155, has no dispersion measure)."""
    c = dedup_trades.groupBy(
        "symbol",
        F.expr(f"event_ts div {bucket_ms}").cast("long").alias("bucket"),
    ).agg(F.count("*").cast("long").alias("n"))
    g = c.groupBy("symbol").agg(
        (F.max("bucket") - F.min("bucket") + 1).cast("long").alias("span"),
        F.count("*").cast("long").alias("active_minutes"),
        F.sum("n").cast("long").alias("sn"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("snn"),
    )
    span = F.col("span").cast("double")
    mean = F.col("sn") / span
    var = F.col("snn") / span - mean * mean
    return g.select(
        "symbol",
        "span",
        "active_minutes",
        "sn",
        r6(mean).alias("mean_per_min"),
        F.when(F.col("span") > 1, r6(var)).alias("var_per_min"),
        F.when((F.col("span") > 1) & (mean > 0), r6(var / mean)).alias(
            "fano_factor"
        ),
    )


FANO_ORACLE_BODY = f"""
,ff_c AS (
  SELECT symbol, event_ts // {FANO_BUCKET_MS} AS bucket,
         CAST(count(*) AS BIGINT) AS n
  FROM dedup_trades GROUP BY 1, 2
),
ff_g AS (
  SELECT symbol,
         CAST(max(bucket) - min(bucket) + 1 AS BIGINT) AS span,
         CAST(count(*) AS BIGINT) AS active_minutes,
         CAST(sum(n) AS BIGINT) AS sn,
         CAST(sum(n * n) AS BIGINT) AS snn
  FROM ff_c GROUP BY symbol
)
SELECT symbol, span, active_minutes, sn,
       round(sn / CAST(span AS DOUBLE), 6) AS mean_per_min,
       CASE WHEN span > 1
            THEN round(snn / CAST(span AS DOUBLE)
                       - (sn / CAST(span AS DOUBLE))
                         * (sn / CAST(span AS DOUBLE)), 6)
       END AS var_per_min,
       CASE WHEN span > 1 AND sn / CAST(span AS DOUBLE) > 0
            THEN round((snn / CAST(span AS DOUBLE)
                        - (sn / CAST(span AS DOUBLE))
                          * (sn / CAST(span AS DOUBLE)))
                       / (sn / CAST(span AS DOUBLE)), 6)
       END AS fano_factor
FROM ff_g"""


def gini_concentration(dedup_trades: DataFrame) -> DataFrame:
    """Trade-size concentration per symbol: the Gini coefficient of trade
    quantities via the rank form G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n with
    sizes sorted ascending.  G ≈ 0 is uniform participation, → 1 means a
    few block trades carry the volume — the inequality complement of
    :func:`fano_factor`'s temporal burstiness.

    Determinism: x rides the engine-wide qty grid (DECIMAL(20,4), the
    VPIN convention); ranks are tie-broken by trade_id so i is unique,
    and the Gini sum is tie-order-invariant anyway (equal x share one
    coefficient sum).  Σx and Σi·x are exact DECIMAL(38,4) sums; the
    closing expression divides identical doubles in both engines.

    Plan shape: ONE partitionBy(symbol) sort carries the ranks; the
    K-row moment aggregate reuses its hash partitioning (no extra
    exchange).  Zero-volume symbols (impossible post-validation, where
    qty > 0) would emit NULL, not 0/0.

    cf. reference: extends the surface (feature_builder.py's per-batch
    aggregates have no inequality measure)."""
    qd = F.col("qty").cast("decimal(20,4)")
    r = dedup_trades.select("symbol", "trade_id", qd.alias("qd"))
    i = (
        F.row_number()
        .over(Window.partitionBy("symbol").orderBy("qd", "trade_id"))
        .cast("long")
    )
    g = r.select("symbol", "qd", i.alias("i")).groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_trades"),
        F.sum("qd").cast("decimal(38,4)").cast("double").alias("sx"),
        F.sum((F.col("i") * F.col("qd")).cast("decimal(38,4)"))
        .cast("double")
        .alias("six"),
    )
    n = F.col("n_trades")
    sx = F.col("sx")
    gini = (F.lit(2.0) * F.col("six")) / (n * sx) - (n + F.lit(1.0)) / n
    return g.select(
        "symbol",
        "n_trades",
        r6(sx).alias("total_qty"),
        F.when(sx > 0, r6(gini)).alias("gini"),
    )


GINI_ORACLE_BODY = """
,gi_r AS (
  SELECT symbol,
         CAST(qty AS DECIMAL(20,4)) AS qd,
         CAST(row_number() OVER (PARTITION BY symbol
              ORDER BY CAST(qty AS DECIMAL(20,4)), trade_id) AS BIGINT) AS i
  FROM dedup_trades
),
gi_g AS (
  SELECT symbol,
         CAST(count(*) AS BIGINT) AS n,
         CAST(CAST(sum(qd) AS DECIMAL(38,4)) AS DOUBLE) AS sx,
         CAST(CAST(sum(CAST(i * qd AS DECIMAL(38,4))) AS DECIMAL(38,4))
              AS DOUBLE) AS six
  FROM gi_r GROUP BY symbol
)
SELECT symbol, n AS n_trades,
       round(sx, 6) AS total_qty,
       CASE WHEN sx > 0
            THEN round((2.0 * six) / (n * sx) - (n + 1.0) / n, 6)
       END AS gini
FROM gi_g"""


SPEARMAN_DAY_BARS = 1440  # minutes per day on the bar clock


def spearman_vol_volatility(bars: DataFrame) -> DataFrame:
    """Per-symbol Spearman rank correlation between daily volume and
    daily absolute price movement — the monotone (outlier-robust) form
    of the volume-volatility relation, where :func:`pair_correlation`'s
    Pearson form is level-sensitive.

    Determinism: daily sums are exact DECIMAL(18,6) (bar columns sit on
    the engine-wide 1e-6 grid); ranks are row_number with the day as
    tie-break, so both engines assign identical integer ranks, Σd² is an
    exact BIGINT, and ρ = 1 − 6·Σd²/(n(n²−1)) divides identical
    operands.  Single-day symbols emit NULL ρ (n(n²−1) = 0).

    Plan shape: bars → one (symbol, day) partial-combinable aggregate →
    both rank windows share ONE partitionBy(symbol) exchange (two sorts,
    one shuffle) → K-row moment aggregate.

    cf. reference: extends the surface (rank-statistics companion of
    q_pair_correlation)."""
    d = (
        bars.groupBy(
            "symbol",
            F.expr(f"bucket div {SPEARMAN_DAY_BARS}").cast("long").alias("day"),
        )
        .agg(
            F.sum(F.col("volume").cast("decimal(18,6)")).alias("dvol"),
            F.sum(F.abs(F.col("price_change")).cast("decimal(18,6)")).alias(
                "dvola"
            ),
        )
    )
    wsym = Window.partitionBy("symbol")
    rx = F.row_number().over(wsym.orderBy("dvol", "day")).cast("long")
    ry = F.row_number().over(wsym.orderBy("dvola", "day")).cast("long")
    ranked = d.select(
        "symbol", rx.alias("rx"), ry.alias("ry")
    ).withColumn("dd", F.col("rx") - F.col("ry"))
    g = ranked.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum(F.col("dd") * F.col("dd")).cast("long").alias("sum_d2"),
    )
    n = F.col("n_days")
    rho = F.lit(1.0) - (F.lit(6.0) * F.col("sum_d2")) / (n * (n * n - F.lit(1)))
    return g.select(
        "symbol",
        "n_days",
        "sum_d2",
        F.when(n > 1, r6(rho)).alias("spearman_rho"),
    )


SPEARMAN_ORACLE_BODY = f"""
,sp_d AS (
  SELECT symbol, bucket // {SPEARMAN_DAY_BARS} AS day,
         sum(CAST(volume AS DECIMAL(18,6))) AS dvol,
         sum(CAST(abs(price_change) AS DECIMAL(18,6))) AS dvola
  FROM bars GROUP BY 1, 2
),
sp_r AS (
  SELECT symbol,
         CAST(row_number() OVER (PARTITION BY symbol ORDER BY dvol, day)
              AS BIGINT) AS rx,
         CAST(row_number() OVER (PARTITION BY symbol ORDER BY dvola, day)
              AS BIGINT) AS ry
  FROM sp_d
),
sp_g AS (
  SELECT symbol,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2
  FROM sp_r GROUP BY symbol
)
SELECT symbol, n AS n_days, sum_d2,
       CASE WHEN n > 1
            THEN round(1.0 - (6.0 * sum_d2) / (n * (n * n - 1)), 6)
       END AS spearman_rho
FROM sp_g"""


def ks_split_drift(dedup_trades: DataFrame) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift test per symbol: split each
    symbol's trades at the temporal midpoint of its span and compare the
    trade-size distributions of the two halves — D = max|F_early(x) −
    F_late(x)| over the merged support, plus the √(n_a·n_b/(n_a+n_b))·D
    normalization the KS tables are entered with.  The distributional
    complement of :func:`windows.feature_drift`'s binned PSI: no binning
    choice, sensitive to the whole CDF.

    Determinism: the ECDF gap is evaluated at DISTINCT size values with
    integer cumulative counts, and the max runs over the exact integers
    |cumA·n_b − cumB·n_a| (DECIMAL(38,0) — long·long would overflow at
    cluster-scale per-symbol counts); only the final division and sqrt
    touch doubles, on identical operands in both engines.  A symbol
    whose trades all land in one half (e.g. a single-tick span) emits
    NULL.

    Plan shape: per-symbol span bounds (K rows, broadcast back) → one
    (symbol, size) partial-combinable count aggregate (bounded by the
    qty grid, not the trade count) → the cumulative window and the
    K-row max ride ONE partitionBy(symbol) exchange.

    cf. reference: extends the surface (drift governance the reference's
    monitoring lacks)."""
    t = dedup_trades.select(
        "symbol", "event_ts", F.col("qty").cast("decimal(20,4)").alias("qd")
    )
    span = t.groupBy("symbol").agg(
        F.min("event_ts").alias("lo"), F.max("event_ts").alias("hi")
    )
    mid = F.expr("(lo + hi) div 2")
    t2 = t.join(F.broadcast(span), "symbol").withColumn(
        "late", F.col("event_ts") > mid
    )
    c = t2.groupBy("symbol", "qd").agg(
        F.sum(F.when(~F.col("late"), 1).otherwise(0)).cast("long").alias("ca"),
        F.sum(F.when(F.col("late"), 1).otherwise(0)).cast("long").alias("cb"),
    )
    wsym = Window.partitionBy("symbol")
    wcum = wsym.orderBy("qd").rowsBetween(Window.unboundedPreceding, 0)
    cum = c.select(
        "symbol",
        F.sum("ca").over(wcum).cast("long").alias("cuma"),
        F.sum("cb").over(wcum).cast("long").alias("cumb"),
        F.sum("ca").over(wsym).cast("long").alias("na"),
        F.sum("cb").over(wsym).cast("long").alias("nb"),
    )
    diff = F.abs(
        F.col("cuma").cast("decimal(38,0)") * F.col("nb")
        - F.col("cumb").cast("decimal(38,0)") * F.col("na")
    )
    g = cum.groupBy("symbol").agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.max(diff).cast("decimal(38,0)").alias("dmax"),
    )
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ks = F.col("dmax").cast("double") / (na * nb)
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return g.select(
        "symbol",
        "n_a",
        "n_b",
        F.when(ok, r6(ks)).alias("ks_stat"),
        F.when(ok, r6(F.sqrt((na * nb) / (na + nb)) * ks)).alias("ks_scaled"),
    )


KS_ORACLE_BODY = """
,ks_t AS (
  SELECT symbol, event_ts, CAST(qty AS DECIMAL(20,4)) AS qd
  FROM dedup_trades
),
ks_span AS (
  SELECT symbol, min(event_ts) AS lo, max(event_ts) AS hi
  FROM ks_t GROUP BY symbol
),
ks_c AS (
  SELECT t.symbol, t.qd,
         CAST(sum(CASE WHEN t.event_ts > (s.lo + s.hi) // 2
                       THEN 0 ELSE 1 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN t.event_ts > (s.lo + s.hi) // 2
                       THEN 1 ELSE 0 END) AS BIGINT) AS cb
  FROM ks_t t JOIN ks_span s ON t.symbol = s.symbol
  GROUP BY 1, 2
),
ks_cum AS (
  SELECT symbol,
         CAST(sum(ca) OVER (PARTITION BY symbol ORDER BY qd
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cuma,
         CAST(sum(cb) OVER (PARTITION BY symbol ORDER BY qd
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumb,
         CAST(sum(ca) OVER (PARTITION BY symbol) AS BIGINT) AS na,
         CAST(sum(cb) OVER (PARTITION BY symbol) AS BIGINT) AS nb
  FROM ks_c
),
ks_g AS (
  SELECT symbol, max(na) AS n_a, max(nb) AS n_b,
         CAST(max(abs(CAST(cuma AS DECIMAL(38,0)) * nb
                      - CAST(cumb AS DECIMAL(38,0)) * na))
              AS DECIMAL(38,0)) AS dmax
  FROM ks_cum GROUP BY symbol
)
SELECT symbol, n_a, n_b,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN round(CAST(dmax AS DOUBLE)
                       / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)
       END AS ks_stat,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN round(sqrt((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                            / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                       * (CAST(dmax AS DOUBLE)
                          / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 6)
       END AS ks_scaled
FROM ks_g"""


VP_BINS = 20  # price bins per symbol for the volume profile


def volume_profile(dedup_trades: DataFrame, n_bins: int = VP_BINS) -> DataFrame:
    """Per-symbol volume-at-price profile: traded volume binned into
    ``n_bins`` equal price slices of the symbol's [min, max] range, with
    each bin's share of total volume and a point-of-control flag on the
    highest-volume bin(s) — the volume-profile / POC structure a
    liquidity-aware execution scheduler keys on.

    Determinism: the bin index is floor((price−lo)/(hi−lo)·n_bins)
    clamped to n_bins−1 — identical IEEE double arithmetic in both
    engines on identical operands (lo/hi are exact column minima);
    volumes are exact DECIMAL(38,4) sums on the engine-wide qty grid, so
    the share division and the POC max-compare see identical values.  A
    flat tape (hi == lo) collapses to bin 0.

    Plan shape: K-row span bounds broadcast back onto the scan → one
    (symbol, bin) partial-combinable aggregate (≤ K·n_bins rows) → the
    share/POC window runs over those K·n_bins rows only.

    cf. reference: extends the surface (depth_features
    feature_builder.py:158-214 profiles the BOOK; this profiles traded
    volume)."""
    span = dedup_trades.groupBy("symbol").agg(
        F.min("price").alias("lo"), F.max("price").alias("hi")
    )
    rel = (F.col("price") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    bin_ = F.when(
        F.col("hi") > F.col("lo"),
        F.least(
            F.floor(rel * F.lit(float(n_bins))), F.lit(n_bins - 1)
        ),
    ).otherwise(F.lit(0)).cast("long")
    b = (
        dedup_trades.join(F.broadcast(span), "symbol")
        .select(
            "symbol",
            bin_.alias("bin"),
            F.col("qty").cast("decimal(20,4)").alias("qd"),
        )
        .groupBy("symbol", "bin")
        .agg(
            F.sum("qd").cast("decimal(38,4)").alias("vol"),
            F.count("*").cast("long").alias("n_trades"),
        )
    )
    wsym = Window.partitionBy("symbol")
    out = b.select(
        "symbol",
        "bin",
        "n_trades",
        F.col("vol"),
        F.sum("vol").over(wsym).alias("tot"),
        F.max("vol").over(wsym).alias("vmax"),
    )
    return out.select(
        "symbol",
        "bin",
        "n_trades",
        r6(F.col("vol").cast("double")).alias("bin_volume"),
        r6(F.col("vol").cast("double") / F.col("tot").cast("double")).alias(
            "volume_share"
        ),
        (F.col("vol") == F.col("vmax")).alias("is_poc"),
    )


VOLUME_PROFILE_ORACLE_BODY = f"""
,vp_span AS (
  SELECT symbol, min(price) AS lo, max(price) AS hi
  FROM dedup_trades GROUP BY symbol
),
vp_b AS (
  SELECT t.symbol,
         CAST(CASE WHEN s.hi > s.lo
                   THEN least(floor((t.price - s.lo) / (s.hi - s.lo)
                                    * {float(VP_BINS)!r}), {VP_BINS - 1})
                   ELSE 0 END AS BIGINT) AS bin,
         CAST(sum(CAST(t.qty AS DECIMAL(20,4))) AS DECIMAL(38,4)) AS vol,
         CAST(count(*) AS BIGINT) AS n_trades
  FROM dedup_trades t JOIN vp_span s ON t.symbol = s.symbol
  GROUP BY 1, 2
),
vp_w AS (
  SELECT symbol, bin, n_trades, vol,
         sum(vol) OVER (PARTITION BY symbol) AS tot,
         max(vol) OVER (PARTITION BY symbol) AS vmax
  FROM vp_b
)
SELECT symbol, bin, n_trades,
       round(CAST(vol AS DOUBLE), 6) AS bin_volume,
       round(CAST(vol AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS volume_share,
       vol = vmax AS is_poc
FROM vp_w"""


def runs_test(bars: DataFrame) -> DataFrame:
    """Wald–Wolfowitz runs test on bar-return signs per symbol: count
    positive/negative ``price_change`` bars and the number of sign RUNS,
    then the z-statistic against the random-ordering null — too few runs
    means trending (positive serial dependence), too many means
    mean-reversion.  The non-parametric companion of :func:`acf`'s
    lag-1 autocorrelation: it sees only signs, so a single outlier bar
    cannot move it.

    Conventions (shared with the oracle): zero-change bars are DISCARDED
    (the standard treatment — a zero has no sign); a run boundary is any
    bar whose sign differs from the previous nonzero bar's sign, so
    R = 1 + Σ[sign_t ≠ sign_{t−1}].

    Determinism: ``price_change`` is the engine-shared 6-dp-rounded bar
    column, so the sign partition is identical; n₊, n₋, R are exact
    integers; μ = 2n₊n₋/n + 1 and σ² = 2n₊n₋(2n₊n₋−n)/(n²(n−1)) are
    evaluated over DECIMAL(38,0) products (2n₊n₋·(2n₊n₋−n) overflows
    BIGINT once a symbol holds ≳2³² bars — the ks_drift precision
    discipline), cast to double only for the final z division.  Symbols
    with n₊ = 0 or n₋ = 0 (σ² = 0) emit NULL z.

    Plan shape: bars → sign filter → lag on ONE partitionBy(symbol)
    sort → the K-row count aggregate rides the window's hash
    partitioning (no extra exchange).

    cf. reference: extends the surface (randomness-audit companion of
    q_acf / q_variance_ratio)."""
    s = bars.filter(F.col("price_change") != 0).select(
        "symbol",
        "bucket",
        F.when(F.col("price_change") > 0, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("sign"),
    )
    w = Window.partitionBy("symbol").orderBy("bucket")
    flagged = s.select(
        "symbol",
        "sign",
        F.when(
            F.lag("sign").over(w).isNull()
            | (F.col("sign") != F.lag("sign").over(w)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("new_run"),
    )
    g = flagged.groupBy("symbol").agg(
        F.sum(F.when(F.col("sign") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_pos"),
        F.sum(F.when(F.col("sign") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_neg"),
        F.sum("new_run").cast("long").alias("n_runs"),
    )
    n1 = F.col("n_pos").cast("decimal(38,0)")
    n2 = F.col("n_neg").cast("decimal(38,0)")
    n = n1 + n2
    two_nn = F.lit(2) * n1 * n2
    mu = (two_nn.cast("double") / n.cast("double")) + F.lit(1.0)
    var = (two_nn * (two_nn - n)).cast("double") / (
        (n * n * (n - F.lit(1))).cast("double")
    )
    z = (F.col("n_runs").cast("double") - mu) / F.sqrt(var)
    # σ² > 0 ⟺ 2n₊n₋ > n (given n₊,n₋ > 0); the n₊ = n₋ = 1 tape has
    # exactly one possible run count, σ = 0, and z undefined — the
    # `when` is lazy per branch, so the z division never evaluates there
    # (ANSI mode would raise DIVIDE_BY_ZERO otherwise)
    return g.select(
        "symbol",
        "n_pos",
        "n_neg",
        "n_runs",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0) & (two_nn > n),
            r6(z),
        ).alias("z_runs"),
    )


RUNS_TEST_ORACLE_BODY = """
,rt_s AS (
  SELECT symbol, bucket,
         CASE WHEN price_change > 0 THEN 1 ELSE -1 END AS sign
  FROM bars WHERE price_change <> 0
),
rt_f AS (
  SELECT symbol, sign,
         CASE WHEN lag(sign) OVER (PARTITION BY symbol ORDER BY bucket)
                   IS DISTINCT FROM sign THEN 1 ELSE 0 END AS new_run
  FROM rt_s
),
rt_g AS (
  SELECT symbol,
         CAST(sum(CASE WHEN sign = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(sum(CASE WHEN sign = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
         CAST(sum(new_run) AS BIGINT) AS n_runs
  FROM rt_f GROUP BY symbol
),
rt_m AS (
  SELECT symbol, n_pos, n_neg, n_runs,
         CAST(n_pos AS DECIMAL(38,0)) + CAST(n_neg AS DECIMAL(38,0)) AS n,
         2 * CAST(n_pos AS DECIMAL(38,0)) * CAST(n_neg AS DECIMAL(38,0))
             AS two_nn
  FROM rt_g
)
SELECT symbol, n_pos, n_neg, n_runs,
       CASE WHEN n_pos > 0 AND n_neg > 0 AND two_nn > n
            THEN round((CAST(n_runs AS DOUBLE)
                        - (CAST(two_nn AS DOUBLE) / CAST(n AS DOUBLE) + 1.0))
                       / sqrt(CAST(two_nn * (two_nn - n) AS DOUBLE)
                              / CAST(n * n * (n - 1) AS DOUBLE)), 6)
       END AS z_runs
FROM rt_m"""


CUSUM_H_SIGMA = 5.0  # breach threshold in per-symbol return sigmas


def cusum_levels(bars: DataFrame, h_sigma: float = CUSUM_H_SIGMA) -> DataFrame:
    """Per-symbol CUSUM level-shift audit over bar returns: the classic
    one-sided statistics S⁺_t = max(0, S⁺_{t−1} + x_t) and
    S⁻_t = max(0, S⁻_{t−1} − x_t) with breach threshold h = ``h_sigma``
    per-symbol return sigmas — the sequential drift detector a
    data-quality monitor runs next to :func:`windows.feature_drift`'s
    batch PSI.

    The recursion is NOT computed recursively: with prefix sums
    P_t = Σx, the reset-at-zero forms collapse to
    S⁺_t = P_t − min_{i≤t} P_i and S⁻_t = max_{i≤t} P_i − P_t, so both
    statistics ride cumulative windows on ONE symbol sort — the
    closed-form that keeps a 100 TB tape out of any per-row Python
    loop.  (Zero drift allowance k = 0: this is the pure level-shift
    form; an allowance subtracts a constant per step, which the prefix
    form absorbs as P_t − k·t, at the cost of leaving the DECIMAL
    grid — documented trade, not taken.)

    Determinism: x = ``price_change`` sits on the shared 1e-6 bar grid,
    so P, the running extrema, and both S statistics are exact
    DECIMAL(38,6) in both engines; σ comes from decimal-exact Σx / Σx²
    (the Kyle-lambda moment discipline, Σx² on the 1e-12 grid) via one
    double expression over identical operands, and every breach compare
    is exact-decimal-vs-identical-double.  n = 1 gives σ = 0 ⇒ h = 0 ⇒
    the strict > never fires on the all-zero statistics.

    Plan shape: bars → ONE partitionBy(symbol) sort carries the prefix
    sum, both running extrema, AND the full-partition moment windows →
    the K-row summary aggregate rides the same hash partitioning.

    cf. reference: extends the surface (sequential-monitoring companion
    of q_feature_drift / q_ks_drift)."""
    xd = F.col("price_change").cast("decimal(18,6)")
    b = bars.select("symbol", "bucket", xd.alias("x"))
    wo = Window.partitionBy("symbol").orderBy("bucket")
    wcum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("symbol")
    p = F.sum("x").over(wcum).cast("decimal(38,6)")
    c = b.select(
        "symbol",
        "bucket",
        "x",
        p.alias("p"),
        F.count("*").over(wall).cast("long").alias("n_bars"),
        F.sum("x").over(wall).cast("decimal(38,6)").alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)"))
        .over(wall)
        .cast("decimal(38,12)")
        .alias("sxx"),
    )
    c = c.select(
        "symbol",
        "bucket",
        "n_bars",
        "sx",
        "sxx",
        (F.col("p") - F.min("p").over(wcum)).alias("s_up"),
        (F.max("p").over(wcum) - F.col("p")).alias("s_dn"),
    )
    nd = F.col("n_bars").cast("double")
    var = (
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    ) / (nd * nd)
    h = F.lit(float(h_sigma)) * F.sqrt(F.greatest(var, F.lit(0.0)))
    flagged = c.select(
        "symbol",
        "bucket",
        "n_bars",
        "s_up",
        "s_dn",
        h.alias("h"),
    )
    g = flagged.groupBy("symbol").agg(
        F.max("n_bars").alias("n_bars"),
        F.max("h").alias("h"),
        F.max("s_up").alias("max_s_up"),
        F.max("s_dn").alias("max_s_dn"),
        F.sum(
            F.when(F.col("s_up").cast("double") > F.col("h"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_breach_up"),
        F.sum(
            F.when(F.col("s_dn").cast("double") > F.col("h"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_breach_dn"),
        F.min(
            F.when(F.col("s_up").cast("double") > F.col("h"), F.col("bucket"))
        )
        .cast("long")
        .alias("first_breach_up"),
        F.min(
            F.when(F.col("s_dn").cast("double") > F.col("h"), F.col("bucket"))
        )
        .cast("long")
        .alias("first_breach_dn"),
    )
    return g.select(
        "symbol",
        "n_bars",
        r6(F.col("h")).alias("h_threshold"),
        r6(F.col("max_s_up").cast("double")).alias("max_s_up"),
        r6(F.col("max_s_dn").cast("double")).alias("max_s_dn"),
        "n_breach_up",
        "n_breach_dn",
        "first_breach_up",
        "first_breach_dn",
    )


CUSUM_ORACLE_BODY = f"""
,cu_b AS (
  SELECT symbol, bucket, CAST(price_change AS DECIMAL(18,6)) AS x
  FROM bars
),
cu_c AS (
  SELECT symbol, bucket, x,
         CAST(sum(x) OVER w AS DECIMAL(38,6)) AS p,
         CAST(count(*) OVER ws AS BIGINT) AS n_bars,
         CAST(sum(x) OVER ws AS DECIMAL(38,6)) AS sx,
         CAST(sum(CAST(CAST(x AS DECIMAL(19,6)) * CAST(x AS DECIMAL(19,6)) AS DECIMAL(38,12))) OVER ws AS DECIMAL(38,12))
             AS sxx
  FROM cu_b
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         ws AS (PARTITION BY symbol)
),
cu_s AS (
  SELECT symbol, bucket, n_bars, sx, sxx,
         p - min(p) OVER w AS s_up,
         max(p) OVER w - p AS s_dn
  FROM cu_c
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cu_h AS (
  SELECT symbol, bucket, n_bars, s_up, s_dn,
         {CUSUM_H_SIGMA!r} * sqrt(greatest(
             (CAST(n_bars AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             / (CAST(n_bars AS DOUBLE) * CAST(n_bars AS DOUBLE)), 0.0)) AS h
  FROM cu_s
)
SELECT symbol,
       max(n_bars) AS n_bars,
       round(max(h), 6) AS h_threshold,
       round(CAST(max(s_up) AS DOUBLE), 6) AS max_s_up,
       round(CAST(max(s_dn) AS DOUBLE), 6) AS max_s_dn,
       CAST(sum(CASE WHEN CAST(s_up AS DOUBLE) > h THEN 1 ELSE 0 END)
            AS BIGINT) AS n_breach_up,
       CAST(sum(CASE WHEN CAST(s_dn AS DOUBLE) > h THEN 1 ELSE 0 END)
            AS BIGINT) AS n_breach_dn,
       CAST(min(CASE WHEN CAST(s_up AS DOUBLE) > h THEN bucket END)
            AS BIGINT) AS first_breach_up,
       CAST(min(CASE WHEN CAST(s_dn AS DOUBLE) > h THEN bucket END)
            AS BIGINT) AS first_breach_dn
FROM cu_h
GROUP BY symbol"""


def hhi_concentration(dedup_trades: DataFrame) -> DataFrame:
    """Hourly volume-concentration per (symbol, day): the
    Herfindahl–Hirschman index of the day's volume across its active
    hours, HHI = Σ(vol_h)²/(Σvol_h)², plus the size-adjusted
    HHI* = (HHI − 1/n)/(1 − 1/n) — 1/n for a perfectly even day, 1.0
    when one hour carries everything.  The concentration complement of
    :func:`q_intraday_profile`'s average shape: the profile says WHEN
    volume trades, HHI says how LUMPY each individual day was.

    Determinism: hourly volumes are exact DECIMAL(18,4) sums on the
    engine-wide qty grid; their squares sit exactly on the 1e-8 grid
    (DECIMAL(38,8) sums, ≤ 24 terms); the closing ratio divides doubles
    cast from identical exact decimals — squaring the day total in
    DOUBLE (not DECIMAL) sidesteps the precision-38 overflow a
    decimal(38,4)² would hit, and stays engine-identical because both
    operands are exact.  Single-hour days emit NULL HHI* (0/0).

    Plan shape: dedup → one (symbol, day, hour) partial-combinable
    aggregate → one (symbol, day) aggregate over ≤ 24·K·days rows.
    Calendar-bounded output; no windows, no joins.

    cf. reference: extends the surface (concentration companion of the
    VWAP-scheduler intraday profile)."""
    h = (
        dedup_trades.select(
            "symbol",
            F.expr("event_ts div 86400000").cast("long").alias("day"),
            F.expr("event_ts div 3600000").cast("long").alias("hour"),
            F.col("qty").cast("decimal(18,4)").alias("qd"),
        )
        .groupBy("symbol", "day", "hour")
        .agg(F.sum("qd").cast("decimal(18,4)").alias("vol"))
    )
    g = h.groupBy("symbol", "day").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum("vol").cast("decimal(38,4)").alias("tot"),
        F.sum((F.col("vol") * F.col("vol")).cast("decimal(38,8)"))
        .cast("decimal(38,8)")
        .alias("ssq"),
    )
    totd = F.col("tot").cast("double")
    hhi = F.col("ssq").cast("double") / (totd * totd)
    n = F.col("n_hours").cast("double")
    return g.select(
        "symbol",
        "day",
        "n_hours",
        r6(totd).alias("total_qty"),
        r6(hhi).alias("hhi"),
        F.when(
            F.col("n_hours") > 1,
            r6((hhi - F.lit(1.0) / n) / (F.lit(1.0) - F.lit(1.0) / n)),
        ).alias("hhi_norm"),
    )


HHI_ORACLE_BODY = """
,hh_h AS (
  SELECT symbol,
         event_ts // 86400000 AS day,
         event_ts // 3600000 AS hour,
         CAST(sum(CAST(qty AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS vol
  FROM dedup_trades
  GROUP BY 1, 2, 3
),
hh_g AS (
  SELECT symbol, day,
         CAST(count(*) AS BIGINT) AS n_hours,
         CAST(sum(vol) AS DECIMAL(38,4)) AS tot,
         CAST(sum(CAST(vol * vol AS DECIMAL(38,8))) AS DECIMAL(38,8)) AS ssq
  FROM hh_h GROUP BY 1, 2
)
SELECT symbol, day, n_hours,
       round(CAST(tot AS DOUBLE), 6) AS total_qty,
       round(CAST(ssq AS DOUBLE)
             / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS hhi,
       CASE WHEN n_hours > 1
            THEN round((CAST(ssq AS DOUBLE)
                        / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))
                        - 1.0 / n_hours)
                       / (1.0 - 1.0 / n_hours), 6)
       END AS hhi_norm
FROM hh_g"""


HILL_K = 20  # tail order statistics per symbol for the Hill estimator


def hill_tail(bars: DataFrame, k: int = HILL_K) -> DataFrame:
    """Hill estimator of the power-law tail index per symbol over
    absolute bar returns: α̂ = k_eff / Σ_{i≤k_eff} ln(x_(i)/x_(k_eff+1))
    with x_(1) ≥ x_(2) ≥ … the descending order statistics of
    |price_change| and k_eff = min(k, n−1) — the heavy-tail exponent a
    risk model fits before trusting any variance-based statistic (α < 2
    means the variance the other estimators report doesn't converge).
    The tail-shape complement of :func:`higher_moments`' kurtosis.

    Determinism: |price_change| is the shared 6-dp bar column, so both
    engines see identical doubles; the order statistics are tie-broken
    by bucket (row_number), the threshold x_(k_eff+1) is ONE array
    element, and the k_eff ln-ratio terms fold in FIXED rank order over
    one sorted array (`aggregate` / `list_reduce`, the zipf_fit
    discipline) — identical doubles summed in identical order.  Symbols
    with k_eff < 2 or a zero ln-sum (all tail values equal) emit NULL α.

    Plan shape: sign filter → rank ≤ k+1 under WindowGroupLimit on ONE
    partitionBy(symbol) sort (the per-partition limit keeps the
    exchange's payload at k+1 rows per symbol-partition, not the tape)
    → a K-row array fold.

    cf. reference: extends the surface (tail-risk companion of
    q_higher_moments / q_drawdown)."""
    x = F.abs(F.col("price_change"))
    nz = bars.filter(x > 0).select("symbol", "bucket", x.alias("x"))
    rn = (
        F.row_number()
        .over(Window.partitionBy("symbol").orderBy(F.desc("x"), "bucket"))
        .cast("long")
    )
    top = nz.select("symbol", "x", rn.alias("rn")).filter(
        F.col("rn") <= k + 1
    )
    arr = top.groupBy("symbol").agg(
        F.sort_array(F.collect_list(F.struct("rn", "x"))).alias("rx"),
        F.count("*").cast("long").alias("n_top"),
    )
    thr = F.expr("element_at(rx, cast(n_top as int)).x")
    lsum = F.expr(
        "aggregate(slice(rx, 1, cast(n_top as int) - 1),"
        " cast(0.0 as double),"
        " (a, s) -> a + ln(s.x / element_at(rx, cast(n_top as int)).x))"
    )
    c = arr.select(
        "symbol",
        (F.col("n_top") - 1).cast("long").alias("n_tail"),
        thr.alias("thr"),
        lsum.alias("lsum"),
    )
    alpha = F.col("n_tail").cast("double") / F.col("lsum")
    return c.select(
        "symbol",
        "n_tail",
        r6(F.col("thr")).alias("x_threshold"),
        F.when(
            (F.col("n_tail") >= 2) & (F.col("lsum") > 0), r6(alpha)
        ).alias("hill_alpha"),
        F.when(
            (F.col("n_tail") >= 2) & (F.col("lsum") > 0),
            r6(F.col("lsum") / F.col("n_tail").cast("double")),
        ).alias("mean_ln_excess"),
    )


HILL_ORACLE_BODY = f"""
,hl_nz AS (
  SELECT symbol, bucket, abs(price_change) AS x
  FROM bars WHERE price_change <> 0
),
hl_r AS (
  SELECT symbol, x,
         CAST(row_number() OVER (PARTITION BY symbol
              ORDER BY x DESC, bucket) AS BIGINT) AS rn
  FROM hl_nz
),
hl_a AS (
  SELECT symbol,
         list(x ORDER BY rn) AS xs,
         CAST(count(*) AS BIGINT) AS n_top
  FROM hl_r WHERE rn <= {HILL_K + 1}
  GROUP BY symbol
),
hl_s AS (
  SELECT symbol, n_top - 1 AS n_tail,
         xs[CAST(n_top AS INT)] AS thr,
         CASE WHEN n_top >= 2
              THEN list_reduce(
                     list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(xs[1:CAST(n_top AS INT) - 1],
                                      v -> ln(v / xs[CAST(n_top AS INT)]))),
                     (a, b) -> a + b)
              ELSE 0.0 END AS lsum
  FROM hl_a
)
SELECT symbol, n_tail,
       round(thr, 6) AS x_threshold,
       CASE WHEN n_tail >= 2 AND lsum > 0
            THEN round(CAST(n_tail AS DOUBLE) / lsum, 6) END AS hill_alpha,
       CASE WHEN n_tail >= 2 AND lsum > 0
            THEN round(lsum / CAST(n_tail AS DOUBLE), 6) END
           AS mean_ln_excess
FROM hl_s"""


VAR_ALPHA = 0.05  # left-tail level for historical VaR / expected shortfall


def var_es(
    bars: DataFrame,
    alpha: float = VAR_ALPHA,
    approx: bool = False,
    accuracy: int = PCTL_ACCURACY,
) -> DataFrame:
    """Historical Value-at-Risk and Expected Shortfall per symbol over
    bar returns (``price_change_pct``): VaR_α is the empirical α-quantile
    of the return distribution, ES_α the mean of the returns at or below
    it — the coherent tail-risk pair a risk desk quotes, and the
    downstream consumer of :func:`hill_tail`'s "does the tail even have
    a mean" diagnostic.

    Determinism: returns are the shared 6-dp bar column; VaR comes from
    Spark's exact ``percentile``, whose equal-bracketing-values shortcut
    the DuckDB twin replicates bit-for-bit via
    ``oracle_defs.spark_percentile_sql`` (plain quantile_cont lerps
    x·(1−d) + x·d one ulp off x on ties, flipping the tail compare —
    found by hypothesis, round 8); the tail membership compare
    (ret ≤ VaR) then runs on identical doubles, and the tail mean is an
    exact DECIMAL(18,6)-grid sum divided by an exact count.  Symbols
    with an empty tail (possible only when alpha interpolates strictly
    below every value) emit NULL ES.

    Plan shape: the winsorize_volumes shape — ONE per-symbol percentile
    aggregate broadcast back onto the bar scan, tail filter BEFORE the
    partial-combinable tail aggregate (only tail rows shuffle).  Exact
    percentiles don't partial-combine; ``approx=True`` swaps in the
    mergeable `percentile_approx` sketch for the 100 TB path (the
    latency_percentiles knob).

    cf. reference: extends the surface (tail-risk companion of
    q_hill_tail / q_drawdown)."""
    r = bars.select("symbol", F.col("price_change_pct").alias("ret"))
    q = r.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_bars"),
        _pctl("ret", alpha, approx, accuracy).alias("var_a"),
    )
    # ONE more bar scan carries the tail membership as conditional
    # aggregates against the broadcast K-row quantile table — no second
    # branch, no K-row re-join back (a first cut left-joined a separate
    # tail aggregate and re-derived the bars lineage three times)
    tail_ret = F.when(F.col("ret") <= F.col("var_a"), F.col("ret"))
    out = (
        r.join(F.broadcast(q), "symbol")
        .groupBy("symbol")
        .agg(
            F.max("n_bars").alias("n_bars"),
            F.max("var_a").alias("var_a"),
            F.count(tail_ret).cast("long").alias("n_tail"),
            F.sum(tail_ret.cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .alias("tail_sum"),
        )
    )
    es = F.col("tail_sum").cast("double") / F.col("n_tail").cast("double")
    return out.select(
        "symbol",
        "n_bars",
        "n_tail",
        r6(F.col("var_a")).alias("var_alpha"),
        F.when(F.col("n_tail") > 0, r6(es)).alias("es_alpha"),
    )


VAR_ES_ORACLE_BODY = f"""
,ve_r AS (
  SELECT symbol, price_change_pct AS ret FROM bars
),
ve_l AS (
  SELECT symbol, CAST(count(*) AS BIGINT) AS n,
         list(ret ORDER BY ret) AS vs
  FROM ve_r GROUP BY symbol
),
ve_q AS (
  SELECT symbol, n AS n_bars,
         {_OD.spark_percentile_sql(VAR_ALPHA)} AS var_a
  FROM ve_l
),
ve_t AS (
  SELECT r.symbol,
         CAST(count(*) AS BIGINT) AS n_tail,
         CAST(sum(CAST(r.ret AS DECIMAL(18,6))) AS DECIMAL(38,6))
             AS tail_sum
  FROM ve_r r JOIN ve_q q ON r.symbol = q.symbol
  WHERE r.ret <= q.var_a
  GROUP BY r.symbol
)
SELECT q.symbol, q.n_bars,
       CAST(coalesce(t.n_tail, 0) AS BIGINT) AS n_tail,
       round(q.var_a, 6) AS var_alpha,
       CASE WHEN t.n_tail > 0
            THEN round(CAST(t.tail_sum AS DOUBLE)
                       / CAST(t.n_tail AS DOUBLE), 6) END AS es_alpha
FROM ve_q q LEFT JOIN ve_t t ON q.symbol = t.symbol"""


CUSUM_H_ABS = 0.5  # fixed absolute breach threshold for the path form


def cusum_path(bars: DataFrame, h_abs: float = CUSUM_H_ABS) -> DataFrame:
    """Per-bar CUSUM path with a FIXED absolute threshold — the form a
    production monitor actually runs: ``h`` is calibrated offline (the
    :func:`cusum_levels` σ-based audit is the calibration study) and the
    live statistics S⁺/S⁻ plus running breach counts are maintained
    incrementally.  This batch form is the replay twin the streaming
    processor (streaming/cusum.py) is property-tested against.

    Same closed form as :func:`cusum_levels` (prefix sum − running min /
    running max − prefix sum), same DECIMAL(38,6)-exact state, same ONE
    partitionBy(symbol) sort for every window; the threshold compare is
    exact-decimal-cast-double vs an identical literal, and the running
    breach counts are integer window sums on the same sort.

    cf. reference: extends the surface (the live-monitor form of
    q_cusum)."""
    xd = F.col("price_change").cast("decimal(18,6)")
    b = bars.select("symbol", "bucket", xd.alias("x"))
    wo = Window.partitionBy("symbol").orderBy("bucket")
    wcum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p = F.sum("x").over(wcum).cast("decimal(38,6)")
    c = b.select("symbol", "bucket", p.alias("p"))
    c = c.select(
        "symbol",
        "bucket",
        (F.col("p") - F.min("p").over(wcum)).alias("s_up"),
        (F.max("p").over(wcum) - F.col("p")).alias("s_dn"),
    )
    h = F.lit(float(h_abs))
    flagged = c.select(
        "symbol",
        "bucket",
        "s_up",
        "s_dn",
        (F.col("s_up").cast("double") > h).alias("breach_up"),
        (F.col("s_dn").cast("double") > h).alias("breach_dn"),
    )
    return flagged.select(
        "symbol",
        "bucket",
        r6(F.col("s_up").cast("double")).alias("s_up"),
        r6(F.col("s_dn").cast("double")).alias("s_dn"),
        "breach_up",
        "breach_dn",
        F.sum(F.when(F.col("breach_up"), 1).otherwise(0))
        .over(wcum)
        .cast("long")
        .alias("n_breach_up_cum"),
        F.sum(F.when(F.col("breach_dn"), 1).otherwise(0))
        .over(wcum)
        .cast("long")
        .alias("n_breach_dn_cum"),
    )


CUSUM_PATH_ORACLE_BODY = f"""
,cp_b AS (
  SELECT symbol, bucket, CAST(price_change AS DECIMAL(18,6)) AS x
  FROM bars
),
cp_c AS (
  SELECT symbol, bucket,
         CAST(sum(x) OVER w AS DECIMAL(38,6)) AS p
  FROM cp_b
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cp_s AS (
  SELECT symbol, bucket,
         p - min(p) OVER w AS s_up,
         max(p) OVER w - p AS s_dn
  FROM cp_c
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cp_f AS (
  SELECT symbol, bucket, s_up, s_dn,
         CAST(s_up AS DOUBLE) > {CUSUM_H_ABS!r} AS breach_up,
         CAST(s_dn AS DOUBLE) > {CUSUM_H_ABS!r} AS breach_dn
  FROM cp_s
)
SELECT symbol, bucket,
       round(CAST(s_up AS DOUBLE), 6) AS s_up,
       round(CAST(s_dn AS DOUBLE), 6) AS s_dn,
       breach_up, breach_dn,
       CAST(sum(CASE WHEN breach_up THEN 1 ELSE 0 END) OVER w AS BIGINT)
           AS n_breach_up_cum,
       CAST(sum(CASE WHEN breach_dn THEN 1 ELSE 0 END) OVER w AS BIGINT)
           AS n_breach_dn_cum
FROM cp_f
WINDOW w AS (PARTITION BY symbol ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""


def price_clustering(dedup_trades: DataFrame) -> DataFrame:
    """Round-increment price clustering per symbol (Harris 1991): the
    share of trades printing on dime / quarter / dollar boundaries vs
    the uniform-tick expectation — real markets cluster on round
    increments, and the clustering ratio is a liveness check on a feed
    (a synthetic or stale tape shows ratio ≈ 1).

    Conventions (shared with the oracle): the price is snapped to cents
    via floor(price·100 + 0.5) — round-half-up on the positive domain,
    identical IEEE arithmetic in both engines (the validation filter
    guarantees price > 0) — and a boundary hit is a modulus test on the
    exact integer cents.

    Determinism: all counts are exact BIGINTs; shares and ratios divide
    identical integers.

    Plan shape: map-only cent snap → one partial-combinable per-symbol
    aggregate.  Zero joins, zero windows.

    cf. reference: extends the surface (feed-liveness companion of
    q_source_consistency)."""
    cents = F.floor(F.col("price") * F.lit(100.0) + F.lit(0.5)).cast("long")
    t = dedup_trades.select("symbol", cents.alias("cents"))
    g = t.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_trades"),
        F.sum(F.when(F.col("cents") % 10 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_dime"),
        F.sum(F.when(F.col("cents") % 25 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_quarter"),
        F.sum(F.when(F.col("cents") % 100 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_dollar"),
    )
    n = F.col("n_trades").cast("double")
    return g.select(
        "symbol",
        "n_trades",
        "n_dime",
        "n_quarter",
        "n_dollar",
        r6(F.col("n_dime") / n).alias("share_dime"),
        r6(F.col("n_quarter") / n).alias("share_quarter"),
        r6(F.col("n_dollar") / n).alias("share_dollar"),
        # clustering ratio: observed share / uniform-tick expectation
        r6(F.col("n_dime") / n / F.lit(0.1)).alias("ratio_dime"),
        r6(F.col("n_quarter") / n / F.lit(0.04)).alias("ratio_quarter"),
        r6(F.col("n_dollar") / n / F.lit(0.01)).alias("ratio_dollar"),
    )


PRICE_CLUSTERING_ORACLE_BODY = """
,pc_t AS (
  SELECT symbol,
         CAST(floor(price * 100.0 + 0.5) AS BIGINT) AS cents
  FROM dedup_trades
),
pc_g AS (
  SELECT symbol,
         CAST(count(*) AS BIGINT) AS n_trades,
         CAST(sum(CASE WHEN cents % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dime,
         CAST(sum(CASE WHEN cents % 25 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quarter,
         CAST(sum(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dollar
  FROM pc_t GROUP BY symbol
)
SELECT symbol, n_trades, n_dime, n_quarter, n_dollar,
       round(n_dime / CAST(n_trades AS DOUBLE), 6) AS share_dime,
       round(n_quarter / CAST(n_trades AS DOUBLE), 6) AS share_quarter,
       round(n_dollar / CAST(n_trades AS DOUBLE), 6) AS share_dollar,
       round(n_dime / CAST(n_trades AS DOUBLE) / 0.1, 6) AS ratio_dime,
       round(n_quarter / CAST(n_trades AS DOUBLE) / 0.04, 6)
           AS ratio_quarter,
       round(n_dollar / CAST(n_trades AS DOUBLE) / 0.01, 6) AS ratio_dollar
FROM pc_g"""


def vwap_slippage(bars: DataFrame) -> DataFrame:
    """Daily execution benchmarks per (symbol, day): the day's VWAP
    (exact notional/volume), TWAP (mean of bar closes), closing price,
    and the slippage of close vs both benchmarks in basis points — the
    scorecard an execution desk grades its fills against, computed from
    the same bars the VWAP-scheduler curve (q_intraday_profile) rides.

    Determinism: notional/volume/close are the shared 6-dp bar columns;
    the daily sums run on DECIMAL(18,6) (exact), the benchmark divisions
    and bps expressions evaluate identical doubles; the closing price is
    max_by(close, bucket) with a unique bucket key.  Zero-volume days
    are impossible post-validation (every bar has volume > 0).

    Plan shape: one calendar-bounded (symbol, day) partial-combinable
    aggregate over the bar table.

    cf. reference: extends the surface (execution-benchmark companion
    of q_intraday_profile)."""
    d = bars.groupBy(
        "symbol",
        F.expr("bucket div 1440").cast("long").alias("day"),
    ).agg(
        F.count("*").cast("long").alias("n_bars"),
        F.sum(F.col("notional").cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .alias("snot"),
        F.sum(F.col("volume").cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .alias("svol"),
        F.sum(F.col("close").cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .alias("sclose"),
        F.expr("max_by(close, bucket)").alias("close_day"),
    )
    vwap = F.col("snot").cast("double") / F.col("svol").cast("double")
    twap = F.col("sclose").cast("double") / F.col("n_bars").cast("double")
    return d.select(
        "symbol",
        "day",
        "n_bars",
        r6(vwap).alias("vwap_day"),
        r6(twap).alias("twap_day"),
        r6(F.col("close_day")).alias("close_day"),
        r6((F.col("close_day") - vwap) / vwap * F.lit(10000.0)).alias(
            "close_vs_vwap_bps"
        ),
        r6((twap - vwap) / vwap * F.lit(10000.0)).alias("twap_vs_vwap_bps"),
    )


VWAP_SLIPPAGE_ORACLE_BODY = """
,vs_d AS (
  SELECT symbol, bucket // 1440 AS day,
         CAST(count(*) AS BIGINT) AS n_bars,
         CAST(sum(CAST(notional AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS snot,
         CAST(sum(CAST(volume AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS svol,
         CAST(sum(CAST(close AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sclose,
         arg_max(close, bucket) AS close_day
  FROM bars GROUP BY 1, 2
)
SELECT symbol, day, n_bars,
       round(CAST(snot AS DOUBLE) / CAST(svol AS DOUBLE), 6) AS vwap_day,
       round(CAST(sclose AS DOUBLE) / CAST(n_bars AS DOUBLE), 6) AS twap_day,
       round(close_day, 6) AS close_day,
       round((close_day - CAST(snot AS DOUBLE) / CAST(svol AS DOUBLE))
             / (CAST(snot AS DOUBLE) / CAST(svol AS DOUBLE)) * 10000.0, 6)
           AS close_vs_vwap_bps,
       round((CAST(sclose AS DOUBLE) / CAST(n_bars AS DOUBLE)
              - CAST(snot AS DOUBLE) / CAST(svol AS DOUBLE))
             / (CAST(snot AS DOUBLE) / CAST(svol AS DOUBLE)) * 10000.0, 6)
           AS twap_vs_vwap_bps
FROM vs_d"""


def efficiency_ratio(bars: DataFrame) -> DataFrame:
    """Kaufman efficiency ratio per (symbol, day): |net close-to-close
    move| / Σ|bar-to-bar close moves| — 1.0 is a straight-line trend,
    → 0 is pure chop.  The regime classifier an adaptive-window control
    (KAMA-style) keys on, and the day-grain complement of
    :func:`runs_test`'s sign-sequence view.

    Determinism: closes are the shared 6-dp bar column; Δcloses come
    from one lag on the (symbol, day) sort and are summed as exact
    DECIMAL(38,6) absolutes; the net move is last−first via
    min_by/max_by on the unique bucket key.  Flat days (zero path
    length) emit NULL ER.

    Plan shape: bars → ONE partitionBy(symbol, day) sort carrying the
    lag → the calendar-bounded (symbol, day) aggregate rides the same
    partitioning.

    cf. reference: extends the surface (trend-regime companion of
    q_runs_test / q_variance_ratio)."""
    b = bars.select(
        "symbol",
        F.expr("bucket div 1440").cast("long").alias("day"),
        "bucket",
        F.col("close").cast("decimal(18,6)").alias("c"),
    )
    w = Window.partitionBy("symbol", "day").orderBy("bucket")
    d = b.select(
        "symbol",
        "day",
        "bucket",
        "c",
        (F.col("c") - F.lag("c").over(w)).alias("dc"),
    )
    g = d.groupBy("symbol", "day").agg(
        F.count("*").cast("long").alias("n_bars"),
        F.expr("min_by(c, bucket)").alias("first_close"),
        F.expr("max_by(c, bucket)").alias("last_close"),
        F.sum(F.abs(F.col("dc")).cast("decimal(38,6)"))
        .cast("decimal(38,6)")
        .alias("path_len"),
    )
    net = F.abs(F.col("last_close") - F.col("first_close"))
    er = net.cast("double") / F.col("path_len").cast("double")
    return g.select(
        "symbol",
        "day",
        "n_bars",
        r6(net.cast("double")).alias("net_move"),
        r6(F.col("path_len").cast("double")).alias("path_length"),
        F.when(F.col("path_len") > 0, r6(er)).alias("efficiency_ratio"),
    )


EFFICIENCY_RATIO_ORACLE_BODY = """
,er_b AS (
  SELECT symbol, bucket // 1440 AS day, bucket,
         CAST(close AS DECIMAL(18,6)) AS c
  FROM bars
),
er_d AS (
  SELECT symbol, day, bucket, c,
         c - lag(c) OVER (PARTITION BY symbol, day ORDER BY bucket) AS dc
  FROM er_b
),
er_g AS (
  SELECT symbol, day,
         CAST(count(*) AS BIGINT) AS n_bars,
         arg_min(c, bucket) AS first_close,
         arg_max(c, bucket) AS last_close,
         CAST(sum(CAST(abs(dc) AS DECIMAL(38,6))) AS DECIMAL(38,6))
             AS path_len
  FROM er_d GROUP BY 1, 2
)
SELECT symbol, day, n_bars,
       round(CAST(abs(last_close - first_close) AS DOUBLE), 6) AS net_move,
       round(CAST(path_len AS DOUBLE), 6) AS path_length,
       CASE WHEN path_len > 0
            THEN round(CAST(abs(last_close - first_close) AS DOUBLE)
                       / CAST(path_len AS DOUBLE), 6) END
           AS efficiency_ratio
FROM er_g"""


def bar_completeness(bars: DataFrame) -> DataFrame:
    """Bar-grain data-completeness audit per (symbol, day): observed bar
    count vs the day's active minute span, the missing-minute count, and
    the completeness ratio — the bar-grain twin of
    :func:`trade_gap_report` (that one measures inter-TRADE gaps in ms;
    this one answers "which symbol-days have holes in the bar series",
    the first question a backfill job asks).

    Conventions (shared with the oracle): the span is max−min bucket + 1
    WITHIN the day — a symbol listed mid-day is not penalized for
    minutes before its first print (the fano_factor span discipline).

    Determinism: every column is exact integer arithmetic except the one
    ratio of exact integers.

    Plan shape: one calendar-bounded (symbol, day) partial-combinable
    aggregate.  Zero windows, zero joins.

    cf. reference: extends the surface (data-quality family:
    q_gap_report at trade grain, this at bar grain)."""
    g = bars.groupBy(
        "symbol",
        F.expr("bucket div 1440").cast("long").alias("day"),
    ).agg(
        F.count("*").cast("long").alias("n_bars"),
        F.min("bucket").cast("long").alias("first_bucket"),
        F.max("bucket").cast("long").alias("last_bucket"),
    )
    span = F.col("last_bucket") - F.col("first_bucket") + F.lit(1)
    return g.select(
        "symbol",
        "day",
        "n_bars",
        "first_bucket",
        "last_bucket",
        span.cast("long").alias("active_span"),
        (span - F.col("n_bars")).cast("long").alias("missing_bars"),
        r6(F.col("n_bars") / span.cast("double")).alias("completeness"),
    )


BAR_COMPLETENESS_ORACLE_BODY = """
,bc_g AS (
  SELECT symbol, bucket // 1440 AS day,
         CAST(count(*) AS BIGINT) AS n_bars,
         CAST(min(bucket) AS BIGINT) AS first_bucket,
         CAST(max(bucket) AS BIGINT) AS last_bucket
  FROM bars GROUP BY 1, 2
)
SELECT symbol, day, n_bars, first_bucket, last_bucket,
       CAST(last_bucket - first_bucket + 1 AS BIGINT) AS active_span,
       CAST(last_bucket - first_bucket + 1 - n_bars AS BIGINT)
           AS missing_bars,
       round(n_bars / CAST(last_bucket - first_bucket + 1 AS DOUBLE), 6)
           AS completeness
FROM bc_g"""


QUOTE_STALE_MS = 5_000  # staleness breach threshold (ms)


def quote_staleness(
    trades: DataFrame, bba: DataFrame, stale_ms: int = QUOTE_STALE_MS
) -> DataFrame:
    """Prevailing-quote staleness at trade times per symbol: for every
    trade, the age of the latest quote STRICTLY before it (the
    :func:`effective_spread` matching convention), summarized as
    p50/p90/max staleness plus the count and share of trades priced off
    a quote older than ``stale_ms`` — the market-data-quality audit that
    says whether effective-spread numbers can be trusted (a spread
    against a 30-second-old quote measures the feed, not the market).

    Unlike the value-carrying as-of match, staleness needs only the MAX
    prevailing quote timestamp, which is tie-order-insensitive — the
    union-LOCF scan carries one running max(quote_ts), no
    lexicographic-max struct required.

    Determinism: staleness is exact integer ms; the percentiles use the
    engine's pinned exact-``percentile`` convention; trades before any
    quote are counted (``n_unmatched``), not silently dropped.

    Plan shape: ONE partitionBy(symbol) sort over the quote+trade union
    (the effective_spread single-sort discipline) → a K-row summary
    aggregate riding the same partitioning.

    cf. reference: extends the surface (market-data-quality companion
    of q_gap_report / q_effective_spread; staleness thresholds follow
    the reference's feed-health monitoring intent)."""
    q = bba.select(
        "symbol",
        (F.col("event_ts") + F.lit(1)).cast("long").alias("sort_ts"),
        F.lit(0).alias("is_q"),
        F.col("event_ts").cast("long").alias("qts"),
        F.lit(None).cast("long").alias("tts"),
    )
    t = trades.select(
        "symbol",
        F.col("event_ts").cast("long").alias("sort_ts"),
        F.lit(1).alias("is_q"),
        F.lit(None).cast("long").alias("qts"),
        F.col("event_ts").cast("long").alias("tts"),
    )
    w = (
        Window.partitionBy("symbol")
        .orderBy("sort_ts", "is_q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = q.unionByName(t).select(
        "symbol", "is_q", "tts", F.max("qts").over(w).alias("last_q")
    )
    tr = u.filter(F.col("is_q") == 1).select(
        "symbol",
        (F.col("tts") - F.col("last_q")).cast("long").alias("stale"),
    )
    g = tr.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_trades"),
        F.sum(F.when(F.col("stale").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_unmatched"),
        F.expr("percentile(stale, 0.5)").alias("p50_raw"),
        F.expr("percentile(stale, 0.9)").alias("p90_raw"),
        F.max("stale").cast("long").alias("max_stale_ms"),
        F.sum(F.when(F.col("stale") > stale_ms, 1).otherwise(0))
        .cast("long")
        .alias("n_stale"),
    )
    matched = (F.col("n_trades") - F.col("n_unmatched")).cast("double")
    return g.select(
        "symbol",
        "n_trades",
        "n_unmatched",
        r6(F.col("p50_raw")).alias("p50_stale_ms"),
        r6(F.col("p90_raw")).alias("p90_stale_ms"),
        "max_stale_ms",
        "n_stale",
        F.when(
            matched > 0, r6(F.col("n_stale") / matched)
        ).alias("stale_share"),
    )


QUOTE_STALENESS_ORACLE_BODY = f"""
,qs_u AS (
  SELECT symbol, event_ts + 1 AS sort_ts, 0 AS is_q,
         CAST(event_ts AS BIGINT) AS qts, CAST(NULL AS BIGINT) AS tts
  FROM bba
  UNION ALL
  SELECT symbol, event_ts, 1, CAST(NULL AS BIGINT),
         CAST(event_ts AS BIGINT)
  FROM dedup_trades
),
qs_l AS (
  SELECT symbol, is_q, tts,
         max(qts) OVER (PARTITION BY symbol ORDER BY sort_ts, is_q
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_q
  FROM qs_u
),
qs_t AS (
  SELECT symbol, CAST(tts - last_q AS BIGINT) AS stale
  FROM qs_l WHERE is_q = 1
),
qs_g AS (
  SELECT symbol,
         CAST(count(*) AS BIGINT) AS n_trades,
         CAST(sum(CASE WHEN stale IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unmatched,
         quantile_cont(stale, 0.5) AS p50_raw,
         quantile_cont(stale, 0.9) AS p90_raw,
         CAST(max(stale) AS BIGINT) AS max_stale_ms,
         CAST(sum(CASE WHEN stale > {QUOTE_STALE_MS} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_stale
  FROM qs_t GROUP BY symbol
)
SELECT symbol, n_trades, n_unmatched,
       round(p50_raw, 6) AS p50_stale_ms,
       round(p90_raw, 6) AS p90_stale_ms,
       max_stale_ms, n_stale,
       CASE WHEN n_trades - n_unmatched > 0
            THEN round(n_stale / CAST(n_trades - n_unmatched AS DOUBLE), 6)
       END AS stale_share
FROM qs_g"""


def intraday_volatility_profile(bars: DataFrame) -> DataFrame:
    """Intraday volatility seasonality per (symbol, hour-of-day): the
    total and per-day-average absolute close-to-open bar movement in
    each clock hour — the |move| twin of
    :func:`intraday_volume_profile`'s volume curve (volume says WHEN it
    trades, this says when it MOVES; the two diverge around scheduled
    events, which is exactly what a scheduler wants flagged).

    Determinism: |price_change| sits on the 6-dp bar grid, so the hour
    sums are exact DECIMAL(38,6) end to end and the per-day average is
    ONE division of exact operands — no mean-of-double-shares anywhere.

    Plan shape: bars → one (symbol, day, hod) partial-combinable
    aggregate → one (symbol, hod) roll-up to K·24 rows.  No windows.

    cf. reference: extends the surface (volatility companion of
    q_intraday_profile)."""
    hb = bars.groupBy(
        "symbol",
        F.expr("(bucket * 60000) div 86400000").cast("long").alias("day"),
        F.expr("(bucket * 60000) % 86400000 div 3600000")
        .cast("int")
        .alias("hod"),
    ).agg(
        F.sum(F.abs(F.col("price_change")).cast("decimal(18,6)"))
        .cast("decimal(38,6)")
        .alias("abs_move"),
        F.count("*").cast("long").alias("n_bars_h"),
    )
    g = hb.groupBy("symbol", "hod").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("abs_move").cast("decimal(38,6)").alias("tot_move"),
        F.sum("n_bars_h").cast("long").alias("n_bars"),
    )
    return g.select(
        "symbol",
        "hod",
        "n_days",
        "n_bars",
        r6(F.col("tot_move").cast("double")).alias("total_abs_move"),
        r6(
            F.col("tot_move").cast("double") / F.col("n_days").cast("double")
        ).alias("avg_abs_move_per_day"),
    )


INTRADAY_VOL_ORACLE_BODY = """
,ivv_h AS (
  SELECT symbol,
         (bucket * 60000) // 86400000 AS day,
         CAST((bucket * 60000) % 86400000 // 3600000 AS INT) AS hod,
         CAST(sum(CAST(abs(price_change) AS DECIMAL(18,6)))
              AS DECIMAL(38,6)) AS abs_move,
         CAST(count(*) AS BIGINT) AS n_bars_h
  FROM bars GROUP BY 1, 2, 3
),
ivv_g AS (
  SELECT symbol, hod,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(abs_move) AS DECIMAL(38,6)) AS tot_move,
         CAST(sum(n_bars_h) AS BIGINT) AS n_bars
  FROM ivv_h GROUP BY 1, 2
)
SELECT symbol, hod, n_days, n_bars,
       round(CAST(tot_move AS DOUBLE), 6) AS total_abs_move,
       round(CAST(tot_move AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
           AS avg_abs_move_per_day
FROM ivv_g"""


def symbol_datasheet(dedup_trades: DataFrame) -> DataFrame:
    """Per-symbol market datasheet — the one-row-per-symbol header block
    a data consumer reads before anything else (the market twin of the
    corpus datasheet): coverage (first/last trade, active days), volume
    (trades, quantity, notional), price range, and mean trade size.

    Determinism: timestamps and counts are exact integers; quantity and
    notional are exact DECIMAL sums on the engine grids (the VPIN / bars
    conventions); min/max prices are order-free; the one mean divides
    exact operands.

    Plan shape: ONE partial-combinable per-symbol aggregate over the
    dedup scan.  Zero windows, zero joins.

    cf. reference: extends the surface (datasheet family:
    q_doc_datasheet for the corpus, this for the tape)."""
    g = dedup_trades.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_trades"),
        F.min("event_ts").cast("long").alias("first_ts"),
        F.max("event_ts").cast("long").alias("last_ts"),
        F.countDistinct(F.expr("event_ts div 86400000"))
        .cast("long")
        .alias("n_active_days"),
        F.sum(F.col("qty").cast("decimal(20,4)"))
        .cast("decimal(38,4)")
        .alias("tot_qty"),
        F.sum((F.col("price") * F.col("qty")).cast("decimal(20,4)"))
        .cast("decimal(38,4)")
        .alias("tot_notional"),
        F.min("price").alias("min_price"),
        F.max("price").alias("max_price"),
    )
    return g.select(
        "symbol",
        "n_trades",
        "first_ts",
        "last_ts",
        "n_active_days",
        r6(F.col("tot_qty").cast("double")).alias("total_qty"),
        r6(F.col("tot_notional").cast("double")).alias("total_notional"),
        r6(F.col("min_price")).alias("min_price"),
        r6(F.col("max_price")).alias("max_price"),
        r6(
            F.col("tot_qty").cast("double") / F.col("n_trades").cast("double")
        ).alias("mean_trade_qty"),
    )


SYMBOL_DATASHEET_ORACLE_BODY = """
,sd_g AS (
  SELECT symbol,
         CAST(count(*) AS BIGINT) AS n_trades,
         CAST(min(event_ts) AS BIGINT) AS first_ts,
         CAST(max(event_ts) AS BIGINT) AS last_ts,
         CAST(count(DISTINCT event_ts // 86400000) AS BIGINT)
             AS n_active_days,
         CAST(sum(CAST(qty AS DECIMAL(20,4))) AS DECIMAL(38,4)) AS tot_qty,
         CAST(sum(CAST(price * qty AS DECIMAL(20,4))) AS DECIMAL(38,4))
             AS tot_notional,
         min(price) AS min_price,
         max(price) AS max_price
  FROM dedup_trades GROUP BY symbol
)
SELECT symbol, n_trades, first_ts, last_ts, n_active_days,
       round(CAST(tot_qty AS DOUBLE), 6) AS total_qty,
       round(CAST(tot_notional AS DOUBLE), 6) AS total_notional,
       round(min_price, 6) AS min_price,
       round(max_price, 6) AS max_price,
       round(CAST(tot_qty AS DOUBLE) / CAST(n_trades AS DOUBLE), 6)
           AS mean_trade_qty
FROM sd_g"""


# --- round 8: multi-horizon trade markouts ---------------------------------

MARKOUT_HORIZONS_MS = (1_000, 10_000, 60_000)


def _trade_identity(trades: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(tid, sides) for the multi-horizon as-of family: the distinct
    3-col trade identity (symbol, event_ts, price) and the distinct
    4-col side frame (identity + is_buyer_maker), derived from ONE
    aggregate — ``groupBy(identity).agg(collect_set(is_buyer_maker))``
    with sides exploding the set back to rows.

    r11 optimization: two separate ``.distinct()`` calls planned the
    upstream dedup window twice — Catalyst pruned ``is_buyer_maker`` out
    of the tid leg's scan projection, the two dedup subtrees stopped
    being canonically equal, and AQE's ReusedExchange could not collapse
    them (measured: the events scan + normalize + dedup sort ran twice
    per query).  One aggregate with both consumers referencing its
    output keeps ONE canonical subtree, so the dedup executes once; as
    a bonus the sides frame comes out hash-partitioned on the (symbol,
    event_ts, price) join key the mids lookup needs.

    Mechanics: the per-identity maker-flag SET is encoded as min/max of
    the boolean (codegen'd declarative aggregates — no
    ObjectHashAggregate) and exploded back for sides; min==max means one
    side, else both.  The tid branch must reference an aggregate output
    or Catalyst prunes the functions away and the branches diverge
    again — the ``mk_min IS NOT NULL`` filter is that pin: always true
    by construction (every group has ≥1 row and the normalize maker
    derivation is total), zero rows removed, but not provable by the
    optimizer, so the shared subtree survives.

    Row-equivalence: explode(min==max ? [mk] : [false, true]) over the
    3-col groups IS the 4-col distinct; the group keys under the
    always-true pin are the 3-col distinct.

    Input requirement (r12, ADVICE r11): ``is_buyer_maker`` must be
    NON-NULL on every input row — true for every caller in this engine
    (the normalize maker derivation is total).  An all-NULL group would
    be dropped from ``tid`` by the pin (where the old ``.distinct()``
    kept it) and ``sides`` would fabricate [false, true] for it (the
    NULL==NULL comparison falls into the otherwise branch); a mixed
    NULL/non-NULL group would lose its NULL side.  Callers feeding
    frames with nullable maker flags must coalesce them first."""
    g = (
        trades.select("symbol", "event_ts", "price", "is_buyer_maker")
        .groupBy("symbol", "event_ts", "price")
        .agg(
            F.min("is_buyer_maker").alias("__mk_min"),
            F.max("is_buyer_maker").alias("__mk_max"),
        )
    )
    tid = g.filter(F.col("__mk_min").isNotNull()).select(
        "symbol", "event_ts", "price"
    )
    sides = g.select(
        "symbol",
        "event_ts",
        "price",
        F.explode(
            F.when(
                F.col("__mk_min") == F.col("__mk_max"), F.array("__mk_min")
            ).otherwise(F.array(F.lit(False), F.lit(True)))
        ).alias("is_buyer_maker"),
    )
    return tid, sides


def markout(
    trades: DataFrame,
    bba: DataFrame,
    horizons_ms: tuple[int, ...] = MARKOUT_HORIZONS_MS,
) -> DataFrame:
    """Multi-horizon trade markouts per (symbol, minute) — the
    adverse-selection CURVE that :func:`realized_spread` samples at one
    point: for each horizon h, the signed prevailing-mid move after the
    trade, ``markout_h = 2·d·(m_{t+h} − m_t) / m_t · 1e4`` (d = +1
    buyer-initiated).  A markout that keeps climbing across horizons is
    informed flow; one that mean-reverts is bid-ask bounce — the curve,
    not any single point, is what an execution desk reads.

    Plan shape (r12): ONE union-LOCF as-of scan for ALL horizons —
    quotes AND the distinct trade identity each enter the symbol sort
    ONCE (Q+T rows); each horizon is resolved by a RANGE-frame window
    ``max(quote sort-tuple) over rangeBetween(unboundedPreceding, +h)``
    sharing that single sort (see :func:`_markout_mids` for the
    equivalence argument), so no per-horizon probe rows and no pivot
    re-assembly exchange exist; one partial-combinable minute aggregate
    finishes.  (The r11 form sorted Q + T·(H+1) probe rows and paid a
    T·(H+1)-row groupBy pivot — guide §2.3/§2.4.)  Trades before the
    first quote drop symmetrically from every horizon (a mid at t
    implies a mid at t+h, so null handling is one filter).

    cf. reference: extends the surface (Huang–Stoll horizon
    generalization; complements :func:`realized_spread`)."""
    hs = [0] + sorted(horizons_ms)
    # r11: one shared identity aggregate — the dedup window executes once
    tid, sides = _trade_identity(trades)
    mids = _markout_mids(_markout_union(tid, bba), hs)
    return _markout_finish(mids, sides, hs)


def markout_sliced(
    trades: DataFrame,
    bba: DataFrame,
    horizons_ms: tuple[int, ...] = MARKOUT_HORIZONS_MS,
    slice_ms: int = SKEW_SLICE_MS,
) -> DataFrame:
    """Hot-key-safe :func:`markout` — identical rows (same DuckDB oracle),
    but the union scan sorts on (symbol, time-slice) instead of
    (symbol): one dominant symbol spreads over ~span/slice_ms sort
    partitions instead of serializing the whole scan (the single-sort
    form measured 2.64x/decade under the 90%-one-symbol tape vs 2.13x
    balanced, BENCH_SCALE_r09.json `skew`).

    r12 rewrite (range frames, matching :func:`markout`): each probe
    enters ONCE at its own instant and horizons resolve via per-slice
    RANGE-frame windows.  Two slice-boundary repairs make that exact:

    - **Ghost quotes** (forward boundary): a probe at t near its
      slice's end has frames reaching up to t + h_max, possibly past
      the slice boundary — quotes in later slices would be invisible to
      its per-slice window.  Every quote is therefore replicated into
      each earlier slice whose probes can reach it (all slices
      intersecting [sort_ts − h_max, sort_ts]; ≤ ceil(h_max/slice_ms)
      extra copies per quote ≈ +0.07 % rows at the default day slice /
      60 s h_max).  A ghost at sort_ts ≤ t+h is exactly a quote the
      single-sort frame contained, and a ghost enters max() only for
      probes whose range bound reaches it — probes that stop short
      never see it.
    - **Carry-in** (backward boundary, as r11): pq_h NULL means no
      quote in [slice_start, t+h]; since t+h ≥ slice_start the correct
      prevailing quote is then the newest one before slice_start — the
      per-(symbol, slice) carry chain.  Carry-outs EXCLUDE ghosts (a
      ghost's true instant lies in a later slice; letting it into the
      carry would leak a future quote into the next slice's backfill),
      computed as a full-frame max in the SAME window operator group so
      the carry leg references the window output and the union subtree
      stays canonical (the r11 ReusedExchange lesson)."""
    hs = [0] + sorted(horizons_ms)
    h_max = hs[-1]
    # r11: one shared identity aggregate (see _trade_identity)
    tid, sides = _trade_identity(trades)
    u = _markout_union(tid, bba).withColumn(
        "true_slice", F.expr(f"sort_ts div {slice_ms}").cast("long")
    )
    u = u.select(
        "*",
        F.explode(
            F.when(
                F.col("is_q") == 0,
                F.expr(
                    f"sequence((sort_ts - {h_max}) div {slice_ms},"
                    f" sort_ts div {slice_ms})"
                ),
            ).otherwise(F.array(F.col("true_slice")))
        ).alias("slice"),
    ).withColumn("ghost", F.col("slice") != F.col("true_slice"))
    base = Window.partitionBy("symbol", "slice").orderBy("sort_ts")
    qt = _asof_quote_tuple()
    pq_cols = [
        F.max(qt)
        .over(base.rangeBetween(Window.unboundedPreceding, h))
        .alias(f"pq_{h}")
        for h in hs
    ]
    carry_out = (
        F.max(F.when(~F.col("ghost"), qt))
        .over(
            base.rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("slice_carry_out")
    )
    local = u.select("*", *pq_cols, carry_out)
    wc = (
        Window.partitionBy("symbol")
        .orderBy("slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        local.select(
            "symbol", "slice", F.col("slice_carry_out").alias("carry_out")
        )
        .distinct()
        .withColumn("carry_in", F.last("carry_out", ignorenulls=True).over(wc))
        .select("symbol", "slice", "carry_in")
    )
    patched = local.join(F.broadcast(carry), ["symbol", "slice"], "left")
    pq_fixed = {
        h: F.coalesce(F.col(f"pq_{h}"), F.col("carry_in")) for h in hs
    }
    mids = (
        patched.filter(
            (F.col("is_q") == 1) & pq_fixed[0].isNotNull()
        )
        .select(
            "symbol",
            "event_ts",
            "price",
            *[
                ((pq_fixed[h]["b"] + pq_fixed[h]["a"]) / 2.0).alias(f"mid_{h}")
                for h in hs
            ],
        )
    )
    return _markout_finish(mids, sides, hs)


def markout_adaptive(
    trades: DataFrame,
    bba: DataFrame,
    horizons_ms: tuple[int, ...] = MARKOUT_HORIZONS_MS,
    hot_share: float | None = None,
    threshold: float = HOT_KEY_SHARE_THRESHOLD,
) -> DataFrame:
    """Skew-adaptive :func:`markout` — the
    :func:`effective_spread_adaptive` dispatch applied to the
    multi-horizon union-LOCF scan (single-sort skew decade 2.64x vs the
    sliced form's 1.66x, BENCH_SCALE_r09.json `skew`; the sliced form
    also pays an extra boundary-repair exchange on balanced data, which
    is why it must not be the unconditional default).  Same oracle
    either way; gauged on the trade leg."""
    if hot_share is None:
        hot_share = hot_key_share(trades)
    if hot_share >= threshold:
        return markout_sliced(trades, bba, horizons_ms)
    return markout(trades, bba, horizons_ms)


def _markout_union(tid: DataFrame, bba: DataFrame) -> DataFrame:
    """The quotes + trade-probe sort frame shared by :func:`markout`,
    its time-sliced twin, and :func:`realized_spread`: quotes available
    at event_ts+1; the distinct trade identity ``tid`` (symbol,
    event_ts, price) enters ONCE at its own instant.  Callers derive
    ``tid`` from their ``sides`` frame so the dedup subtree executes
    once (r11: passing ``trades`` and re-deriving the distinct here
    planned the dedup window twice with different prunings — no
    ReusedExchange).

    r12: the per-horizon probe explode is GONE — horizons are resolved
    by RANGE-frame windows over this Q+T-row frame (see
    :func:`markout`), where the old form sorted Q + T·(H+1) rows
    (every trade re-entered the sort once per horizon with sort key
    event_ts + h).  Guide §2.3: fewer sorted/shuffled bytes for the
    same answer."""
    q = bba.select(
        "symbol",
        (F.col("event_ts") + F.lit(1)).cast("long").alias("sort_ts"),
        F.lit(0).alias("is_q"),
        "ingest_ts",
        "bid_px",
        "ask_px",
        "bid_sz",
        "ask_sz",
        F.lit(None).cast("long").alias("event_ts"),
        F.lit(None).cast("double").alias("price"),
    )
    t = tid.select(
        "symbol",
        F.col("event_ts").cast("long").alias("sort_ts"),
        F.lit(1).alias("is_q"),
        F.lit(0).cast("long").alias("ingest_ts"),
        F.lit(None).cast("double").alias("bid_px"),
        F.lit(None).cast("double").alias("ask_px"),
        F.lit(None).cast("double").alias("bid_sz"),
        F.lit(None).cast("double").alias("ask_sz"),
        "event_ts",
        "price",
    )
    return q.unionByName(t)


def _markout_mids(u: DataFrame, hs: list) -> DataFrame:
    """Prevailing mid at t+h for every horizon h, resolved by H+1
    RANGE-frame windows over ONE (symbol)-sorted pass of the Q+T-row
    union frame (r12 rewrite of the Q+T·(H+1) probe-explode form):

        pq_h = max(quote sort-tuple) over
                   partitionBy(symbol) orderBy(sort_ts)
                   rangeBetween(unboundedPreceding, +h)

    For a probe at sort_ts = t the frame holds every row with
    sort_ts ≤ t + h, so max over :func:`_asof_quote_tuple` IS the
    prevailing quote at t+h — the row the old per-horizon probe's
    running ``last(ignorenulls)`` resolved (same frame contents: a
    quote available at exactly t+h sorted before the old probe via
    is_q and is ≤ the range bound here; same tie winner: lexicographic
    max, see _asof_quote_tuple).  All H+1 frames share one partition
    spec and one sort key, so Spark evaluates them in a single Window
    operator over a single sort; each unbounded-preceding frame is a
    grow-only running aggregate (O(rows) per frame, no per-row
    re-scan).

    A second structural win falls out: each probe row carries ALL
    horizon mids, so the old groupBy(symbol, event_ts, price) pivot
    that reassembled per-horizon rows into one row per trade — a full
    T·(H+1)-row exchange — disappears (guide §2.4).

    A mid at t implies a mid at t+h (the frame only grows with h),
    so filtering on pq_0 alone drops exactly the trades the
    per-horizon NULL filter dropped."""
    base = Window.partitionBy("symbol").orderBy("sort_ts")
    qt = _asof_quote_tuple()
    pq_cols = [
        F.max(qt)
        .over(base.rangeBetween(Window.unboundedPreceding, h))
        .alias(f"pq_{h}")
        for h in hs
    ]
    return (
        u.select("*", *pq_cols)
        .filter((F.col("is_q") == 1) & F.col("pq_0").isNotNull())
        .select(
            "symbol",
            "event_ts",
            "price",
            *[
                ((F.col(f"pq_{h}.b") + F.col(f"pq_{h}.a")) / 2.0).alias(
                    f"mid_{h}"
                )
                for h in hs
            ],
        )
    )


def _markout_finish(mids: DataFrame, sides: DataFrame, hs: list) -> DataFrame:
    """Markout minute aggregate shared by both sort forms.  ``mids`` is
    already one row per trade identity with len(hs) mid columns (r12:
    the range-frame scan emits that shape directly — the old
    per-horizon pivot groupBy and its T·(H+1)-row exchange are gone)."""
    m = sides.join(mids, ["symbol", "event_ts", "price"])
    d = F.when(F.col("is_buyer_maker"), F.lit(-1.0)).otherwise(F.lit(1.0))
    return m.groupBy(
        "symbol",
        F.expr("event_ts div 60000").cast("long").alias("bucket"),
    ).agg(
        F.count("*").cast("long").alias("n_trades"),
        *[
            r6(
                F.avg(
                    2.0 * d * (F.col(f"mid_{h}") - F.col("mid_0"))
                    / F.col("mid_0") * 10000.0
                )
            ).alias(f"markout_{h // 1000}s_bps")
            for h in hs[1:]
        ],
    )


# oracle body after DEDUP_TRADES_CTE + BBA_CTE: one ASOF join per horizon
# over the same shifted-sort-key convention as the Spark single-sort scan;
# quote-tie collapse is the window dedup (see EFFECTIVE_SPREAD note)
MARKOUT_ORACLE_BODY = f"""
,quotes AS (
  SELECT symbol, avail_ts,
         {{'i': ingest_ts, 'b': bid_px, 'a': ask_px,
          'bs': bid_sz, 'asz': ask_sz}} AS s
  FROM (SELECT symbol, event_ts + 1 AS avail_ts, ingest_ts,
               bid_px, ask_px, bid_sz, ask_sz FROM bba)
  QUALIFY row_number() OVER (PARTITION BY symbol, avail_ts
      ORDER BY ingest_ts DESC, bid_px DESC, ask_px DESC,
               bid_sz DESC, ask_sz DESC) = 1
),
t0 AS (
  SELECT DISTINCT symbol, event_ts, price, is_buyer_maker
  FROM dedup_trades
),
tid AS (SELECT DISTINCT symbol, event_ts, price FROM t0),
mk_m0 AS (
  SELECT t.symbol, t.event_ts, t.price,
         (struct_extract(q.s, 'b') + struct_extract(q.s, 'a')) / 2.0 AS mid
  FROM tid t
  ASOF JOIN quotes q ON t.symbol = q.symbol AND t.event_ts >= q.avail_ts
),
mk_s1 AS (SELECT symbol, event_ts, price,
                 event_ts + {MARKOUT_HORIZONS_MS[0]} AS sts FROM tid),
mk_m1 AS (
  SELECT t.symbol, t.event_ts, t.price,
         (struct_extract(q.s, 'b') + struct_extract(q.s, 'a')) / 2.0 AS mid
  FROM mk_s1 t
  ASOF JOIN quotes q ON t.symbol = q.symbol AND t.sts >= q.avail_ts
),
mk_s2 AS (SELECT symbol, event_ts, price,
                 event_ts + {MARKOUT_HORIZONS_MS[1]} AS sts FROM tid),
mk_m2 AS (
  SELECT t.symbol, t.event_ts, t.price,
         (struct_extract(q.s, 'b') + struct_extract(q.s, 'a')) / 2.0 AS mid
  FROM mk_s2 t
  ASOF JOIN quotes q ON t.symbol = q.symbol AND t.sts >= q.avail_ts
),
mk_s3 AS (SELECT symbol, event_ts, price,
                 event_ts + {MARKOUT_HORIZONS_MS[2]} AS sts FROM tid),
mk_m3 AS (
  SELECT t.symbol, t.event_ts, t.price,
         (struct_extract(q.s, 'b') + struct_extract(q.s, 'a')) / 2.0 AS mid
  FROM mk_s3 t
  ASOF JOIN quotes q ON t.symbol = q.symbol AND t.sts >= q.avail_ts
),
mk AS (
  SELECT t.symbol, t.event_ts,
         CASE WHEN t.is_buyer_maker THEN -1.0 ELSE 1.0 END AS d,
         m0.mid AS mid_0, m1.mid AS mid_1, m2.mid AS mid_2, m3.mid AS mid_3
  FROM t0 t
  JOIN mk_m0 m0 USING (symbol, event_ts, price)
  JOIN mk_m1 m1 USING (symbol, event_ts, price)
  JOIN mk_m2 m2 USING (symbol, event_ts, price)
  JOIN mk_m3 m3 USING (symbol, event_ts, price)
)
SELECT symbol, event_ts // 60000 AS bucket,
       CAST(count(*) AS BIGINT) AS n_trades,
       round(avg(2.0 * d * (mid_1 - mid_0) / mid_0 * 10000.0), 6)
           AS markout_{MARKOUT_HORIZONS_MS[0] // 1000}s_bps,
       round(avg(2.0 * d * (mid_2 - mid_0) / mid_0 * 10000.0), 6)
           AS markout_{MARKOUT_HORIZONS_MS[1] // 1000}s_bps,
       round(avg(2.0 * d * (mid_3 - mid_0) / mid_0 * 10000.0), 6)
           AS markout_{MARKOUT_HORIZONS_MS[2] // 1000}s_bps
FROM mk GROUP BY 1, 2"""


# --- round 8: candlestick pattern counts ------------------------------------

DOJI_BODY_FRAC = 0.1  # body <= 10% of range


def candle_patterns(bars: DataFrame) -> DataFrame:
    """Candlestick pattern counts per (symbol, day) over the 1-minute
    bars — the classical-TA feature block a signal library extracts
    before model training: doji (open≈close inside a real range),
    hammer (long lower shadow, capped upper shadow), and bullish/bearish
    engulfing (current body swallows the previous OBSERVED bar's body,
    opposite direction).  Counts, not signals: the per-day pattern
    frequency is the regime feature.

    Pattern definitions (deterministic double compares on the shared
    bar columns): with body = |close − open|, range = high − low,
      doji    := range > 0 AND body <= 0.1·range
      hammer  := range > 0 AND (least(o,c) − low) >= 2·body
                 AND (high − greatest(o,c)) <= body
      bullish engulfing := prev bearish AND current bullish
                 AND open <= prev_close AND close >= prev_open
      bearish engulfing := mirror
    Flat bars (range = 0 — single-trade minutes) are excluded from
    doji/hammer by the range guard and counted in ``n_flat``.

    Plan shape: ONE partitionBy(symbol) sort for the two lags, then one
    partial-combinable (symbol, day) aggregate.

    cf. reference: extends the surface (no reference counterpart)."""
    wl = Window.partitionBy("symbol").orderBy("bucket")
    body = F.abs(F.col("close") - F.col("open"))
    rng = F.col("high") - F.col("low")
    lower = F.least(F.col("open"), F.col("close")) - F.col("low")
    upper = F.col("high") - F.greatest(F.col("open"), F.col("close"))
    p_o = F.lag("open").over(wl)
    p_c = F.lag("close").over(wl)
    doji = (rng > 0) & (body <= F.lit(DOJI_BODY_FRAC) * rng)
    hammer = (rng > 0) & (lower >= 2.0 * body) & (upper <= body)
    bull = (
        p_c.isNotNull()
        & (p_c < p_o)
        & (F.col("close") > F.col("open"))
        & (F.col("open") <= p_c)
        & (F.col("close") >= p_o)
    )
    bear = (
        p_c.isNotNull()
        & (p_c > p_o)
        & (F.col("close") < F.col("open"))
        & (F.col("open") >= p_c)
        & (F.col("close") <= p_o)
    )

    def cnt(cond, name):
        return (
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)
        )

    return (
        bars.select(
            "symbol",
            "bucket",
            "open",
            "high",
            "low",
            "close",
            doji.alias("is_doji"),
            hammer.alias("is_hammer"),
            bull.alias("is_bull"),
            bear.alias("is_bear"),
            (rng == 0).alias("is_flat"),
        )
        .groupBy(
            "symbol",
            F.expr("bucket div 1440").cast("long").alias("day"),
        )
        .agg(
            F.count("*").cast("long").alias("n_bars"),
            cnt(F.col("is_flat"), "n_flat"),
            cnt(F.col("is_doji"), "n_doji"),
            cnt(F.col("is_hammer"), "n_hammer"),
            cnt(F.col("is_bull"), "n_bull_engulf"),
            cnt(F.col("is_bear"), "n_bear_engulf"),
        )
    )


CANDLE_PATTERNS_ORACLE_BODY = f"""
,cp AS (
  SELECT symbol, bucket, open, high, low, close,
         lag(open) OVER (PARTITION BY symbol ORDER BY bucket) AS p_o,
         lag(close) OVER (PARTITION BY symbol ORDER BY bucket) AS p_c
  FROM bars
),
cp_f AS (
  SELECT symbol, bucket // 1440 AS day,
         high - low AS rng,
         abs(close - open) AS body,
         least(open, close) - low AS lower,
         high - greatest(open, close) AS upper,
         p_o, p_c, open, close
  FROM cp
)
SELECT symbol, day,
       CAST(count(*) AS BIGINT) AS n_bars,
       CAST(sum(CASE WHEN rng = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat,
       CAST(sum(CASE WHEN rng > 0
                      AND body <= CAST({DOJI_BODY_FRAC!r} AS DOUBLE) * rng
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_doji,
       CAST(sum(CASE WHEN rng > 0 AND lower >= 2.0 * body
                      AND upper <= body
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_hammer,
       CAST(sum(CASE WHEN p_c IS NOT NULL AND p_c < p_o AND close > open
                      AND open <= p_c AND close >= p_o
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bull_engulf,
       CAST(sum(CASE WHEN p_c IS NOT NULL AND p_c > p_o AND close < open
                      AND open >= p_c AND close <= p_o
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_bear_engulf
FROM cp_f GROUP BY symbol, day"""


# --- round 8: order-flow sign autocorrelation -------------------------------

SIGN_ACF_MAX_LAG = 5


def sign_acf(trades: DataFrame, max_lag: int = SIGN_ACF_MAX_LAG) -> DataFrame:
    """Autocorrelation of trade SIGNS at lags 1..max_lag per symbol —
    the "long memory of order flow" diagnostic (Bouchaud et al.): sign
    ACF decays slowly on real tapes because large parents split into
    child orders, and its decay rate is the input to propagator-model
    impact estimates.  Complements :func:`trade_runs` (run lengths are
    the same persistence viewed as islands) and
    :func:`acf_price_changes` (price-change ACF at bar grain; this is
    TRADE grain on the ±1 sign series).

    Determinism: signs are exact ±1 integers, so every Pearson moment
    is an exact BIGINT sum — no decimal casts needed; the correlation
    arithmetic sees bit-identical operands.  Degenerate margins emit
    NULL.

    Plan shape: the :func:`acf_price_changes` shape at trade grain —
    sign and its lagged copies ride ONE partitionBy(symbol) sort,
    `stack` fans out max_lag× map-side, one partial-combinable
    (symbol, lag) aggregate.

    cf. reference: extends the surface (no serial-dependence
    diagnostics in the reference)."""
    wl = Window.partitionBy("symbol").orderBy("event_ts", "trade_id")
    sign = F.when(F.col("is_buyer_maker"), -1).otherwise(1)
    b = trades.select("symbol", "event_ts", "trade_id", sign.alias("s"))
    lag_cols = [
        F.lag("s", k).over(wl).alias(f"s_l{k}") for k in range(1, max_lag + 1)
    ]
    stacked = b.select("symbol", "s", *lag_cols).select(
        "symbol",
        "s",
        F.expr(
            "stack({n}, {args}) AS (lag, s_lag)".format(
                n=max_lag,
                args=", ".join(f"{k}, s_l{k}" for k in range(1, max_lag + 1)),
            )
        ),
    ).filter(F.col("s_lag").isNotNull())
    g = stacked.groupBy("symbol", "lag").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("s").cast("long").alias("sx"),
        F.sum("s_lag").cast("long").alias("sy"),
        F.sum(F.col("s") * F.col("s_lag")).cast("long").alias("sxy"),
        # s^2 == 1, so sxx == syy == n — kept explicit for the formula
    )
    n = F.col("n_pairs").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    varx = n * n - sx * sx  # n*sxx with sxx = n
    vary = n * n - sy * sy
    corr = (n * F.col("sxy").cast("double") - sx * sy) / F.sqrt(varx * vary)
    return g.select(
        "symbol",
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        F.when((varx > 0) & (vary > 0), r6(corr)).alias("sign_acf"),
    )


SIGN_ACF_ORACLE_BODY = f"""
,sa_s AS (
  SELECT symbol, event_ts, trade_id,
         CASE WHEN is_buyer_maker THEN -1 ELSE 1 END AS s
  FROM dedup_trades
),
sa_l AS (
  SELECT symbol, s,
         {", ".join(f"lag(s, {k}) OVER w AS s_l{k}"
                    for k in range(1, SIGN_ACF_MAX_LAG + 1))}
  FROM sa_s
  WINDOW w AS (PARTITION BY symbol ORDER BY event_ts, trade_id)
),
sa_u AS (
  {" UNION ALL ".join(
      f"SELECT symbol, {k} AS lag, s, s_l{k} AS s_lag FROM sa_l "
      f"WHERE s_l{k} IS NOT NULL"
      for k in range(1, SIGN_ACF_MAX_LAG + 1))}
),
sa_g AS (
  SELECT symbol, lag,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(s) AS BIGINT) AS sx,
         CAST(sum(s_lag) AS BIGINT) AS sy,
         CAST(sum(s * s_lag) AS BIGINT) AS sxy
  FROM sa_u GROUP BY symbol, lag
)
SELECT symbol, CAST(lag AS INTEGER) AS lag, n_pairs,
       CASE WHEN CAST(n_pairs AS DOUBLE) * n_pairs - CAST(sx AS DOUBLE) * sx > 0
             AND CAST(n_pairs AS DOUBLE) * n_pairs - CAST(sy AS DOUBLE) * sy > 0
            THEN round((CAST(n_pairs AS DOUBLE) * sxy
                        - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n_pairs AS DOUBLE) * n_pairs
                         - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n_pairs AS DOUBLE) * n_pairs
                           - CAST(sy AS DOUBLE) * sy)), 6)
       END AS sign_acf
FROM sa_g"""
