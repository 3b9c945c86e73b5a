"""Aggregation operators (SURVEY §2.4, A1-A12).

Each is a declarative groupBy/agg so Catalyst plans a partial (map-side)
aggregate before the shuffle — the scale-critical property: at 100 TB the
shuffle carries one partial row per (symbol, bucket) per input partition,
not raw ticks.  No Python UDFs anywhere in this module.

References for the semantics are cited per function (reference repo paths,
see SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import r6

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
        F.sum(F.col("price") * F.col("qty")).alias("notional_raw"),
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
