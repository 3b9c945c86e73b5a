"""Kline positional-array parsing (P2) + decimal-string formatting (P4).

P2 — the reference receives Binance klines as positional 12-element arrays
and maps them to named fields with float casts plus a composite dedup key
(services/rest_ingestor/src/writers/s3_writer.py:150-175; documented struct
form docs/schemas/S3_SCHEMA.md:272-295).

The engine synthesizes the wire-form array deterministically from `events`
(the same stand-in convention as functions/normalize.py) and then performs
the REAL operation under test: positional extraction → named, typed columns.
Elements are decimal STRINGS on the wire, exactly like Binance.

P4 — the SBE normalizer renders numerics as fixed 8-dp strings with
trailing zeros stripped (binance_sbe.py:339-352 `_format_numeric`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import r6
from .normalize import _props_k


def kline_wire(events: DataFrame) -> DataFrame:
    """events → synthetic positional kline array (wire form).

    12 slots: [open_time, open, high, low, close, volume, close_time,
    quote_volume, trade_count, taker_buy_base, taker_buy_quote, ignore] —
    numerics as strings, like the Binance REST payload."""
    minute = F.expr("(ts div 1000) div 60000") * 60000
    px = F.col("value")
    # r11: shared fast-path payload decode (see normalize._props_k)
    k = _props_k() + 1.0
    arr = F.array(
        minute.cast("string"),
        px.cast("string"),
        (px * 1.01).cast("string"),
        (px * 0.99).cast("string"),
        (px * 1.005).cast("string"),
        k.cast("string"),
        (minute + 59999).cast("string"),
        (px * k).cast("string"),
        (F.col("event_id") % 100 + 1).cast("string"),
        (k / 2.0).cast("string"),
        (px * k / 2.0).cast("string"),
        F.lit("0"),
    )
    return events.select(
        F.upper(F.col("event_type")).alias("symbol"),
        F.lit("1m").alias("interval"),
        arr.alias("k"),
    ).filter(px > 0)


KLINE_WIRE_SQL = """
kline_wire AS (
  SELECT upper(event_type) AS symbol, '1m' AS interval,
         [CAST((epoch_ms(ts) // 60000) * 60000 AS VARCHAR),
          CAST(value AS VARCHAR),
          CAST(value * 1.01 AS VARCHAR),
          CAST(value * 0.99 AS VARCHAR),
          CAST(value * 1.005 AS VARCHAR),
          CAST(CAST(json_extract(props, '$.k') AS DOUBLE) + 1.0 AS VARCHAR),
          CAST((epoch_ms(ts) // 60000) * 60000 + 59999 AS VARCHAR),
          CAST(value * (CAST(json_extract(props, '$.k') AS DOUBLE) + 1.0) AS VARCHAR),
          CAST(event_id % 100 + 1 AS VARCHAR),
          CAST((CAST(json_extract(props, '$.k') AS DOUBLE) + 1.0) / 2.0 AS VARCHAR),
          CAST(value * (CAST(json_extract(props, '$.k') AS DOUBLE) + 1.0) / 2.0 AS VARCHAR),
          '0'] AS k
  FROM events
  WHERE value > 0
)"""


def parse_klines(kline_wire_df: DataFrame) -> DataFrame:
    """P2 proper: positional array → named struct with casts + the
    reference's composite dedup key `{symbol}_{interval}_{open_time}`
    (s3_writer.py:172-175)."""
    k = F.col("k")
    return kline_wire_df.select(
        "symbol",
        "interval",
        F.element_at(k, 1).cast("long").alias("open_time"),
        r6(F.element_at(k, 2).cast("double")).alias("open_price"),
        r6(F.element_at(k, 3).cast("double")).alias("high_price"),
        r6(F.element_at(k, 4).cast("double")).alias("low_price"),
        r6(F.element_at(k, 5).cast("double")).alias("close_price"),
        r6(F.element_at(k, 6).cast("double")).alias("volume"),
        F.element_at(k, 7).cast("long").alias("close_time"),
        r6(F.element_at(k, 8).cast("double")).alias("quote_volume"),
        F.element_at(k, 9).cast("int").alias("trade_count"),
        r6(F.element_at(k, 10).cast("double")).alias("taker_buy_base_volume"),
        r6(F.element_at(k, 11).cast("double")).alias("taker_buy_quote_volume"),
        F.concat_ws("_", "symbol", "interval", F.element_at(k, 1)).alias("dedup_key"),
        # VWAP check: kline VWAP = quote_volume / volume (transformer.py:134-135)
        r6(
            F.element_at(k, 8).cast("double") / F.element_at(k, 6).cast("double")
        ).alias("vwap"),
    )


PARSE_KLINES_ORACLE_BODY = """
SELECT symbol, interval,
       CAST(k[1] AS BIGINT)  AS open_time,
       round(CAST(k[2] AS DOUBLE), 6) AS open_price,
       round(CAST(k[3] AS DOUBLE), 6) AS high_price,
       round(CAST(k[4] AS DOUBLE), 6) AS low_price,
       round(CAST(k[5] AS DOUBLE), 6) AS close_price,
       round(CAST(k[6] AS DOUBLE), 6) AS volume,
       CAST(k[7] AS BIGINT)  AS close_time,
       round(CAST(k[8] AS DOUBLE), 6) AS quote_volume,
       CAST(k[9] AS INTEGER) AS trade_count,
       round(CAST(k[10] AS DOUBLE), 6) AS taker_buy_base_volume,
       round(CAST(k[11] AS DOUBLE), 6) AS taker_buy_quote_volume,
       concat(symbol, '_', interval, '_', k[1]) AS dedup_key,
       round(CAST(k[8] AS DOUBLE) / CAST(k[6] AS DOUBLE), 6) AS vwap
FROM kline_wire"""


def decimal_string_format(trades: DataFrame) -> DataFrame:
    """P4: numeric → fixed 8-dp string with trailing zeros stripped
    (binance_sbe.py:339-352): 451.95 → '451.95', 100.0 → '100'."""

    def fmt(c):
        s = F.format_number(c, 8)  # 8 dp, but inserts thousands separators
        s = F.regexp_replace(s, ",", "")
        s = F.regexp_replace(s, r"0+$", "")
        return F.regexp_replace(s, r"\.$", "")

    return trades.select(
        "symbol",
        "trade_id",
        fmt(F.col("price")).alias("price_str"),
        fmt(F.col("qty")).alias("qty_str"),
    )


DECIMAL_STRING_ORACLE_BODY = """
SELECT symbol, trade_id,
       regexp_replace(regexp_replace(printf('%.8f', price), '0+$', ''), '\\.$', '')
           AS price_str,
       regexp_replace(regexp_replace(printf('%.8f', qty), '0+$', ''), '\\.$', '')
           AS qty_str
FROM valid_trades"""
