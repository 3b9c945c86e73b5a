"""Bucketing / categorization + curated-type casts (P6, P11, P4).

Reference: trade_size_category small/medium/large
(docs/schemas/S3_SCHEMA.md:488), volatility buckets (:644-646) and
market-regime labels (RDS_SCHEMA.md:682-691) are `CASE WHEN` chains; the
curated Postgres sink stores prices as DECIMAL(20,8) via Python `Decimal`
coercion (services/data_connector/src/transformer.py:217-239,
db_writer.py:79-111).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import r6

# notional thresholds for trade-size buckets
SMALL_MAX = 1000.0
MEDIUM_MAX = 5000.0


def categorize(trades: DataFrame) -> DataFrame:
    notional = F.col("price") * F.col("qty")
    size_cat = (
        F.when(notional < SMALL_MAX, "small")
        .when(notional < MEDIUM_MAX, "medium")
        .otherwise("large")
    )
    px_band = (
        F.when(F.col("price") < 50.0, "low")
        .when(F.col("price") < 150.0, "mid")
        .otherwise("high")
    )
    return trades.select(
        "symbol",
        "trade_id",
        "event_ts",
        r6(notional).alias("notional"),
        size_cat.alias("trade_size_category"),
        px_band.alias("price_band"),
        F.when(F.col("is_buyer_maker"), "sell").otherwise("buy").alias("taker_side"),
    )


CATEGORIZE_ORACLE_BODY = f"""
SELECT symbol, trade_id, event_ts,
       round(price * qty, 6) AS notional,
       CASE WHEN price * qty < {SMALL_MAX} THEN 'small'
            WHEN price * qty < {MEDIUM_MAX} THEN 'medium'
            ELSE 'large' END AS trade_size_category,
       CASE WHEN price < 50.0 THEN 'low'
            WHEN price < 150.0 THEN 'mid'
            ELSE 'high' END AS price_band,
       CASE WHEN is_buyer_maker THEN 'sell' ELSE 'buy' END AS taker_side
FROM valid_trades"""


def decimal_cast(trades: DataFrame) -> DataFrame:
    """P6: curated-sink safe cast — DECIMAL(20,8) for price/qty/notional.

    Matches the transformer's Decimal coercion contract: garbage/overflow →
    NULL (Spark's cast-to-decimal null-on-overflow == the reference's
    `None` on InvalidOperation, transformer.py:230-239).
    """
    dec = T.DecimalType(20, 8)
    # Round-trip back to double for the oracle comparison: DuckDB's pandas
    # bridge renders DECIMAL as float64 while Spark yields Decimal objects,
    # so raw decimals can't be value-compared across engines.  The cast
    # itself (with its null-on-overflow contract) is still exercised.
    return trades.select(
        "symbol",
        "trade_id",
        "event_ts",
        F.col("price").cast(dec).cast("double").alias("price_dec8"),
        F.col("qty").cast(dec).cast("double").alias("qty_dec8"),
        (F.col("price") * F.col("qty")).cast(dec).cast("double").alias("notional_dec8"),
    )


DECIMAL_ORACLE_BODY = """
SELECT symbol, trade_id, event_ts,
       CAST(CAST(price AS DECIMAL(20,8)) AS DOUBLE)       AS price_dec8,
       CAST(CAST(qty AS DECIMAL(20,8)) AS DOUBLE)         AS qty_dec8,
       CAST(CAST(price * qty AS DECIMAL(20,8)) AS DOUBLE) AS notional_dec8
FROM valid_trades"""
