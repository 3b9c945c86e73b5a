"""Deduplication operators (SURVEY §2.3, D1-D3).

The reference dedups every stream with an in-memory per-symbol id window
(`src/bitcoin_datapipeline/utils/deduplication.py:55-104` — duplicate iff the
same id was seen within 3600 s, LRU-capped at 100k ids/symbol) and again at
the sink via a unique index `(symbol, timestamp, data_type,
COALESCE(trade_id,0))` (`services/data_connector/src/db_writer.py:131-135`).

Engine mapping:
- batch: keep the EARLIEST record per (symbol, trade_id) — deterministic
  (the reference keeps first-seen by arrival; event-time order is this
  engine's arrival order, per SURVEY §7.4: event-time, not wall-clock).
- streaming: ``withWatermark + dropDuplicatesWithinWatermark`` (see
  streaming/ops.py) — the watermark IS the 3600 s window, the state store
  IS the LRU map, with spill instead of silent eviction.

Scale note (100 TB): the window ranks within (symbol, trade_id) hash
partitions — one shuffle, no skew risk beyond symbol hotness (symbol alone
is low-cardinality, but (symbol, trade_id) is effectively unique so the
shuffle is uniform).  `dropDuplicates` would avoid the sort but is
non-deterministic about WHICH duplicate survives; the reference's contract
(first wins) requires the rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_first_wins(df: DataFrame, keys: list[str], order: list[str]) -> DataFrame:
    """Keep the first row per key under `order` (D1 general form)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_trades(trades: DataFrame) -> DataFrame:
    """D1: earliest record wins per (symbol, trade_id)."""
    return dedup_first_wins(trades, ["symbol", "trade_id"], ["event_ts", "ingest_ts"])


def sink_key_stats(trades: DataFrame) -> DataFrame:
    """D2: duplicate accounting on the curated-sink composite key
    (symbol, event_ts, source, coalesce(trade_id, 0)) — the engine's analog
    of unique-violation skip counting (db_writer.py:205-208)."""
    keyed = trades.groupBy(
        "symbol",
        "event_ts",
        "source",
        F.coalesce(F.col("trade_id"), F.lit(0)).alias("k_trade_id"),
    ).agg(F.count("*").alias("n"))
    return keyed.groupBy("symbol").agg(
        F.sum("n").cast("long").alias("total_rows"),
        F.count("*").cast("long").alias("distinct_keys"),
        (F.sum("n") - F.count("*")).cast("long").alias("duplicate_rows"),
    )
