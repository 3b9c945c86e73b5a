"""Incremental high-watermark checkpointing (S10 + A6).

Reference: `services/rest_ingestor/src/checkpoint.py` persists
`{symbol → last_timestamp}` JSON and resumes collection from it minus a
5-minute overlap (scheduler.py:66-81); the ETL side derives its resume
point as `MAX(timestamp) WHERE symbol=?` (db_writer.py:287-302).

Engine form: the SINK is the checkpoint — the high-watermark is
`max(event_ts) per key` over the already-written output, so resume state
can never diverge from the data (the reference's separate checkpoint file
can).  The overlap re-read stays idempotent because the write path dedups
(D1), exactly like the reference's overlap + dedup pairing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OVERLAP_MS = 5 * 60_000  # scheduler.py overlap_minutes = 5


def high_watermarks(spark: SparkSession, sink_dir: str) -> dict[str, int]:
    """{symbol → max event_ts} over an existing Parquet sink (empty dict if
    the sink doesn't exist yet — first run collects everything)."""
    if not os.path.exists(sink_dir):
        return {}
    df = spark.read.parquet(sink_dir)
    rows = df.groupBy("symbol").agg(F.max("event_ts").alias("wm")).collect()
    return {r["symbol"]: r["wm"] for r in rows}


def incremental_filter(
    trades: DataFrame, watermarks: dict[str, int], overlap_ms: int = OVERLAP_MS
) -> DataFrame:
    """Keep rows newer than each symbol's watermark minus the overlap.
    Symbols without a watermark (including NULL symbols) pass through
    entirely.

    Implemented as a broadcast left join against a watermark table rather
    than an OR-chain predicate: per-symbol Column conditions would grow the
    Catalyst expression tree linearly with key count, and `isin`-based
    passthrough silently drops NULL-symbol rows (NULL predicate → filtered).
    """
    if not watermarks:
        return trades
    spark = trades.sparkSession
    wm_df = spark.createDataFrame(
        [(sym, wm) for sym, wm in watermarks.items()], "symbol string, __wm long"
    )
    joined = trades.join(F.broadcast(wm_df), on="symbol", how="left")
    keep = F.col("__wm").isNull() | (F.col("event_ts") > F.col("__wm") - overlap_ms)
    return joined.filter(keep).drop("__wm")


def incremental_append(
    spark: SparkSession, trades: DataFrame, sink_dir: str, keys: list[str]
) -> int:
    """One incremental cycle: watermark → overlap re-read → dedup against
    the increment AND the already-written sink tail → append.  Returns rows
    written.

    The anti-join against the sink tail is what makes the overlap re-read
    actually idempotent (the reference gets this from its unique index,
    db_writer.py:131-135; Parquet has no constraints, so the "index probe"
    is an explicit anti join).  Only the overlap window of the sink is
    re-read — the probe cost is bounded by overlap size, not sink size
    (partition/row-group pruning on event_ts serves it at scale)."""
    wms = high_watermarks(spark, sink_dir)
    inc = incremental_filter(trades, wms).dropDuplicates(keys)
    if wms and os.path.exists(sink_dir):
        tail_min = min(wms.values()) - OVERLAP_MS
        sink_tail = (
            spark.read.parquet(sink_dir)
            .filter(F.col("event_ts") > tail_min)
            .select(keys)
        )
        inc = inc.join(sink_tail, on=keys, how="left_anti")
    n = inc.count()
    if n:
        inc.write.mode("append").parquet(sink_dir)
    return n
