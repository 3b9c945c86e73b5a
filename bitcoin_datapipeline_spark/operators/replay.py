"""Batch order-book replay — reconstruct book state at time t from a
level-update log (the batch twin of ``streaming/orderbook.py``).

The reference maintains a live top-10 book by applying depth deltas in
sequence order on top of a REST snapshot
(docs/architecture/DATA_PIPELINE.md:73-107).  The batch question it answers
offline is "what did the book look like at time t?" — replay the update log
up to t and read the levels.

Spark-first replay, with *no* per-row Python and no iterative driver loop:

1. **Explode the delta log to level grain** — ``posexplode`` each depth
   message's bids/asks into (symbol, side, level, event_ts, price, qty)
   rows.  A depth message IS a batch of level updates; exploding recovers
   the per-level update stream the streaming operator consumes one-by-one.
2. **Last update per (symbol, side, level, minute)** — ``max_by(·,
   event_ts)``: one shuffle with map-side partial aggregation; at
   production rates this compresses the log from per-message to per-minute
   grain before any window runs.
3. **LOCF across the minute grid per (symbol, side, level)** — a level not
   touched in minute m keeps its last set (price, qty): exactly the
   streaming book's state-carry semantics, expressed as the same
   ``last(ignorenulls)`` pattern as ``operators/grid.py``.  The window key
   has symbols × sides × levels partitions — more parallelism, less skew
   than per-symbol windows.
4. **Re-aggregate per (symbol, minute)** into book metrics (best bid/ask,
   spread/mid, per-side qty and notional depth, imbalance).  Qty/value
   sums go through DECIMAL(38,12) so the 10-way sums are order-insensitive
   and bit-identical across engines.

At 100 TB: every stage is keyed by (symbol, side, level[, minute]) — the
shuffles are fine-grained and skew-resistant, the grid is wall-clock-bounded
(minutes × 20 level-slots per symbol), and nothing holds more than one
level-minute in window state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import r6

REPLAY_SLICE_MIN = 1_440  # replay horizon: first 24 h of the delta log


def _level_updates(depth: DataFrame, side: str) -> DataFrame:
    col = "bids" if side == "bid" else "asks"
    return depth.select(
        "symbol",
        "event_ts",
        F.lit(side).alias("side"),
        F.posexplode(col).alias("pos", "e"),
    ).select(
        "symbol",
        "event_ts",
        "side",
        (F.col("pos") + 1).cast("int").alias("level"),
        F.col("e.price").alias("price"),
        F.col("e.qty").alias("qty"),
        F.expr("event_ts div 60000").cast("long").alias("minute"),
    )


def orderbook_replay(depth: DataFrame, slice_min: int = REPLAY_SLICE_MIN) -> DataFrame:
    """Book state at the end of every minute, replayed from the level-update
    log (DATA_PIPELINE.md:73-107 apply-deltas-in-order semantics;
    streaming twin: streaming/orderbook.py)."""
    lv = _level_updates(depth, "bid").unionByName(_level_updates(depth, "ask"))

    per_min = lv.groupBy("symbol", "side", "level", "minute").agg(
        F.max_by("price", "event_ts").alias("p"),
        F.max_by("qty", "event_ts").alias("q"),
    )

    g0 = lv.groupBy().agg(F.min("minute").alias("g0"))
    spans = (
        lv.groupBy("symbol")
        .agg(F.min("minute").alias("lo"))
        .join(F.broadcast(g0))
        .select("symbol", "lo", (F.col("g0") + F.lit(slice_min - 1)).alias("hi"))
        .filter(F.col("lo") <= F.col("hi"))
    )
    gridl = (
        spans.select("symbol", F.explode(F.sequence("lo", "hi")).alias("minute"))
        .select(
            "*", F.explode(F.array(F.lit("bid"), F.lit("ask"))).alias("side")
        )
        .select(
            "*",
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("lvl_raw"),
        )
        .select("symbol", "minute", "side", F.col("lvl_raw").cast("int").alias("level"))
    )

    j = gridl.join(per_min, ["symbol", "side", "level", "minute"], "left")
    cum = (
        Window.partitionBy("symbol", "side", "level")
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    book = j.select(
        "symbol",
        "side",
        "level",
        "minute",
        F.last("p", ignorenulls=True).over(cum).alias("price"),
        F.last("q", ignorenulls=True).over(cum).alias("qty"),
    ).filter(F.col("price").isNotNull())

    bid = F.when(F.col("side") == "bid", F.col("price"))
    ask = F.when(F.col("side") == "ask", F.col("price"))
    dec = "decimal(38,12)"
    bid_qty = F.sum(
        F.when(F.col("side") == "bid", F.col("qty")).cast(dec)
    ).cast("double")
    ask_qty = F.sum(
        F.when(F.col("side") == "ask", F.col("qty")).cast(dec)
    ).cast("double")
    bid_val = F.sum(
        F.when(F.col("side") == "bid", F.col("price") * F.col("qty")).cast(dec)
    ).cast("double")
    ask_val = F.sum(
        F.when(F.col("side") == "ask", F.col("price") * F.col("qty")).cast(dec)
    ).cast("double")
    best_bid = F.max(bid)
    best_ask = F.min(ask)
    out = book.groupBy("symbol", "minute").agg(
        best_bid.alias("bb"),
        best_ask.alias("ba"),
        bid_qty.alias("bq"),
        ask_qty.alias("aq"),
        bid_val.alias("bv"),
        ask_val.alias("av"),
        F.sum(F.when(F.col("side") == "bid", 1).otherwise(0))
        .cast("long")
        .alias("bid_levels"),
        F.sum(F.when(F.col("side") == "ask", 1).otherwise(0))
        .cast("long")
        .alias("ask_levels"),
    )
    return out.select(
        "symbol",
        "minute",
        r6(F.col("bb")).alias("best_bid"),
        r6(F.col("ba")).alias("best_ask"),
        r6(F.col("ba") - F.col("bb")).alias("spread"),
        r6((F.col("bb") + F.col("ba")) / 2.0).alias("mid_price"),
        r6(F.col("bq")).alias("bid_qty_total"),
        r6(F.col("aq")).alias("ask_qty_total"),
        r6(F.col("bv")).alias("bid_value"),
        r6(F.col("av")).alias("ask_value"),
        r6((F.col("bq") - F.col("aq")) / (F.col("bq") + F.col("aq"))).alias(
            "book_imbalance"
        ),
        (F.col("bb") >= F.col("ba")).alias("crossed"),
        "bid_levels",
        "ask_levels",
    )
