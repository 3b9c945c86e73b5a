"""Batch order-book replay — reconstruct book state at time t from a
depth-update log (the batch twin of ``streaming/orderbook.py``).

The reference maintains a live top-10 book by applying depth deltas in
sequence order on top of a REST snapshot
(docs/architecture/DATA_PIPELINE.md:73-107).  The batch question it answers
offline is "what did the book look like at time t?" — replay the update log
up to t and read the levels.

Spark-first replay, with *no* per-row Python and no iterative driver loop:

1. **Last message per (symbol, minute)** — ``max_by(struct(bids, asks),
   event_ts)``: one shuffle with map-side partial aggregation.  Each depth
   message carries the full level set, so the minute's closing book IS the
   last message's levels — the aggregation legitimately collapses the log
   BEFORE any explode (100 k messages → one row per symbol-minute).  For a
   SPARSE per-level delta log (messages touching single levels), move the
   explode above the aggregate and key it by (symbol, side, level, minute)
   — same plan shape one grain finer; the DuckDB oracle is written at that
   level grain and proves the two are equivalent on this log.
2. **Explode the per-minute book to level grain** — one ``explode`` over
   the concatenated per-side struct arrays, each struct carrying its own
   per-side level index (bounded: levels × 2 rows per symbol-minute).
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

At 100 TB: the message log collapses to symbol-minute grain in stage 1's
single combinable shuffle; everything after is bounded by wall-clock
(minutes × 20 level-slots per symbol), not by message volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import r6

REPLAY_SLICE_MIN = 1_440  # replay horizon: first 24 h of the delta log


def orderbook_replay(
    depth: DataFrame, slice_min: int | None = REPLAY_SLICE_MIN
) -> DataFrame:
    """Book state at the end of every minute, replayed from the depth-update
    log (DATA_PIPELINE.md:73-107 apply-deltas-in-order semantics;
    streaming twin: streaming/orderbook.py).  ``slice_min=None`` replays to
    the last observed minute (full span)."""
    minute = F.expr("event_ts div 60000").cast("long")
    last_msg = depth.groupBy("symbol", minute.alias("minute")).agg(
        F.max_by(F.struct("bids", "asks"), "event_ts").alias("m")
    )
    # level index is embedded per SIDE at construction — robust to books
    # that are not exactly 10 deep on both sides (a pos%10 trick would
    # mislabel asks whenever the bid side is short)
    sided = F.expr(
        "concat(transform(m.bids, (b, i) -> struct('bid' as side, i + 1 as level,"
        "                                          b.price as price, b.qty as qty)),"
        "       transform(m.asks, (a, i) -> struct('ask' as side, i + 1 as level,"
        "                                          a.price as price, a.qty as qty)))"
    )
    per_min = last_msg.select(
        "symbol", "minute", F.explode(sided).alias("e")
    ).select(
        "symbol",
        "minute",
        F.col("e.side").alias("side"),
        F.col("e.level").cast("int").alias("level"),
        F.col("e.price").alias("p"),
        F.col("e.qty").alias("q"),
    )

    # grid bounds from the unexploded message stream (column-pruned scan)
    minutes = depth.select("symbol", minute.alias("minute"))
    if slice_min is None:
        bounds = minutes.groupBy().agg(F.max("minute").alias("hi"))
        spans = (
            minutes.groupBy("symbol")
            .agg(F.min("minute").alias("lo"))
            .join(F.broadcast(bounds))
            .select("symbol", "lo", "hi")
        )
    else:
        g0 = minutes.groupBy().agg(F.min("minute").alias("g0"))
        spans = (
            minutes.groupBy("symbol")
            .agg(F.min("minute").alias("lo"))
            .join(F.broadcast(g0))
            .select("symbol", "lo", (F.col("g0") + F.lit(slice_min - 1)).alias("hi"))
            .filter(F.col("lo") <= F.col("hi"))
        )
    gridl = (
        spans.select("symbol", F.explode(F.sequence("lo", "hi")).alias("minute"))
        .select("*", F.explode(F.array(F.lit("bid"), F.lit("ask"))).alias("side"))
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
    out = book.groupBy("symbol", "minute").agg(
        F.max(bid).alias("bb"),
        F.min(ask).alias("ba"),
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
