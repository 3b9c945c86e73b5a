"""Stateful order-book maintenance (SURVEY §2.10 "stateful ops").

The reference's aggregator keeps a mutable per-symbol order book in memory,
applying each depth delta as it arrives and serving the top-10 levels to the
feature builder (aggregator/README.md depth processing;
docs/architecture/DATA_PIPELINE.md:73-107 — `ob:{symbol}` Redis hash with
absolute-quantity updates where qty=0 deletes a level).

Engine form: a keyed state machine on ``applyInPandasWithState`` —

- state  = the full book per symbol (two parallel price/qty arrays per
  side; a fixed struct schema so the state store can serialize it);
- input  = depth deltas (symbol, seq, side, price, qty), absolute-quantity
  semantics: qty > 0 upserts the level, qty == 0 removes it;
- output = one top-of-book snapshot per symbol per micro-batch (best bid/
  ask, top-5 depth sums, imbalance) — the same columns the batch A3
  operator derives from full snapshots.

Deltas are applied in (seq) order within each batch; state carries the last
applied seq so replayed/out-of-order deltas at-or-below it are dropped —
the re-anchor boundary the reference guards with sequence-id gap checks
(kinesis_consumer sequence resume + gap_detector).

This is the designated imperative escape hatch (custom mutable state has no
declarative form); everything per-batch is still Arrow-batched, and state
size is bounded by book depth, not stream length.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DELTA_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("side", T.StringType()),  # 'bid' | 'ask'
        T.StructField("price", T.DoubleType()),
        T.StructField("qty", T.DoubleType()),   # absolute; 0 removes level
    ]
)

BOOK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_seq", T.LongType()),
        T.StructField("bid_prices", T.ArrayType(T.DoubleType())),
        T.StructField("bid_qtys", T.ArrayType(T.DoubleType())),
        T.StructField("ask_prices", T.ArrayType(T.DoubleType())),
        T.StructField("ask_qtys", T.ArrayType(T.DoubleType())),
    ]
)

BOOK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("last_seq", T.LongType()),
        T.StructField("n_bid_levels", T.IntegerType()),
        T.StructField("n_ask_levels", T.IntegerType()),
        T.StructField("best_bid", T.DoubleType()),
        T.StructField("best_ask", T.DoubleType()),
        T.StructField("bid_depth_5", T.DoubleType()),
        T.StructField("ask_depth_5", T.DoubleType()),
        T.StructField("depth_imbalance", T.DoubleType()),
        # a crossed book (best_bid >= best_ask) signals feed corruption →
        # the re-anchor trigger alongside sequence gaps
        T.StructField("is_crossed", T.BooleanType()),
    ]
)


def apply_deltas(book: dict[str, dict[float, float]], rows) -> int:
    """Apply (seq-ordered) absolute-quantity deltas to a {side: {price: qty}}
    book in place; returns the last applied seq."""
    last = -1
    for seq, side, price, qty in rows:
        levels = book[side]
        if qty == 0.0:
            levels.pop(price, None)
        else:
            levels[price] = qty
        last = seq
    return last


def snapshot(symbol: str, last_seq: int, book: dict[str, dict[float, float]]):
    bids = sorted(book["bid"].items(), key=lambda pq: -pq[0])
    asks = sorted(book["ask"].items(), key=lambda pq: pq[0])
    bid5 = sum(q for _, q in bids[:5])
    ask5 = sum(q for _, q in asks[:5])
    bid_all = sum(q for _, q in bids)
    ask_all = sum(q for _, q in asks)
    denom = max(bid_all + ask_all, 1.0)
    best_bid = bids[0][0] if bids else None
    best_ask = asks[0][0] if asks else None
    return (
        symbol,
        last_seq,
        len(bids),
        len(asks),
        best_bid,
        best_ask,
        bid5,
        ask5,
        (bid_all - ask_all) / denom,
        (best_bid is not None and best_ask is not None and best_bid >= best_ask),
    )


def make_book_updater():
    def fn(key, pdfs, state: GroupState):
        symbol = key[0]
        if state.exists:
            last_seq, bp, bq, ap, aq = state.get
            book = {"bid": dict(zip(bp, bq)), "ask": dict(zip(ap, aq))}
        else:
            last_seq = -1
            book = {"bid": {}, "ask": {}}
        rows = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                rows.append((r.seq, r.side, r.price, r.qty))
        # apply strictly ascending, dropping replays at-or-below the
        # persisted seq (idempotent under source re-delivery)
        rows = sorted(r for r in rows if r[0] > last_seq)
        if rows:
            last_seq = apply_deltas(book, rows)
        state.update(
            (
                last_seq,
                list(book["bid"].keys()),
                list(book["bid"].values()),
                list(book["ask"].keys()),
                list(book["ask"].values()),
            )
        )
        yield pd.DataFrame(
            [snapshot(symbol, last_seq, book)],
            columns=[f.name for f in BOOK_OUTPUT_SCHEMA.fields],
        )

    return fn


def stream_order_book(deltas: DataFrame) -> DataFrame:
    """Depth-delta stream → per-symbol top-of-book snapshots (update-mode
    custom stateful operator)."""
    return deltas.groupBy("symbol").applyInPandasWithState(
        make_book_updater(),
        outputStructType=BOOK_OUTPUT_SCHEMA,
        stateStructType=BOOK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
