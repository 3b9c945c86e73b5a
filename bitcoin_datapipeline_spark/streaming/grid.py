"""Streaming twin of the fixed-second LOCF grid (operators/grid.py).

The reference's real-time feature path holds per-symbol last-trade state in
Redis and serves a carried-forward price for every second, gap-flagged when
the state goes stale (DATA_PIPELINE.md:166-169; REDIS_SCHEMA.md feature
keys).  The batch engine resamples offline; this operator produces the SAME
dense per-second rows incrementally from a stream.

``applyInPandasWithState`` with per-symbol state = (last emitted second,
carried price, last trade ts).  Each micro-batch:

1. accumulate the group's chunks, aggregate to per-second last price /
   volume / trade count (vectorized pandas — no per-event Python beyond the
   batch boundary walk);
2. emit one row for EVERY second from the state's frontier through the
   batch's newest active second — carried seconds get the LOCF price,
   volume 0, and a data-age that grows until ``gap_threshold_s`` flips the
   gap flag (exactly operators/grid.locf_resample's columns);
3. advance the state frontier.

Late events older than the frontier are dropped (the batch twin's
watermark policy); re-delivered batches re-emit only seconds past the
frontier, so the output stream is append-consistent under retries.

State is O(1) per symbol regardless of stream volume — the same bound as
the reference's Redis hash — and emission is bounded by wall-clock seconds,
not event count.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GRID_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("feature_ts", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("data_age_ms", T.LongType()),
        T.StructField("gap_indicator", T.BooleanType()),
        T.StructField("volume", T.DoubleType()),
        T.StructField("trades", T.LongType()),
        T.StructField("has_obs", T.BooleanType()),
    ]
)

# (frontier second already emitted, carried price, last trade event_ts ms)
GRID_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_sec", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("last_trade_ts", T.LongType()),
    ]
)


def make_grid_resampler(gap_threshold_s: int = 60):
    gap_ms = gap_threshold_s * 1000

    def fn(key, pdfs, state: GroupState):
        symbol = key[0]
        chunks = [
            pdf[["event_ts", "price", "qty"]]
            for pdf in pdfs
            if len(pdf)
        ]
        if not chunks:
            yield pd.DataFrame(
                [], columns=[f.name for f in GRID_OUTPUT_SCHEMA.fields]
            )
            return
        ev = pd.concat(chunks, ignore_index=True)
        if state.exists:
            last_sec, price, last_ts = state.get
            # late data behind the frontier is dropped (watermark policy)
            ev = ev[ev["event_ts"] // 1000 > last_sec]
        else:
            last_sec, price, last_ts = None, None, None

        rows = []
        if len(ev):
            ev = ev.sort_values("event_ts", kind="mergesort")
            ev["sec"] = ev["event_ts"] // 1000
            per_sec = ev.groupby("sec").agg(
                price=("price", "last"),
                last_ts=("event_ts", "max"),
                volume=("qty", "sum"),
                trades=("qty", "size"),
            )
            start = (
                int(per_sec.index[0]) if last_sec is None else int(last_sec) + 1
            )
            end = int(per_sec.index[-1])
            for sec in range(start, end + 1):
                if sec in per_sec.index:
                    o = per_sec.loc[sec]
                    price = float(o["price"])
                    last_ts = int(o["last_ts"])
                    vol, n, has = float(o["volume"]), int(o["trades"]), True
                else:
                    vol, n, has = 0.0, 0, False
                age = (sec + 1) * 1000 - 1 - last_ts
                rows.append(
                    (symbol, sec, price, age, age > gap_ms, vol, n, has)
                )
            last_sec = end
            state.update((int(last_sec), float(price), int(last_ts)))
        yield pd.DataFrame(
            rows, columns=[f.name for f in GRID_OUTPUT_SCHEMA.fields]
        )

    return fn


def stream_locf_grid(trades: DataFrame, gap_threshold_s: int = 60) -> DataFrame:
    """Dense per-second LOCF rows from a trade stream — the incremental
    form of operators/grid.locf_resample (same columns, same carry/gap
    semantics), verified row-for-row against the batch twin in
    tests/test_streaming.py."""
    return trades.groupBy("symbol").applyInPandasWithState(
        make_grid_resampler(gap_threshold_s),
        outputStructType=GRID_OUTPUT_SCHEMA,
        stateStructType=GRID_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RETURNS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("feature_ts", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("ret_1s", T.DoubleType()),
        T.StructField("ret_5s", T.DoubleType()),
        T.StructField("ret_10s", T.DoubleType()),
        T.StructField("gap_indicator", T.BooleanType()),
    ]
)

# grid frontier + a bounded ring of the last max(horizon) carried prices
RETURNS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_sec", T.LongType()),
        T.StructField("last_trade_ts", T.LongType()),
        T.StructField("hist", T.ArrayType(T.DoubleType())),
    ]
)

RET_HORIZONS_S = (1, 5, 10)


def make_returns_resampler(gap_threshold_s: int = 60):
    """Streaming k-second returns at grid grain — the live form of the
    reference's Redis ``ret_1s``/``ret_5s``/``ret_10s`` feature fields
    (REDIS_SCHEMA.md feat hash; batch twin: operators/grid.grid_returns).

    State per symbol = the LOCF frontier plus a bounded price ring of the
    last max(horizon) grid prices — O(60 doubles), the Redis-hash bound.
    Returns over carried prices are exactly 0 (log p/p), matching the batch
    twin; a horizon reaching before the symbol's first print yields NULL."""
    import math

    gap_ms = gap_threshold_s * 1000
    max_h = max(RET_HORIZONS_S)

    def fn(key, pdfs, state: GroupState):
        symbol = key[0]
        chunks = [pdf[["event_ts", "price"]] for pdf in pdfs if len(pdf)]
        if not chunks:
            yield pd.DataFrame(
                [], columns=[f.name for f in RETURNS_OUTPUT_SCHEMA.fields]
            )
            return
        ev = pd.concat(chunks, ignore_index=True)
        if state.exists:
            last_sec, last_ts, hist = state.get
            hist = list(hist)
            ev = ev[ev["event_ts"] // 1000 > last_sec]
        else:
            last_sec, last_ts, hist = None, None, []

        rows = []
        if len(ev):
            ev = ev.sort_values("event_ts", kind="mergesort")
            ev["sec"] = ev["event_ts"] // 1000
            per_sec = ev.groupby("sec").agg(
                price=("price", "last"), last_ts=("event_ts", "max")
            )
            start = (
                int(per_sec.index[0]) if last_sec is None else int(last_sec) + 1
            )
            end = int(per_sec.index[-1])
            price = hist[-1] if hist else None
            for sec in range(start, end + 1):
                if sec in per_sec.index:
                    o = per_sec.loc[sec]
                    price = float(o["price"])
                    last_ts = int(o["last_ts"])
                hist.append(price)
                rets = []
                for h in RET_HORIZONS_S:
                    prev = hist[-h - 1] if len(hist) > h else None
                    rets.append(
                        math.log(price / prev) if prev is not None else None
                    )
                age = (sec + 1) * 1000 - 1 - last_ts
                rows.append((symbol, sec, price, *rets, age > gap_ms))
            hist = hist[-(max_h + 1):]
            state.update((int(end), int(last_ts), hist))
        yield pd.DataFrame(
            rows, columns=[f.name for f in RETURNS_OUTPUT_SCHEMA.fields]
        )

    return fn


def stream_grid_returns(trades: DataFrame, gap_threshold_s: int = 60) -> DataFrame:
    """Per-second streaming returns over the LOCF grid (live twin of
    operators/grid.grid_returns for horizons {1,5,10} s)."""
    return trades.groupBy("symbol").applyInPandasWithState(
        make_returns_resampler(gap_threshold_s),
        outputStructType=RETURNS_OUTPUT_SCHEMA,
        stateStructType=RETURNS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
