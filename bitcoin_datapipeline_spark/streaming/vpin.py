"""Streaming VPIN — the live form of operators/aggregates.vpin.

VPIN is an early-warning metric: its whole point is to be watched LIVE
(flow toxicity spikes precede liquidity events), so the volume-clock
bucketing must run incrementally.  Per-symbol state is exact and O(window):

- the cumulative volume, in INTEGER 1e-4 units (the qty grid) — float
  accumulation would drift from the batch twin's DECIMAL cumsum; integer
  units make every bucket assignment and imbalance bit-reproducible;
- the currently-open bucket's partial counts (id, trades, buy/sell units);
- a ring of the last ``window − 1`` CLOSED buckets' (imbalance, volume)
  units backing the trailing estimate.

A bucket row is emitted the moment a trade STARTS a later bucket (the
volume clock passed it) — append-mode semantics: emitted rows are final.
The batch twin additionally reports each symbol's still-open last bucket;
the equivalence test compares against batch minus that partial tail.

Events are processed in (event_ts, trade_id) order within each
micro-batch, chunks accumulated before sorting (the same Arrow-boundary
hazard as streaming/grid.py); ordering across batches follows the feed.

cf. reference: the aggregator's live imbalance feature
(feature_builder.py:160-161) on the wall clock; this is its
volume-clock upgrade with bounded state, same Redis-hash-sized bound.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.aggregates import VPIN_BUCKET_VOLUME, VPIN_WINDOW

# qty grid: 1e-4 (FIXTURES.md).  Integer units assume qty sits on a <=4dp
# grid — there float->int rounding has no ties, so it agrees with the
# batch twin's CAST(qty AS DECIMAL(20,4)) exactly; an off-grid feed would
# need UNITS raised to its grid.
UNITS = 10_000

VPIN_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("n_trades", T.LongType()),
        T.StructField("bucket_volume", T.DoubleType()),
        T.StructField("imbalance", T.DoubleType()),
        T.StructField("n_in_window", T.LongType()),
        T.StructField("vpin", T.DoubleType()),
    ]
)

VPIN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cum_units", T.LongType()),
        T.StructField("cur_bucket", T.LongType()),
        T.StructField("cur_n", T.LongType()),
        T.StructField("cur_buy", T.LongType()),
        T.StructField("cur_sell", T.LongType()),
        T.StructField("ring_imb", T.ArrayType(T.LongType())),
        T.StructField("ring_vol", T.ArrayType(T.LongType())),
    ]
)


def make_vpin_processor(
    bucket_volume: int = VPIN_BUCKET_VOLUME, window: int = VPIN_WINDOW
):
    v_units = bucket_volume * UNITS

    def fn(key, pdfs, state: GroupState):
        symbol = key[0]
        chunks = [
            pdf[["event_ts", "trade_id", "qty", "is_buyer_maker"]]
            for pdf in pdfs
            if len(pdf)
        ]
        if not chunks:
            yield pd.DataFrame(
                [], columns=[f.name for f in VPIN_OUTPUT_SCHEMA.fields]
            )
            return
        ev = pd.concat(chunks, ignore_index=True).sort_values(
            ["event_ts", "trade_id"], kind="mergesort"
        )
        if state.exists:
            cum, cur_b, cur_n, buy, sell, ring_imb, ring_vol = state.get
            ring_imb, ring_vol = list(ring_imb), list(ring_vol)
        else:
            cum, cur_b, cur_n, buy, sell = 0, None, 0, 0, 0
            ring_imb, ring_vol = [], []

        rows = []

        def close_bucket():
            nonlocal cur_n, buy, sell
            imb = abs(buy - sell)
            vol = buy + sell
            w_imb = sum(ring_imb) + imb
            w_vol = sum(ring_vol) + vol
            rows.append((
                symbol,
                int(cur_b),
                int(cur_n),
                vol / UNITS,
                imb / UNITS,
                len(ring_imb) + 1,
                (w_imb / UNITS) / (w_vol / UNITS),
            ))
            ring_imb.append(imb)
            ring_vol.append(vol)
            del ring_imb[: max(0, len(ring_imb) - (window - 1))]
            del ring_vol[: max(0, len(ring_vol) - (window - 1))]
            cur_n, buy, sell = 0, 0, 0

        for qty, maker in zip(ev["qty"], ev["is_buyer_maker"]):
            units = int(round(float(qty) * UNITS))
            b = cum // v_units
            if cur_b is None:
                cur_b = b
            elif b != cur_b:
                close_bucket()
                cur_b = b
            cur_n += 1
            if maker:
                sell += units
            else:
                buy += units
            cum += units
        state.update((
            int(cum), int(cur_b), int(cur_n), int(buy), int(sell),
            ring_imb, ring_vol,
        ))
        yield pd.DataFrame(
            rows, columns=[f.name for f in VPIN_OUTPUT_SCHEMA.fields]
        )

    return fn


def stream_vpin(
    trades: DataFrame,
    bucket_volume: int = VPIN_BUCKET_VOLUME,
    window: int = VPIN_WINDOW,
) -> DataFrame:
    """Incremental volume-clock VPIN (see module docstring).  Emits one
    final row per COMPLETED bucket; batch-equivalence (minus each
    symbol's open tail bucket) pinned in tests/test_streaming.py."""
    return trades.groupBy("symbol").applyInPandasWithState(
        make_vpin_processor(bucket_volume, window),
        outputStructType=VPIN_OUTPUT_SCHEMA,
        stateStructType=VPIN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
