"""Flagship pipeline correctness on hand-checkable data + sf0.001 smoke."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from bitcoin_datapipeline_spark.functions.normalize import valid_trades
from bitcoin_datapipeline_spark.operators.aggregates import bars_1m
from bitcoin_datapipeline_spark.operators.dedup import dedup_trades
from bitcoin_datapipeline_spark.plans.pipeline import bars_pipeline


def _trade(symbol, event_ts, trade_id, price, qty, maker, source="sbe", ingest=None):
    return Row(
        symbol=symbol,
        event_ts=event_ts,
        ingest_ts=ingest if ingest is not None else event_ts + 1,
        trade_id=trade_id,
        price=float(price),
        qty=float(qty),
        is_buyer_maker=maker,
        source=source,
    )


@pytest.fixture()
def tiny_trades(spark):
    # one symbol, one minute bucket (bucket 0 = ms [0, 60000))
    rows = [
        _trade("BTC", 1000, 1, 100.0, 2.0, False),   # taker buy, first → open
        _trade("BTC", 2000, 2, 110.0, 1.0, True),    # taker sell, high
        _trade("BTC", 3000, 3, 90.0, 3.0, True),     # low
        _trade("BTC", 4000, 4, 105.0, 4.0, False),   # last → close
        _trade("BTC", 4500, 4, 999.0, 9.0, False),   # duplicate trade_id → dropped
    ]
    return spark.createDataFrame(rows)


def test_bars_1m_exact(tiny_trades):
    out = bars_1m(dedup_trades(tiny_trades)).collect()
    assert len(out) == 1
    b = out[0].asDict()
    assert b["symbol"] == "BTC" and b["bucket"] == 0
    assert b["open"] == 100.0 and b["close"] == 105.0
    assert b["high"] == 110.0 and b["low"] == 90.0
    assert b["volume"] == 10.0
    # notional = 100*2 + 110*1 + 90*3 + 105*4 = 1000
    assert b["notional"] == 1000.0
    assert b["vwap"] == 100.0
    assert b["trade_count"] == 4
    assert b["buy_volume"] == 6.0 and b["sell_volume"] == 4.0
    assert b["buy_trade_count"] == 2 and b["sell_trade_count"] == 2
    assert b["volume_imbalance"] == round((6.0 - 4.0) / 10.0, 6)
    assert b["price_range"] == 20.0
    assert b["price_change"] == 5.0
    assert b["price_change_pct"] == 5.0


def test_dedup_first_wins(spark):
    rows = [
        _trade("BTC", 5000, 7, 50.0, 1.0, False),
        _trade("BTC", 1000, 7, 40.0, 1.0, False),  # earlier → survives
        _trade("ETH", 1000, 7, 30.0, 1.0, False),  # other symbol untouched
    ]
    out = dedup_trades(spark.createDataFrame(rows)).orderBy("symbol").collect()
    assert [(r.symbol, r.price) for r in out] == [("BTC", 40.0), ("ETH", 30.0)]


def test_validate_filter_drops_bad_rows(spark):
    from bitcoin_datapipeline_spark.functions.normalize import valid_filter

    rows = [
        _trade("BTC", 1577836800000, 1, 10.0, 1.0, False),    # valid (2020)
        _trade("BTC", 1577836800000, 2, -1.0, 1.0, False),    # bad price
        _trade("BTC", 1577836800000, 3, 10.0, 0.0, False),    # zero qty
        _trade("BTC", 1000, 4, 10.0, 1.0, False),             # ts before 2020
        _trade("BTC", 1993456000000, 5, 10.0, 1.0, False),    # ts after 2030
    ]
    out = spark.createDataFrame(rows).filter(valid_filter()).collect()
    assert [r.trade_id for r in out] == [1]


def test_flagship_smoke_sf0001(spark, sf_dir):
    df = bars_pipeline(spark, sf_dir)
    rows = df.count()
    assert rows > 0
    cols = set(df.columns)
    assert {"symbol", "bucket", "open", "high", "low", "close", "vwap"} <= cols


def test_normalize_schema(spark, sf_dir):
    from bitcoin_datapipeline_spark.tables import table

    t = valid_trades(table(spark, sf_dir, "events"))
    assert [f.name for f in t.schema.fields] == [
        "symbol", "event_ts", "ingest_ts", "trade_id",
        "price", "qty", "is_buyer_maker", "source",
    ]
    assert t.count() > 0
