"""Exact-value unit tests for feature aggregations (A1-A3, A8-A12, P6-P8, P11)."""

from __future__ import annotations

from pyspark.sql import Row

from bitcoin_datapipeline_spark.functions.categorize import categorize, decimal_cast
from bitcoin_datapipeline_spark.functions.timeparts import derived_time
from bitcoin_datapipeline_spark.operators.aggregates import (
    bba_features,
    depth_features,
    latency_percentiles,
    price_qty_corr,
    trade_features,
)


def _trade(symbol, event_ts, trade_id, price, qty, maker, ingest=None):
    return Row(
        symbol=symbol,
        event_ts=event_ts,
        ingest_ts=ingest if ingest is not None else event_ts,
        trade_id=trade_id,
        price=float(price),
        qty=float(qty),
        is_buyer_maker=maker,
        source="sbe",
    )


def test_trade_features_exact(spark):
    rows = [
        _trade("BTC", 0, 1, 100.0, 1.0, False),
        _trade("BTC", 10_000, 2, 120.0, 3.0, True),
    ]
    f = trade_features(spark.createDataFrame(rows), bucket_ms=3_600_000).collect()[0].asDict()
    assert f["trade_count"] == 2
    assert f["latest_price"] == 120.0
    assert f["volume"] == 4.0
    assert f["vwap"] == round((100.0 * 1 + 120.0 * 3) / 4.0, 6)  # 115.0
    assert f["price_change"] == 20.0
    assert f["price_change_pct"] == 20.0
    assert f["volume_imbalance"] == round((1.0 - 3.0) / 4.0, 6)
    # span 10 s → 2 trades / 10 s
    assert f["trades_per_second"] == 0.2
    assert f["avg_trade_size"] == 2.0


def test_bba_features_latest_sizes(spark):
    # regression guard for the reference's latest_bid_size NameError
    # (feature_builder.py:274-275) — intended semantics: LAST observed size.
    rows = [
        Row(symbol="BTC", event_ts=0, ingest_ts=0, bid_px=99.0, bid_sz=5.0,
            ask_px=101.0, ask_sz=7.0, source="sbe"),
        Row(symbol="BTC", event_ts=1000, ingest_ts=1000, bid_px=100.0, bid_sz=2.0,
            ask_px=102.0, ask_sz=3.0, source="sbe"),
    ]
    f = bba_features(spark.createDataFrame(rows)).collect()[0].asDict()
    assert f["latest_bid"] == 100.0 and f["latest_ask"] == 102.0
    assert f["latest_bid_size"] == 2.0 and f["latest_ask_size"] == 3.0
    assert f["latest_spread"] == 2.0
    assert f["avg_spread"] == 2.0
    assert f["mid_change"] == 1.0  # 100 → 101
    assert f["size_imbalance"] == round((7.0 - 10.0) / 17.0, 6)


def test_depth_features_top5(spark):
    bids = [Row(price=float(100 - i), qty=float(i)) for i in range(1, 11)]
    asks = [Row(price=float(100 + i), qty=float(i)) for i in range(1, 11)]
    rows = [
        Row(symbol="BTC", event_ts=1, last_update_id=1, bids=bids, asks=asks),
        # older snapshot that must be ignored (latest-per-key semantics)
        Row(symbol="BTC", event_ts=0, last_update_id=0,
            bids=[Row(price=1.0, qty=999.0)], asks=[Row(price=2.0, qty=999.0)]),
    ]
    f = depth_features(spark.createDataFrame(rows)).collect()[0].asDict()
    assert f["best_bid"] == 99.0 and f["best_ask"] == 101.0
    assert f["bid_depth_5"] == float(1 + 2 + 3 + 4 + 5)
    assert f["ask_depth_5"] == 15.0
    # symmetric books → zero imbalance
    assert f["depth_imbalance"] == 0.0
    # weighted price over 10 levels: sum(p*q)/sum(q)
    num = sum((100 - i) * i for i in range(1, 11))
    assert f["bid_weighted_price"] == round(num / 55.0, 6)


def test_latency_percentiles_exact(spark):
    rows = [_trade("BTC", 0, i, 10.0, 1.0, False, ingest=lat) for i, lat in
            enumerate([100, 200, 300, 400])]
    f = latency_percentiles(spark.createDataFrame(rows)).collect()[0].asDict()
    assert f["p50_latency_ms"] == 250.0   # interpolated
    assert f["avg_latency_ms"] == 250.0
    assert f["slow_rate"] == 0.5          # 300,400 > 200
    assert f["rms_latency_ms"] == round(((100**2 + 200**2 + 300**2 + 400**2) / 4) ** 0.5, 6)


def test_corr_sign(spark):
    rows = [_trade("BTC", i, i, float(i), float(i), False) for i in range(1, 6)]
    f = price_qty_corr(spark.createDataFrame(rows)).collect()[0].asDict()
    assert f["price_qty_corr"] == 1.0


def test_categorize_buckets(spark):
    rows = [
        _trade("BTC", 0, 1, 10.0, 1.0, False),      # notional 10 → small
        _trade("BTC", 0, 2, 100.0, 20.0, True),     # 2000 → medium
        _trade("BTC", 0, 3, 200.0, 100.0, False),   # 20000 → large
    ]
    out = {r.trade_id: r for r in categorize(spark.createDataFrame(rows)).collect()}
    assert out[1].trade_size_category == "small" and out[1].taker_side == "buy"
    assert out[2].trade_size_category == "medium" and out[2].taker_side == "sell"
    assert out[3].trade_size_category == "large"


def test_decimal_cast_roundtrip(spark):
    rows = [_trade("BTC", 0, 1, 451.95, 6.55, False)]
    f = decimal_cast(spark.createDataFrame(rows)).collect()[0].asDict()
    assert f["price_dec8"] == 451.95
    assert f["notional_dec8"] == round(451.95 * 6.55, 8)


def test_derived_time_integer_arithmetic(spark):
    # 2024-01-01T00:00:00Z was a Monday, hour 0
    ts = 1704067200000
    rows = [_trade("BTC", ts, 1, 1.0, 1.0, False)]
    f = derived_time(spark.createDataFrame(rows)).collect()[0].asDict()
    assert f["hour_of_day"] == 0
    assert f["day_of_week"] == 1  # Monday (0=Sunday)
    assert f["hour_cos"] == 1.0 and f["hour_sin"] == 0.0
    assert f["is_asia_hours"] is True and f["is_us_hours"] is False


def test_resample_bars_composition(spark):
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.aggregates import resample_bars

    def bar(bucket, o, h, l, c, vol):
        return Row(symbol="BTC", bucket=bucket, open=float(o), high=float(h),
                   low=float(l), close=float(c), volume=float(vol),
                   notional=float(vol) * float(c), trade_count=2)

    # minutes 0,1 in hour 0; minute 61 in hour 1
    bars = spark.createDataFrame([
        bar(0, 100, 110, 95, 105, 2.0),
        bar(1, 105, 120, 100, 118, 3.0),
        bar(61, 200, 205, 195, 202, 1.0),
    ])
    out = {r.bucket: r for r in resample_bars(bars).collect()}
    h0 = out[0]
    assert h0.open == 100.0       # first fine bar's open
    assert h0.close == 118.0      # last fine bar's close
    assert h0.high == 120.0 and h0.low == 95.0
    assert h0.volume == 5.0
    assert h0.trade_count == 4 and h0.n_source_bars == 2
    assert out[1].open == 200.0 and out[1].n_source_bars == 1


def test_conversion_funnel_requires_stage_order(spark):
    """A purchase BEFORE the first click must not count as a conversion —
    the funnel is ordered, not a bag of event types."""
    import json

    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.aggregates import conversion_funnel

    def ev(eid, ms, uid, etype):
        return Row(event_id=eid, ts=ms * 1000, user_id=uid, event_type=etype,
                   value=1.0, props=json.dumps({"k": 1}))

    rows = [
        # user 1: view -> click -> purchase (full conversion)
        ev(1, 0, 1, "view"), ev(2, 10, 1, "click"), ev(3, 20, 1, "purchase"),
        # user 2: purchase BEFORE click -> reaches click, not purchase
        ev(4, 0, 2, "view"), ev(5, 30, 2, "click"), ev(6, 25, 2, "purchase"),
        # user 3: click only, never viewed -> reaches nothing
        ev(7, 0, 3, "click"),
    ]
    out = conversion_funnel(spark.createDataFrame(rows)).collect()[0]
    assert out.n_users == 3
    assert out.n_view == 2
    assert out.n_click == 2
    assert out.n_purchase == 1
    assert out.view_to_purchase == 0.5
