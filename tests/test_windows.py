"""Exact-value tests for window operators (W1-W7, A5, gap detect)."""

from __future__ import annotations

import math

from pyspark.sql import Row

from bitcoin_datapipeline_spark.operators.windows import (
    bar_returns,
    gap_detect,
    labels,
    lag_features,
    latest_per_key,
    momentum,
    rolling_stats,
    rolling_volatility,
    topk_recent,
)


def _bar(symbol, bucket, close, volume=1.0, high=None, low=None, trade_count=1, notional=None):
    return Row(
        symbol=symbol,
        bucket=bucket,
        close=float(close),
        high=float(high if high is not None else close),
        low=float(low if low is not None else close),
        volume=float(volume),
        notional=float(notional if notional is not None else close * volume),
        trade_count=trade_count,
    )


def _trade(symbol, event_ts, trade_id, price):
    return Row(
        symbol=symbol,
        event_ts=event_ts,
        ingest_ts=event_ts,
        trade_id=trade_id,
        price=float(price),
        qty=1.0,
        is_buyer_maker=False,
        source="sbe",
    )


def test_lag_features_first_row_null(spark):
    rows = [_trade("BTC", 1000, 1, 100.0), _trade("BTC", 2000, 2, 110.0)]
    out = {r.trade_id: r for r in lag_features(spark.createDataFrame(rows)).collect()}
    assert out[1].prev_price is None and out[1].price_change is None
    assert out[2].price_change == 10.0 and out[2].price_change_pct == 10.0


def test_bar_returns_log(spark):
    rows = [_bar("BTC", b, 100.0 * (1.01 ** b)) for b in range(6)]
    out = {r.bucket: r for r in bar_returns(spark.createDataFrame(rows)).collect()}
    assert out[0].ret_1 is None
    assert out[1].ret_1 == round(math.log(1.01), 6)
    assert out[5].ret_5 == round(5 * math.log(1.01), 6)


def test_labels_forward_no_leakage(spark):
    rows = [_bar("BTC", b, float(100 + b)) for b in range(12)]
    out = {r.bucket: r for r in labels(spark.createDataFrame(rows)).collect()}
    # bucket 0: target = close at bucket 10 = 110
    assert out[0].target_price == 110.0
    assert out[0].return_10 == round(math.log(110.0 / 100.0), 6)
    assert out[0].direction == 1
    assert out[0].is_valid is True
    # path stats over buckets 1..10 only (no current row)
    assert out[0].path_max == 110.0 and out[0].path_min == 101.0
    # bucket 5: fewer than 10 future bars → invalid, null target
    assert out[5].target_price is None and out[5].is_valid is False
    assert out[5].direction is None


def test_latest_and_topk(spark):
    rows = [_trade("BTC", t, t, float(t)) for t in (1000, 2000, 3000)] + [
        _trade("ETH", 500, 1, 9.0)
    ]
    latest = {r.symbol: r for r in latest_per_key(spark.createDataFrame(rows)).collect()}
    assert latest["BTC"].price == 3000.0 and latest["ETH"].price == 9.0
    top2 = topk_recent(spark.createDataFrame(rows), k=2).collect()
    btc = sorted([r.price for r in top2 if r.symbol == "BTC"])
    assert btc == [2000.0, 3000.0]


def test_momentum_acceleration(spark):
    # closes: 100, 101, 103, 106 → momentum: -, 1, 2, 3 → accel: -, -, 1, 1
    rows = [_bar("BTC", b, c) for b, c in enumerate([100, 101, 103, 106])]
    out = {r.bucket: r for r in momentum(spark.createDataFrame(rows)).collect()}
    assert out[1].momentum == 1.0 and out[1].acceleration is None
    assert out[2].momentum == 2.0 and out[2].acceleration == 1.0
    assert out[3].momentum == 3.0 and out[3].acceleration == 1.0


def test_rolling_volatility_window_size(spark):
    rows = [_bar("BTC", b, float(b)) for b in range(15)]
    out = {r.bucket: r for r in rolling_volatility(spark.createDataFrame(rows)).collect()}
    assert out[0].n_in_window == 1 and out[0].volatility_10 is None
    assert out[14].n_in_window == 10


def test_rolling_stats_gap_correct(spark):
    # bars at minutes 0,1,10 — the range frame must NOT include minute 0/1
    # in minute 10's window (a ROWS frame would).
    rows = [_bar("BTC", 0, 100.0, volume=5.0), _bar("BTC", 1, 100.0, volume=7.0),
            _bar("BTC", 10, 100.0, volume=11.0)]
    out = {r.bucket: r for r in rolling_stats(spark.createDataFrame(rows)).collect()}
    assert out[1].roll_volume == 12.0 and out[1].bars_in_window == 2
    assert out[10].roll_volume == 11.0 and out[10].bars_in_window == 1


def test_gap_detect_threshold(spark):
    h = 3_600_000
    rows = [_trade("BTC", 0, 1, 1.0), _trade("BTC", h, 2, 1.0),
            _trade("BTC", 4 * h, 3, 1.0)]
    out = gap_detect(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    assert out[0].gap_ms == 3 * h and out[0].gap_seconds == 3 * 3600.0


def test_rsi_bounds_and_hand_values(spark):
    """All-up windows read 100, all-down 0, a 50/50 split reads by the
    gain share; warm-up rows (fewer than `period` deltas) don't emit."""
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.windows import rsi

    def bars(sym, closes):
        return [Row(symbol=sym, bucket=i, close=float(c))
                for i, c in enumerate(closes)]

    up = bars("UP", [100 + i for i in range(16)])        # 15 deltas, all +1
    down = bars("DN", [100 - i for i in range(16)])
    # 14 deltas: +2 x7 then -1 x7 -> gains 14, losses 7 -> rsi 66.666667
    mixed = bars("MX", [100, 102, 104, 106, 108, 110, 112, 114,
                        113, 112, 111, 110, 109, 108, 107])
    out = rsi(spark.createDataFrame(up + down + mixed, 
              "symbol string, bucket long, close double"), period=14)
    rows = {(r.symbol, r.bucket): r.rsi for r in out.collect()}
    # first emission needs 14 deltas -> bucket >= 14
    assert ("UP", 13) not in rows
    assert rows[("UP", 14)] == 100.0 and rows[("UP", 15)] == 100.0
    assert rows[("DN", 14)] == 0.0
    assert rows[("MX", 14)] == round(100 * 14 / 21, 6)


def test_bollinger_breach_flat_and_spike(spark):
    """Constant closes give zero bandwidth and no breaches; one spike
    above the +2-sigma band is counted exactly once."""
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.windows import (
        bollinger_breach,
    )

    flat = [Row(symbol="F", bucket=i, close=100.0) for i in range(25)]
    spik = [Row(symbol="S", bucket=i,
                close=100.0 + (1.0 if i % 2 else -1.0)) for i in range(24)]
    spik.append(Row(symbol="S", bucket=24, close=150.0))
    out = {r.symbol: r for r in bollinger_breach(
        spark.createDataFrame(flat + spik,
                              "symbol string, bucket long, close double")
    ).collect()}
    f = out["F"]
    assert (f.n_eval, f.n_upper_breach, f.n_lower_breach) == (6, 0, 0)
    assert f.mean_bandwidth == 0.0
    s = out["S"]
    assert s.n_upper_breach == 1 and s.n_lower_breach == 0


def test_stochastic_k_extremes_and_flat_null(spark):
    """Close at the window high reads %K=100, at the low 0; a flat
    window (HH == LL) emits NULL %K and drops out of %D."""
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.windows import stochastic_k

    rows = [
        Row(symbol="A", bucket=i, high=float(100 + i), low=float(90 + i),
            close=float(100 + i))
        for i in range(14)
    ]
    # bucket 13: close == HH -> 100
    flat = [Row(symbol="B", bucket=i, high=50.0, low=50.0, close=50.0)
            for i in range(14)]
    out = {(r.symbol, r.bucket): r for r in stochastic_k(
        spark.createDataFrame(
            rows + flat,
            "symbol string, bucket long, high double, low double,"
            " close double",
        )
    ).collect()}
    a = out[("A", 13)]
    assert a.k_pct == 100.0 and a.d_pct == 100.0
    b = out[("B", 13)]
    assert b.k_pct is None and b.d_pct is None


def test_atr_hand_values_and_gap_rule(spark):
    """TR picks the max of the three legs (a gap-up bar's TR comes from
    |high − prev_close|, not its own range); warm-up rows don't emit."""
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.windows import atr

    rows = [
        Row(symbol="A", bucket=i, high=101.0, low=99.0, close=100.0)
        for i in range(14)
    ]
    # bar 14 gaps up: range 2 but |high - prev_close| = 10
    rows.append(Row(symbol="A", bucket=14, high=110.0, low=108.0,
                    close=109.0))
    out = {r.bucket: r for r in atr(
        spark.createDataFrame(
            rows, "symbol string, bucket long, high double, low double,"
            " close double")
    ).collect()}
    # Wilder convention: the FIRST bar's TR is its own range (greatest
    # ignores the NULL prev-close legs in both engines), so bucket 13
    # already has 14 TRs; bucket 12 is still warm-up
    assert 12 not in out
    assert out[13].atr == 2.0
    assert out[14].atr == round((13 * 2.0 + 10.0) / 14, 6)
    assert out[14].atr_norm == round((13 * 2.0 + 10.0) / 14 / 109.0, 6)


def test_obv_cumulative_signed_volume(spark):
    """OBV adds volume on up closes, subtracts on down, holds on flat,
    starting at zero on each symbol's first bar."""
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.windows import obv

    rows = [
        Row(symbol="A", bucket=0, close=100.0, volume=5.0),
        Row(symbol="A", bucket=1, close=101.0, volume=3.0),   # up: +3
        Row(symbol="A", bucket=2, close=100.5, volume=2.0),   # down: -2
        Row(symbol="A", bucket=3, close=100.5, volume=9.0),   # flat: hold
        Row(symbol="A", bucket=4, close=102.0, volume=4.0),   # up: +4
    ]
    out = {r.bucket: r.obv for r in obv(
        spark.createDataFrame(
            rows, "symbol string, bucket long, close double, volume double")
    ).collect()}
    assert out == {0: 0.0, 1: 3.0, 2: 1.0, 3: 1.0, 4: 5.0}


def test_macd_constant_and_trend(spark):
    """Constant closes give macd = signal = histogram = 0; a monotone
    uptrend gives a positive macd (fast EMA above slow); the crossover
    flag fires exactly when the histogram changes sign."""
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.windows import macd

    flat = [Row(symbol="F", bucket=i, close=100.0) for i in range(40)]
    up = [Row(symbol="U", bucket=i, close=100.0 + i) for i in range(40)]
    # V-shape: downtrend then uptrend -> histogram must cross sign
    vee = [Row(symbol="V", bucket=i, close=float(100 - i)) for i in range(20)]
    vee += [Row(symbol="V", bucket=20 + i, close=float(80 + 2 * i))
            for i in range(20)]
    out = macd(spark.createDataFrame(
        flat + up + vee, "symbol string, bucket long, close double"
    )).collect()
    by = {}
    for r in out:
        by.setdefault(r.symbol, {})[r.bucket] = r
    f = by["F"]
    assert all(r.macd == 0.0 and r.signal == 0.0 and r.histogram == 0.0
               for r in f.values())
    assert f[0].crossover is None          # no previous histogram
    assert f[5].crossover is False         # 0 -> 0: no sign change
    u = by["U"]
    assert u[39].macd > 0                  # fast EMA above slow in a trend
    v = by["V"]
    assert any(r.crossover for r in v.values()), "V-shape must cross"
    # n_in_window grows to the truncation cap
    assert u[39].n_in_window == 40
