

def test_kyle_lambda_perfect_line_and_degenerate(spark):
    """Hand-built tape where dp = 0.1*sv exactly across three buckets ->
    slope 0.1, intercept 0; a symbol with constant signed volume has zero
    variance -> NULL slope, never 0/0."""
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.aggregates import kyle_lambda

    def t(sym, ts, tid, price, qty, maker):
        return Row(symbol=sym, event_ts=ts, trade_id=tid,
                   price=float(price), qty=float(qty), is_buyer_maker=maker)

    rows = [
        # bucket 0: sv = +10, open 100 close 101 -> dp = +1
        t("A", 1_000, 1, 100.0, 6.0, False),
        t("A", 2_000, 2, 101.0, 4.0, False),
        # bucket 1: sv = -10, dp = -1
        t("A", 60_500, 3, 101.0, 6.0, True),
        t("A", 61_000, 4, 100.0, 4.0, True),
        # bucket 2: sv = +20, dp = +2
        t("A", 120_100, 5, 100.0, 12.0, False),
        t("A", 121_000, 6, 102.0, 8.0, False),
        # symbol B: sv identical (+5) in both buckets -> zero variance
        t("B", 1_000, 1, 50.0, 5.0, False),
        t("B", 61_000, 2, 51.0, 5.0, False),
    ]
    out = {r.symbol: r for r in
           kyle_lambda(spark.createDataFrame(rows)).collect()}
    assert out["A"].n_buckets == 3
    assert out["A"].kyle_lambda == 0.1
    assert out["A"].impact_intercept == 0.0
    assert out["B"].kyle_lambda is None and out["B"].impact_intercept is None


def test_vpin_volume_clock_and_trailing_window(spark):
    """Volume-clock bucketing (trade belongs where its cumulative volume
    starts) and the trailing volume-weighted imbalance."""
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.aggregates import vpin

    def t(ts, tid, qty, maker):
        return Row(symbol="A", event_ts=ts, trade_id=tid, price=100.0,
                   qty=float(qty), is_buyer_maker=maker)

    rows = [
        t(1000, 1, 6, False),   # cum_before 0  -> bucket 0 (buy)
        t(2000, 2, 6, True),    # cum_before 6  -> bucket 0 (sell)
        t(3000, 3, 6, False),   # cum_before 12 -> bucket 1 (buy)
        t(4000, 4, 6, False),   # cum_before 18 -> bucket 1 (buy)
        t(5000, 5, 6, True),    # cum_before 24 -> bucket 2 (sell)
    ]
    out = {r.bucket: r for r in
           vpin(spark.createDataFrame(rows), bucket_volume=10,
                window=2).collect()}
    assert out[0].imbalance == 0.0 and out[0].bucket_volume == 12.0
    assert out[1].imbalance == 12.0
    assert out[2].imbalance == 6.0 and out[2].bucket_volume == 6.0
    assert out[0].vpin == 0.0
    assert out[1].vpin == 0.5          # (0 + 12) / (12 + 12)
    assert out[2].vpin == 1.0          # (12 + 6) / (12 + 6)
    assert out[0].n_in_window == 1 and out[2].n_in_window == 2


def test_roll_spread_bounce_and_trend(spark):
    """Alternating bid-ask bounce gives the hand-computed negative serial
    covariance and spread; a monotone trending tape (cov >= 0, the
    model's failure mode) reports the covariance but NULL spread."""
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.aggregates import roll_spread

    def t(sym, tid, price):
        return Row(symbol=sym, event_ts=1000 * tid, trade_id=tid,
                   price=float(price), qty=1.0, is_buyer_maker=False)

    rows = (
        [t("A", i, 100.0 if i % 2 else 101.0) for i in range(1, 6)]
        + [t("B", i, 100.0 + i) for i in range(1, 5)]
    )
    out = {r.symbol: r for r in
           roll_spread(spark.createDataFrame(rows)).collect()}
    # A: dps alternate +1/-1 -> n=3, sx=-1, sy=1, sxy=-3
    # cov = (-3 - (-1)(1)/3)/3 = -0.888889; spread = 2*sqrt(0.888889)
    assert out["A"].n_pairs == 3
    assert out["A"].serial_cov == -0.888889
    assert out["A"].roll_spread == 1.885618
    # B: constant +1 dps -> cov 0 -> NULL spread
    assert out["B"].serial_cov == 0.0 and out["B"].roll_spread is None


def test_markout_horizon_curve_hand_computed(spark):
    """One buy at 100.5 with mids stepping 100 -> 101 -> 102 -> 104 at
    the three horizon boundaries: markouts are 2*(mid_h - mid_0)/mid_0
    in bps, the prevailing quote is the STRICTLY-before one at each
    shifted instant, and a trade before any quote drops from every
    horizon symmetrically."""
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.aggregates import markout

    def q(sym, ts, ing, b, a):
        return Row(symbol=sym, event_ts=ts, ingest_ts=ing,
                   bid_px=float(b), ask_px=float(a),
                   bid_sz=1.0, ask_sz=1.0)

    def t(sym, ts, ing, price, maker):
        return Row(symbol=sym, event_ts=ts, ingest_ts=ing,
                   price=float(price), is_buyer_maker=maker)

    # trade at ts=10_000; horizons land at 11_000 / 20_000 / 70_000
    quotes = [
        q("A", 9_000, 1, 99.5, 100.5),     # mid_0 = 100
        q("A", 10_500, 2, 100.5, 101.5),   # mid at +1s = 101
        q("A", 15_000, 3, 101.5, 102.5),   # mid at +10s = 102
        q("A", 60_000, 4, 103.5, 104.5),   # mid at +60s = 104
    ]
    trades = [
        t("A", 10_000, 1, 100.5, False),   # buyer-initiated: d = +1
        t("A", 1_000, 2, 99.0, False),     # before any quote: dropped
    ]
    out = markout(
        spark.createDataFrame(trades), spark.createDataFrame(quotes)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.symbol, r.bucket, r.n_trades) == ("A", 0, 1)
    assert r.markout_1s_bps == 200.0     # 2*(101-100)/100*1e4
    assert r.markout_10s_bps == 400.0
    assert r.markout_60s_bps == 800.0
    # seller-initiated flips the sign
    sell = markout(
        spark.createDataFrame([t("A", 10_000, 1, 100.5, True)]),
        spark.createDataFrame(quotes),
    ).collect()[0]
    assert sell.markout_1s_bps == -200.0
    # quote available exactly AT the horizon instant is included
    # (avail_ts = event_ts + 1 <= t + h)
    edge = markout(
        spark.createDataFrame([t("A", 10_000, 1, 100.5, False)]),
        spark.createDataFrame(
            [q("A", 9_000, 1, 99.5, 100.5), q("A", 10_999, 2, 109.5, 110.5)]
        ),
    ).collect()[0]
    assert edge.markout_1s_bps == 2000.0  # mid 110 visible at +1s exactly


def test_candle_patterns_hand_built(spark):
    """Each pattern fires on a hand-built bar and nowhere else: doji
    (small body in a real range), hammer (long lower shadow), bullish
    and bearish engulfing (current body swallows the previous observed
    bar's opposite-direction body), with flat bars excluded by the
    range guard."""
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.aggregates import (
        candle_patterns,
    )

    def bar(sym, bucket, o, h, l, c):
        return Row(symbol=sym, bucket=bucket, open=float(o), high=float(h),
                   low=float(l), close=float(c))

    rows = [
        bar("A", 0, 100.0, 110.0, 90.0, 101.0),   # doji: body 1 <= 2
        bar("A", 1, 100.0, 103.0, 90.0, 103.0),   # hammer only: body 3 >
                                                  # 0.1*13, lower 10 >= 6
        bar("A", 2, 105.0, 106.0, 99.0, 101.0),   # bearish bar (setup;
                                                  # close > bar-1 open so
                                                  # it doesn't engulf it)
        bar("A", 3, 99.0, 107.0, 98.0, 106.0),    # bull engulf of bar 2
        bar("A", 4, 107.0, 108.0, 96.0, 97.0),    # bear engulf of bar 3
        bar("A", 5, 50.0, 50.0, 50.0, 50.0),      # flat: excluded
    ]
    out = candle_patterns(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.symbol, r.day, r.n_bars, r.n_flat) == ("A", 0, 6, 1)
    assert r.n_doji == 1
    # bar 1 is a hammer (lower 10 >= 2*1, upper 0 <= 1); bar 3's lower
    # shadow is 1 < 2*7 so engulfing bars don't double-count as hammers
    assert r.n_hammer == 1
    assert r.n_bull_engulf == 1
    assert r.n_bear_engulf == 1


def test_sign_acf_alternating_and_persistent(spark):
    """A strictly alternating tape has sign ACF -1 at odd lags and +1 at
    even lags; an all-buy tape has zero sign variance -> NULL."""
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.aggregates import sign_acf

    def t(sym, i, maker):
        return Row(symbol=sym, event_ts=i * 1000, trade_id=i,
                   is_buyer_maker=maker)

    alt = [t("ALT", i, i % 2 == 0) for i in range(40)]
    allbuy = [t("BUY", i, False) for i in range(40)]
    out = {(r.symbol, r.lag): r for r in sign_acf(
        spark.createDataFrame(alt + allbuy)
    ).collect()}
    assert out[("ALT", 1)].sign_acf == -1.0
    assert out[("ALT", 2)].sign_acf == 1.0
    assert out[("ALT", 3)].sign_acf == -1.0
    assert out[("ALT", 1)].n_pairs == 39
    for k in range(1, 6):
        assert out[("BUY", k)].sign_acf is None  # zero variance margin
