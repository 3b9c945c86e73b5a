"""Tests for join operators, set ops, and the relational surface."""

from __future__ import annotations

import json

from pyspark.sql import Row

from bitcoin_datapipeline_spark.operators.joins import (
    asof_purchase_click,
    feature_assembly,
    interval_join,
)
from bitcoin_datapipeline_spark.operators.relational import (
    customers_without_orders,
    pricing_summary,
    top_customers,
)
from bitcoin_datapipeline_spark.operators.setops import union_sources


def _event(event_id, ms, user_id, event_type, value):
    # ts column is int64 micros (engine reads parquet TIMESTAMP(MICROS) as long)
    return Row(
        event_id=event_id,
        ts=ms * 1_000,
        user_id=user_id,
        event_type=event_type,
        value=float(value),
        props=json.dumps({"k": 1}),
    )


def test_asof_at_or_before_and_tolerance(spark):
    h = 3_600_000
    rows = [
        _event(1, 0 * h, 7, "click", 10.0),
        _event(2, 1 * h, 7, "purchase", 99.0),   # click 1h ago → fresh
        _event(3, 9 * h, 7, "purchase", 98.0),   # click 9h ago → stale (>6h)
        _event(4, 5 * h, 8, "purchase", 97.0),   # user 8 has no clicks
        _event(5, 2 * h, 7, "click", 20.0),
        _event(6, 2 * h, 7, "purchase", 96.0),   # same-ms click visible (at-or-before)
    ]
    out = {r.purchase_id: r for r in asof_purchase_click(spark.createDataFrame(rows)).collect()}
    assert out[2].click_value == 10.0 and out[2].age_ms == h
    assert out[3].click_value is None and out[3].age_ms is None  # stale
    assert out[4].click_value is None                            # no click ever
    assert out[6].click_value == 20.0 and out[6].age_ms == 0     # tie: at-or-before


def test_interval_join_bucket_containment(spark):
    trades = spark.createDataFrame(
        [Row(symbol="BTC", event_ts=61_000, trade_id=1, price=110.0, qty=1.0,
             ingest_ts=61_000, is_buyer_maker=False, source="sbe")]
    )
    bars = spark.createDataFrame(
        [Row(symbol="BTC", bucket=1, vwap=100.0, volume=5.0),
         Row(symbol="BTC", bucket=0, vwap=999.0, volume=5.0)]
    )
    out = interval_join(trades, bars).collect()
    assert len(out) == 1
    assert out[0].bucket == 1 and out[0].vwap == 100.0
    assert out[0].vwap_deviation == 10.0
    assert out[0].vwap_deviation_bp == 1000.0


def test_feature_assembly_left_join_depth(spark):
    tf = spark.createDataFrame([Row(symbol="BTC", bucket=1, latest_price=1.0, vwap=1.0,
                                    volume_imbalance=0.0, trades_per_second=1.0,
                                    price_volatility=0.1)])
    bf = spark.createDataFrame([Row(symbol="BTC", bucket=1, latest_bid=0.9, latest_ask=1.1,
                                    latest_spread_bp=10.0, size_imbalance=0.0)])
    dfeat = spark.createDataFrame([Row(symbol="ETH", bid_depth_5=1.0, ask_depth_5=1.0,
                                       depth_imbalance=0.0)])
    out = feature_assembly(tf, bf, dfeat).collect()
    assert len(out) == 1
    assert out[0].bid_depth_5 is None  # left join: missing depth → nulls


def test_union_sources_mix(spark):
    def t(symbol, tid, source):
        return Row(symbol=symbol, event_ts=tid * 1000, ingest_ts=tid * 1000,
                   trade_id=tid, price=1.0, qty=1.0, is_buyer_maker=False, source=source)

    rows = [t("BTC", 1, "sbe"), t("BTC", 2, "rest"), t("BTC", 2, "sbe"),
            t("ETH", 1, "rest")]
    # BTC trade 2 from rest arrives at same ts... make sbe earlier to win dedup
    rows[2] = Row(symbol="BTC", event_ts=1500, ingest_ts=1500, trade_id=2,
                  price=1.0, qty=1.0, is_buyer_maker=False, source="sbe")
    out = {r.symbol: r for r in union_sources(spark.createDataFrame(rows)).collect()}
    assert out["BTC"].n_total == 2  # dup trade_id collapsed
    assert out["BTC"].source_mix == "sbe"  # both survivors sbe (earlier wins)
    assert out["ETH"].source_mix == "rest"


def test_pricing_summary_exact_decimal(spark, sf_dir):
    from bitcoin_datapipeline_spark.tables import table

    out = pricing_summary(table(spark, sf_dir, "lineitem")).collect()
    assert len(out) > 0
    for r in out:
        # exact decimal path: sum_disc_price <= sum_base_price, avg consistent
        assert r.sum_disc_price <= r.sum_base_price
        assert abs(r.avg_qty - r.sum_qty / r.count_order) < 1e-9


def test_top_customers_rank_deterministic(spark, sf_dir):
    from bitcoin_datapipeline_spark.tables import table

    out = top_customers(
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "customer"),
    ).orderBy("revenue_rank").collect()
    assert len(out) == 10
    assert [r.revenue_rank for r in out] == list(range(1, 11))
    revs = [r.revenue for r in out]
    assert revs == sorted(revs, reverse=True)


def test_anti_join(spark):
    cust = spark.createDataFrame(
        [Row(c_custkey=1, c_name="a", c_mktsegment="M", c_acctbal=1.0),
         Row(c_custkey=2, c_name="b", c_mktsegment="M", c_acctbal=2.0)]
    )
    orders = spark.createDataFrame([Row(o_custkey=1, o_orderkey=10)])
    out = customers_without_orders(cust, orders).collect()
    assert [r.c_custkey for r in out] == [2]


def test_asof_null_click_value_travels_with_its_timestamp(spark):
    """Regression (review finding): a click with NULL value must yield
    click_value=NULL for later purchases — not resurrect an older value
    paired with the newer timestamp."""
    import json as _json

    h = 3_600_000
    rows = [
        _event(1, 0, 7, "click", 5.0),
        Row(event_id=2, ts=1 * h * 1_000, user_id=7, event_type="click",
            value=None, props=_json.dumps({"k": 1})),
        _event(3, 2 * h, 7, "purchase", 99.0),
    ]
    out = asof_purchase_click(spark.createDataFrame(rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.click_ms == 1 * h        # matched the latest click row...
    assert r.click_value is None      # ...whose value is legitimately NULL


def test_lee_ready_rules(spark):
    """Quote rule, mid-tie tick fallback, stale-quote tick fallback, and
    the accuracy arithmetic on a hand-built tape."""
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.joins import lee_ready

    def t(ts, tid, price, maker):
        return Row(symbol="BTC", event_ts=ts, trade_id=tid,
                   price=float(price), is_buyer_maker=maker)

    def q(ts, bid, ask):
        return Row(symbol="BTC", event_ts=ts,
                   bid_px=float(bid), ask_px=float(ask))

    quotes = spark.createDataFrame([q(1000, 99.0, 101.0)])   # mid = 100
    trades = spark.createDataFrame([
        t(1500, 1, 101.0, False),   # > mid → quote rule buy; truth buy ✔
        t(1600, 2, 99.0, False),    # < mid → quote sell; truth buy ✗
        t(1700, 3, 100.0, True),    # == mid → tick test vs ldp 99 → buy; truth sell ✗
        t(90_000, 4, 98.0, True),   # quote stale (>30 s) → tick vs 100 → sell; truth sell ✔
    ])
    r = lee_ready(trades, quotes).collect()[0]
    assert r.n_trades == 4
    assert r.n_quote_rule == 2 and r.n_tick_test == 2 and r.n_unclassified == 0
    assert r.accuracy == 0.5


def test_lee_ready_unclassified_without_state(spark):
    """First trade with no quote and no prior different price → 'none'."""
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.joins import lee_ready

    trades = spark.createDataFrame(
        [Row(symbol="BTC", event_ts=1000, trade_id=1, price=100.0,
             is_buyer_maker=False),
         Row(symbol="BTC", event_ts=2000, trade_id=2, price=101.0,
             is_buyer_maker=False)]
    )
    quotes = spark.createDataFrame(
        [], "symbol string, event_ts long, bid_px double, ask_px double"
    )
    r = lee_ready(trades, quotes).collect()[0]
    assert r.n_unclassified == 1          # the opening print
    assert r.n_tick_test == 1 and r.accuracy == 1.0


def test_lee_ready_fully_unclassified_symbol_null_accuracy(spark):
    """A symbol whose EVERY trade is unclassifiable (no quote, single
    price level) must emit accuracy NULL — never 0/0 = NaN, which rounds
    differently across engines."""
    import math

    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.joins import lee_ready

    trades = spark.createDataFrame(
        [Row(symbol="BTC", event_ts=1000, trade_id=1, price=100.0,
             is_buyer_maker=False),
         Row(symbol="BTC", event_ts=2000, trade_id=2, price=100.0,  # same px
             is_buyer_maker=True)]
    )
    quotes = spark.createDataFrame(
        [], "symbol string, event_ts long, bid_px double, ask_px double"
    )
    r = lee_ready(trades, quotes).collect()[0]
    assert r.n_trades == 2 and r.n_unclassified == 2
    assert r.accuracy is None or not math.isnan(r.accuracy)
    assert r.accuracy is None
