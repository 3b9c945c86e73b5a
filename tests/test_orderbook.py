"""Stateful order-book maintenance tests: delta application, level removal,
cross-batch state, replay idempotency."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from bitcoin_datapipeline_spark.streaming.orderbook import (
    DELTA_SCHEMA,
    apply_deltas,
    snapshot,
    stream_order_book,
)


def _delta(symbol, seq, side, price, qty):
    return Row(symbol=symbol, seq=seq, side=side, price=float(price), qty=float(qty))


def _run(spark, stream_df, name):
    q = (
        stream_df.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_apply_deltas_upsert_and_remove():
    book = {"bid": {}, "ask": {}}
    last = apply_deltas(
        book,
        [(1, "bid", 99.0, 5.0), (2, "bid", 98.0, 3.0), (3, "ask", 101.0, 2.0),
         (4, "bid", 99.0, 7.0),   # upsert overwrites
         (5, "bid", 98.0, 0.0)],  # zero removes
    )
    assert last == 5
    assert book["bid"] == {99.0: 7.0}
    assert book["ask"] == {101.0: 2.0}


def test_snapshot_ordering_and_depth():
    book = {"bid": {99.0: 1.0, 98.0: 2.0, 97.0: 4.0},
            "ask": {101.0: 3.0, 102.0: 5.0}}
    s = snapshot("BTC", 9, book)
    # best bid = highest bid, best ask = lowest ask
    assert s[4] == 99.0 and s[5] == 101.0
    assert s[6] == 7.0 and s[7] == 8.0       # top-5 sums
    assert s[8] == (7.0 - 8.0) / 15.0        # imbalance


def test_stream_order_book_cross_batch(spark, tmp_path):
    src_dir = str(tmp_path / "deltas")
    batch1 = [
        _delta("BTC", 1, "bid", 99.0, 5.0),
        _delta("BTC", 2, "ask", 101.0, 2.0),
        _delta("ETH", 1, "bid", 10.0, 1.0),
    ]
    spark.createDataFrame(batch1, DELTA_SCHEMA).coalesce(1).write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema(DELTA_SCHEMA).parquet(src_dir)
    q = (
        stream_order_book(stream).writeStream.outputMode("update")
        .format("memory").queryName("book").start()
    )
    try:
        q.processAllAvailable()
        snap1 = {r.symbol: r for r in spark.sql("SELECT * FROM book").collect()}
        assert snap1["BTC"].best_bid == 99.0 and snap1["BTC"].best_ask == 101.0

        # batch 2 arrives later: removes BTC's bid level, adds a better ask;
        # includes a REPLAY of seq 1 which must be ignored
        batch2 = [
            _delta("BTC", 3, "bid", 99.0, 0.0),
            _delta("BTC", 4, "ask", 100.5, 9.0),
            _delta("BTC", 1, "bid", 99.0, 555.0),  # stale replay
        ]
        spark.createDataFrame(batch2, DELTA_SCHEMA).coalesce(1).write.mode("append").parquet(src_dir)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM book").collect()
    finally:
        q.stop()
    # update mode: take the latest snapshot per symbol (max last_seq)
    latest = {}
    for r in rows:
        if r.symbol not in latest or r.last_seq > latest[r.symbol].last_seq:
            latest[r.symbol] = r
    btc = latest["BTC"]
    assert btc.last_seq == 4
    assert btc.best_bid is None          # removed level; replay did NOT resurrect it
    assert btc.best_ask == 100.5         # new best ask
    assert btc.n_ask_levels == 2
    eth = latest["ETH"]
    assert eth.best_bid == 10.0          # other key untouched


def test_is_crossed_flag(spark, tmp_path):
    """Crossed book detected; one-sided book NOT flagged."""
    src = str(tmp_path / "crossed")
    deltas = [
        _delta("OK", 1, "bid", 99.0, 1.0), _delta("OK", 2, "ask", 101.0, 1.0),
        _delta("BAD", 1, "bid", 105.0, 1.0), _delta("BAD", 2, "ask", 100.0, 1.0),
        _delta("ONE", 1, "bid", 1.0, 1.0),
    ]
    spark.createDataFrame(deltas, DELTA_SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(DELTA_SCHEMA).parquet(src)
    out = {r.symbol: r for r in _run(spark, stream_order_book(stream), "crossed_t").collect()}
    assert out["OK"].is_crossed is False
    assert out["BAD"].is_crossed is True
    assert out["ONE"].is_crossed is False  # empty side → not crossed


def test_replay_full_span_reaches_last_minute(spark):
    """slice_min=None (the api's full-span knob) replays the book through
    the global last minute instead of the fixed 24 h horizon."""
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.replay import orderbook_replay

    def snap(symbol, ts_min, px):
        lv = [Row(price=float(px - i), qty=1.0) for i in range(1, 11)]
        la = [Row(price=float(px + i), qty=1.0) for i in range(1, 11)]
        return Row(symbol=symbol, event_ts=ts_min * 60_000, last_update_id=1,
                   bids=lv, asks=la)

    # B's last update is far beyond A's 24h+ gap
    depth = spark.createDataFrame(
        [snap("A", 0, 100.0), snap("B", 10, 50.0), snap("B", 2000, 51.0)]
    )
    full = orderbook_replay(depth, slice_min=None)
    spans = {
        r["symbol"]: (r["lo"], r["hi"])
        for r in full.groupBy("symbol")
        .agg(F.min("minute").alias("lo"), F.max("minute").alias("hi"))
        .collect()
    }
    assert spans["A"] == (0, 2000)   # carried through the global last minute
    assert spans["B"] == (10, 2000)
