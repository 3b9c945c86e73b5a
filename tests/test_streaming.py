"""Streaming-variant tests: parquet file source → memory sink, driven to
completion with processAllAvailable (synchronous micro-batching)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from bitcoin_datapipeline_spark.functions.normalize import valid_trades
from bitcoin_datapipeline_spark.streaming.ops import (
    TRADE_SCHEMA,
    stream_bars_1m,
    stream_dedup,
    stream_gap_detect,
    stream_sessionize,
)
from bitcoin_datapipeline_spark.tables import table


def _trade(symbol, event_ts, trade_id, price=10.0, qty=1.0):
    return Row(
        symbol=symbol,
        event_ts=event_ts,
        ingest_ts=event_ts,
        trade_id=trade_id,
        price=float(price),
        qty=float(qty),
        is_buyer_maker=False,
        source="sbe",
    )


@pytest.fixture()
def trade_stream_dir(spark, tmp_path):
    """Materialize a small trade batch as parquet for the streaming file
    source."""
    h = 3_600_000
    rows = [
        _trade("BTC", 0 * h, 1, 100.0),
        _trade("BTC", 0 * h + 1000, 1, 100.0),  # duplicate id within watermark
        _trade("BTC", 0 * h + 2000, 2, 101.0),
        _trade("BTC", 5 * h, 3, 102.0),          # 5h gap
        _trade("ETH", 0, 1, 50.0),
    ]
    d = str(tmp_path / "stream_in")
    spark.createDataFrame(rows, schema=TRADE_SCHEMA).write.parquet(d)
    return d


def _run(spark, stream_df, name, mode):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_dedup_within_watermark(spark, trade_stream_dir):
    src = spark.readStream.schema(TRADE_SCHEMA).parquet(trade_stream_dir)
    out = _run(spark, stream_dedup(src), "dedup_out", "append").collect()
    btc_ids = sorted(r.trade_id for r in out if r.symbol == "BTC")
    assert btc_ids == [1, 2, 3]  # duplicate id 1 collapsed


def test_stream_bars_append_mode(spark, trade_stream_dir):
    src = spark.readStream.schema(TRADE_SCHEMA).parquet(trade_stream_dir)
    out = _run(spark, stream_bars_1m(src), "bars_out", "append")
    rows = out.collect()
    # append mode only emits windows the watermark has passed; with a single
    # batch the final watermark closes all but the latest window per symbol
    assert len(rows) >= 1
    btc0 = [r for r in rows if r.symbol == "BTC" and r.bar_start.minute == 0
            and r.bar_start.hour == 0]
    if btc0:  # watermark permitting, the first BTC bar has both trades
        assert btc0[0].trade_count == 3 and btc0[0].high == 101.0


def test_stream_sessionize_append_mode(spark, trade_stream_dir):
    """Session windows close once the watermark passes them: BTC's 5 h gap
    splits two sessions; the first (3 trades inside 2 s) is emitted in
    append mode with the batch operator's bounds/duration convention."""
    src = spark.readStream.schema(TRADE_SCHEMA).parquet(trade_stream_dir)
    out = _run(spark, stream_sessionize(src), "sess_out", "append").collect()
    btc = [r for r in out if r.symbol == "BTC"]
    assert len(btc) >= 1  # first session closed; the tail session may be open
    first = min(btc, key=lambda r: r.session_start)
    assert first.session_start == 0
    assert first.session_end == 2000
    assert first.duration_s == 2.0
    assert first.n_trades == 3
    assert first.volume == 3.0


def test_stream_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """Streaming session windows over the real events table == batch
    sessionize on (symbol, session_start) keys and per-session stats."""
    from pyspark.sql import functions as F

    from bitcoin_datapipeline_spark.operators.windows import sessionize

    trades = valid_trades(table(spark, sf_dir, "events"))
    d = str(tmp_path / "sess_stream")
    trades.write.parquet(d)
    src = spark.readStream.schema(TRADE_SCHEMA).parquet(d)
    streamed = _run(
        spark, stream_sessionize(src, watermark="0 seconds"), "sess_b", "complete"
    )
    got = {
        (r.symbol, r.session_start): (r.session_end, r.n_trades)
        for r in streamed.collect()
    }
    want = {
        (r.symbol, r.session_start): (r.session_end, r.n_trades)
        for r in sessionize(trades).collect()
    }
    assert got == want


def test_stream_gap_detect_stateful(spark, trade_stream_dir):
    src = spark.readStream.schema(TRADE_SCHEMA).parquet(trade_stream_dir)
    out = _run(spark, stream_gap_detect(src), "gaps_out", "append").collect()
    assert len(out) == 1
    g = out[0]
    assert g.symbol == "BTC"
    assert g.gap_ms == 5 * 3_600_000 - 2000


def test_stream_matches_batch_bars(spark, sf_dir, tmp_path):
    """Streaming bars over the real events table == batch bars (same agg)."""
    trades = valid_trades(table(spark, sf_dir, "events"))
    d = str(tmp_path / "ev_stream")
    trades.write.parquet(d)
    src = spark.readStream.schema(TRADE_SCHEMA).parquet(d)
    streamed = _run(spark, stream_bars_1m(src, watermark="0 seconds"), "sb_out", "complete")
    from pyspark.sql import functions as F

    batch = (
        trades.groupBy("symbol", F.window(F.timestamp_millis("event_ts"), "1 minute"))
        .agg(F.count("*").alias("trade_count"))
        .agg(F.sum("trade_count"))
        .collect()[0][0]
    )
    assert streamed.agg(F.sum("trade_count")).collect()[0][0] == batch


def test_jsonl_bronze_roundtrip(spark, tmp_path):
    from bitcoin_datapipeline_spark.sources.jsonl import (
        read_bronze_jsonl,
        write_bronze_jsonl,
    )

    rows = [_trade("BTC", 1704067200000 + i * 1000, i) for i in range(20)]
    df = spark.createDataFrame(rows, schema=TRADE_SCHEMA)
    out = str(tmp_path / "bronze")
    write_bronze_jsonl(df, out)
    # partition layout exists (symbol=BTC/yyyy=2024/...)
    assert any(p.startswith("symbol=") for p in os.listdir(out))
    back = read_bronze_jsonl(spark, out)
    assert back.count() == 20
    assert sorted(back.columns) == sorted(df.columns)


def test_incremental_append_idempotent(spark, tmp_path):
    from bitcoin_datapipeline_spark.sources.checkpoint import incremental_append

    sink = str(tmp_path / "sink")
    batch1 = spark.createDataFrame([_trade("BTC", t * 1000, t) for t in range(10)],
                                   schema=TRADE_SCHEMA)
    n1 = incremental_append(spark, batch1, sink, ["symbol", "trade_id"])
    assert n1 == 10
    # re-run the IDENTICAL batch: every row is either below the watermark or
    # already in the sink tail → truly idempotent, zero rows written
    n_replay = incremental_append(spark, batch1, sink, ["symbol", "trade_id"])
    assert n_replay == 0
    assert spark.read.parquet(sink).count() == 10  # no duplicates in the sink
    # a batch overlapping the tail writes only the genuinely new rows
    batch2 = spark.createDataFrame(
        [_trade("BTC", t * 1000, t) for t in range(8, 15)], schema=TRADE_SCHEMA
    )
    n2 = incremental_append(spark, batch2, sink, ["symbol", "trade_id"])
    assert n2 == 5  # rows 8,9 are already in the sink tail; 10..14 are new
    from bitcoin_datapipeline_spark.sources.checkpoint import high_watermarks

    assert high_watermarks(spark, sink)["BTC"] == 14_000
    assert spark.read.parquet(sink).count() == 15  # still duplicate-free


def test_stream_sliding_stats_matches_batch(spark, tmp_path):
    """Sliding 5m/1m streaming stats == the equivalent batch sliding-window
    aggregation (same window function, complete mode)."""
    from pyspark.sql import functions as F

    from bitcoin_datapipeline_spark.streaming.ops import (
        stream_sliding_stats,
        with_event_time,
    )

    m = 60_000
    rows = [_trade("BTC", t * m, t, price=100.0 + t, qty=2.0) for t in range(8)]
    df = spark.createDataFrame(rows, schema=TRADE_SCHEMA)
    d = str(tmp_path / "slide_in")
    df.write.parquet(d)
    src = spark.readStream.schema(TRADE_SCHEMA).parquet(d)
    streamed = _run(spark, stream_sliding_stats(src, watermark="0 seconds"),
                    "slide_out", "complete").toPandas()
    batch = (
        with_event_time(df)
        .groupBy("symbol", F.window("event_time", "5 minutes", "1 minute").alias("win"))
        .agg(F.count("*").alias("trade_count"), F.sum("qty").alias("volume"),
             F.sum(F.col("price") * F.col("qty")).alias("notional"))
        .select("symbol", F.col("win.start").alias("win_start"), "trade_count",
                "volume", (F.col("notional") / F.col("volume")).alias("vwap"))
        .toPandas()
    )
    s = streamed.sort_values(["symbol", "win_start"]).reset_index(drop=True)
    b = batch.sort_values(["symbol", "win_start"]).reset_index(drop=True)
    assert len(s) == len(b)
    assert (s.trade_count.values == b.trade_count.values).all()
    assert abs(s.vwap.values - b.vwap.values).max() < 1e-9


def test_incremental_filter_null_symbol_passthrough(spark):
    """Regression (review finding): NULL-symbol rows must pass through the
    incremental filter, not vanish once a watermark exists."""
    from bitcoin_datapipeline_spark.sources.checkpoint import incremental_filter

    rows = [
        Row(symbol="BTC", event_ts=10_000_000, ingest_ts=0, trade_id=1, price=1.0,
            qty=1.0, is_buyer_maker=False, source="sbe"),
        Row(symbol=None, event_ts=1, ingest_ts=0, trade_id=2, price=1.0,
            qty=1.0, is_buyer_maker=False, source="sbe"),
    ]
    df = spark.createDataFrame(rows, TRADE_SCHEMA)
    out = incremental_filter(df, {"BTC": 20_000_000})
    got = {(r.symbol, r.trade_id) for r in out.collect()}
    assert (None, 2) in got          # NULL symbol passes through
    assert ("BTC", 1) not in got     # below watermark-minus-overlap → dropped


def test_checkpoint_restart_resumes_state(spark, tmp_path):
    """S5/S10 exactly-once-ish claim: a streaming query stopped and
    RESTARTED from its checkpoint must (a) not reprocess consumed files and
    (b) carry dedup state across the restart — the engine analog of the
    reference's Kinesis sequence-number resume (kinesis_consumer.py:231-272).
    """
    from bitcoin_datapipeline_spark.streaming.ops import stream_dedup

    src = str(tmp_path / "cp_src")
    ckpt = str(tmp_path / "cp_state")
    out = str(tmp_path / "cp_out")

    spark.createDataFrame(
        [_trade("BTC", 1000, 1), _trade("BTC", 2000, 2)], schema=TRADE_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    def start():
        return (
            stream_dedup(spark.readStream.schema(TRADE_SCHEMA).parquet(src))
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", out)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 2

    # new file arrives while the query is DOWN: one replayed id, one new
    spark.createDataFrame(
        [_trade("BTC", 3000, 1), _trade("BTC", 4000, 3)], schema=TRADE_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    q2 = start()  # restart from checkpoint
    q2.processAllAvailable()
    q2.stop()
    rows = spark.read.parquet(out).collect()
    ids = sorted(r.trade_id for r in rows)
    # id 1 was deduped ACROSS the restart (state store recovered);
    # batch 1's rows were not reprocessed (offsets recovered)
    assert ids == [1, 2, 3]


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc"])
def test_bronze_format_roundtrip(spark, tmp_path, fmt):
    """Every bronze format round-trips the canonical schema under the same
    Hive partition layout (partition pruning contract is format-agnostic)."""
    from bitcoin_datapipeline_spark.sources.jsonl import read_bronze, write_bronze

    rows = [_trade("BTC", 1704067200000 + i * 1000, i, price=100.0 + i)
            for i in range(12)]
    df = spark.createDataFrame(rows, schema=TRADE_SCHEMA)
    out = str(tmp_path / f"bronze_{fmt}")
    write_bronze(df, out, fmt=fmt)
    assert any(p.startswith("symbol=") for p in os.listdir(out))
    back = read_bronze(spark, out, fmt=fmt)
    assert back.count() == 12
    got = {(r.trade_id, r.price) for r in back.collect()}
    assert got == {(i, 100.0 + i) for i in range(12)}


def test_latest_snapshot_cache_matches_batch(spark, sf_dir, tmp_path):
    """Streaming feature-cache sink (Redis feat:{symbol} analog): after the
    stream drains, the cache holds exactly the newest bar per symbol — the
    same rows the batch latest-per-key query computes."""
    from pyspark.sql import functions as F

    from bitcoin_datapipeline_spark.functions import normalize
    from bitcoin_datapipeline_spark.streaming import ops
    from bitcoin_datapipeline_spark.tables import table

    src_dir = str(tmp_path / "src")
    cache_dir = str(tmp_path / "feature_cache")
    trades = normalize.valid_trades(table(spark, sf_dir, "events"))
    trades.write.parquet(src_dir)

    stream = spark.readStream.schema(trades.schema).parquet(src_dir)
    bars = ops.stream_bars_1m(ops.with_event_time(stream))
    q = (
        bars.writeStream.foreachBatch(
            ops.latest_snapshot_sink(cache_dir, key="symbol", ts_col="bar_start")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    cache = spark.read.parquet(cache_dir)
    # contract 1: exactly one row per key — the cache is a latest-state table
    assert cache.groupBy("symbol").count().filter("count > 1").count() == 0
    assert cache.count() == 5  # all symbols present

    # contract 2: each cached row IS the batch bar for its (symbol, minute)
    # (append mode holds back windows still above the watermark, so the
    # cache may trail the batch latest — but every row it holds must agree
    # with batch values exactly)
    from bitcoin_datapipeline_spark.operators.aggregates import bars_1m
    from bitcoin_datapipeline_spark.operators.dedup import dedup_trades

    batch = bars_1m(dedup_trades(trades)).select(
        "symbol", (F.col("bucket") * 60).alias("sec"), "open", "high", "low",
        "close", "trade_count",
    )
    c = cache.select(
        "symbol",
        F.col("bar_start").cast("long").alias("sec"),
        F.col("open").alias("s_open"),
        F.col("high").alias("s_high"),
        F.col("low").alias("s_low"),
        F.col("close").alias("s_close"),
        F.col("trade_count").alias("s_n"),
    )
    j = c.join(batch, ["symbol", "sec"]).collect()
    assert len(j) == 5, "every cached row must match a batch bar"
    for r in j:
        assert (
            round(r["s_open"], 6) == r["open"]
            and round(r["s_high"], 6) == r["high"]
            and round(r["s_low"], 6) == r["low"]
            and round(r["s_close"], 6) == r["close"]
            and r["s_n"] == r["trade_count"]
        )

    # contract 3: the cached minute is the newest EMITTED bar per symbol
    # (monotone vs any earlier bar of the stream output)
    emitted_latest = (
        spark.read.parquet(cache_dir)
        .select("symbol", F.col("bar_start").cast("long").alias("sec"))
    )
    assert {r["symbol"] for r in emitted_latest.collect()} == {
        "CLICK", "ERROR", "PURCHASE", "SIGNUP", "VIEW"
    }


def test_stream_locf_grid_matches_batch(spark, tmp_path):
    """Streaming LOCF grid == batch locf_resample row-for-row over the
    streamed span, including carry-forward rows, data ages, and gap flags —
    with state surviving across two micro-batches."""
    from pyspark.sql import functions as F

    from bitcoin_datapipeline_spark.operators import grid as batch_grid
    from bitcoin_datapipeline_spark.streaming import grid as sgrid

    schema = (
        "symbol string, event_ts long, trade_id long, price double, qty double,"
        " is_buyer_maker boolean, source string"
    )
    batch1 = [
        ("A", 0, 1, 100.0, 1.0, False, "sbe"),
        ("A", 5_500, 2, 101.0, 2.0, True, "sbe"),
        ("B", 2_000, 3, 50.0, 1.0, False, "sbe"),
    ]
    batch2 = [
        ("A", 130_250, 4, 105.0, 1.0, False, "sbe"),  # 125 s gap
        ("B", 50_900, 5, 55.0, 3.0, True, "sbe"),
    ]

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def run_once(rows, part):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / part)
        )
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).option("recursiveFileLookup", "true").parquet(str(src))
        q = (
            sgrid.stream_locf_grid(stream, gap_threshold_s=60)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once(batch1, "p1")
    run_once(batch2, "p2")

    got = spark.read.parquet(out)
    trades = spark.createDataFrame(batch1 + batch2, schema)
    want_full = batch_grid.locf_resample(
        trades, step_s=1, slice_s=1_000, gap_threshold_s=60
    )
    last_sec = trades.groupBy("symbol").agg(
        F.expr("max(event_ts div 1000)").alias("last_sec")
    )
    want = (
        want_full.join(last_sec, "symbol")
        .filter(F.col("feature_ts") <= F.col("last_sec"))
        .select(
            "symbol", "feature_ts", "price", "data_age_ms", "gap_indicator",
            "volume", "trades", "has_obs",
        )
    )
    assert got.count() == want.count() == (131 + 49)
    mismatched = (
        got.alias("g")
        .join(want.alias("w"), ["symbol", "feature_ts"], "full")
        .filter(
            "g.price IS DISTINCT FROM w.price OR "
            "g.data_age_ms IS DISTINCT FROM w.data_age_ms OR "
            "g.gap_indicator IS DISTINCT FROM w.gap_indicator OR "
            "g.volume IS DISTINCT FROM w.volume OR "
            "g.trades IS DISTINCT FROM w.trades OR "
            "g.has_obs IS DISTINCT FROM w.has_obs"
        )
        .count()
    )
    assert mismatched == 0
    # the 125 s silence must be gap-flagged in the stream output
    assert (
        got.filter("symbol = 'A' AND gap_indicator").count() > 0
    )


def test_stream_grid_returns_matches_batch(spark, tmp_path):
    """Streaming k-second returns == batch grid_returns over the streamed
    span — the carried-price zeros, the across-gap return, and the NULLs
    before each horizon's history exists, with the price ring surviving a
    micro-batch boundary."""
    from pyspark.sql import functions as F

    from bitcoin_datapipeline_spark.operators import grid as batch_grid
    from bitcoin_datapipeline_spark.streaming import grid as sgrid

    schema = (
        "symbol string, event_ts long, trade_id long, price double, qty double,"
        " is_buyer_maker boolean, source string"
    )
    batch1 = [
        ("A", 0, 1, 100.0, 1.0, False, "sbe"),
        ("A", 7_400, 2, 110.0, 1.0, False, "sbe"),
    ]
    batch2 = [
        ("A", 23_900, 3, 121.0, 1.0, False, "sbe"),  # crosses the boundary
    ]

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def run_once(rows, part):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / part)
        )
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).option("recursiveFileLookup", "true").parquet(str(src))
        q = (
            sgrid.stream_grid_returns(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once(batch1, "p1")
    run_once(batch2, "p2")

    got = spark.read.parquet(out)
    trades = spark.createDataFrame(batch1 + batch2, schema)
    want = (
        batch_grid.grid_returns(
            batch_grid.locf_resample(trades, step_s=1, slice_s=1_000),
            horizons_s=(1, 5, 10),
        )
        .filter(F.col("feature_ts") <= 23)
    )
    assert got.count() == want.count() == 24  # seconds 0..23
    # batch twin rounds to 6dp; the stream emits raw — compare rounded
    g = got.select(
        "symbol", "feature_ts",
        F.round("price", 6).alias("price"),
        F.round("ret_1s", 6).alias("ret_1s"),
        F.round("ret_5s", 6).alias("ret_5s"),
        F.round("ret_10s", 6).alias("ret_10s"),
    )
    w = want.select("symbol", "feature_ts", "price", "ret_1s", "ret_5s", "ret_10s")
    mism = (
        g.alias("g").join(w.alias("w"), ["symbol", "feature_ts"], "full")
        .filter(
            "g.price IS DISTINCT FROM w.price OR "
            "g.ret_1s IS DISTINCT FROM w.ret_1s OR "
            "g.ret_5s IS DISTINCT FROM w.ret_5s OR "
            "g.ret_10s IS DISTINCT FROM w.ret_10s"
        )
        .count()
    )
    assert mism == 0
    r = {x["feature_ts"]: x for x in got.collect()}
    assert r[7]["ret_1s"] != 0.0 and r[8]["ret_1s"] == 0.0  # print then carry
    assert r[2]["ret_5s"] is None  # horizon precedes history


def test_stateful_api_compat_matrix():
    """Pins the stateful-API decision recorded in streaming/ops.py: the
    engine stays on applyInPandasWithState because Spark 4.1's successor
    (transformWithStateInPandas) requires the protobuf package in its
    Python driver worker, which this runtime lacks. (a) the shipped API
    exists (its behavior is exercised end-to-end by the orderbook / grid /
    gap-detector streaming tests); (b) the successor's surface exists, so
    migration is an env question, not a Spark-version question; (c) the
    blocker still holds — this assertion FAILING means protobuf appeared
    and the migration should be scheduled."""
    from pyspark.sql import GroupedData

    assert hasattr(GroupedData, "applyInPandasWithState")
    assert hasattr(GroupedData, "transformWithStateInPandas")
    from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    try:
        from google.protobuf import descriptor  # noqa: F401

        blocked = False
    except ImportError:
        blocked = True
    assert blocked, (
        "google.protobuf now imports — the transformWithStateInPandas "
        "blocker documented in streaming/ops.py is gone; the dual-path gap "
        "detector's tws equivalence test now activates (run it), flip "
        "stream_gap_detect's auto default if green, migrate orderbook/grid "
        "the same way, and update this matrix"
    )


def test_stream_stream_quote_trade_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream interval join == the identical batch join: same symbol
    equality, same [-band, 0] event-time band, same inner semantics.  Also
    pins that the streaming plan is a watermarked StreamingSymmetricHashJoin
    (bounded two-sided state), not an unbounded buffer."""
    from pyspark.sql import functions as F

    from bitcoin_datapipeline_spark.functions.normalize import bba
    from bitcoin_datapipeline_spark.streaming.ops import (
        BBA_SCHEMA,
        stream_quote_trade_join,
    )

    ev = table(spark, sf_dir, "events")
    trades_b = valid_trades(ev)
    quotes_b = bba(ev)
    td = str(tmp_path / "t_src")
    qd = str(tmp_path / "q_src")
    trades_b.write.parquet(td)
    quotes_b.write.parquet(qd)

    t_src = spark.readStream.schema(TRADE_SCHEMA).parquet(td)
    q_src = spark.readStream.schema(BBA_SCHEMA).parquet(qd)
    joined = stream_quote_trade_join(t_src, q_src, band_s=2)
    assert "watermark" in joined._jdf.queryExecution().analyzed().toString().lower()
    out = _run(spark, joined, "ssj_out", "append")

    # batch twin: same condition expressed directly on the batch frames
    t = trades_b.select(
        F.col("symbol").alias("t_symbol"),
        F.timestamp_millis("event_ts").alias("trade_time"),
        "trade_id",
        "price",
    )
    q = quotes_b.select(
        F.col("symbol").alias("q_symbol"),
        F.timestamp_millis("event_ts").alias("quote_time"),
        "bid_px",
        "ask_px",
    )
    cond = (
        (F.col("t_symbol") == F.col("q_symbol"))
        & (F.col("quote_time") <= F.col("trade_time"))
        & (F.col("quote_time") >= F.col("trade_time") - F.expr("INTERVAL 2 SECONDS"))
    )
    expected = t.join(q, cond).count()
    got = out.count()
    assert got == expected and got > 0
    # checksum a value column too, not just cardinality
    exp_sum = t.join(q, cond).agg(F.sum("bid_px")).collect()[0][0]
    got_sum = out.agg(F.sum("bid_px")).collect()[0][0]
    assert abs(got_sum - exp_sum) < 1e-6 * max(1.0, abs(exp_sum))


def test_stream_enrich_matches_batch_join(spark, trade_stream_dir, tmp_path):
    """Stream-static broadcast enrichment must emit exactly the batch
    left-join rows, with dim-less symbols passing through null-padded."""
    from bitcoin_datapipeline_spark.streaming.ops import TRADE_SCHEMA, stream_enrich

    batch = spark.read.schema(TRADE_SCHEMA).parquet(trade_stream_dir)
    syms = [r.symbol for r in batch.select("symbol").distinct().collect()]
    dim = spark.createDataFrame(
        [Row(symbol=s, tick_size=0.01 * (i + 1), venue=f"v{i}")
         for i, s in enumerate(sorted(syms)[:1])]  # only ONE symbol has dim
    )
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    src = spark.readStream.schema(TRADE_SCHEMA).parquet(trade_stream_dir)
    (
        stream_enrich(src, dim)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    want = sorted(map(tuple, stream_enrich(batch, dim).collect()))
    assert got == want and len(got) == batch.count()


def test_stream_locf_grid_bounded_lateness_matches_batch(spark, tmp_path):
    """allowed_lateness_s=2: input shuffled out of order by up to 2 s —
    including disorder ACROSS micro-batch boundaries — still produces the
    batch twin's rows exactly, because emission is held 2 s behind the
    newest observed second while late slivers merge into their pending
    grid second."""
    from pyspark.sql import functions as F

    from bitcoin_datapipeline_spark.operators import grid as batch_grid
    from bitcoin_datapipeline_spark.streaming import grid as sgrid

    schema = (
        "symbol string, event_ts long, trade_id long, price double, qty double,"
        " is_buyer_maker boolean, source string"
    )
    # event times deliberately OUT OF ORDER within a 2 s disorder bound:
    # 5_500 arrives after 6_900/7_100; batch 2 starts with 9_400 which is
    # older than batch 1's newest (10_100) — cross-batch disorder.
    batch1 = [
        ("A", 0, 1, 100.0, 1.0, False, "sbe"),
        ("A", 6_900, 2, 103.0, 1.0, False, "sbe"),
        ("A", 7_100, 3, 104.0, 2.0, True, "sbe"),
        ("A", 5_500, 4, 101.0, 2.0, True, "sbe"),   # 1.6 s late
        ("A", 10_100, 5, 106.0, 1.0, False, "sbe"),
    ]
    batch2 = [
        ("A", 9_400, 6, 105.0, 2.0, True, "sbe"),   # behind batch 1's max
        ("A", 15_200, 7, 108.0, 1.0, False, "sbe"),
        ("A", 14_300, 8, 107.0, 1.0, True, "sbe"),  # late within batch 2
        ("A", 30_000, 9, 110.0, 1.0, False, "sbe"), # flush sentinel
    ]

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def run_once(rows, part):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / part)
        )
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).option("recursiveFileLookup", "true").parquet(str(src))
        q = (
            sgrid.stream_locf_grid(
                stream, gap_threshold_s=60, allowed_lateness_s=2
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once(batch1, "p1")
    run_once(batch2, "p2")

    got = spark.read.parquet(out)
    trades = spark.createDataFrame(batch1 + batch2, schema)
    want = (
        batch_grid.locf_resample(
            trades, step_s=1, slice_s=1_000, gap_threshold_s=60
        )
        # the stream has emitted through newest_sec - lateness = 28
        .filter(F.col("feature_ts") <= 30 - 2)
        .select(
            "symbol", "feature_ts", "price", "data_age_ms", "gap_indicator",
            "volume", "trades", "has_obs",
        )
    )
    assert got.count() == want.count() == 29
    mismatched = (
        got.alias("g")
        .join(want.alias("w"), ["symbol", "feature_ts"], "full")
        .filter(
            "g.price IS DISTINCT FROM w.price OR "
            "g.data_age_ms IS DISTINCT FROM w.data_age_ms OR "
            "g.gap_indicator IS DISTINCT FROM w.gap_indicator OR "
            "g.volume IS DISTINCT FROM w.volume OR "
            "g.trades IS DISTINCT FROM w.trades OR "
            "g.has_obs IS DISTINCT FROM w.has_obs"
        )
        .count()
    )
    assert mismatched == 0
    # the late slivers landed in their correct seconds: sec 5 carries the
    # 5.5 s print, sec 9 the cross-batch 9.4 s print
    by_sec = {r["feature_ts"]: r for r in got.collect()}
    assert by_sec[5]["price"] == 101.0 and by_sec[5]["has_obs"]
    assert by_sec[9]["price"] == 105.0 and by_sec[9]["has_obs"]


def test_stream_gap_detect_classic_explicit(spark, trade_stream_dir):
    """api='classic' pins the applyInPandasWithState path explicitly."""
    src = spark.readStream.schema(TRADE_SCHEMA).parquet(trade_stream_dir)
    out = _run(
        spark, stream_gap_detect(src, api="classic"), "gaps_cl", "append"
    ).collect()
    assert len(out) == 1 and out[0].gap_ms == 5 * 3_600_000 - 2000


def test_stream_gap_detect_tws_equivalence(spark, trade_stream_dir):
    """The transformWithStateInPandas port must emit the classic path's
    rows exactly.  Auto-skips while the successor API's protobuf
    dependency is missing (see STATEFUL-API COMPAT in streaming/ops.py);
    the moment the environment unblocks, this test activates and the
    compat-matrix test flips — together they gate the migration."""
    from bitcoin_datapipeline_spark.streaming.ops import tws_available

    if not tws_available():
        pytest.skip("transformWithStateInPandas blocked: protobuf missing")
    src = spark.readStream.schema(TRADE_SCHEMA).parquet(trade_stream_dir)
    got = sorted(
        tuple(r)
        for r in _run(
            spark, stream_gap_detect(src, api="tws"), "gaps_tws", "append"
        ).collect()
    )
    src2 = spark.readStream.schema(TRADE_SCHEMA).parquet(trade_stream_dir)
    want = sorted(
        tuple(r)
        for r in _run(
            spark, stream_gap_detect(src2, api="classic"), "gaps_tws_c", "append"
        ).collect()
    )
    assert got == want and len(got) == 1


def test_gap_processor_constructs_when_api_present():
    """The StatefulProcessor port itself is importable/constructible on
    this Spark (the API surface exists; only the worker-side protobuf
    dependency blocks execution) — so the dual path is compile-real, not
    a string."""
    from bitcoin_datapipeline_spark.streaming.ops import make_gap_processor

    p = make_gap_processor(1000)
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    assert isinstance(p, StatefulProcessor)
    assert hasattr(p, "handleInputRows") and hasattr(p, "init")


def test_stream_grid_returns_bounded_lateness_matches_batch(spark, tmp_path):
    """allowed_lateness_s=2 on the returns resampler: out-of-order input
    (including across micro-batches) still yields the batch twin's
    returns — the late print lands in its grid second BEFORE that
    second's return is computed."""
    from pyspark.sql import functions as F

    from bitcoin_datapipeline_spark.operators import grid as batch_grid
    from bitcoin_datapipeline_spark.streaming import grid as sgrid

    schema = (
        "symbol string, event_ts long, trade_id long, price double, qty double,"
        " is_buyer_maker boolean, source string"
    )
    batch1 = [
        ("A", 0, 1, 100.0, 1.0, False, "sbe"),
        ("A", 7_400, 2, 110.0, 1.0, False, "sbe"),
        ("A", 6_100, 3, 105.0, 1.0, False, "sbe"),   # 1.3 s late
    ]
    batch2 = [
        ("A", 6_900, 4, 108.0, 1.0, False, "sbe"),   # cross-batch late
        ("A", 14_200, 5, 121.0, 1.0, False, "sbe"),
        ("A", 25_000, 6, 130.0, 1.0, False, "sbe"),  # flush sentinel
    ]

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def run_once(rows, part):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / part)
        )
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).option("recursiveFileLookup", "true").parquet(str(src))
        q = (
            sgrid.stream_grid_returns(stream, allowed_lateness_s=2)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once(batch1, "p1")
    run_once(batch2, "p2")

    got = spark.read.parquet(out)
    trades = spark.createDataFrame(batch1 + batch2, schema)
    want = (
        batch_grid.grid_returns(
            batch_grid.locf_resample(trades, step_s=1, slice_s=1_000),
            horizons_s=(1, 5, 10),
        )
        .filter(F.col("feature_ts") <= 25 - 2)  # emitted frontier
    )
    assert got.count() == want.count() == 24  # seconds 0..23
    g = got.select(
        "symbol", "feature_ts",
        F.round("price", 6).alias("price"),
        F.round("ret_1s", 6).alias("ret_1s"),
        F.round("ret_5s", 6).alias("ret_5s"),
        F.round("ret_10s", 6).alias("ret_10s"),
    )
    w = want.select("symbol", "feature_ts", "price", "ret_1s", "ret_5s",
                    "ret_10s")
    mism = (
        g.alias("g").join(w.alias("w"), ["symbol", "feature_ts"], "full")
        .filter(
            "g.price IS DISTINCT FROM w.price OR "
            "g.ret_1s IS DISTINCT FROM w.ret_1s OR "
            "g.ret_5s IS DISTINCT FROM w.ret_5s OR "
            "g.ret_10s IS DISTINCT FROM w.ret_10s"
        )
        .count()
    )
    assert mism == 0
    r = {x["feature_ts"]: x for x in got.collect()}
    # sec 6's price is the LAST event-ts print of that second (6.9 s =
    # 108.0, delivered a batch late), not the first-arrived 105.0
    assert r[6]["price"] == 108.0


def test_stream_vpin_matches_batch_completed_buckets(spark, tmp_path):
    """Streaming volume-clock VPIN == batch vpin on every COMPLETED
    bucket (the batch twin additionally reports each symbol's still-open
    tail bucket), with the clock and the trailing ring surviving a
    micro-batch boundary mid-bucket."""
    from pyspark.sql import functions as F

    from bitcoin_datapipeline_spark.operators.aggregates import vpin
    from bitcoin_datapipeline_spark.streaming.vpin import stream_vpin

    schema = (
        "symbol string, event_ts long, trade_id long, price double, qty double,"
        " is_buyer_maker boolean, source string"
    )
    batch1 = [
        ("A", 1_000, 1, 100.0, 6.0, False, "sbe"),
        ("A", 2_000, 2, 100.0, 6.0, True, "sbe"),
        ("A", 3_000, 3, 100.0, 6.0, False, "sbe"),   # opens bucket 1
        ("B", 1_000, 1, 50.0, 25.0, False, "sbe"),   # huge trade: bucket 0 alone
    ]
    batch2 = [
        ("A", 4_000, 4, 100.0, 6.0, False, "sbe"),   # still bucket 1
        ("A", 5_000, 5, 100.0, 6.0, True, "sbe"),    # opens bucket 2 -> closes 1
        ("A", 6_000, 6, 100.0, 9.5, False, "sbe"),   # opens bucket 3 -> closes 2
        ("B", 2_000, 2, 50.0, 4.0, True, "sbe"),     # bucket 2 -> closes 0
    ]

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def run_once(rows, part):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / part)
        )
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).option("recursiveFileLookup", "true").parquet(str(src))
        q = (
            stream_vpin(stream, bucket_volume=10, window=2)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once(batch1, "p1")
    run_once(batch2, "p2")

    got = spark.read.parquet(out)
    trades = spark.createDataFrame(batch1 + batch2, schema)
    full = vpin(trades, bucket_volume=10, window=2)
    tails = full.groupBy("symbol").agg(F.max("bucket").alias("tail"))
    want = (
        full.join(tails, "symbol")
        .filter(F.col("bucket") < F.col("tail"))
        .drop("tail")
    )
    assert got.count() == want.count() == 4  # A: buckets 0,1,2; B: bucket 0
    mism = (
        got.select(
            "symbol", "bucket", "n_trades", "bucket_volume", "imbalance",
            "n_in_window", "vpin",  # emitted pre-rounded == batch r6
        )
        .alias("g")
        .join(want.alias("w"), ["symbol", "bucket"], "full")
        .filter(
            "g.n_trades IS DISTINCT FROM w.n_trades OR "
            "g.bucket_volume IS DISTINCT FROM w.bucket_volume OR "
            "g.imbalance IS DISTINCT FROM w.imbalance OR "
            "g.n_in_window IS DISTINCT FROM w.n_in_window OR "
            "g.vpin IS DISTINCT FROM w.vpin"
        )
        .count()
    )
    assert mism == 0
    # the mid-bucket batch boundary did not split A's bucket 1
    # (t3 closes batch 1, t4 arrives in batch 2; both land in bucket 1)
    a1 = got.filter("symbol = 'A' AND bucket = 1").collect()[0]
    assert a1["n_trades"] == 2 and a1["bucket_volume"] == 12.0


class _VpinState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _drive_vpin(batches, **kw):
    """Drive make_vpin_processor chunk-by-chunk for one symbol; returns
    (emitted namedtuple rows, final state tuple)."""
    import pandas as pd

    from bitcoin_datapipeline_spark.streaming.vpin import make_vpin_processor

    fn = make_vpin_processor(**kw)
    state = _VpinState()
    cols = ["event_ts", "trade_id", "qty", "is_buyer_maker"]
    emitted = []
    for batch in batches:
        pdf = pd.DataFrame(batch, columns=cols)
        for out in fn(("A",), iter([pdf]), state):
            emitted.extend(out.itertuples(index=False))
    return emitted, state.get


def test_stream_vpin_bounded_lateness_reorders_across_batches(spark):
    """A trade delivered out of order ACROSS a micro-batch boundary lands
    in its correct volume-clock position when allowed_lateness_s covers
    the disorder — the streaming output equals the batch twin built from
    the correctly-ordered tape (ADVICE r5: the VPIN processor previously
    folded such trades into whatever bucket was open, silently)."""
    from bitcoin_datapipeline_spark.operators.aggregates import vpin

    # ordered tape: t1..t6, 6 units each, bucket_volume=10 -> buckets of 2
    tape = [
        (1_000, 1, 6.0, False),
        (2_000, 2, 6.0, True),
        (3_000, 3, 6.0, False),
        (4_000, 4, 6.0, True),
        (5_000, 5, 6.0, False),
        (6_000, 6, 6.0, True),
    ]
    # delivery: t3 (ts=3000) arrives one batch LATE, after t4/t5 — within
    # a 5 s lateness window of the newest observed event
    batches = [
        [tape[0], tape[1]],
        [tape[3], tape[4]],
        [tape[2], tape[5]],
        # flush: a later trade advances the horizon past the whole tape
        [(20_000, 7, 25.0, False)],
    ]
    emitted, _ = _drive_vpin(
        batches, bucket_volume=10, window=2, allowed_lateness_s=5
    )
    assert all(e.late_dropped == 0 for e in emitted)

    rows = [
        ("A", ts, tid, 100.0, qty, mk, "sbe")
        for ts, tid, qty, mk in tape + [(20_000, 7, 25.0, False)]
    ]
    schema = (
        "symbol string, event_ts long, trade_id long, price double,"
        " qty double, is_buyer_maker boolean, source string"
    )
    full = vpin(
        spark.createDataFrame(rows, schema), bucket_volume=10, window=2
    ).collect()
    tail = max(r.bucket for r in full)
    want = {r.bucket: r for r in full if r.bucket < tail}
    got = {e.bucket: e for e in emitted}
    assert set(got) == set(want)
    for b, w in want.items():
        g = got[b]
        assert (g.n_trades, g.bucket_volume, g.imbalance, g.n_in_window,
                g.vpin) == (w.n_trades, w.bucket_volume, w.imbalance,
                            w.n_in_window, w.vpin)


def test_stream_vpin_hard_late_trade_dropped_and_counted(spark):
    """With allowed_lateness_s=0 a trade behind the folded frontier is
    dropped, not silently folded into the open bucket — and the drop is
    observable via the cumulative late_dropped column on emitted rows."""
    batches = [
        # bucket 0 opens: t1 + t2 = 12 units of the 10-unit clock
        [(1_000, 1, 6.0, False), (2_000, 2, 6.0, True)],
        # ts=1500 is behind the folded frontier (2_000) -> hard-late;
        # t3 advances the clock and closes bucket 0
        [(1_500, 9, 6.0, False), (3_000, 3, 6.0, False)],
        # t4 folds into bucket 1; t5 opens bucket 2 -> closes bucket 1
        [(4_000, 4, 2.0, False), (5_000, 5, 1.0, False)],
    ]
    emitted, state = _drive_vpin(
        batches, bucket_volume=10, window=2, allowed_lateness_s=0
    )
    # the late trade contributed to NO bucket: volumes reflect only the
    # in-order tape (t1+t2 = bucket 0; t3+t4 = bucket 1)
    by_bucket = {e.bucket: e for e in emitted}
    assert set(by_bucket) == {0, 1}
    assert by_bucket[0].bucket_volume == 12.0
    assert by_bucket[1].bucket_volume == 8.0
    # every row emitted after the drop carries the cumulative count
    assert by_bucket[0].late_dropped == 1
    assert by_bucket[1].late_dropped == 1
    assert state[9] == 1  # n_late persisted in state


def test_stream_kyle_lambda_matches_batch_closed_buckets(spark, tmp_path):
    """Streaming Kyle's lambda through a REAL availableNow stream: state
    (including nullable longs and pending arrays) survives checkpointed
    micro-batches, and each closed minute bucket's emitted row equals the
    batch kyle_lambda over the closed buckets — with NULL (not NaN)
    lambda when the single-bucket den=0 guard fires."""
    from pyspark.sql import functions as F

    from bitcoin_datapipeline_spark.operators.aggregates import kyle_lambda
    from bitcoin_datapipeline_spark.streaming.impact import stream_kyle_lambda

    schema = (
        "symbol string, event_ts long, trade_id long, price double, qty double,"
        " is_buyer_maker boolean, source string"
    )
    # minute buckets: A gets buckets 0,1,2 (2 closed); the boundary
    # between bucket 0 and 1 falls ACROSS the micro-batch split
    batch1 = [
        ("A", 10_000, 1, 100.00, 5.0, False, "sbe"),
        ("A", 20_000, 2, 100.50, 3.0, True, "sbe"),
    ]
    batch2 = [
        ("A", 70_000, 3, 101.00, 4.0, False, "sbe"),   # opens bucket 1
        ("A", 80_000, 4, 100.75, 2.0, False, "sbe"),
        ("A", 130_000, 5, 101.50, 6.0, True, "sbe"),   # opens bucket 2
    ]

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def run_once(rows, part):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / part)
        )
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).option("recursiveFileLookup", "true").parquet(str(src))
        q = (
            stream_kyle_lambda(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once(batch1, "p1")
    run_once(batch2, "p2")

    got = {r.bucket: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {0, 1}  # bucket 2 still open
    # bucket-0 row: regression over ONE bucket -> den=0 -> SQL NULL
    assert got[0].n_buckets == 1
    assert got[0].kyle_lambda is None and got[0].impact_intercept is None
    assert got[0].late_dropped == 0
    # bucket-1 row == batch over buckets 0..1
    trades = spark.createDataFrame(batch1 + batch2, schema).filter(
        "event_ts < 120000"
    )
    w = kyle_lambda(trades).collect()[0]
    g = got[1]
    assert (g.n_buckets, g.kyle_lambda, g.impact_intercept) == (
        w.n_buckets, w.kyle_lambda, w.impact_intercept,
    )


def test_stream_kyle_bounded_lateness_reorders_across_batches(spark):
    """A trade delivered out of order ACROSS a micro-batch boundary lands
    in its correct minute bucket when allowed_lateness_s covers the
    disorder; a hard-late trade under lateness 0 is dropped and counted —
    the shared merge_fold discipline, exercised on the Kyle twin."""
    import pandas as pd

    from bitcoin_datapipeline_spark.operators.aggregates import kyle_lambda
    from bitcoin_datapipeline_spark.streaming.impact import (
        make_kyle_processor,
    )

    cols = ["event_ts", "trade_id", "price", "qty", "is_buyer_maker"]
    # minute buckets 0,1,2; t3 (bucket 0's close) arrives a batch late
    tape = [
        (10_000, 1, 100.0, 5.0, False),
        (20_000, 2, 101.0, 3.0, True),
        (30_000, 3, 102.0, 2.0, False),   # late-delivered
        (70_000, 4, 103.0, 4.0, False),   # bucket 1
        (80_000, 5, 102.5, 1.0, True),
        (130_000, 6, 104.0, 6.0, False),  # bucket 2 (stays open)
    ]
    batches = [
        [tape[0], tape[1]],
        [tape[3], tape[4]],            # bucket 1 before t3 arrives
        [tape[2]],                     # t3, 50s late
        [tape[5]],
        # flush: advances the lateness horizon past buckets 0-1 so their
        # events fold and bucket 2 opens (closing bucket 1)
        [(200_000, 7, 104.0, 1.0, False)],
    ]
    state = _VpinState()
    fn = make_kyle_processor(allowed_lateness_s=60)
    emitted = []
    for b in batches:
        for out in fn(("A",), iter([pd.DataFrame(b, columns=cols)]), state):
            emitted.extend(out.itertuples(index=False))
    assert [e.bucket for e in emitted] == [0, 1]
    assert all(e.late_dropped == 0 for e in emitted)
    # the bucket-1 row equals batch kyle_lambda over buckets 0..1 of the
    # CORRECTLY ORDERED tape — t3 landed in bucket 0 despite arriving
    # after bucket 1's trades
    schema = ("symbol string, event_ts long, trade_id long, price double,"
              " qty double, is_buyer_maker boolean")
    df = spark.createDataFrame(
        [("A",) + t for t in tape if t[0] < 120_000], schema
    )
    w = kyle_lambda(df).collect()[0]
    g = emitted[-1]
    assert (g.n_buckets, g.kyle_lambda, g.impact_intercept) == (
        w.n_buckets, w.kyle_lambda, w.impact_intercept,
    )

    # hard-late under lateness 0: dropped + counted, buckets unpolluted
    state2 = _VpinState()
    fn2 = make_kyle_processor(allowed_lateness_s=0)
    emitted2 = []
    for b in [[tape[0], tape[1]], [(15_000, 9, 500.0, 9.0, False), tape[3]],
              [tape[5]]]:
        for out in fn2(("A",), iter([pd.DataFrame(b, columns=cols)]), state2):
            emitted2.extend(out.itertuples(index=False))
    assert [e.bucket for e in emitted2] == [0, 1]
    assert emitted2[0].late_dropped == 1  # counted on first row after drop
    # the dropped 500.0 print never entered bucket 0's open/close
    assert emitted2[0].n_buckets == 1


def test_stream_roll_bounded_lateness_reorders_across_batches(spark):
    """A price delivered out of order across a micro-batch boundary lands
    in its correct Δp-pair position under allowed_lateness_s — the final
    streaming row equals batch roll_spread over the correctly ordered
    tape (merge_fold discipline on the Roll twin)."""
    import pandas as pd

    from bitcoin_datapipeline_spark.operators.aggregates import roll_spread
    from bitcoin_datapipeline_spark.streaming.impact import (
        make_roll_processor,
    )

    cols = ["event_ts", "trade_id", "price"]
    tape = [
        (1_000, 1, 100.0),
        (2_000, 2, 99.5),
        (3_000, 3, 100.2),   # late-delivered
        (4_000, 4, 99.8),
        (5_000, 5, 100.1),
    ]
    batches = [
        [tape[0], tape[1]],
        [tape[3], tape[4]],          # arrive before t3
        [tape[2]],                   # t3, 2s late
        [(60_000, 6, 100.0)],        # flush past the lateness window
    ]
    state = _VpinState()
    fn = make_roll_processor(allowed_lateness_s=5)
    emitted = []
    for b in batches:
        for out in fn(("A",), iter([pd.DataFrame(b, columns=cols)]), state):
            emitted.extend(out.itertuples(index=False))
    assert emitted and all(e.late_dropped == 0 for e in emitted)
    final = emitted[-1]
    # the flush trade itself stays inside the lateness window (pending,
    # not folded) — the batch twin compares over the FOLDED prefix
    schema = ("symbol string, event_ts long, trade_id long, price double,"
              " qty double, is_buyer_maker boolean")
    df = spark.createDataFrame(
        [("A", ts, tid, p, 1.0, False) for ts, tid, p in tape], schema
    )
    w = roll_spread(df).collect()[0]
    assert (final.n_pairs, final.serial_cov, final.roll_spread) == (
        w.n_pairs, w.serial_cov, w.roll_spread,
    )


def test_stream_twa_spread_real_stream_matches_batch(spark, tmp_path):
    """Streaming TWA spread through a REAL availableNow stream: the open
    quote interval (and its partially-filled minute bucket) survives
    checkpointed micro-batches, a multi-minute quote lifetime is
    pro-rated across every bucket it spans, and each finalized bucket's
    row equals the batch twa_spread row."""
    from bitcoin_datapipeline_spark.operators.aggregates import twa_spread
    from bitcoin_datapipeline_spark.streaming.impact import stream_twa_spread

    schema = (
        "symbol string, event_ts long, ingest_ts long, bid_px double,"
        " ask_px double, bid_sz double, ask_sz double"
    )
    # quote 1 stands from 10s to 130s — spanning buckets 0,1,2 and the
    # micro-batch split; quote 2 closes it; quote 3 finalizes bucket 2
    batch1 = [("A", 10_000, 1, 100.0, 101.0, 1.0, 1.0)]
    batch2 = [
        ("A", 130_000, 2, 100.5, 101.5, 1.0, 1.0),
        ("A", 185_000, 3, 100.2, 101.2, 1.0, 1.0),  # bucket 3 opens
    ]

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def run_once(rows, part):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / part)
        )
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).option("recursiveFileLookup", "true").parquet(str(src))
        q = (
            stream_twa_spread(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once(batch1, "p1")
    run_once(batch2, "p2")

    got = {r.bucket: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {0, 1, 2}  # bucket 3 still open
    want = {
        r.bucket: r
        for r in twa_spread(
            spark.createDataFrame(batch1 + batch2, schema)
        ).collect()
    }
    for b in (0, 1, 2):
        g, w = got[b], want[b]
        assert (g.n_intervals, g.quoted_ms, g.twa_spread_bps) == (
            w.n_intervals, w.quoted_ms, w.twa_spread_bps
        ), (g, w)
        assert g.late_dropped == 0
    # coverage arithmetic is the pro-rated overlap, not arrival counts
    assert got[0].quoted_ms == 50_000    # 10s → 60s
    assert got[1].quoted_ms == 60_000    # full minute under quote 1
    assert got[2].quoted_ms == 60_000    # 10s of q1 + 50s of q2
    assert got[2].n_intervals == 2


def test_stream_rsi_real_stream_ring_survives_checkpoint(spark, tmp_path):
    """Streaming RSI through a REAL availableNow stream: the Δclose ring
    array survives checkpointed micro-batches (the warm-up spans the
    batch split), and each full-ring bucket close emits the batch
    windows.rsi value."""
    from bitcoin_datapipeline_spark.operators.windows import rsi
    from bitcoin_datapipeline_spark.streaming.impact import stream_rsi

    schema = "symbol string, event_ts long, trade_id long, price double"
    # closes per minute: 100, 101, 103, 102, 105, 104 -> deltas
    # +1, +2, -1, +3, -1; with period=3 the ring fills at bucket 3
    closes = [100.0, 101.0, 103.0, 102.0, 105.0, 104.0]
    rows = [
        ("A", i * 60_000 + 1, i, c) for i, c in enumerate(closes)
    ]
    batch1, batch2 = rows[:3], rows[3:]

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def run_once(part_rows, part):
        spark.createDataFrame(part_rows, schema).coalesce(1).write.parquet(
            str(src / part)
        )
        q = (
            stream_rsi(
                spark.readStream.schema(
                    spark.createDataFrame([], schema).schema
                ).option("recursiveFileLookup", "true").parquet(str(src)),
                period=3,
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once(batch1, "p1")
    run_once(batch2, "p2")

    got = {r.bucket: r.rsi for r in spark.read.parquet(out).collect()}
    assert set(got) == {3, 4}  # buckets 0-2 warm up; bucket 5 still open
    bars = [("A", i, c) for i, c in enumerate(closes[:5])]
    want = {
        r.bucket: r.rsi
        for r in rsi(
            spark.createDataFrame(
                bars, "symbol string, bucket long, close double"
            ),
            period=3,
        ).collect()
    }
    assert got == want


def test_stream_obv_real_stream_prefix_survives_checkpoint(spark, tmp_path):
    """Streaming OBV through a REAL availableNow stream: the signed-volume
    prefix sum and prev-close state survive checkpointed micro-batches,
    and every closed bucket emits the batch windows.obv row."""
    from bitcoin_datapipeline_spark.operators.windows import obv
    from bitcoin_datapipeline_spark.streaming.impact import stream_obv

    schema = (
        "symbol string, event_ts long, trade_id long, price double,"
        " qty double"
    )
    # per-minute (close, qty): up, up, down, flat, up — OBV flips sign
    bars_in = [(100.0, 2.0), (101.0, 3.0), (99.0, 5.0),
               (99.0, 7.0), (102.0, 1.0), (50.0, 9.0)]
    rows = [
        ("A", i * 60_000 + 1, i, c, q) for i, (c, q) in enumerate(bars_in)
    ]
    batch1, batch2 = rows[:3], rows[3:]

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def run_once(part_rows, part):
        spark.createDataFrame(part_rows, schema).coalesce(1).write.parquet(
            str(src / part)
        )
        q = (
            stream_obv(
                spark.readStream.schema(
                    spark.createDataFrame([], schema).schema
                ).option("recursiveFileLookup", "true").parquet(str(src))
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once(batch1, "p1")
    run_once(batch2, "p2")

    got = {r.bucket: (r.volume, r.obv)
           for r in spark.read.parquet(out).collect()}
    assert set(got) == {0, 1, 2, 3, 4}  # bucket 5 still open
    closed = [("A", i, c, q) for i, (c, q) in enumerate(bars_in[:5])]
    want = {
        r.bucket: (r.volume, r.obv)
        for r in obv(
            spark.createDataFrame(
                closed,
                "symbol string, bucket long, close double, volume double",
            )
        ).collect()
    }
    assert got == want


def test_stream_bollinger_real_stream_day_survives_checkpoint(
    spark, tmp_path
):
    """Streaming Bollinger through a REAL availableNow stream: the close
    ring AND the open day's scorecard partials survive checkpointed
    micro-batches (the batch split lands mid-day), and the completed day
    emits the batch windows.bollinger_breach row."""
    from bitcoin_datapipeline_spark.operators.windows import (
        bollinger_breach,
    )
    from bitcoin_datapipeline_spark.streaming.impact import stream_bollinger

    schema = "symbol string, event_ts long, trade_id long, price double"
    # day 0: buckets 0-4 (ring of 3 fills at bucket 2 -> 3 evals);
    # day 1: bucket 1440 CLOSES (bucket 1441 arrives) -> day 0 emits;
    # bucket 1441 and day 1 stay open
    closes = [100.0, 150.0, 50.0, 200.0, 10.0]
    rows = [("A", i * 60_000 + 1, i, c) for i, c in enumerate(closes)]
    rows.append(("A", 1440 * 60_000 + 1, 9, 120.0))
    rows.append(("A", 1441 * 60_000 + 1, 10, 121.0))
    batch1, batch2 = rows[:3], rows[3:]

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def run_once(part_rows, part):
        spark.createDataFrame(part_rows, schema).coalesce(1).write.parquet(
            str(src / part)
        )
        q = (
            stream_bollinger(
                spark.readStream.schema(
                    spark.createDataFrame([], schema).schema
                ).option("recursiveFileLookup", "true").parquet(str(src)),
                period=3,
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once(batch1, "p1")
    run_once(batch2, "p2")

    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0].day == 0
    closed = [("A", i, c) for i, c in enumerate(closes)]
    want = bollinger_breach(
        spark.createDataFrame(
            closed, "symbol string, bucket long, close double"
        ),
        period=3,
    ).collect()
    assert len(want) == 1
    g, w = got[0], want[0]
    assert (g.n_eval, g.n_upper_breach, g.n_lower_breach) == (
        w.n_eval, w.n_upper_breach, w.n_lower_breach
    )
    assert abs(g.mean_bandwidth - w.mean_bandwidth) <= 1e-6


def test_stream_momentum_drawdown_rvol_real_stream_roundtrip(
    spark, tmp_path
):
    """Three r9 second-pass TA twins through REAL availableNow streams:
    each state schema (nested-lag momentum, running-summary drawdown,
    moment-ring rolling volatility) survives a checkpointed batch
    split, and the emitted rows equal their batch operators.  (The
    candle twin's day-grain round-trip is the separate
    test_stream_candle_real_stream_day_roundtrip.)"""
    from bitcoin_datapipeline_spark.operators.windows import (
        drawdown,
        momentum,
    )
    from bitcoin_datapipeline_spark.streaming.impact import (
        stream_drawdown,
        stream_momentum,
    )

    schema = (
        "symbol string, event_ts long, trade_id long, price double,"
        " qty double"
    )
    bars_in = [(100.0, 2.0), (104.0, 3.0), (99.0, 5.0), (101.0, 7.0),
               (97.0, 1.0), (103.0, 9.0)]
    rows = [
        ("A", i * 60_000 + 1, i, c, q) for i, (c, q) in enumerate(bars_in)
    ]
    batches = [rows[:3], rows[3:]]

    def drive(builder, sub):
        src = tmp_path / f"src_{sub}"
        out = str(tmp_path / f"out_{sub}")
        ckpt = str(tmp_path / f"ckpt_{sub}")
        src.mkdir()
        for j, part in enumerate(batches):
            spark.createDataFrame(part, schema).coalesce(1).write.parquet(
                str(src / f"p{j}")
            )
            q = (
                builder(
                    spark.readStream.schema(
                        spark.createDataFrame([], schema).schema
                    ).option("recursiveFileLookup", "true").parquet(str(src))
                )
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        return spark.read.parquet(out).collect()

    closed = [("A", i, c, q) for i, (c, q) in enumerate(bars_in[:5])]
    bars_df = spark.createDataFrame(
        closed, "symbol string, bucket long, close double, volume double"
    )

    got_m = {r.bucket: (r.close, r.momentum, r.acceleration, r.volume_trend)
             for r in drive(stream_momentum, "mom")}
    want_m = {r.bucket: (r.close, r.momentum, r.acceleration, r.volume_trend)
              for r in momentum(bars_df).collect()}
    assert got_m == want_m and set(got_m) == {0, 1, 2, 3, 4}

    got_d = drive(stream_drawdown, "dd")
    # running summary: the LAST emitted row equals batch over all closed
    last = max(got_d, key=lambda r: r.bucket)
    w = drawdown(bars_df).collect()[0]
    assert (last.n_bars, last.max_drawdown, last.trough_bucket,
            last.peak_close, last.trough_close) == (
        w.n_bars, w.max_drawdown, w.trough_bucket,
        w.peak_close, w.trough_close,
    )

    from bitcoin_datapipeline_spark.operators.windows import (
        rolling_volatility,
    )
    from bitcoin_datapipeline_spark.streaming.impact import (
        stream_rolling_volatility,
    )

    got_v = {r.bucket: (r.close, r.volatility, r.n_in_window)
             for r in drive(
                 lambda s: stream_rolling_volatility(s, nbars=3), "rvol")}
    want_v = {r.bucket: (r.close, r.volatility_3, r.n_in_window)
              for r in rolling_volatility(bars_df, nbars=3).collect()}
    assert got_v == want_v and set(got_v) == {0, 1, 2, 3, 4}


def test_stream_candle_real_stream_day_roundtrip(spark, tmp_path):
    """Candle twin through a REAL stream at day grain: day-0 OHLC bars
    straddle the checkpoint split; the day-1 bucket closes in the second
    run and day 0 emits the batch candle_patterns row."""
    from bitcoin_datapipeline_spark.operators.aggregates import (
        candle_patterns,
    )
    from bitcoin_datapipeline_spark.streaming.impact import (
        stream_candle_patterns,
    )

    schema = "symbol string, event_ts long, trade_id long, price double"
    # two trades per minute -> real OHLC; bucket 1440 closes via 1441
    prices = [(100.0, 100.2), (101.0, 99.0), (99.5, 100.5), (98.0, 98.0)]
    rows = []
    for i, (p1, p2) in enumerate(prices):
        rows.append(("A", i * 60_000 + 1, 2 * i, p1))
        rows.append(("A", i * 60_000 + 2, 2 * i + 1, p2))
    rows.append(("A", 1440 * 60_000 + 1, 100, 101.0))
    rows.append(("A", 1441 * 60_000 + 1, 101, 102.0))
    batches = [rows[:5], rows[5:]]

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    for j, part in enumerate(batches):
        spark.createDataFrame(part, schema).coalesce(1).write.parquet(
            str(src / f"p{j}")
        )
        q = (
            stream_candle_patterns(
                spark.readStream.schema(
                    spark.createDataFrame([], schema).schema
                ).option("recursiveFileLookup", "true").parquet(str(src))
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    got = spark.read.parquet(out).collect()
    assert len(got) == 1 and got[0].day == 0
    ohlc = {}
    for s, ts, _tid, p in rows[:8]:
        b = ts // 60_000
        if b not in ohlc:
            ohlc[b] = [p, p, p, p]
        ohlc[b][1] = max(ohlc[b][1], p)
        ohlc[b][2] = min(ohlc[b][2], p)
        ohlc[b][3] = p
    want = candle_patterns(
        spark.createDataFrame(
            [("A", b, *v) for b, v in sorted(ohlc.items())],
            "symbol string, bucket long, open double, high double,"
            " low double, close double",
        )
    ).collect()
    assert len(want) == 1
    g, w = got[0], want[0]
    assert (g.n_bars, g.n_flat, g.n_doji, g.n_hammer, g.n_bull_engulf,
            g.n_bear_engulf) == (
        w.n_bars, w.n_flat, w.n_doji, w.n_hammer, w.n_bull_engulf,
        w.n_bear_engulf,
    )


def test_stream_markout_real_stream_delayed_emission(spark, tmp_path):
    """Streaming markout through a REAL availableNow stream: the
    delayed-emission state (pending trades with nested horizon-mid
    arrays, quote history, bucket sums) survives checkpointed
    micro-batches — the trade folds in batch one, its horizons finalize
    and the bucket emits only in batch two when the frontier clears
    bucket_end + 60 s."""
    from bitcoin_datapipeline_spark.operators.aggregates import markout
    from bitcoin_datapipeline_spark.streaming.impact import stream_markout

    schema = (
        "symbol string, kind int, event_ts long, ingest_ts long,"
        " bid_px double, ask_px double, price double,"
        " is_buyer_maker boolean"
    )

    def q(ts, ing, b, a):
        return ("A", 0, ts, ing, float(b), float(a), None, None)

    def t(ts, ing, px, mk):
        return ("A", 1, ts, ing, None, None, float(px), mk)

    # trade at 10s (bucket 0); horizon mids at 11s / 20s / 70s; the
    # emission gate needs frontier >= 60_000 + 60_000
    batch1 = [
        q(9_000, 1, 99.5, 100.5),
        t(10_000, 2, 100.5, False),
        q(10_500, 3, 100.5, 101.5),   # mid at +1s
    ]
    batch2 = [
        q(15_000, 4, 101.5, 102.5),   # mid at +10s
        q(60_000, 5, 103.5, 104.5),   # mid at +60s
        q(125_000, 6, 103.5, 104.5),  # pushes the frontier past the gate
    ]

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def run_once(rows, part):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / part)
        )
        s = (
            stream_markout(
                spark.readStream.schema(
                    spark.createDataFrame([], schema).schema
                ).option("recursiveFileLookup", "true").parquet(str(src))
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        s.awaitTermination(120)

    run_once(batch1, "p1")
    assert spark.read.parquet(out).count() == 0  # nothing finalized yet
    run_once(batch2, "p2")

    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    g = got[0]
    df = spark.createDataFrame(batch1 + batch2, schema)
    w = markout(
        df.filter("kind = 1").select(
            "symbol", "event_ts", "price", "is_buyer_maker"
        ),
        df.filter("kind = 0").selectExpr(
            "symbol", "event_ts", "CAST(0 AS LONG) AS ingest_ts",
            "bid_px", "ask_px", "1.0 AS bid_sz", "1.0 AS ask_sz",
        ),
    ).collect()[0]
    assert (g.bucket, g.n_trades) == (w.bucket, w.n_trades) == (0, 1)
    assert (g.markout_1s_bps, g.markout_10s_bps, g.markout_60s_bps) == (
        w.markout_1s_bps, w.markout_10s_bps, w.markout_60s_bps
    )
    assert g.markout_1s_bps == 200.0  # mid 100 -> 101 on a buy
