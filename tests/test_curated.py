"""Curated-sink contract tests (S9 JDBC path + Avro gating).

The JDBC path runs END-TO-END against the embedded Derby driver the Spark
distribution ships (jdbc:derby:<dir>;create=true — same ``df.write.jdbc``
code path a Postgres cluster uses, different driver class); the
key-dedup-before-write half is additionally unit-tested."""

from __future__ import annotations

from pyspark.sql import functions as F

from bitcoin_datapipeline_spark.sources import curated


def test_prepare_curated_rows_first_wins(spark):
    df = spark.createDataFrame(
        [
            ("BTC", 1, 100, "a"),
            ("BTC", 1, 50, "b"),   # earlier ingest -> wins
            ("BTC", 2, 10, "c"),
            ("ETH", 1, 5, "d"),
            ("ETH", 1, 5, "d"),    # exact duplicate collapses
        ],
        "symbol string, k long, ingest_ts long, payload string",
    )
    out = curated.prepare_curated_rows(df, ["symbol", "k"], "ingest_ts")
    rows = {(r["symbol"], r["k"]): (r["ingest_ts"], r["payload"]) for r in out.collect()}
    assert rows == {
        ("BTC", 1): (50, "b"),
        ("BTC", 2): (10, "c"),
        ("ETH", 1): (5, "d"),
    }


def test_prepare_curated_rows_idempotent_on_replay(spark):
    """Replaying an overlapping batch yields the identical curated set —
    the property the reference's ON CONFLICT upsert provides."""
    base = spark.createDataFrame(
        [("BTC", i, i * 10) for i in range(20)],
        "symbol string, k long, ingest_ts long",
    )
    replay = base.union(base.filter(F.col("k") >= 10))  # overlap
    once = curated.prepare_curated_rows(base, ["symbol", "k"], "ingest_ts")
    twice = curated.prepare_curated_rows(replay, ["symbol", "k"], "ingest_ts")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_jdbc_roundtrip_derby(spark, tmp_path):
    """S9 end-to-end: write_curated_jdbc → real JDBC write (embedded Derby,
    bundled with Spark) → read back → the upsert-key dedup held and values
    survived the SQL type mapping."""
    df = spark.createDataFrame(
        [
            ("BTC", 1, 100, 45000.5),
            ("BTC", 1, 50, 45001.0),   # earlier ingest wins
            ("ETH", 1, 5, 2500.25),
        ],
        "symbol string, k long, ingest_ts long, price double",
    )
    url = f"jdbc:derby:{tmp_path}/curated_db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    curated.write_curated_jdbc(
        df, url, "curated_trades", ["symbol", "k"], "ingest_ts",
        properties=props, mode="overwrite",
    )
    back = spark.read.jdbc(url, "curated_trades", properties=props)
    rows = {(r.symbol, r.k): (r.ingest_ts, r.price) for r in back.collect()}
    assert rows == {("BTC", 1): (50, 45001.0), ("ETH", 1): (5, 2500.25)}


def test_avro_roundtrip(spark, tmp_path):
    """Avro container round trip — values and schema survive (the
    reference's at-rest schema format, MarketTrade.avsc et al.)."""
    df = spark.createDataFrame(
        [("BTCUSDT", 1700000000000, 45230.5, 0.25, True)],
        "symbol string, event_ts long, price double, qty double, is_buyer_maker boolean",
    )
    path = str(tmp_path / "avro_roundtrip")
    curated.write_avro(df, path)
    back = curated.read_avro(spark, path)
    assert back.schema == df.schema
    assert back.collect() == df.collect()


def test_orc_roundtrip(spark, tmp_path):
    """ORC round trip — values and schema survive (format breadth:
    parquet is the lake default, Avro the reference's at-rest schema,
    ORC the third columnar option, built into Spark core)."""
    df = spark.createDataFrame(
        [("BTCUSDT", 1700000000000, 45230.5, 0.25, True)],
        "symbol string, event_ts long, price double, qty double,"
        " is_buyer_maker boolean",
    )
    path = str(tmp_path / "orc_roundtrip")
    curated.write_orc(df, path)
    back = curated.read_orc(spark, path)
    assert back.schema == df.schema
    assert back.collect() == df.collect()
