"""Market-stream normalization (reference P1/P3: key-rename + cast + enrich).

The reference normalizes raw Binance payloads into the canonical MarketTrade
record — rename `T→event_ts, a→trade_id, p→price, q→qty, m→is_buyer_maker`,
cast string→float, add `symbol`/`ingest_ts`/`source`
(services/rest_ingestor/src/clients/binance_rest.py:233-246;
services/sbe_ingestor/src/stream_processor.py:118-123).

The driver's generic ``events`` table plays the raw-stream role
(FIXTURES.md).  The mapping below is the engine's deterministic analog of
that normalization — every derivation is exact integer arithmetic or a
straight cast so the DuckDB oracle reproduces it bit-for-bit:

==============  =====================================================
canonical col    derivation from ``events``
==============  =====================================================
symbol           upper(event_type)                    (P3 uppercase)
event_ts (ms)    ts div 1_000   (µs→ms, exact — ref µs→ms at
                 sbe_decoder.cpp:134-136 is the same truncating scale;
                 ts reads as raw int64 epoch-µs, see tables.py)
ingest_ts (ms)   event_ts + (event_id % 250)          (bounded skew)
trade_id         event_id - (1 if event_id%100==7 else 0)
                 (~1% planted duplicate ids for dedup tests — ref D1)
price            value (double)
qty              CAST(json k field AS DOUBLE)         (P12 json parse)
is_buyer_maker   event_id % 2 == 0
source           'sbe' if event_id%10<7 else 'rest'   (union tests)
==============  =====================================================

NOTE: never divide the µs timestamp as a double — 1.7e15 µs is within 2^53
today but the pattern is one unit-change away from silent ms loss; `div`
is exact 64-bit regardless of scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame  # noqa: F401 (Column in return type)
from pyspark.sql import functions as F

# Validation bounds (reference: transformer.py:241-260 — timestamps must be
# in [2020, 2030) as epoch ms).
TS_MIN_MS = 1577836800000  # 2020-01-01T00:00:00Z
TS_MAX_MS = 1893456000000  # 2030-01-01T00:00:00Z


def _props_k() -> Column:
    """``props`` → the numeric ``$.k`` field, fast-path + full-parser
    fallback (r11 optimization).

    ``get_json_object`` runs a full Jackson parse per row; on the
    normalize path that parse IS most of the scan stage's CPU (measured
    0.33 s vs 0.12 s for the bare scan+filter at sf0.1 — and the scan
    stage is the serial head of every market-side query).  The feed's
    payload is the single-key object ``{"k": <number>}``, so the common
    case short-circuits to a substring+cast (the SBE-decoder pattern:
    cheap fixed-layout decode, full parser for anything else):

    - guard: literal ``{"k": `` prefix, ``}`` suffix, and a digit/minus
      first payload char — anything else (extra keys, string values,
      whitespace variants, malformed JSON) falls back to the real parser;
    - ``try_cast`` double: a payload that is not a plain JSON number
      (e.g. ``76, "j": 1``) yields NULL and falls back.

    On every valid-JSON input both branches agree (Spark's string→double
    cast and Jackson parse the same number grammar); the fallback keeps
    arbitrary JSON payloads exactly as before.  MALFORMED payloads that
    pass the guard diverge DELIBERATELY (r12, ADVICE r11): try_cast also
    accepts non-JSON numerals ('1d', '1.', 'inf', leading zeros) where
    Jackson returns NULL — a value-recovering superset, never a wrong
    value for a well-formed number.  Tightening the guard to a strict
    JSON-number rlike would put a regex on every row of the hot scan,
    re-paying a large share of what the fast path saves, to change only
    garbage-input behavior; documented instead.  Measured: 0.14 s vs
    0.33 s for the scan+filter microbench — ~0.2 s per query across the
    ~80 queries that read the tape.  Scale-independent: per-row CPU in
    the scan stage shrinks identically on a cluster (guide §1.2 step 2 /
    §4.2 — expression choice in the hot path)."""
    fast_ok = (
        (F.expr("left(props, 6)") == '{"k": ')
        & (F.expr("right(props, 1)") == "}")
        & F.expr("substr(props, 7, 1) in ('-','0','1','2','3','4','5','6','7','8','9')")
    )
    fast = F.expr("try_cast(substr(props, 7, length(props) - 7) as double)")
    slow = F.get_json_object(F.col("props"), "$.k").cast("double")
    return F.when(fast_ok, F.coalesce(fast, slow)).otherwise(slow)


def trades(events: DataFrame) -> DataFrame:
    """events → canonical trade stream (MarketTrade.avsc field set)."""
    event_ts = F.expr("ts div 1000")
    return events.select(
        F.upper(F.col("event_type")).alias("symbol"),
        event_ts.cast("long").alias("event_ts"),
        (event_ts + (F.col("event_id") % 250)).cast("long").alias("ingest_ts"),
        (
            F.col("event_id")
            - F.when(F.col("event_id") % 100 == 7, F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("trade_id"),
        F.col("value").alias("price"),
        _props_k().alias("qty"),
        (F.col("event_id") % 2 == 0).alias("is_buyer_maker"),
        F.when(F.col("event_id") % 10 < 7, F.lit("sbe"))
        .otherwise(F.lit("rest"))
        .alias("source"),
    )


def valid_filter() -> Column:
    """P5 validation predicate: positive price/qty, sane event-time range
    (transformer.py:71-84, :241-260; feature_builder.py:109-117)."""
    return (
        (F.col("price") > 0)
        & (F.col("qty") > 0)
        & (F.col("event_ts") >= TS_MIN_MS)
        & (F.col("event_ts") < TS_MAX_MS)
    )


def valid_trades(events: DataFrame) -> DataFrame:
    """Normalized + validated trades (the standard engine input)."""
    return trades(events).filter(valid_filter())


def bba(events: DataFrame) -> DataFrame:
    """events → canonical best-bid/ask stream (BestBidAsk.avsc field set).

    Synthetic but deterministic: bid at `value`, ask a few bps above, sizes
    derived from the json payload — exercises the same spread/mid arithmetic
    as the reference (feature_builder.py:220-225, :264-266).
    """
    event_ts = F.expr("ts div 1000")
    k = _props_k()
    return events.select(
        F.upper(F.col("event_type")).alias("symbol"),
        event_ts.cast("long").alias("event_ts"),
        (event_ts + (F.col("event_id") % 250)).cast("long").alias("ingest_ts"),
        F.col("value").alias("bid_px"),
        (k + F.lit(1.0)).alias("bid_sz"),
        (F.col("value") * (F.lit(1.0) + (F.col("event_id") % 50 + 1) / F.lit(10000.0))).alias(
            "ask_px"
        ),
        ((k + F.lit(1.0)) * (F.lit(1.0) + (F.col("event_id") % 7) / F.lit(10.0))).alias("ask_sz"),
        F.when(F.col("event_id") % 10 < 7, F.lit("sbe")).otherwise(F.lit("rest")).alias("source"),
    ).filter(F.col("bid_px") > 0)


def depth(events: DataFrame) -> DataFrame:
    """events → canonical depth-snapshot stream (DepthDelta.avsc shape, at-rest
    form: array<struct<price double, qty double>> per SURVEY §1.5).

    Ten deterministic levels per side built with array higher-order functions
    (JVM-side `transform(sequence(...))` — no Python in the loop).  Level i
    (1-based): bid price = price*(1 - i/1000), ask price = price*(1 + i/1000),
    qty = (k+1)/i — descending-bid / ascending-ask book like the reference's
    top-10 Redis book (docs/architecture/DATA_PIPELINE.md:73-107).
    """
    event_ts = F.expr("ts div 1000")
    base = events.select(
        F.upper(F.col("event_type")).alias("symbol"),
        event_ts.cast("long").alias("event_ts"),
        F.col("event_id").cast("long").alias("last_update_id"),
        F.col("value").alias("price"),
        (_props_k() + 1.0).alias("k"),
    ).filter(F.col("price") > 0)
    bids = F.expr(
        "transform(sequence(1, 10), i -> struct("
        "  price * (1.0 - i / 1000.0) AS price,"
        "  k / i AS qty))"
    )
    asks = F.expr(
        "transform(sequence(1, 10), i -> struct("
        "  price * (1.0 + i / 1000.0) AS price,"
        "  k / i AS qty))"
    )
    return base.select(
        "symbol",
        "event_ts",
        "last_update_id",
        bids.alias("bids"),
        asks.alias("asks"),
    )
