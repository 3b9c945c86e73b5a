"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Engine implementation lives in ``bitcoin_datapipeline_spark/``; this module
only wires (spark, sf_dir) → DataFrame callables and their DuckDB twins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bitcoin_datapipeline_spark import oracle_defs as OD
from bitcoin_datapipeline_spark.functions import normalize
from bitcoin_datapipeline_spark.operators import aggregates, dedup
from bitcoin_datapipeline_spark.plans import pipeline
from bitcoin_datapipeline_spark.tables import table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable + its DuckDB twin."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# P1/P3/P12 — normalization projection (SURVEY §2.2)
# ---------------------------------------------------------------------------
@q(
    "q_normalize_trades",
    OD.with_ctes(OD.TRADES_CTE, body="SELECT * FROM trades"),
)
def q_normalize_trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize.trades(table(spark, sf_dir, "events"))


# P5 — validation filter
@q(
    "q_validate_filter",
    OD.with_ctes(OD.VALID_TRADES_CTE, body="SELECT * FROM valid_trades"),
)
def q_validate_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize.valid_trades(table(spark, sf_dir, "events"))


# D1 — windowed keyed dedup (first-wins)
@q(
    "q_dedup_trades",
    OD.with_ctes(OD.DEDUP_TRADES_CTE, body="SELECT * FROM dedup_trades"),
)
def q_dedup_trades(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.trades_clean(spark, sf_dir)


# D2 — sink-side composite-key duplicate accounting
@q(
    "q_dedup_sink_stats",
    OD.with_ctes(
        OD.VALID_TRADES_CTE,
        body="""
SELECT symbol,
       CAST(sum(n) AS BIGINT)            AS total_rows,
       CAST(count(*) AS BIGINT)          AS distinct_keys,
       CAST(sum(n) - count(*) AS BIGINT) AS duplicate_rows
FROM (
  SELECT symbol, event_ts, source, coalesce(trade_id, 0) AS k_trade_id,
         count(*) AS n
  FROM valid_trades
  GROUP BY 1, 2, 3, 4
)
GROUP BY symbol""",
    ),
)
def q_dedup_sink_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.sink_key_stats(
        normalize.valid_trades(table(spark, sf_dir, "events"))
    )


# A4 — flagship: 1-minute OHLCV bars
@q(
    "q_bars_1m",
    OD.with_ctes(OD.BARS_1M_CTE, body="SELECT * FROM bars"),
)
def q_bars_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.bars_pipeline(spark, sf_dir)


# A6 — incremental high-watermark
@q(
    "q_max_ts",
    OD.with_ctes(
        OD.VALID_TRADES_CTE,
        body="""
SELECT symbol, source, CAST(max(event_ts) AS BIGINT) AS max_event_ts
FROM valid_trades GROUP BY symbol, source""",
    ),
)
def q_max_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return aggregates.max_ts(normalize.valid_trades(table(spark, sf_dir, "events")))


# A7 — counts
@q(
    "q_counts",
    OD.with_ctes(
        OD.VALID_TRADES_CTE,
        body="SELECT symbol, CAST(count(*) AS BIGINT) AS n FROM valid_trades GROUP BY symbol",
    ),
)
def q_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return aggregates.counts(normalize.valid_trades(table(spark, sf_dir, "events")))


# ---------------------------------------------------------------------------
# driver contract surface
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return pipeline.bars_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
