"""Reshaping surface (SURVEY §2.4/§2.9 extensions): CUBE grouping sets with
grouping_id, wide→long unpivot, and within-partition rank bucketing
(ntile / cume_dist) — the three classic layout transforms the round-3
surface expressed only partially (ROLLUP and pivot existed; their inverses
did not).

Cross-engine contracts pinned here:
- Spark ``grouping_id()`` and DuckDB ``GROUPING_ID()`` agree bit-for-bit
  (first grouping column = most-significant bit) — verified in
  tests/test_reshape.py;
- ``ntile(n)`` fills the FIRST buckets with the extra rows in both engines
  (ANSI), and is made deterministic by a total-order tiebreak;
- unpivot is Catalyst ``Expand`` (same operator CUBE uses) — map-side only,
  output rows = input rows × metric count, no shuffle.

Scale notes: CUBE multiplies the aggregate input by the number of grouping
sets (4 here) BEFORE the shuffle — fine for low-cardinality keys like
segment × status; for high-cardinality cubes prefer separate rollups.
The decile window partitions by (symbol, day) — bounded partitions at any
corpus size, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import r6

D = "decimal(18,4)"


def cube_sales(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Revenue cube over (market segment, order status): every grouping
    set — detail, each one-key subtotal, grand total — in one pass via
    Catalyst Expand, with ``grouping_id`` disambiguating subtotal rows
    from genuine NULL keys."""
    j = orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
    g = j.cube("c_mktsegment", "o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast(D)).alias("rev"),
        F.count("*").alias("n"),
        F.grouping_id().alias("gid"),
    )
    return g.select(
        "c_mktsegment",
        "o_orderstatus",
        F.col("gid").cast("int").alias("gid"),
        F.col("rev").cast("double").alias("revenue"),
        F.col("n").cast("long").alias("n_orders"),
    )


CUBE_SALES_ORACLE = """
SELECT c_mktsegment, o_orderstatus,
       CAST(GROUPING_ID(c_mktsegment, o_orderstatus) AS INTEGER) AS gid,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY CUBE (c_mktsegment, o_orderstatus)"""


UNPIVOT_STATUS_METRICS = ("open_total", "finished_total", "pending_total")


def unpivot_order_metrics(orders: DataFrame) -> DataFrame:
    """Wide→long inverse of ``relational.pivot_orderstatus``: per order
    year, the three status totals as (metric, total) rows.  Spark's
    ``unpivot`` plans a single Expand — map-side, no shuffle beyond the
    source aggregate."""

    def status_sum(s):
        return F.sum(
            F.when(F.col("o_orderstatus") == s, F.col("o_totalprice").cast(D)).otherwise(
                F.lit(0).cast(D)
            )
        )

    wide = orders.groupBy(F.year("o_orderdate").cast("int").alias("order_year")).agg(
        status_sum("O").cast("double").alias("open_total"),
        status_sum("F").cast("double").alias("finished_total"),
        status_sum("P").cast("double").alias("pending_total"),
    )
    return wide.unpivot(
        ids=["order_year"],
        values=list(UNPIVOT_STATUS_METRICS),
        variableColumnName="metric",
        valueColumnName="total",
    )


UNPIVOT_ORDER_METRICS_ORACLE = """
WITH wide AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4))
                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS open_total,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4))
                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS finished_total,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4))
                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS pending_total
  FROM orders GROUP BY year(o_orderdate)
)
SELECT order_year, 'open_total' AS metric, open_total AS total FROM wide
UNION ALL
SELECT order_year, 'finished_total', finished_total FROM wide
UNION ALL
SELECT order_year, 'pending_total', pending_total FROM wide"""


PRICE_DECILE_N = 10
MS_PER_DAY = 86_400_000


def price_deciles(dedup_trades: DataFrame, n: int = PRICE_DECILE_N) -> DataFrame:
    """Within-day price deciles per symbol: ntile(n) over (price,
    trade_id) inside each (symbol, day) partition, then per-decile stats.
    The tiebreak on trade_id makes bucket membership total-ordered and
    deterministic; partitioning by day bounds every window partition to
    one symbol-day of ticks regardless of corpus size (same day-keying as
    operators/grid.py).

    cume_dist at each decile's upper edge is reported r6-rounded — the
    only float-derived output; counts and min/max prices are exact."""
    day = (F.col("event_ts") / F.lit(MS_PER_DAY)).cast("long").alias("trade_day")
    w = Window.partitionBy("symbol", "trade_day").orderBy("price", "trade_id")
    t = dedup_trades.select("symbol", day, "price", "trade_id").withColumn(
        "decile", F.ntile(n).over(w)
    ).withColumn("cd", F.cume_dist().over(w))
    return (
        t.groupBy("symbol", "trade_day", "decile")
        .agg(
            F.count("*").cast("long").alias("n_trades"),
            F.min("price").alias("lo_price"),
            F.max("price").alias("hi_price"),
            r6(F.max("cd")).alias("edge_cume_dist"),
        )
    )


# CTE + body for oracle_defs.with_ctes(DEDUP_TRADES_CTE, PRICE_DECILE_CTE, ...)
PRICE_DECILE_CTE = f"""
decile_ranked AS (
  SELECT symbol, event_ts // {MS_PER_DAY} AS trade_day, price, trade_id,
         ntile({PRICE_DECILE_N}) OVER (
             PARTITION BY symbol, event_ts // {MS_PER_DAY}
             ORDER BY price, trade_id) AS decile,
         cume_dist() OVER (
             PARTITION BY symbol, event_ts // {MS_PER_DAY}
             ORDER BY price, trade_id) AS cd
  FROM dedup_trades
)"""

PRICE_DECILE_BODY = """
SELECT symbol, trade_day, decile,
       CAST(count(*) AS BIGINT) AS n_trades,
       min(price) AS lo_price,
       max(price) AS hi_price,
       round(max(cd), 6) AS edge_cume_dist
FROM decile_ranked
GROUP BY symbol, trade_day, decile"""
