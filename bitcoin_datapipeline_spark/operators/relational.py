"""Generic relational surface over the star schema (SURVEY §2.6 J5, §2.7,
FIXTURES.md §6): broadcast-dim enrichment joins, semi/anti joins
(the reference's processed-file-set pattern, s3_reader.py:94-96), grouped
aggregates, pivot, rollup, top-K.

Money arithmetic policy — decimal-exact sums
--------------------------------------------
Revenue-style aggregates reach ~1e9 at sf0.01; double summation-order noise
across engines (~1e-5 absolute at that magnitude) exceeds any fixed-decimal
rounding, so these queries CANNOT be double-summed and hash-compared.
Instead every money sum casts its operands to DECIMAL(18,4) (exact — the
inputs have ≤2 decimals), sums exactly, and casts the final value to double.
Bit-identical across engines, and on a cluster decimal partial aggregation
is still map-side combinable.

Join strategy: region/nation/supplier/part are classic broadcast dims (25 /
5 / tiny rows; at 100 TB they are still ≤ MBs).  customer and orders join
on hashed keys; AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import r6

D = "decimal(18,4)"


def _dec(c):
    return c.cast(D)


def _ranked_top_k(df: DataFrame, order_cols, k: int, rank_name: str) -> DataFrame:
    """Deterministic global top-K WITH a rank column, and no unpartitioned
    window over the full relation: ``orderBy().limit(k)`` plans
    TakeOrderedAndProject (per-partition heap + driver merge — scale-safe at
    any row count), and only the K survivors pass through a constant-keyed
    row_number window (K rows; the constant key keeps WindowExec off its
    move-everything-to-one-partition path)."""
    topk = df.orderBy(*order_cols).limit(k)
    w = Window.partitionBy(F.lit(0)).orderBy(*order_cols)
    return topk.withColumn(rank_name, F.row_number().over(w))


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: 2-key groupBy, 8 aggregates, exact
    decimal money sums, avg via exact-sum / count."""
    li = lineitem.filter(F.col("l_shipdate") <= F.lit("1997-09-02").cast("timestamp_ntz"))
    disc_price = _dec(F.col("l_extendedprice")) * _dec(1.0 - F.col("l_discount"))
    charge = _dec(F.col("l_extendedprice")) * _dec(
        (1.0 - F.col("l_discount")) * (1.0 + F.col("l_tax"))
    )
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec(F.col("l_quantity"))).alias("sq"),
        F.sum(_dec(F.col("l_extendedprice"))).alias("sbp"),
        F.sum(disc_price).alias("sdp"),
        F.sum(charge).alias("sc"),
        F.count("*").alias("n"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sq").cast("double").alias("sum_qty"),
        F.col("sbp").cast("double").alias("sum_base_price"),
        F.col("sdp").cast("double").alias("sum_disc_price"),
        F.col("sc").cast("double").alias("sum_charge"),
        (F.col("sq").cast("double") / F.col("n")).alias("avg_qty"),
        (F.col("sbp").cast("double") / F.col("n")).alias("avg_price"),
        F.col("n").cast("long").alias("count_order"),
    )


PRICING_SUMMARY_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)      AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST((1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,4))) AS DOUBLE)
                                                                   AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*)      AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1997-09-02'
GROUP BY l_returnflag, l_linestatus"""


def revenue_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H-Q5-shaped enrichment chain: fact ⋈ fact ⋈ dim ⋈ dim ⋈ dim with
    explicit broadcasts on the small dims (J5)."""
    rev = _dec(F.col("l_extendedprice")) * _dec(1.0 - F.col("l_discount"))
    o96 = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    j = (
        lineitem.join(o96, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        j.groupBy("r_name", "n_name")
        .agg(F.sum(rev).alias("rev"), F.count("*").alias("n"))
        .select(
            "r_name",
            "n_name",
            F.col("rev").cast("double").alias("revenue"),
            F.col("n").cast("long").alias("n_lineitems"),
        )
    )


REVENUE_BY_NATION_ORACLE = """
SELECT r_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY r_name, n_name"""


def top_customers(lineitem: DataFrame, orders: DataFrame, customer: DataFrame, k: int = 10) -> DataFrame:
    """O4/W5 on the star schema: top-K customers by exact revenue.

    Rank AFTER aggregation, via TakeOrderedAndProject (_ranked_top_k) — no
    global window touches the full per-customer relation."""
    rev = _dec(F.col("l_extendedprice")) * _dec(1.0 - F.col("l_discount"))
    # pre-aggregate to order grain BEFORE the join: the lineitem side
    # shrinks ~4× and the join carries one row per order.  Decimal sums
    # re-aggregate exactly, so the per-customer totals are unchanged.
    per_order = lineitem.groupBy("l_orderkey").agg(F.sum(rev).alias("orev"))
    per_cust = (
        per_order.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("orev").alias("rev"))
    )
    ranked = _ranked_top_k(
        per_cust, [F.col("rev").desc(), F.col("o_custkey")], k, "revenue_rank"
    )
    return (
        ranked.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("revenue_rank").cast("int").alias("revenue_rank"),
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            "c_mktsegment",
            F.col("rev").cast("double").alias("revenue"),
        )
    )


TOP_CUSTOMERS_ORACLE = """
WITH per_cust AS (
  SELECT o_custkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey
),
ranked AS (
  SELECT o_custkey, rev,
         CAST(row_number() OVER (ORDER BY rev DESC, o_custkey) AS INTEGER)
             AS revenue_rank
  FROM per_cust
)
SELECT revenue_rank, CAST(c_custkey AS BIGINT) AS c_custkey, c_name, c_mktsegment,
       CAST(rev AS DOUBLE) AS revenue
FROM ranked JOIN customer ON o_custkey = c_custkey
WHERE revenue_rank <= 10"""


def rollup_sales(
    orders: DataFrame, customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Grouping-sets surface (SURVEY §2.4 note): revenue by (region, year)
    with ROLLUP — subtotals + grand total in one pass via Catalyst's
    Expand."""
    j = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    g = j.rollup("r_name", F.year("o_orderdate").cast("int").alias("order_year")).agg(
        F.sum(_dec(F.col("o_totalprice"))).alias("rev"),
        F.count("*").alias("n"),
    )
    return g.select(
        "r_name",
        "order_year",
        F.col("rev").cast("double").alias("revenue"),
        F.col("n").cast("long").alias("n_orders"),
    )


ROLLUP_SALES_ORACLE = """
SELECT r_name, CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, CAST(year(o_orderdate) AS INTEGER))"""


def pivot_orderstatus(orders: DataFrame) -> DataFrame:
    """Pivot via conditional aggregation (engine-portable form of
    `.pivot()` — identical plan, and expressible in ANSI SQL for the
    oracle): order totals by priority × status."""
    def status_sum(s):
        return F.sum(
            F.when(F.col("o_orderstatus") == s, _dec(F.col("o_totalprice"))).otherwise(
                F.lit(0).cast(D)
            )
        )

    g = orders.groupBy("o_orderpriority").agg(
        status_sum("O").alias("o"),
        status_sum("F").alias("f"),
        status_sum("P").alias("p"),
        F.count("*").alias("n"),
    )
    return g.select(
        "o_orderpriority",
        F.col("o").cast("double").alias("open_total"),
        F.col("f").cast("double").alias("finished_total"),
        F.col("p").cast("double").alias("pending_total"),
        F.col("n").cast("long").alias("n_orders"),
    )


PIVOT_ORDERSTATUS_ORACLE = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS open_total,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS finished_total,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS pending_total,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_orderpriority"""


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti join — the processed-set skip pattern (s3_reader.py:94-96 skips
    files already seen; D2 skips rows already inserted)."""
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


CUSTOMERS_WITHOUT_ORDERS_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi join — EXISTS."""
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_nationkey", "c_acctbal")


CUSTOMERS_WITH_ORDERS_ORACLE = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""


def forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H-Q6-shaped pure filter-aggregate: the pushdown showcase — every
    predicate reaches the parquet scan (PushedFilters), only four columns are
    read, and the whole query is one codegen'd scan + scalar agg with no
    shuffle beyond the final single-row combine."""
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = _dec(F.col("l_extendedprice")) * _dec(F.col("l_discount"))
    return li.groupBy().agg(
        F.sum(rev).cast("double").alias("forecast_revenue"),
        F.count("*").cast("long").alias("n_lineitems"),
    )


FORECAST_REVENUE_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS forecast_revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"""


def shipping_priority(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, k: int = 10
) -> DataFrame:
    """TPC-H-Q3-shaped join + agg + top-N: unshipped BUILDING-segment orders
    by revenue.  Rank after the per-order aggregate (small), deterministic
    (revenue desc, orderkey) tiebreak."""
    rev = _dec(F.col("l_extendedprice")) * _dec(1.0 - F.col("l_discount"))
    cutoff = F.lit("1996-06-30").cast("timestamp_ntz")
    j = (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    per_order = j.groupBy("o_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(rev).alias("rev")
    )
    return (
        _ranked_top_k(
            per_order, [F.col("rev").desc(), F.col("o_orderkey")], k, "priority_rank"
        )
        .select(
            F.col("priority_rank").cast("int").alias("priority_rank"),
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            "o_orderdate",
            "o_orderpriority",
            F.col("rev").cast("double").alias("revenue"),
        )
    )


SHIPPING_PRIORITY_ORACLE = """
WITH per_order AS (
  SELECT o_orderkey, o_orderdate, o_orderpriority,
         sum(CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_shipdate > TIMESTAMP '1996-06-30'
    AND o_orderdate < TIMESTAMP '1996-06-30'
    AND c_mktsegment = 'BUILDING'
  GROUP BY 1, 2, 3
)
SELECT CAST(priority_rank AS INTEGER) AS priority_rank,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       o_orderdate, o_orderpriority,
       CAST(rev AS DOUBLE) AS revenue
FROM (
  SELECT *, row_number() OVER (ORDER BY rev DESC, o_orderkey) AS priority_rank
  FROM per_order
)
WHERE priority_rank <= 10"""


def promo_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H-Q14-shaped conditional revenue share: promo-part revenue as a
    percentage of total, per month — broadcast part dim, decimal-exact
    numerator/denominator, one exact double division at the end."""
    rev = _dec(F.col("l_extendedprice")) * _dec(1.0 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(D))
    j = lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    g = j.groupBy(
        F.year("l_shipdate").cast("int").alias("ship_year"),
        F.month("l_shipdate").cast("int").alias("ship_month"),
    ).agg(
        F.sum(promo).alias("promo_rev"),
        F.sum(rev).alias("total_rev"),
        F.count("*").alias("n"),
    )
    return g.select(
        "ship_year",
        "ship_month",
        F.col("promo_rev").cast("double").alias("promo_revenue"),
        F.col("total_rev").cast("double").alias("total_revenue"),
        r6(
            F.col("promo_rev").cast("double") / F.col("total_rev").cast("double") * 100.0
        ).alias("promo_share_pct"),
        F.col("n").cast("long").alias("n_lineitems"),
    )


PROMO_REVENUE_ORACLE = """
SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(month(l_shipdate) AS INTEGER) AS ship_month,
       CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(1.0 - l_discount AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
       round(CAST(sum(CASE WHEN p_type = 'PROMO'
                           THEN CAST(l_extendedprice AS DECIMAL(18,4))
                                * CAST(1.0 - l_discount AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                        * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE)
             * 100.0, 6) AS promo_share_pct,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2"""


def returned_item_customers(
    lineitem: DataFrame, orders: DataFrame, customer: DataFrame, k: int = 20
) -> DataFrame:
    """TPC-H-Q10-shaped: customers ranked by revenue lost to returned items
    (l_returnflag = 'R') — join chain, filtered agg, deterministic top-K."""
    rev = _dec(F.col("l_extendedprice")) * _dec(1.0 - F.col("l_discount"))
    j = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
    )
    per_cust = j.groupBy("c_custkey", "c_name", "c_mktsegment").agg(
        F.sum(rev).alias("lost"), F.count("*").alias("n")
    )
    return (
        _ranked_top_k(
            per_cust, [F.col("lost").desc(), F.col("c_custkey")], k, "return_rank"
        )
        .select(
            F.col("return_rank").cast("int").alias("return_rank"),
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            "c_mktsegment",
            F.col("lost").cast("double").alias("returned_revenue"),
            F.col("n").cast("long").alias("n_returned_items"),
        )
    )


RETURNED_CUSTOMERS_ORACLE = """
WITH per_cust AS (
  SELECT c_custkey, c_name, c_mktsegment,
         sum(CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS lost,
         count(*) AS n
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
  GROUP BY 1, 2, 3
)
SELECT CAST(return_rank AS INTEGER) AS return_rank,
       CAST(c_custkey AS BIGINT) AS c_custkey, c_name, c_mktsegment,
       CAST(lost AS DOUBLE) AS returned_revenue,
       CAST(n AS BIGINT) AS n_returned_items
FROM (
  SELECT *, row_number() OVER (ORDER BY lost DESC, c_custkey) AS return_rank
  FROM per_cust
)
WHERE return_rank <= 20"""


LARGE_ORDER_MIN_QTY = 200.0


def large_orders(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    min_qty: float = LARGE_ORDER_MIN_QTY,
) -> DataFrame:
    """TPC-H-Q18-shaped: customers who placed very large-quantity orders —
    aggregate to order grain FIRST (combinable, shrinks the join input),
    filter on the exact decimal quantity sum, then enrich with order and
    customer attributes."""
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.sum(_dec(F.col("l_quantity"))).alias("tq")
    )
    big = per_order.filter(F.col("tq") > min_qty)
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            "o_orderdate",
            F.col("o_totalprice").alias("o_totalprice"),
            F.col("tq").cast("double").alias("total_qty"),
        )
    )


LARGE_ORDERS_ORACLE = f"""
WITH per_order AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,4))) AS tq
  FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
       CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderdate,
       o_totalprice, CAST(tq AS DOUBLE) AS total_qty
FROM per_order
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE tq > {LARGE_ORDER_MIN_QTY}"""


MARKET_SHARE_NATION = "NATION_2"


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = MARKET_SHARE_NATION,
) -> DataFrame:
    """TPC-H-Q8-shaped: one nation's share of regional revenue per order
    year.  Same broadcast-dim enrichment chain as revenue_by_nation; the
    share is a conditional decimal sum over the same aggregate (one pass,
    no second join)."""
    rev = _dec(F.col("l_extendedprice")) * _dec(1.0 - F.col("l_discount"))
    nat_rev = F.when(F.col("n_name") == target_nation, rev).otherwise(
        F.lit(0.0).cast(D)
    )
    j = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    g = j.groupBy("r_name", F.year("o_orderdate").cast("int").alias("o_year")).agg(
        F.sum(rev).alias("total"), F.sum(nat_rev).alias("nat")
    )
    return g.select(
        "r_name",
        "o_year",
        F.col("total").cast("double").alias("total_revenue"),
        F.col("nat").cast("double").alias("nation_revenue"),
        r6(F.col("nat").cast("double") / F.col("total").cast("double") * 100.0).alias(
            "market_share_pct"
        ),
    )


MARKET_SHARE_ORACLE = f"""
SELECT r_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
       CAST(sum(CASE WHEN n_name = '{MARKET_SHARE_NATION}'
                     THEN CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(1.0 - l_discount AS DECIMAL(18,4))
                     ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nation_revenue,
       round(CAST(sum(CASE WHEN n_name = '{MARKET_SHARE_NATION}'
                           THEN CAST(l_extendedprice AS DECIMAL(18,4))
                                * CAST(1.0 - l_discount AS DECIMAL(18,4))
                           ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                        * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE)
             * 100.0, 6) AS market_share_pct
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, year(o_orderdate)"""


ORDER_PRIORITY_SHIP_FROM = "1996-01-01"
ORDER_PRIORITY_SHIP_TO = "1996-07-01"


def order_priority_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H-Q4-shaped order-priority check: count orders per priority that
    have AT LEAST ONE lineitem shipped inside the window — an EXISTS
    subquery expressed as a left-semi join on the order key.

    Plan shape: the date filter prunes lineitem at the scan, the semi join
    carries only o_orderkey from the probe side (no fact-fact row blowup —
    semi joins short-circuit on first match), and the priority count is a
    5-group aggregate."""
    shipped = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(ORDER_PRIORITY_SHIP_FROM).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(ORDER_PRIORITY_SHIP_TO).cast("timestamp_ntz"))
    ).select("l_orderkey")
    return (
        orders.join(shipped, orders.o_orderkey == shipped.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )


ORDER_PRIORITY_ORACLE = f"""
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate >= TIMESTAMP '{ORDER_PRIORITY_SHIP_FROM}'
    AND l_shipdate <  TIMESTAMP '{ORDER_PRIORITY_SHIP_TO}'
)
GROUP BY o_orderpriority"""


def disjunctive_parts_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H-Q19-shaped disjunctive-predicate revenue: OR of per-brand
    conjunct groups mixing part attributes (brand, size) with lineitem
    attributes (quantity).  The join itself stays a plain broadcast
    equi-join on partkey; only the residual disjunction filters joined rows
    — the shape Catalyst handles by pushing the common partkey equality
    down and keeping the OR as a post-join filter, plus scan-level IN/range
    pushdown for the union of each side's constraints."""
    j = lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(10, 30))
            & (F.col("l_quantity").between(10, 40))
        )
    )
    revenue = F.sum(
        _dec(F.col("l_extendedprice")) * _dec(1.0 - F.col("l_discount"))
    )
    return (
        j.filter(cond)
        .groupBy("p_brand")
        .agg(
            revenue.cast("double").alias("revenue"),
            F.count("*").cast("long").alias("n_lineitems"),
            F.avg("l_quantity").alias("avg_qty_raw"),
        )
        .select(
            "p_brand",
            "revenue",
            "n_lineitems",
            r6(F.col("avg_qty_raw")).alias("avg_qty"),
        )
    )


DISJUNCTIVE_PARTS_ORACLE = """
SELECT p_brand,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       round(avg(l_quantity), 6) AS avg_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 40)
GROUP BY p_brand"""


def supplier_revenue_above_avg(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H-Q11-shaped: suppliers whose revenue exceeds 1.05x the average
    supplier revenue — a HAVING over a GLOBAL scalar, broadcast to the
    per-supplier aggregate (the uniform synthetic revenue spread tops out
    ~1.12x average, so 1.05 keeps the survivor set non-trivial).

    The threshold compare stays integer/decimal-exact cross-engine:
    ``rev * 20 * n > 21 * total`` instead of ``rev > 1.05 * (total / n)`` —
    no double division anywhere near the predicate, so the survivor set is
    bit-identical in both engines no matter the summation order."""
    rev = lineitem.groupBy("l_suppkey").agg(
        F.sum(_dec(F.col("l_extendedprice")) * _dec(1.0 - F.col("l_discount"))).alias(
            "rev"
        )
    )
    totals = rev.groupBy().agg(
        F.sum("rev").alias("total"), F.count("*").alias("n_suppliers")
    )
    kept = (
        rev.join(F.broadcast(totals))
        .filter(F.col("rev") * 20 * F.col("n_suppliers") > 21 * F.col("total"))
    )
    return (
        kept.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("rev").cast("double").alias("revenue"),
            r6(
                F.col("rev").cast("double") / F.col("total").cast("double") * 100.0
            ).alias("revenue_share_pct"),
        )
    )


SUPPLIER_ABOVE_AVG_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(1.0 - l_discount AS DECIMAL(18,4))) AS rev
  FROM lineitem GROUP BY l_suppkey
),
totals AS (SELECT sum(rev) AS total, count(*) AS n_suppliers FROM rev)
SELECT s_suppkey, s_name, n_name,
       CAST(rev AS DOUBLE) AS revenue,
       round(CAST(rev AS DOUBLE) / CAST(total AS DOUBLE) * 100.0, 6)
           AS revenue_share_pct
FROM rev CROSS JOIN totals
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE rev * 20 * n_suppliers > 21 * total"""


def repeat_purchase_intervals(orders: DataFrame) -> DataFrame:
    """Repeat-customer purchase cadence: per customer with ≥2 orders,
    the count, mean/max gap in days between consecutive orders (by
    order date, keyed deterministic on o_orderkey for same-day ties),
    and lifetime spend — the retention/LTV substrate a growth dashboard
    aggregates (here kept at customer grain so the cadence joins back
    to segments).

    Exactness: gaps are exact integer datediff days; the mean divides
    an exact integer sum; spend is an exact DECIMAL(18,2)-grid sum.

    Plan shape: ONE partitionBy(custkey) sort for the lag, one
    per-customer aggregate riding the same partitioning (no second
    exchange).

    cf. reference: extends the surface (TPC-H-style windowed retention;
    no reference counterpart)."""
    wl = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(
        F.col("o_orderdate"), F.lag("o_orderdate").over(wl)
    )
    g = orders.select(
        "o_custkey",
        "o_totalprice",
        gap.alias("gap_days"),
    )
    return (
        g.groupBy("o_custkey")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.count("gap_days").cast("long").alias("n_gaps"),
            F.sum("gap_days").cast("long").alias("sum_gap_days"),
            F.max("gap_days").cast("long").alias("max_gap_days"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("double")
            .alias("lifetime_spend"),
        )
        .filter(F.col("n_orders") >= 2)
        .select(
            "o_custkey",
            "n_orders",
            r6(F.col("sum_gap_days") / F.col("n_gaps")).alias(
                "mean_gap_days"
            ),
            "max_gap_days",
            r6(F.col("lifetime_spend")).alias("lifetime_spend"),
        )
    )


REPEAT_PURCHASE_ORACLE = """
WITH rp AS (
  SELECT o_custkey, o_totalprice,
         datediff('day',
                  lag(o_orderdate) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey),
                  o_orderdate) AS gap_days
  FROM orders
)
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(gap_days) * 1.0 / count(gap_days), 6) AS mean_gap_days,
       CAST(max(gap_days) AS BIGINT) AS max_gap_days,
       round(CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                       AS DECIMAL(38,2)) AS DOUBLE), 6) AS lifetime_spend
FROM rp
GROUP BY o_custkey
HAVING count(*) >= 2"""


def cohort_retention(orders: DataFrame, max_months: int = 6) -> DataFrame:
    """Classic cohort-retention matrix over orders: customers grouped by
    their FIRST order month (the cohort), then for each month offset
    0..``max_months`` the count and share of the cohort that ordered
    again in that month — the activation/retention table every growth
    dashboard opens with.

    Determinism: cohort and offset are exact integer month arithmetic
    (months_between on first-of-month truncations is integral);
    shares divide exact counts.

    Plan shape: one per-customer min-date aggregate (broadcast back —
    customer count is the small side vs the order fact), one
    (cohort, offset) count-distinct aggregate, one cohort-size
    broadcast join.  No window needed.

    cf. reference: extends the surface (no reference counterpart)."""
    first = orders.groupBy("o_custkey").agg(
        F.trunc(F.min("o_orderdate"), "month").alias("cohort_month")
    )
    j = orders.join(F.broadcast(first), "o_custkey").select(
        "o_custkey",
        F.date_format("cohort_month", "yyyy-MM").alias("cohort"),
        F.months_between(
            F.trunc(F.col("o_orderdate"), "month"), F.col("cohort_month")
        )
        .cast("int")
        .alias("offset"),
    ).filter(F.col("offset") <= max_months)
    active = j.groupBy("cohort", "offset").agg(
        F.countDistinct("o_custkey").cast("long").alias("n_active")
    )
    size = j.filter(F.col("offset") == 0).groupBy("cohort").agg(
        F.countDistinct("o_custkey").cast("long").alias("cohort_size")
    )
    return active.join(F.broadcast(size), "cohort").select(
        "cohort",
        "offset",
        "cohort_size",
        "n_active",
        r6(F.col("n_active") / F.col("cohort_size")).alias("retention"),
    )


COHORT_RETENTION_ORACLE = """
WITH cr_first AS (
  SELECT o_custkey, date_trunc('month', min(o_orderdate)) AS cohort_month
  FROM orders GROUP BY o_custkey
),
cr_j AS (
  SELECT o.o_custkey,
         strftime(f.cohort_month, '%Y-%m') AS cohort,
         CAST(datediff('month', f.cohort_month,
                       date_trunc('month', o.o_orderdate)) AS INTEGER)
             AS "offset"
  FROM orders o JOIN cr_first f USING (o_custkey)
  WHERE datediff('month', f.cohort_month,
                 date_trunc('month', o.o_orderdate)) <= {max_months}
),
cr_a AS (
  SELECT cohort, "offset",
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active
  FROM cr_j GROUP BY cohort, "offset"
),
cr_s AS (
  SELECT cohort, CAST(count(DISTINCT o_custkey) AS BIGINT) AS cohort_size
  FROM cr_j WHERE "offset" = 0 GROUP BY cohort
)
SELECT a.cohort, a."offset" AS offset, s.cohort_size, a.n_active,
       round(a.n_active * 1.0 / s.cohort_size, 6) AS retention
FROM cr_a a JOIN cr_s s USING (cohort)""".replace("{max_months}", "6")


def customer_pareto(
    orders: DataFrame, customer: DataFrame
) -> DataFrame:
    """Revenue-concentration (Pareto) report per market segment: rank
    each segment's customers by lifetime spend, and report what share
    of segment revenue its top customer and top decile capture — the
    80/20 check a revenue dashboard opens with, and the skew signal
    that warns which segment keys would hot-spot a customer-partitioned
    join.

    Determinism: spends are exact DECIMAL(18,2) sums; ranks break ties
    on custkey; the decile cut is integer ceil arithmetic; shares
    divide exact decimals cast to double once.

    Plan shape: one per-customer spend aggregate, a broadcast segment
    lookup, ONE per-segment sort (rank + running sum ride it), one
    K_segment-row aggregate.

    cf. reference: extends the surface (no reference counterpart)."""
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("spend")
    )
    seg = customer.select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    j = spend.join(F.broadcast(seg), "o_custkey")
    wl = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("spend"), "o_custkey"
    )
    wc = wl.rowsBetween(Window.unboundedPreceding, 0)
    ranked = j.select(
        "c_mktsegment",
        "spend",
        F.row_number().over(wl).alias("rnk"),
        F.sum("spend").over(wc).cast("decimal(38,2)").alias("cum_spend"),
        F.count("*")
        .over(Window.partitionBy("c_mktsegment"))
        .alias("n_seg"),
    )
    g = ranked.groupBy("c_mktsegment").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("spend").cast("decimal(38,2)").alias("total"),
        F.max(F.when(F.col("rnk") == 1, F.col("spend"))).alias("top1"),
        F.max(
            F.when(
                F.col("rnk") == F.ceil(F.col("n_seg") / 10.0),
                F.col("cum_spend"),
            )
        ).alias("decile_cum"),
    )
    return g.select(
        F.col("c_mktsegment").alias("segment"),
        "n_customers",
        r6(F.col("total").cast("double")).alias("total_revenue"),
        r6(F.col("top1").cast("double") / F.col("total").cast("double")).alias(
            "top1_share"
        ),
        r6(
            F.col("decile_cum").cast("double")
            / F.col("total").cast("double")
        ).alias("top_decile_share"),
    )


CUSTOMER_PARETO_ORACLE = """
WITH cp_s AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
             AS spend
  FROM orders GROUP BY o_custkey
),
cp_j AS (
  SELECT c.c_mktsegment, s.spend, s.o_custkey
  FROM cp_s s JOIN customer c ON s.o_custkey = c.c_custkey
),
cp_r AS (
  SELECT c_mktsegment, spend,
         row_number() OVER w AS rnk,
         CAST(sum(spend) OVER (PARTITION BY c_mktsegment
             ORDER BY spend DESC, o_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DECIMAL(38,2)) AS cum_spend,
         count(*) OVER (PARTITION BY c_mktsegment) AS n_seg
  FROM cp_j
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY spend DESC, o_custkey)
)
SELECT c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(CAST(sum(spend) AS DECIMAL(38,2)) AS DOUBLE), 6)
           AS total_revenue,
       round(CAST(max(CASE WHEN rnk = 1 THEN spend END) AS DOUBLE)
             / CAST(CAST(sum(spend) AS DECIMAL(38,2)) AS DOUBLE), 6)
           AS top1_share,
       round(CAST(max(CASE WHEN rnk = CAST(ceil(n_seg / 10.0) AS BIGINT)
                           THEN cum_spend END) AS DOUBLE)
             / CAST(CAST(sum(spend) AS DECIMAL(38,2)) AS DOUBLE), 6)
           AS top_decile_share
FROM cp_r GROUP BY c_mktsegment"""


def scd2_history(orders: DataFrame) -> DataFrame:
    """Slowly-changing-dimension type-2 history builder — the CDC →
    warehouse-dimension pattern: treat each customer's order stream as
    an attribute update log (here ``o_orderpriority``), collapse
    CONSECUTIVE equal values into one validity interval
    (gaps-and-islands: change-flag lag + running island id), and emit
    per (customer, island): the attribute value, valid_from (first
    observation), valid_to (the next island's valid_from — the standard
    exclusive upper bound), is_current, and how many updates the island
    absorbed.  This is how a MERGE-less lakehouse derives dimension
    history from an append-only log.

    Determinism: islands key on exact (o_orderdate, o_orderkey) order;
    all outputs are values, dates, and integer counts.

    Plan shape: ONE partitionBy(custkey) sort carries the change lag,
    the running island id, and the island lead — the island aggregate
    rides the same partitioning.

    cf. reference: extends the surface (warehouse-modeling pattern; no
    reference counterpart)."""
    wl = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = (
        F.lag("o_orderpriority").over(wl).isNull()
        | (F.lag("o_orderpriority").over(wl) != F.col("o_orderpriority"))
    ).cast("int")
    wc = wl.rowsBetween(Window.unboundedPreceding, 0)
    islands = orders.select(
        "o_custkey",
        "o_orderdate",
        "o_orderpriority",
        F.sum(chg).over(wc).alias("island"),
    )
    g = islands.groupBy("o_custkey", "island").agg(
        F.min("o_orderdate").alias("valid_from"),
        F.max("o_orderpriority").alias("priority"),
        F.count("*").cast("long").alias("n_updates"),
    )
    wi = Window.partitionBy("o_custkey").orderBy("island")
    return g.select(
        "o_custkey",
        F.col("island").cast("long").alias("version"),
        "priority",
        "valid_from",
        F.lead("valid_from").over(wi).alias("valid_to"),
        F.lead("valid_from").over(wi).isNull().alias("is_current"),
        "n_updates",
    )


SCD2_HISTORY_ORACLE = """
WITH sc_c AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
         CASE WHEN lag(o_orderpriority) OVER w IS NULL
                OR lag(o_orderpriority) OVER w != o_orderpriority
              THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
sc_i AS (
  SELECT o_custkey, o_orderdate, o_orderpriority,
         sum(chg) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM sc_c
),
sc_g AS (
  SELECT o_custkey, island,
         min(o_orderdate) AS valid_from,
         max(o_orderpriority) AS priority,
         CAST(count(*) AS BIGINT) AS n_updates
  FROM sc_i GROUP BY o_custkey, island
)
SELECT o_custkey,
       CAST(island AS BIGINT) AS version,
       priority, valid_from,
       lead(valid_from) OVER w2 AS valid_to,
       lead(valid_from) OVER w2 IS NULL AS is_current,
       n_updates
FROM sc_g
WINDOW w2 AS (PARTITION BY o_custkey ORDER BY island)"""


def weekly_revenue_growth(orders: DataFrame) -> DataFrame:
    """Week-over-week revenue growth per order priority class: weekly
    exact-decimal revenue, the previous OBSERVED week's revenue, and
    the WoW growth rate — the time-series trend view every revenue
    dashboard draws, expressed as one calendar aggregate + one lag.

    Week key: ISO year-week from date_trunc('week') — both engines
    truncate to the same Monday, so the key is engine-stable (unlike
    weekofyear, whose year-boundary conventions differ).

    Determinism: revenue is an exact DECIMAL(18,2) sum; growth divides
    the exact sums cast to double once.

    Plan shape: one (priority, week) aggregate, one priority-keyed lag
    window over ≤ priorities × weeks rows.

    cf. reference: extends the surface (no reference counterpart)."""
    wk = F.date_format(
        F.date_trunc("week", F.col("o_orderdate")), "yyyy-MM-dd"
    )
    g = orders.groupBy(
        F.col("o_orderpriority").alias("priority"), wk.alias("week_start")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("rev"),
    )
    wl = Window.partitionBy("priority").orderBy("week_start")
    prev = F.lag("rev").over(wl)
    return g.select(
        "priority",
        "week_start",
        "n_orders",
        r6(F.col("rev").cast("double")).alias("revenue"),
        r6(prev.cast("double")).alias("prev_revenue"),
        F.when(
            prev.isNotNull() & (prev != 0),
            r6(
                (F.col("rev").cast("double") - prev.cast("double"))
                / prev.cast("double")
            ),
        ).alias("wow_growth"),
    )


WEEKLY_REVENUE_GROWTH_ORACLE = """
WITH wr_g AS (
  SELECT o_orderpriority AS priority,
         strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week_start,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
             AS rev
  FROM orders GROUP BY 1, 2
)
SELECT priority, week_start, n_orders,
       round(CAST(rev AS DOUBLE), 6) AS revenue,
       round(CAST(lag(rev) OVER w AS DOUBLE), 6) AS prev_revenue,
       CASE WHEN lag(rev) OVER w IS NOT NULL AND lag(rev) OVER w != 0
            THEN round((CAST(rev AS DOUBLE)
                        - CAST(lag(rev) OVER w AS DOUBLE))
                       / CAST(lag(rev) OVER w AS DOUBLE), 6)
       END AS wow_growth
FROM wr_g
WINDOW w AS (PARTITION BY priority ORDER BY week_start)"""
