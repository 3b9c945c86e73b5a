"""Correlated-subquery and multi-join relational shapes (SURVEY §2.7
extensions — the remaining classic decision-support query forms the round-3
surface did not yet cover: two-sided nation joins, correlated scalar
aggregates, grouped-outer-join distributions, distinct-count rollups, and
EXISTS/NOT-EXISTS pair logic).

Like ``relational.py`` these are TPC-H-*shaped*, adapted to the driver's
star schema (no partsupp / comment / shipmode / commitdate columns — see
FIXTURES.md).  Every money sum is decimal-exact (see relational.py's money
policy), and every threshold predicate that the classic query states as a
double comparison against an average is restated as an integer/decimal
cross-multiplication (``k * x * n  <>  sum``) so the survivor set is
bit-identical across engines regardless of summation order.

Scale notes (100 TB):
- supplier / nation / part / region are broadcast dims everywhere;
- fact-fact joins (lineitem ⋈ orders) stay hashed equi-joins on the order
  key with AQE skew handling (tests/test_plans.py pins the skew split);
- per-order "which supplier shipped last" logic uses windows PARTITIONED BY
  the order key — millions of small partitions, never a global sort;
- every aggregate here is partial-mergeable (sums, counts, min/max), so
  map-side combine applies before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import r6

D = "decimal(18,4)"


def _dec(c):
    return c.cast(D)


def _rev():
    return _dec(F.col("l_extendedprice")) * _dec(1.0 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# TPC-H-Q7-shaped: volume shipping between two nations
# ---------------------------------------------------------------------------

VOLUME_SHIP_NATION_A = "NATION_1"
VOLUME_SHIP_NATION_B = "NATION_2"


def volume_shipping(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = VOLUME_SHIP_NATION_A,
    nation_b: str = VOLUME_SHIP_NATION_B,
) -> DataFrame:
    """Q7 shape: revenue shipped between a nation pair, per direction and
    ship year.  The supplier side resolves through l_suppkey → supplier →
    nation and the customer side through o_custkey → customer → nation —
    the same dim table joined twice under different roles.

    Plan: both nation legs and supplier broadcast (tiny); the nation-pair
    filter is pushed onto each *leg* before the fact-fact join, so only
    lineitems of nation-A/B suppliers and orders of nation-A/B customers
    reach the join — at 100 TB that is a ~(2/25)² input reduction ahead of
    the only shuffle."""
    supp_n = (
        supplier.join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .filter(F.col("n_name").isin(nation_a, nation_b))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_n = (
        customer.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .filter(F.col("n_name").isin(nation_a, nation_b))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    j = (
        lineitem.join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust_n, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    g = j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(F.sum(_rev()).alias("rev"), F.count("*").alias("n"))
    return g.select(
        "supp_nation",
        "cust_nation",
        "l_year",
        F.col("rev").cast("double").alias("revenue"),
        F.col("n").cast("long").alias("n_lineitems"),
    )


VOLUME_SHIPPING_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(rev) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(1.0 - l_discount AS DECIMAL(18,4)) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('{VOLUME_SHIP_NATION_A}', '{VOLUME_SHIP_NATION_B}')
    AND n2.n_name IN ('{VOLUME_SHIP_NATION_A}', '{VOLUME_SHIP_NATION_B}')
    AND n1.n_name <> n2.n_name
)
GROUP BY supp_nation, cust_nation, l_year"""


# ---------------------------------------------------------------------------
# TPC-H-Q9-shaped: product-type profit by supplier nation and year
# ---------------------------------------------------------------------------

PRODUCT_PROFIT_TYPE = "STANDARD"


def product_profit(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    p_type: str = PRODUCT_PROFIT_TYPE,
) -> DataFrame:
    """Q9 shape: profit on one part type per (supplier nation, ship year).
    The schema has no partsupp.ps_supplycost, so cost is proxied by the
    part's retail price × quantity (decimal-exact either way — the shape
    under test is the 4-way join + signed decimal arithmetic, not the cost
    model).  Part and supplier/nation broadcast; one shuffle for the final
    two-key aggregate."""
    cost = _dec(F.col("p_retailprice")) * _dec(F.col("l_quantity"))
    j = (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == p_type)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    g = j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("l_shipdate").cast("int").alias("o_year"),
    ).agg(F.sum(_rev() - cost).alias("profit"), F.count("*").alias("n"))
    return g.select(
        "nation",
        "o_year",
        F.col("profit").cast("double").alias("sum_profit"),
        F.col("n").cast("long").alias("n_lineitems"),
    )


PRODUCT_PROFIT_ORACLE = f"""
SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                    * CAST(1.0 - l_discount AS DECIMAL(18,4))
                - CAST(p_retailprice AS DECIMAL(18,4))
                    * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = '{PRODUCT_PROFIT_TYPE}'
GROUP BY n_name, year(l_shipdate)"""


# ---------------------------------------------------------------------------
# TPC-H-Q12-shaped: late-shipment priority counts
# ---------------------------------------------------------------------------

LATE_SHIP_DAYS = 90


def late_shipments(
    lineitem: DataFrame, orders: DataFrame, late_days: int = LATE_SHIP_DAYS
) -> DataFrame:
    """Q12 shape: per ship year, how many *late* lineitems (shipped more
    than ``late_days`` after the order date — the schema's stand-in for the
    commit/receipt-date lag) belong to critical-priority orders vs not.
    The CASE-count split is the Q12 signature; the date lag is exact
    timestamp arithmetic in both engines."""
    late = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {int(late_days)} DAYS")
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    g = late.groupBy(F.year("l_shipdate").cast("int").alias("ship_year")).agg(
        F.sum(F.when(crit, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(crit, 0).otherwise(1)).cast("long").alias("low_line_count"),
        F.count("*").cast("long").alias("late_line_count"),
    )
    return g


LATE_SHIPMENTS_ORACLE = f"""
SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count,
       CAST(count(*) AS BIGINT) AS late_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
GROUP BY year(l_shipdate)"""


# ---------------------------------------------------------------------------
# TPC-H-Q13-shaped: customer order-count distribution
# ---------------------------------------------------------------------------

CUSTOMER_DIST_EXCLUDED_PRIORITY = "1-URGENT"


def customer_distribution(
    customer: DataFrame,
    orders: DataFrame,
    excluded_priority: str = CUSTOMER_DIST_EXCLUDED_PRIORITY,
) -> DataFrame:
    """Q13 shape: distribution of customers by how many (non-excluded)
    orders they placed, INCLUDING zero-order customers — the left outer
    join + count(joined key) + re-group signature.

    Plan: orders pre-aggregates to per-customer counts first (combinable),
    then a left join from customer fills the zeros, then a tiny regroup on
    the count value.  The heavy relation is touched once."""
    per_cust = (
        orders.filter(F.col("o_orderpriority") != excluded_priority)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("c_count"))
    )
    filled = customer.join(
        per_cust, customer.c_custkey == per_cust.o_custkey, "left"
    ).select(F.coalesce(F.col("c_count"), F.lit(0)).cast("long").alias("c_count"))
    return (
        filled.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
    )


CUSTOMER_DISTRIBUTION_ORACLE = f"""
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN (SELECT * FROM orders
             WHERE o_orderpriority <> '{CUSTOMER_DIST_EXCLUDED_PRIORITY}') o
    ON c_custkey = o.o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count"""


# ---------------------------------------------------------------------------
# TPC-H-Q16-shaped: supplier variety per part group
# ---------------------------------------------------------------------------

PARTS_SUPPLIER_EXCLUDED_BRAND = "Brand#5"
PARTS_SUPPLIER_SIZES = (1, 5, 10, 15, 20, 25, 30, 35)


def parts_supplier_counts(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    excluded_brand: str = PARTS_SUPPLIER_EXCLUDED_BRAND,
    sizes: tuple = PARTS_SUPPLIER_SIZES,
) -> DataFrame:
    """Q16 shape: distinct suppliers able to supply each (brand, type,
    size) group, excluding a brand, restricting sizes, and excluding
    "complaint" suppliers (negative account balance — the schema's stand-in
    for the comment LIKE filter) via NOT IN ≡ anti join.

    lineitem plays the partsupp bridge (the schema has no partsupp): the
    (partkey, suppkey) pairs it witnesses.  Distinct-count is the one
    aggregate here that is NOT partial-mergeable in its exact form; Spark
    plans it as the standard two-phase Expand/partial-distinct, which
    scales (shuffle key is the group key + supplier)."""
    bad_supp = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    bridge = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") != excluded_brand)
                    & (F.col("p_size").isin(*sizes))
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    return (
        bridge.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


PARTS_SUPPLIER_COUNTS_ORACLE = f"""
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{PARTS_SUPPLIER_EXCLUDED_BRAND}'
  AND p_size IN {PARTS_SUPPLIER_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size"""


# ---------------------------------------------------------------------------
# TPC-H-Q17-shaped: small-quantity order revenue (correlated scalar avg)
# ---------------------------------------------------------------------------

SMALL_QTY_BRAND = "Brand#3"
SMALL_QTY_TYPE = "ECONOMY"


def small_qty_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = SMALL_QTY_BRAND,
    p_type: str = SMALL_QTY_TYPE,
) -> DataFrame:
    """Q17 shape: average yearly revenue lost if small-quantity orders
    (below 20% of that part's average order quantity) were not taken.
    The correlated scalar subquery ``avg(l_quantity) WHERE same part``
    becomes a per-part aggregate joined back to the detail rows.

    The classic ``l_quantity < 0.2 * avg(qty)`` double predicate is
    restated as ``5 * qty * cnt < sum_qty`` — all-integer (quantities are
    integral), so the survivor set cannot flip on cross-engine summation
    order.  Per-part stats are combinable and the join back is on the part
    key (broadcastable — bounded by part count, not lineitem count)."""
    li_qty = F.col("l_quantity").cast("long")
    per_part = lineitem.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.sum(li_qty).alias("sum_qty"), F.count("*").alias("cnt_qty")
    )
    target = part.filter(
        (F.col("p_brand") == brand) & (F.col("p_type") == p_type)
    ).select("p_partkey")
    small = (
        lineitem.join(F.broadcast(target), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(5 * li_qty * F.col("cnt_qty") < F.col("sum_qty"))
    )
    return small.groupBy().agg(
        (F.sum(_dec(F.col("l_extendedprice"))).cast("double") / 7.0).alias(
            "avg_yearly"
        ),
        F.count("*").cast("long").alias("n_small_lineitems"),
    )


SMALL_QTY_REVENUE_ORACLE = f"""
WITH per_part AS (
  SELECT l_partkey AS ap_partkey,
         sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
         count(*) AS cnt_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
           AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_small_lineitems
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN per_part ON l_partkey = ap_partkey
WHERE p_brand = '{SMALL_QTY_BRAND}' AND p_type = '{SMALL_QTY_TYPE}'
  AND 5 * CAST(l_quantity AS BIGINT) * cnt_qty < sum_qty"""


# ---------------------------------------------------------------------------
# TPC-H-Q21-shaped: suppliers who shipped last on multi-supplier orders
# ---------------------------------------------------------------------------


def waiting_suppliers(lineitem: DataFrame, orders: DataFrame, supplier: DataFrame) -> DataFrame:
    """Q21 shape: for finalized orders with several suppliers, find the
    supplier who was strictly the LAST to ship (EXISTS another supplier on
    the order, NOT EXISTS another supplier who shipped as late) and count
    such orders per supplier.

    The EXISTS/NOT-EXISTS pair collapses into per-order window aggregates
    over the (order, supplier) grain: order max ship date, supplier count,
    and how many suppliers attain the max.  Both windows partition by the
    order key — one keyed sort shared by both (Catalyst reuses the
    exchange), millions of tiny partitions at scale, no global ordering."""
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    # repartition on the ORDER key alone: HashPartitioning(l_orderkey)
    # satisfies the (l_orderkey, l_suppkey) aggregate's clustering AND the
    # windows' partitioning, so the whole left branch runs on ONE exchange
    # (without it the aggregate shuffles on both keys and the window
    # re-shuffles on the order key — a second full pass over the grain).
    per_os = (
        lineitem.join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("s_last_ship"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        per_os.withColumn("o_last_ship", F.max("s_last_ship").over(w))
        .withColumn("n_supp", F.count("*").over(w))
        .withColumn(
            "n_at_max",
            F.sum(
                F.when(F.col("s_last_ship") == F.col("o_last_ship"), 1).otherwise(0)
            ).over(w),
        )
    )
    waiting = flagged.filter(
        (F.col("n_supp") > 1)
        & (F.col("n_at_max") == 1)
        & (F.col("s_last_ship") == F.col("o_last_ship"))
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.col("numwait").cast("long").alias("numwait"),
        )
    )


WAITING_SUPPLIERS_ORACLE = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_last_ship
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
  GROUP BY l_orderkey, l_suppkey
),
maxed AS (
  SELECT l_orderkey, l_suppkey, s_last_ship,
         max(s_last_ship) OVER (PARTITION BY l_orderkey) AS o_last_ship,
         count(*) OVER (PARTITION BY l_orderkey) AS n_supp
  FROM per_os
),
flagged AS (
  SELECT *,
         sum(CASE WHEN s_last_ship = o_last_ship THEN 1 ELSE 0 END)
             OVER (PARTITION BY l_orderkey) AS n_at_max
  FROM maxed
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(count(*) AS BIGINT) AS numwait
FROM flagged
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp > 1 AND n_at_max = 1 AND s_last_ship = o_last_ship
GROUP BY s_suppkey, s_name"""


# ---------------------------------------------------------------------------
# TPC-H-Q22-shaped: sales opportunity among order-less rich customers
# ---------------------------------------------------------------------------

SALES_OPP_SEGMENTS = ("AUTOMOBILE", "MACHINERY", "HOUSEHOLD")
SALES_OPP_RECENT_CUTOFF = "1999-01-01"


def sales_opportunity(
    customer: DataFrame,
    orders: DataFrame,
    segments: tuple = SALES_OPP_SEGMENTS,
    recent_cutoff: str = SALES_OPP_RECENT_CUTOFF,
) -> DataFrame:
    """Q22 shape: per market segment (the phone-prefix stand-in), count
    customers with above-average positive balances and no RECENT orders
    (every synthetic customer has *some* order, so the classic "never
    ordered" form is vacuous here; "no order since the cutoff" keeps the
    NOT-EXISTS non-trivial).  Global scalar average → broadcast; NOT
    EXISTS → anti join; the above-average predicate is cross-multiplied
    (``bal * n > total``, decimal-exact — balances carry 2 decimals) so no
    double division sits under the filter."""
    seg = customer.filter(F.col("c_mktsegment").isin(*segments))
    pos = seg.filter(F.col("c_acctbal") > 0)
    avg_t = pos.groupBy().agg(
        F.sum(_dec(F.col("c_acctbal"))).alias("total_bal"),
        F.count("*").alias("n_pos"),
    )
    rich = seg.join(F.broadcast(avg_t)).filter(
        _dec(F.col("c_acctbal")) * F.col("n_pos") > F.col("total_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(recent_cutoff).cast("timestamp_ntz")
    )
    no_orders = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return (
        no_orders.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
    )


SALES_OPPORTUNITY_ORACLE = f"""
WITH seg AS (
  SELECT * FROM customer WHERE c_mktsegment IN {SALES_OPP_SEGMENTS}
),
avg_t AS (
  SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) AS total_bal,
         count(*) AS n_pos
  FROM seg WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM seg CROSS JOIN avg_t
WHERE CAST(c_acctbal AS DECIMAL(18,4)) * n_pos > total_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{SALES_OPP_RECENT_CUTOFF}')
GROUP BY c_mktsegment"""


# ---------------------------------------------------------------------------
# TPC-H-Q2-shaped: cheapest supplier per part (correlated min subquery)
# ---------------------------------------------------------------------------

MIN_COST_SIZE_MAX = 10


def min_cost_supplier(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    size_max: int = MIN_COST_SIZE_MAX,
) -> DataFrame:
    """Q2 shape: for each small part, the supplier who offered it at the
    lowest observed unit price (extendedprice / quantity — the partsupp
    supplycost stand-in), with supplier attributes attached.  The
    correlated ``= (SELECT min(...) WHERE same part)`` becomes a min_by
    per part: one combinable aggregate, no self-join, deterministic
    tie-break on (unit price, suppkey) via a packed struct min.

    Unit price is decimal/integer exact: price has ≤2 decimals and
    quantity is integral, so ``price * 10000 div qty`` is an exact BIGINT
    in both engines (no double division under the argmin)."""
    unit_e4 = F.expr(
        "CAST(CAST(l_extendedprice * 100 AS DECIMAL(18,0)) * 100 AS BIGINT)"
        " div CAST(l_quantity AS BIGINT)"
    )
    small = part.filter(F.col("p_size") <= size_max).select(
        "p_partkey", "p_brand", "p_type", "p_size"
    )
    offers = lineitem.join(
        F.broadcast(small), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        "p_partkey",
        "p_brand",
        "p_type",
        "p_size",
        "l_suppkey",
        unit_e4.alias("unit_e4"),
    )
    best = offers.groupBy("p_partkey", "p_brand", "p_type", "p_size").agg(
        F.min(F.struct("unit_e4", "l_suppkey")).alias("best")
    )
    return (
        best.select(
            F.col("p_partkey").cast("long").alias("p_partkey"),
            "p_brand",
            "p_type",
            "p_size",
            F.col("best.l_suppkey").cast("long").alias("s_suppkey"),
            (F.col("best.unit_e4").cast("double") / 10000.0).alias("min_unit_price"),
        )
        .join(F.broadcast(supplier), "s_suppkey")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "p_brand",
            "p_type",
            "p_size",
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("supp_nation"),
            "min_unit_price",
        )
    )


MIN_COST_SUPPLIER_ORACLE = f"""
WITH offers AS (
  SELECT p_partkey, p_brand, p_type, p_size, l_suppkey,
         CAST(CAST(l_extendedprice * 100 AS DECIMAL(18,0)) * 100 AS BIGINT)
             // CAST(l_quantity AS BIGINT) AS unit_e4
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_size <= {MIN_COST_SIZE_MAX}
),
best AS (
  SELECT p_partkey, p_brand, p_type, p_size, l_suppkey AS s_suppkey, unit_e4
  FROM offers
  QUALIFY row_number() OVER (
      PARTITION BY p_partkey ORDER BY unit_e4, l_suppkey) = 1
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_brand, p_type, p_size,
       CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       n_name AS supp_nation,
       CAST(unit_e4 AS DOUBLE) / 10000.0 AS min_unit_price
FROM best
JOIN supplier USING (s_suppkey)
JOIN nation ON s_nationkey = n_nationkey"""
