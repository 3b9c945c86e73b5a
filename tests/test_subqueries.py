"""Structural tests for operators/subqueries.py and operators/reshape.py —
invariants and plan shapes the DuckDB oracle compare can't see (the oracle
pins values; these pin the physical strategy and the algebraic identities).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bitcoin_datapipeline_spark.operators import reshape, subqueries
from bitcoin_datapipeline_spark.plans import pipeline
from bitcoin_datapipeline_spark.tables import table


@pytest.fixture(scope="module")
def sf01():
    return "/root/testdata/sf0.001"


def _plan(spark, df, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_volume_shipping_broadcasts_both_nation_legs(spark, sf01):
    """Q7 shape: supplier-leg and the two nation joins must be broadcast —
    only the lineitem ⋈ orders ⋈ customer chain may shuffle."""
    df = subqueries.volume_shipping(
        table(spark, sf01, "lineitem"),
        table(spark, sf01, "orders"),
        table(spark, sf01, "customer"),
        table(spark, sf01, "supplier"),
        table(spark, sf01, "nation"),
    )
    plan = _plan(spark, df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_customer_distribution_counts_every_customer(spark, sf01):
    """Q13 identity: the distribution must partition the customer relation
    exactly — sum(custdist) == |customer|, and the zero bucket equals the
    anti-join count against the filtered orders."""
    customer = table(spark, sf01, "customer")
    orders = table(spark, sf01, "orders")
    dist = subqueries.customer_distribution(customer, orders).collect()
    assert sum(r.custdist for r in dist) == customer.count()
    zero = next((r.custdist for r in dist if r.c_count == 0), 0)
    kept = orders.filter(
        F.col("o_orderpriority") != subqueries.CUSTOMER_DIST_EXCLUDED_PRIORITY
    )
    expected_zero = customer.join(
        kept, customer.c_custkey == kept.o_custkey, "left_anti"
    ).count()
    assert zero == expected_zero


def test_waiting_suppliers_one_wait_per_order(spark, sf01):
    """Q21 identity: each qualifying order names exactly one waiting
    supplier, so sum(numwait) == count of multi-supplier 'F' orders with a
    unique latest shipper."""
    lineitem = table(spark, sf01, "lineitem")
    orders = table(spark, sf01, "orders")
    supplier = table(spark, sf01, "supplier")
    out = subqueries.waiting_suppliers(lineitem, orders, supplier)
    total_waits = out.agg(F.sum("numwait")).collect()[0][0] or 0

    f_orders = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    per_os = (
        lineitem.join(f_orders, lineitem.l_orderkey == f_orders.o_orderkey, "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("s_last_ship"))
    )
    per_order = per_os.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.max("s_last_ship").alias("o_last_ship"),
        F.max(F.struct("s_last_ship", "l_suppkey")).alias("_m"),
    )
    # qualifying orders: >1 supplier and a unique max ship date
    at_max = per_os.join(
        per_order.select("l_orderkey", "o_last_ship", "n_supp"), "l_orderkey"
    ).filter(F.col("s_last_ship") == F.col("o_last_ship"))
    qualifying = (
        at_max.groupBy("l_orderkey", "n_supp")
        .agg(F.count("*").alias("n_at_max"))
        .filter((F.col("n_supp") > 1) & (F.col("n_at_max") == 1))
        .count()
    )
    assert total_waits == qualifying
    assert total_waits > 0, "fixture must exercise the qualifying branch"


def test_waiting_suppliers_shares_one_window_exchange(spark, sf01):
    """Both per-order windows partition on the same key — the plan must not
    re-shuffle between them (one hashpartitioning on l_orderkey feeds both
    Window operators)."""
    df = subqueries.waiting_suppliers(
        table(spark, sf01, "lineitem"),
        table(spark, sf01, "orders"),
        table(spark, sf01, "supplier"),
    )
    plan = _plan(spark, df, "simple")
    n_order_exchanges = plan.count("hashpartitioning(l_orderkey")
    # ONE exchange on the order key serves the (order, supplier) aggregate
    # AND both windows (HashPartitioning(l_orderkey) satisfies the
    # two-key clustering) — see the repartition note in waiting_suppliers
    assert n_order_exchanges == 1, plan


def test_small_qty_predicate_is_integer_exact(spark, sf01):
    """The 5*qty*cnt < sum cross-multiplication must match the double form
    qty < 0.2*avg on this data (they are equivalent — the point of the
    rewrite is only to remove the cross-engine double hazard)."""
    lineitem = table(spark, sf01, "lineitem")
    per_part = lineitem.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )
    j = lineitem.join(per_part, lineitem.l_partkey == per_part.pk)
    int_form = j.filter(
        5 * F.col("l_quantity").cast("long") * F.col("cnt") < F.col("sum_qty")
    ).count()
    dbl_form = j.filter(F.col("l_quantity") < 0.2 * F.col("avg_qty")).count()
    assert int_form == dbl_form


def test_min_cost_supplier_no_self_join(spark, sf01):
    """Q2 shape must resolve the correlated min via one aggregate — no
    second lineitem scan and no SortMergeJoin of lineitem against itself."""
    df = subqueries.min_cost_supplier(
        table(spark, sf01, "lineitem"),
        table(spark, sf01, "part"),
        table(spark, sf01, "supplier"),
        table(spark, sf01, "nation"),
    )
    plan = _plan(spark, df)
    assert plan.count("lineitem.parquet") <= 1, "correlated min re-scans the fact"


def test_cube_sales_grouping_sets(spark, sf01):
    """CUBE must emit all four grouping sets with the documented gid bit
    order (first column = most-significant bit)."""
    out = reshape.cube_sales(
        table(spark, sf01, "orders"), table(spark, sf01, "customer")
    ).collect()
    gids = {r.gid for r in out}
    assert gids == {0, 1, 2, 3}
    for r in out:
        assert (r.c_mktsegment is None) == bool(r.gid & 2)
        assert (r.o_orderstatus is None) == bool(r.gid & 1)
    # grand total row consistency
    total = next(r for r in out if r.gid == 3)
    detail = [r for r in out if r.gid == 0]
    assert total.n_orders == sum(r.n_orders for r in detail)


def test_unpivot_is_expand_not_join(spark, sf01):
    """Wide→long must plan a single Expand — no union-of-scans, no join."""
    df = reshape.unpivot_order_metrics(table(spark, sf01, "orders"))
    plan = _plan(spark, df)
    assert "Expand" in plan
    assert plan.count("orders.parquet") == 1, "unpivot re-scanned the source"


def test_price_deciles_are_ordered_partitions(spark, sf01):
    """Within each (symbol, day): decile sizes differ by ≤1 (ANSI ntile)
    and price ranges are non-overlapping in decile order."""
    out = reshape.price_deciles(pipeline.trades_clean(spark, sf01)).collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault((r.symbol, r.trade_day), []).append(r)
    assert by_key
    for rows in by_key.values():
        rows.sort(key=lambda r: r.decile)
        sizes = [r.n_trades for r in rows]
        assert max(sizes) - min(sizes) <= 1
        for a, b in zip(rows, rows[1:]):
            assert a.hi_price <= b.lo_price
        assert abs(rows[-1].edge_cume_dist - 1.0) < 1e-9


def test_temperature_resample_rebalances_langs(spark, sf01):
    """The sqrt-law mix: the rarest language keeps everything (p = 1);
    dominant languages downsample toward sqrt-share; realized keep rates
    track keep_prob within binomial noise."""
    from bitcoin_datapipeline_spark.operators import text as T

    docs = table(spark, sf01, "documents")
    before = {r.lang: r.cnt for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    out = T.temperature_resample(docs)
    rows = out.collect()
    n_min = min(before.values())
    kept: dict = {}
    probs: dict = {}
    for r in rows:
        kept[r.lang] = kept.get(r.lang, 0) + 1
        probs[r.lang] = r.keep_prob
    # rarest stratum fully kept
    rarest = min(before, key=lambda k: before[k])
    assert kept[rarest] == before[rarest]
    assert probs[rarest] == 1.0
    for lang, n in before.items():
        p = (n_min / n) ** 0.5
        assert abs(probs[lang] - round(p, 6)) < 1e-9
        # 4-sigma binomial envelope
        sigma = (n * p * (1 - p)) ** 0.5
        assert abs(kept.get(lang, 0) - n * p) <= 4 * sigma + 1


def test_compaction_hits_target_and_is_idempotent(spark, tmp_path):
    """Small-file compaction: a partition fragmented into many files is
    rewritten to ceil(bytes/target) files with identical rows; a second
    sweep is a no-op."""
    from bitcoin_datapipeline_spark.sources import compact

    root = str(tmp_path / "lake")
    df = spark.range(0, 20_000).selectExpr(
        "id", "id % 7 AS k", "repeat('x', 64) AS pad"
    )
    df.repartition(40).write.parquet(root)  # 40 shards of one partition
    n0, bytes0 = compact._dir_stats(root)
    assert n0 == 40
    target = max(1, bytes0 // 3)  # force ~3-4 output files
    stats = compact.compact_tree(spark, root, target_bytes=target)
    assert len(stats) == 1 and stats[0]["rewritten"]
    want = -(-bytes0 // target)
    assert stats[0]["files_after"] == want
    back = spark.read.parquet(root)
    assert back.count() == 20_000
    assert back.agg(F.sum("id")).collect()[0][0] == sum(range(20_000))
    # idempotent second sweep
    stats2 = compact.compact_tree(spark, root, target_bytes=target)
    assert not stats2[0]["rewritten"]


def test_repeat_purchase_intervals_hand_built(spark):
    """Gap arithmetic on exact datediff days; single-order customers
    drop; lifetime spend is the exact 2-dp sum."""
    import datetime as dt

    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.relational import (
        repeat_purchase_intervals,
    )

    def o(key, cust, day, price):
        return Row(o_orderkey=key, o_custkey=cust,
                   o_orderdate=dt.datetime(2024, 1, day),
                   o_totalprice=float(price))

    orders = [
        o(1, 7, 1, 100.10), o(2, 7, 4, 200.20), o(3, 7, 10, 50.05),
        o(4, 9, 2, 999.99),                       # single order: dropped
        o(5, 8, 5, 10.0), o(6, 8, 5, 20.0),       # same-day pair: gap 0
    ]
    out = {r.o_custkey: r for r in repeat_purchase_intervals(
        spark.createDataFrame(orders)
    ).collect()}
    assert set(out) == {7, 8}
    c7 = out[7]
    assert c7.n_orders == 3
    assert c7.mean_gap_days == round((3 + 6) / 2, 6)
    assert c7.max_gap_days == 6
    assert c7.lifetime_spend == 350.35
    c8 = out[8]
    assert (c8.mean_gap_days, c8.max_gap_days) == (0.0, 0)


def test_cohort_retention_hand_built(spark):
    """Two cohorts with hand-countable comeback months; retention at
    offset 0 is 1.0 by construction and customers count once per month
    however many orders they place."""
    import datetime as dt

    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.relational import (
        cohort_retention,
    )

    def o(key, cust, y, m, d):
        return Row(o_orderkey=key, o_custkey=cust,
                   o_orderdate=dt.datetime(y, m, d), o_totalprice=1.0)

    orders = [
        # cohort 2024-01: customers 1, 2; cust 1 returns in Feb (twice)
        o(1, 1, 2024, 1, 5), o(2, 2, 2024, 1, 20),
        o(3, 1, 2024, 2, 3), o(4, 1, 2024, 2, 28),
        # cust 2 returns in March
        o(5, 2, 2024, 3, 1),
        # cohort 2024-02: customer 3, never returns
        o(6, 3, 2024, 2, 14),
    ]
    out = {(r.cohort, r.offset): r for r in
           cohort_retention(spark.createDataFrame(orders)).collect()}
    jan = out[("2024-01", 0)]
    assert (jan.cohort_size, jan.n_active, jan.retention) == (2, 2, 1.0)
    assert out[("2024-01", 1)].n_active == 1      # cust 1, counted once
    assert out[("2024-01", 1)].retention == 0.5
    assert out[("2024-01", 2)].n_active == 1      # cust 2 in March
    assert ("2024-02", 1) not in out              # cohort 3 never returns
    assert out[("2024-02", 0)].cohort_size == 1


def test_customer_pareto_hand_built(spark):
    """One whale and nine minnows in one segment: top-1 share is the
    whale's fraction and the top decile (ceil(10/10) = rank 1) equals
    it; a two-customer segment's decile is also its top customer."""
    import datetime as dt

    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.relational import (
        customer_pareto,
    )

    orders = [
        Row(o_orderkey=i, o_custkey=c, o_orderdate=dt.datetime(2024, 1, 1),
            o_totalprice=float(p))
        for i, (c, p) in enumerate(
            [(1, 910.0)] + [(k, 10.0) for k in range(2, 11)]  # seg A
            + [(20, 75.0), (21, 25.0)]                        # seg B
        )
    ]
    cust = [
        Row(c_custkey=c, c_name=f"c{c}", c_nationkey=0, c_acctbal=0.0,
            c_mktsegment=("A" if c < 20 else "B"))
        for c in list(range(1, 11)) + [20, 21]
    ]
    out = {r.segment: r for r in customer_pareto(
        spark.createDataFrame(orders), spark.createDataFrame(cust)
    ).collect()}
    a = out["A"]
    assert (a.n_customers, a.total_revenue) == (10, 1000.0)
    assert a.top1_share == 0.91 and a.top_decile_share == 0.91
    b = out["B"]
    assert b.top1_share == 0.75
    assert b.top_decile_share == 0.75  # ceil(2/10) = rank 1


def test_scd2_history_hand_built(spark):
    """Consecutive equal priorities collapse into one version; a change
    opens a new version whose valid_from closes the previous one; the
    last version is current with NULL valid_to; same-day ties resolve
    on orderkey."""
    import datetime as dt

    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.relational import scd2_history

    def o(key, cust, day, prio):
        return Row(o_orderkey=key, o_custkey=cust,
                   o_orderdate=dt.datetime(2024, 1, day),
                   o_orderpriority=prio)

    orders = [
        o(1, 7, 1, "HIGH"), o(2, 7, 3, "HIGH"),     # island 1: 2 updates
        o(3, 7, 5, "LOW"),                          # island 2
        o(4, 7, 9, "HIGH"),                         # island 3 (re-change)
        # same-day tie: key 5 then 6 -> LOW first, HIGH second
        o(5, 8, 2, "LOW"), o(6, 8, 2, "HIGH"),
    ]
    out = {(r.o_custkey, r.version): r for r in scd2_history(
        spark.createDataFrame(orders)
    ).collect()}
    c7v1 = out[(7, 1)]
    assert (c7v1.priority, c7v1.n_updates) == ("HIGH", 2)
    assert c7v1.valid_from == dt.datetime(2024, 1, 1)
    assert c7v1.valid_to == dt.datetime(2024, 1, 5)
    assert c7v1.is_current is False
    assert out[(7, 2)].priority == "LOW"
    c7v3 = out[(7, 3)]
    assert c7v3.is_current is True and c7v3.valid_to is None
    # coverage is contiguous: each valid_to equals the next valid_from
    assert out[(7, 2)].valid_to == c7v3.valid_from
    # same-day tie on orderkey: LOW (key 5) is version 1, HIGH current
    assert out[(8, 1)].priority == "LOW" and out[(8, 2)].is_current is True


def test_weekly_revenue_growth_hand_built(spark):
    """Weeks truncate to Mondays; the first observed week has NULL
    growth; growth divides the exact weekly sums."""
    import datetime as dt

    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.relational import (
        weekly_revenue_growth,
    )

    def o(key, day, price, prio="HIGH"):
        return Row(o_orderkey=key, o_custkey=1,
                   o_orderdate=dt.datetime(2024, 1, day),
                   o_totalprice=float(price), o_orderpriority=prio)

    # 2024-01-01 is a Monday; week 1: days 1-7, week 2: days 8-14
    orders = [
        o(1, 2, 100.0), o(2, 5, 100.0),    # week of Jan 1: 200
        o(3, 9, 300.0),                    # week of Jan 8: 300 -> +50%
        o(4, 16, 150.0),                   # week of Jan 15: 150 -> -50%
    ]
    out = {r.week_start: r for r in weekly_revenue_growth(
        spark.createDataFrame(orders)
    ).collect()}
    assert out["2024-01-01"].revenue == 200.0
    assert out["2024-01-01"].wow_growth is None
    assert out["2024-01-08"].wow_growth == 0.5
    assert out["2024-01-15"].wow_growth == -0.5
    assert out["2024-01-15"].prev_revenue == 300.0
