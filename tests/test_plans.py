"""Plan-shape regression tests — codified `.explain` audit.

These assert the PHYSICAL properties the scale design depends on
(SCALING.md): filter pushdown into the parquet scan, column pruning,
map-side partial aggregation, broadcast joins on dims, and WindowGroupLimit
pushdown for rankings.  A refactor that silently loses one of these still
returns correct rows — only the plan shows the regression.
"""

from __future__ import annotations

import re

import pytest


def _plan(spark, df, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@pytest.fixture(scope="module")
def sf01():
    return "/root/testdata/sf0.001"


def test_validation_filter_pushed_to_scan(spark, sf01):
    import __spark_entry__ as E

    plan = _plan(spark, E.queries()["q_bars_1m"](spark, sf01))
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThan\(value,0\.0\)", plan), (
        "price>0 must reach the parquet scan"
    )
    # column pruning: user_id is never needed by the pipeline
    m = re.search(r"ReadSchema: (struct<[^\n]*)", plan)
    assert m and "user_id" not in m.group(1), "unused columns must be pruned"


def test_pricing_summary_pushdown_and_partial_agg(spark, sf01):
    import __spark_entry__ as E

    plan = _plan(spark, E.queries()["q_pricing_summary"](spark, sf01))
    assert "LessThanOrEqual(l_shipdate" in plan
    assert "partial_" in plan, "aggregation must have a map-side partial phase"
    m = re.search(r"ReadSchema: (struct<[^\n]*)", plan)
    assert m and "l_suppkey" not in m.group(1)


def test_dim_joins_broadcast(spark, sf01):
    import __spark_entry__ as E

    plan = _plan(spark, E.queries()["q_revenue_by_nation"](spark, sf01))
    assert plan.count("BroadcastHashJoin") >= 2, "nation/region must broadcast"


def test_ranking_gets_window_group_limit(spark, sf01):
    import __spark_entry__ as E

    plan = _plan(spark, E.queries()["q_latest_per_key"](spark, sf01))
    assert "WindowGroupLimit" in plan, (
        "rank<=k must push a per-partition group limit below the exchange"
    )
    # exactly one shuffle for the whole latest-per-key query
    assert plan.count("Exchange") <= 2  # one exchange node + its reuse ref


def test_no_python_udf_in_relational_plans(spark, sf01):
    """UDF policy (SURVEY §2.11) + join-strategy floor: no Python
    evaluation in ANY declared query plan — only the multimodal
    decode/frames/resize paths may use Python (and those must be Arrow
    mapInPandas, asserted separately) — and no CartesianProduct anywhere:
    every join in the engine is bucketed/equi/broadcast by construction
    (1-row broadcast scalar joins plan as BroadcastNestedLoopJoin with a
    single build row, which is fine; an unkeyed big-big cross join would
    surface here as CartesianProduct)."""
    import __spark_entry__ as E

    multimodal = {
        "q_multimodal_meta",
        "q_multimodal_decode",
        "q_multimodal_frames",
        "q_multimodal_resize",
    }
    for name, fn in E.queries().items():
        plan = _plan(spark, fn(spark, sf01))
        assert "CartesianProduct" not in plan, name
        if name in multimodal:
            continue
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name
        assert "MapInPandas" not in plan, name


def test_multimodal_is_the_only_python_plan(spark, sf01):
    import __spark_entry__ as E

    plan = _plan(spark, E.queries()["q_multimodal_decode"](spark, sf01))
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_global_topk_plans_take_ordered(spark, sf01):
    """The three star-schema top-Ks must plan TakeOrderedAndProject
    (per-partition heap + driver merge) — never a global-window sort over
    the full per-key aggregate."""
    import __spark_entry__ as E

    for q in ("q_top_customers", "q_shipping_priority", "q_returned_customers"):
        plan = _plan(spark, E.queries()[q](spark, sf01))
        assert "TakeOrderedAndProject" in plan, f"{q} lost the top-K pushdown"


def test_locf_grid_pushdown_and_per_tick_partial_agg(spark, sf01):
    """The fixed-second grid must (a) push the validation filter into the
    parquet scan and (b) pre-aggregate ticks with a map-side partial phase —
    the compression step that makes the grid O(symbols × seconds) instead of
    O(ticks)."""
    import __spark_entry__ as E
    import re

    plan = _plan(spark, E.queries()["q_returns_1s"](spark, sf01))
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThan\(value,0\.0\)", plan)
    assert "partial_" in plan


def test_gold_vector_single_dedup_pass_and_shared_sort(spark, sf01):
    """The gold vector's analytic block must (a) run the expensive
    dedup shuffle ONCE — the lead-based gap-fill removed the grid-bounds
    branches that used to re-run it (3× in the executed plan) — and
    (b) share one (symbol, tick) sort across every Window operator."""
    import __spark_entry__ as E

    plan = _plan(spark, E.queries()["q_gold_vector_1s"](spark, sf01), "simple")
    dedup_ex = re.findall(
        r"Exchange hashpartitioning\(symbol#\d+, trade_id#\d+", plan
    )
    assert len(dedup_ex) == 1, f"dedup must shuffle once, saw {len(dedup_ex)}"
    tick_sorts = re.findall(r"Sort \[symbol#\d+ ASC NULLS FIRST, tick#\d+L", plan)
    # exactly two (symbol, tick) sorts: the gap-fill lead window at obs
    # grain, and ONE shared sort for the whole post-explode analytic block
    assert len(tick_sorts) == 2, (
        f"expected gap-fill sort + one shared analytic sort, saw {len(tick_sorts)}"
    )


def test_market_share_and_large_orders_partial_agg_broadcast(spark, sf01):
    """The Q8/Q18-shaped joins must keep map-side partial aggregation and
    broadcast their dimension sides."""
    import __spark_entry__ as E

    for name, min_bhj in (("q_market_share", 4), ("q_large_orders", 2)):
        plan = _plan(spark, E.queries()[name](spark, sf01))
        assert "partial_" in plan, name
        assert plan.count("BroadcastHashJoin") >= min_bhj, name


def test_orderbook_replay_collapses_before_explode(spark, sf01):
    """The replay must collapse the message log with a combinable partial
    max_by BEFORE exploding to level grain — the property that keeps the
    explode bounded by wall-clock, not message volume."""
    import __spark_entry__ as E

    plan = _plan(spark, E.queries()["q_orderbook_replay"](spark, sf01))
    assert "partial_max_by" in plan
    assert "explode" in plan


def test_bucketed_join_is_exchange_free(spark, sf01):
    """Co-located join contract: two tables bucketed on the join key with
    the same bucket count must SortMergeJoin with ZERO Exchange operators —
    the physical property that makes a repeated big-big join affordable at
    100 TB (one-time bucketed write replaces a per-query shuffle)."""
    from bitcoin_datapipeline_spark.functions.normalize import valid_trades
    from bitcoin_datapipeline_spark.sources.bucketed import (
        read_table,
        write_bucketed,
    )
    from bitcoin_datapipeline_spark.tables import table

    # managed tables land in the session's spark-warehouse dir; the DROPs
    # in the finally block delete their data (managed-table semantics)
    t = valid_trades(table(spark, sf01, "events"))
    write_bucketed(
        t, "bt_trades", ["symbol"], n_buckets=4, sort_cols=["symbol"]
    )
    agg = t.groupBy("symbol").count()
    write_bucketed(
        agg, "bt_counts", ["symbol"], n_buckets=4, sort_cols=["symbol"]
    )

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force SMJ so the assertion exercises the bucketed path, not BHJ
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = read_table(spark, "bt_trades").join(
            read_table(spark, "bt_counts"), "symbol"
        )
        plan = _plan(spark, j, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS bt_trades")
        spark.sql("DROP TABLE IF EXISTS bt_counts")


def test_partitioned_silver_scan_prunes_partitions(spark, sf01, tmp_path):
    """A symbol predicate over a Hive-partitioned silver table must appear
    as a PartitionFilter (directories skipped at planning) — NOT a data
    filter — and the scan must list only the matching partition."""
    from bitcoin_datapipeline_spark.functions.normalize import valid_trades
    from bitcoin_datapipeline_spark.sources.jsonl import write_silver_parquet
    from bitcoin_datapipeline_spark.tables import table

    out = str(tmp_path / "silver")
    write_silver_parquet(
        valid_trades(table(spark, sf01, "events")), out, ["symbol"]
    )
    df = spark.read.parquet(out).filter("symbol = 'CLICK'")
    plan = _plan(spark, df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "symbol" in m.group(1), "symbol must prune at partition level"
    assert df.count() > 0


def test_approx_percentile_tracks_exact(spark, sf01):
    """The 100 TB percentile path: approx_percentile (mergeable sketch, one
    pass, bounded memory) must track the exact percentile within the
    configured accuracy on the latency distribution the exact query serves."""
    from pyspark.sql import functions as F

    from bitcoin_datapipeline_spark.functions.normalize import valid_trades
    from bitcoin_datapipeline_spark.tables import table

    t = valid_trades(table(spark, sf01, "events")).withColumn(
        "lat", (F.col("ingest_ts") - F.col("event_ts")).cast("double")
    )
    rows = t.groupBy("symbol").agg(
        F.percentile("lat", 0.95).alias("exact"),
        F.percentile_approx("lat", 0.95, 10_000).alias("approx"),
    ).collect()
    assert rows
    for r in rows:
        # latencies are 0..249 ms; the sketch returns an actual data point
        # while the exact form interpolates — a few ms of play on a
        # 250-wide distribution is the expected gap, not sketch error
        assert abs(r["approx"] - r["exact"]) <= 4.0, r["symbol"]


def test_approx_percentile_knob_partial_aggregates(spark, sf01):
    """The approx=True knob on latency_percentiles / winsorize_volumes must
    plan the mergeable sketch as a map-side PARTIAL aggregate (bounded
    buffer merged across executors) — that partial-mergeability is the
    entire reason the knob exists; the default path must stay on exact
    `percentile` (the DuckDB-oracle contract)."""
    from bitcoin_datapipeline_spark.functions.normalize import valid_trades
    from bitcoin_datapipeline_spark.operators import aggregates
    from bitcoin_datapipeline_spark.plans import pipeline
    from bitcoin_datapipeline_spark.tables import table

    t = valid_trades(table(spark, sf01, "events"))
    approx_plan = _plan(spark, aggregates.latency_percentiles(t, approx=True))
    assert re.search(r"partial_approx_percentile|partial_percentile_approx",
                     approx_plan), "sketch must run as a map-side partial"
    assert "percentile(" not in approx_plan.replace("approx_percentile(", "")

    exact_plan = _plan(spark, aggregates.latency_percentiles(t))
    assert "approx_percentile" not in exact_plan, (
        "default path must keep the exact oracle-contract percentile"
    )

    wz = aggregates.winsorize_volumes(
        pipeline.bars_pipeline(spark, sf01), approx=True
    )
    assert re.search(r"partial_approx_percentile|partial_percentile_approx",
                     _plan(spark, wz))


def test_approx_distinct_knob_single_pass_and_accurate(spark, sf01):
    """distinct_counts(approx=True) must drop the Expand-based exact
    distinct (one extra shuffle per distinct column) for mergeable HLL++
    sketch partials, and stay within the configured relative error on the
    fixture cardinalities.  Default path must keep exact countDistinct
    (the DuckDB-oracle contract)."""
    from bitcoin_datapipeline_spark.functions.normalize import valid_trades
    from bitcoin_datapipeline_spark.operators import aggregates
    from bitcoin_datapipeline_spark.tables import table

    t = valid_trades(table(spark, sf01, "events"))
    approx_plan = _plan(spark, aggregates.distinct_counts(t, approx=True))
    assert "approx_count_distinct" in approx_plan
    assert "Expand" not in approx_plan, "HLL path must be a single aggregate"
    assert re.search(r"partial_approx_count_distinct", approx_plan), (
        "sketch must run as a map-side partial"
    )
    exact_plan = _plan(spark, aggregates.distinct_counts(t))
    assert "approx_count_distinct" not in exact_plan

    exact = {r.symbol: r for r in aggregates.distinct_counts(t).collect()}
    for r in aggregates.distinct_counts(t, approx=True, rsd=0.02).collect():
        e = exact[r.symbol]
        assert abs(r.n_distinct_ids - e.n_distinct_ids) <= max(
            3, 0.06 * e.n_distinct_ids
        ), (r.symbol, r.n_distinct_ids, e.n_distinct_ids)
        assert r.n_sources == e.n_sources  # tiny cardinalities stay exact


def test_runtime_bloom_filter_prunes_probe_scan(spark, sf01):
    """100 TB fact-fact join aid: with a selective filter on the build side,
    Spark's runtime row-level filtering must inject a bloom filter —
    `bloom_filter_agg` over the build keys, `might_contain` on the probe
    scan — so probe rows that cannot join die at the scan instead of
    crossing the shuffle.  Thresholds are production-scale by default
    (application side ≥ 10 GB), so this test lowers the application-side
    floor to exercise the rewrite on fixture data; the assertion is about
    the OPTIMIZER REWRITE, which is size-independent."""
    from pyspark.sql import functions as F

    from bitcoin_datapipeline_spark.tables import table

    tweaked = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in tweaked}
    try:
        for k, v in tweaked.items():
            spark.conf.set(k, v)
        orders = table(spark, sf01, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = table(spark, sf01, "lineitem")
        j = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        plan = _plan(spark, j)
        assert "bloom_filter_agg" in plan, "no bloom built on the filtered side"
        assert "might_contain" in plan, "probe scan not bloom-pruned"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(spark):
    """SCALING.md's join-skew story: salting covers aggregations
    (test_salted_aggregation_equivalence); JOIN skew is delegated to AQE's
    OptimizeSkewedJoin, which splits an oversized shuffle partition into
    parallel sub-reads at runtime. Pin that the executed plan actually
    marks the join skew-split on a synthetically hot key, so a conf
    regression (AQE or skewJoin disabled) can't silently serialize the hot
    key through one reducer."""
    from pyspark.sql import functions as F

    keys = [
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    saved = {k: spark.conf.get(k, None) for k in keys}
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # local-scale thresholds: production defaults (256 MB) scaled down so
        # a ~MB hot partition triggers the same code path the cluster hits
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        # no broadcast escape hatch — force the shuffle join AQE must repair
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
        )
        j = left.join(right, "k")
        # execute THIS DataFrame's plan (count() would spin up a separate
        # QueryExecution and leave j's own AQE plan un-finalized)
        assert len(j.collect()) == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, (
            "hot-key shuffle partition must be skew-split by AQE:\n" + plan
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_quality_scoring_joins_broadcast(spark, sf01):
    """The perplexity vocab join and the DSIR ratio join must plan as
    BroadcastHashJoin — the docstrings' map-side-scoring claim, pinned."""
    import __spark_entry__ as E

    for name in ("q_doc_perplexity", "q_doc_dsir_weights"):
        plan = _plan(spark, E.queries()[name](spark, sf01))
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_embed_decontaminate_broadcasts_eval_side(spark, sf01):
    """The eval holdout must broadcast (map-only corpus scan — the
    docstring's no-corpus-shuffle claim): the condition-less join plans
    as BroadcastNestedLoopJoin, never CartesianProduct or a shuffle
    join, and the threshold filter sits below the best-match aggregate.
    Pinned for BOTH parameterizations — the classic %-mod holdout and
    the r11 production-convention fixed eval set."""
    import __spark_entry__ as E

    for name in ("q_embed_decontaminate", "q_embed_decontaminate_prod"):
        plan = _plan(spark, E.queries()[name](spark, sf01))
        assert "BroadcastNestedLoopJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        assert "SortMergeJoin" not in plan, name


def test_passage_scrub_df_agg_partial_combines(spark, sf01):
    """The segment-df aggregate must two-phase (partial_count(distinct)
    map-side before the exchange) so hot boilerplate segments collapse
    before any shuffle — the docstring's skew argument, pinned."""
    import __spark_entry__ as E

    plan = _plan(spark, E.queries()["q_doc_passage_scrub"](spark, sf01))
    assert "partial_count(distinct" in plan
    assert "CartesianProduct" not in plan


# Measured shuffle-exchange budgets for every headline query (round 5,
# sf0.001, AQE initial plan): hash + range + single-partition exchanges,
# ReusedExchange/BroadcastExchange excluded.  These pin the engine's
# "minimize shuffles" property — a plan change that ADDS an exchange to a
# headline query fails here loudly instead of surfacing as a silent
# wall-clock regression at scale.  Lowering a budget after a genuine
# optimization is expected; raising one requires a reviewed reason.
SHUFFLE_BUDGETS = {
    "q_bars_1m": 2,
    "q_dedup_trades": 1,
    "q_trade_features_1h": 2,
    "q_daily_summary": 3,
    "q_latency_percentiles": 1,
    "q_rolling_stats_5m": 3,
    "q_labels_10m": 3,
    "q_asof_price": 2,
    "q_feature_assembly": 4,
    "q_gold_training_set": 7,
    "q_returns_1s": 4,
    "q_gold_vector_2s": 5,
    "q_pricing_summary": 1,
    "q_forecast_revenue": 1,
    "q_shipping_priority": 1,
    "q_revenue_by_nation": 1,
    "q_top_customers": 2,
    "q_minhash_lsh": 10,
    "q_embed_knn": 1,
    # r10: the headline ANN row is the production convention (fixed
    # 20-query set, sqrt(N) centroids) — same plan shape as the classic
    # parameterization it replaced, so the budget carries over
    # r12: +1 static exchange, deliberately.  The model frame is now a
    # driver-built local row without the old 1-row re-aggregate; losing
    # the aggregate's (bogus, tiny) size estimate stops the planner
    # auto-broadcasting the POSTING LEG — the full corpus at scale, a
    # driver-OOM hazard the old static plan carried — so the c-join
    # plans as SMJ and AQE broadcasts at runtime only when genuinely
    # small (executed: fewer stages overall, A/B ivfpq -24%/-31%).
    "q_embed_ann_ivf_prod": 5,
    "q_waiting_suppliers": 2,
    "q_price_deciles": 2,
    "q_semdedup": 7,
    "q_decontaminate_ngram": 2,
    "q_doc_perplexity": 4,
    "q_doc_incremental_dedup": 12,
    "q_doc_passage_scrub": 3,
    # r11: headline row is the production convention (fixed 20-vector
    # eval set, linear per decade) — same plan shape as the classic
    # %-mod row it replaced, so the budget carries over
    "q_embed_decontaminate_prod": 1,
    "q_vpin": 2,
    "q_doc_domain_gate": 1,
    "q_doc_novelty": 2,
    "q_doc_perplexity_capped": 7,
    "q_ofi": 1,
    "q_amihud": 3,
    # cap-engaged since r8 (VERDICT r7 item 2): df-cap aggregate +
    # semi-join legs around the shingle-blocked self-join, same static
    # shape as q_doc_jaccard_hist; AQE reuses the shared scan at runtime
    "q_doc_split_leakage": 7,
    # r8: ONE symbol-sort LOCF exchange for ALL horizons + the trade-
    # identity dedup legs (AQE reuses the shared dedup scan at runtime)
    "q_markout": 5,
    # r8: scoring pass (explode + vocab agg + per-doc agg) + the lang
    # join-back + one per-lang ntile sort
    "q_doc_ccnet_buckets": 5,
    # r8: one (source, n) aggregate; the exact count-distinct partial
    # expansion is the second exchange (the burstiness shape)
    "q_doc_ngram_diversity": 2,
    # r8: cells aggregate + label-totals aggregate (broadcast join-back)
    "q_doc_lang_confusion": 2,
    # r8: map-only norm + ONE label aggregate — the cheapest full pass
    "q_embed_norm_audit": 1,
    # r8: bars agg + one symbol sort for the lags + the day aggregate
    "q_candle_patterns": 3,
    # r8: map-only scoring against the broadcast quantizer + the K-row
    # cell aggregates and their broadcast join-back (static count; the
    # two scoring legs share one scan at runtime via ReuseExchange)
    "q_embed_cell_outliers": 6,
    # r8 TA block: bars agg (2) + the one symbol sort each
    "q_rsi": 3,
    "q_bollinger_breach": 3,
    "q_stochastic_k": 3,
    "q_atr": 3,
    "q_obv": 3,
    # r8: ONE custkey sort; the aggregate rides the same partitioning
    "q_repeat_purchase": 1,
    # r8: knn's rank window + the labels aggregate (broadcast lookups)
    "q_embed_knn_label_agreement": 2,
    # r8: first-order agg + two count-distinct partial expansions +
    # cohort-size join-back (static count; AQE reuses the shared scan)
    "q_cohort_retention": 6,
    # r8: map-only rule battery — ZERO shuffles
    "q_doc_gopher_rules": 0,
    # r8: per-customer spend agg + ONE segment sort (the final K-row
    # aggregate rides the sort's partitioning)
    "q_customer_pareto": 2,
    # r8: bars agg (2) + the one symbol sort all three window levels ride
    "q_macd": 3,
    # r8: ONE custkey sort; islands, aggregate, and lead all ride it
    "q_scd2_history": 1,
    # r8: dedup windows + the one trade-grain symbol sort + (symbol,
    # lag) aggregate (static count; shared dedup scan reused at runtime)
    "q_sign_acf": 2,
    # r8: doc_id join of the two map-only batteries + the cells agg
    "q_doc_filter_confusion": 2,
    # r8: (priority, week) aggregate + the K-row lag window
    "q_weekly_revenue_growth": 2,
    # r8: exact-side max(struct) aggregate + ann_ivf's posting join and
    # rank window + the K-row recall join (r11: headline row is the
    # production convention — same plan shape, budget carries over)
    "q_embed_recall_ivf_prod": 6,  # r12: see q_embed_ann_ivf_prod note
    # r8: sigs aggregate + band fan-out + (band, hash) count + the
    # n_bands-row aggregate (static; shared sigs scan reused at runtime)
    "q_doc_lsh_bucket_balance": 6,
    # r8: shingle df aggregate + the 64-row histogram + 1-row total
    "q_doc_shingle_df_profile": 5,
    # r8: posexplode + (label, dim) aggregate + labels-row reduction
    "q_embed_dim_stats": 2,
    # r8: map-only counting + ONE (lang, source) aggregate
    "q_doc_tokenizer_compression": 1,
    # r8: the declared gold subtree (7) + the one feature aggregate
    "q_gold_feature_screen": 8,
    # r8: (source, prefix) aggregate + totals + final source aggregate
    # (static count; AQE reuses the shared scan at runtime)
    "q_doc_template_detect": 4,
    # static plan count; at runtime AQE ReuseExchange collapses the
    # corpus-scale legs to one (see operators/text.source_overlap)
    "q_doc_source_overlap": 6,
    "q_effective_spread": 2,
    "q_realized_var": 3,
    "q_embed_pq": 2,
    # ADC join on the cell key + pool window + the two bounded refine
    # joins and the final rank window — each exchange is bounded by
    # queries x pool except the posting-side cell join (r10: headline row
    # moved to the production convention; same plan shape, same budget)
    "q_embed_ann_ivfpq_prod": 11,
    "q_microprice": 1,
    "q_trade_runs": 2,
    "q_drawdown": 3,
    # r12: one Q+T-row range-frame scan (probes enter once, horizons are
    # rangeBetween frames) — the per-horizon pivot groupBy is gone (was 8)
    "q_realized_spread": 5,
    # the bucket aggregate rides the lead's symbol sort partitioning
    "q_twa_spread": 1,
    # r9 sliced rewrites: skew-immunity costs two bounded extra legs —
    # the (symbol, slice) sort replaces the symbol sort, plus the
    # per-slice carry summary aggregate and its broadcast join-back
    # (counts are the static plan; AQE reuses the shared scans)
    "q_effective_spread_sliced": 7,
    "q_twa_spread_sliced": 4,
    # r9: sliced markout — the union subtree appears in two legs (local
    # range-frame windows, carry summary), each re-deriving the trade
    # dedup in the STATIC plan; AQE ReusedExchange collapses the shared
    # scans at runtime.  r12: probes enter the sort once (Q+T rows, ghost
    # quotes repair the forward slice boundary) and the pivot groupBy is
    # gone (was 12)
    "q_markout_sliced": 10,
    # r9: one partial-combining key aggregate + the K-row global stats
    "q_key_skew_profile": 2,
    # r11: the sigs aggregate is localCheckpoint-materialized once per
    # invocation, so band legs and both signature lookups read the
    # checkpointed rows — the 11-exchange/20-scan union shape collapsed
    # to the candidate self-join + final aggregate
    "q_doc_minhash_calibration": 2,
    # r11: one cluster-blocked pair pass + the grid explode aggregate
    # (distinct adds its expand legs); AQE reuses the shared assignment
    # scan at runtime — same discipline as the text calibration twin
    "q_embed_semdedup_calibration": 10,
    # capped pair pass: df-cap aggregate + semi-join legs around the
    # shingle-blocked self-join; AQE reuses the shared scan at runtime
    "q_doc_jaccard_hist": 8,
    # bars agg + the one symbol sort + the (symbol, lag) moment agg
    "q_acf": 3,
    # bars agg + the one symbol sort + the K-row symbol moment agg
    "q_variance_ratio": 3,
    # static count: both self-join legs re-derive bars+Δp (3 each); at
    # runtime AQE ReusedExchange collapses the shared scan — the join
    # itself is the one bucket-keyed exchange pair
    "q_leadlag_xcorr": 6,
    # one single-row stats aggregate (broadcast back) + the per-query
    # rank window; WindowGroupLimit keeps the window exchange at
    # top_k·partitions rows (plan-asserted in test_bm25_plan)
    "q_doc_bm25": 4,
    # per-snapshot folds are map-side array math; the one exchange is
    # the (symbol, hour) partial-combinable aggregate
    "q_depth_slope": 1,
    # the fixed d·w cells aggregate + the token-count aggregate feeding
    # the top-k probe (TakeOrderedAndProject, no extra exchange)
    "q_doc_cms": 2,
    # register aggregate (m rows) + its single-row summary + the exact
    # distinct audit aggregate (two-phase countDistinct)
    "q_doc_hll": 4,
    # two count aggregates + the K·hours full outer join
    "q_quote_trade_ratio": 3,
    # bars (2) + the (symbol, day) aggregate + the one day-partitioned
    # rank window (all six functions share its sort)
    "q_rank_surface": 4,
    # static count: both legs re-derive bars+Δp (3 each, AQE reuses the
    # shared scan at runtime) + the bucket-keyed market aggregate/join
    # + the K-row moment aggregate
    "q_realized_beta": 7,
    # the one symbol sort + the K-row percentile aggregate
    "q_gap_report": 2,
    # bars (2) + the (symbol, day, hod) aggregate + the (symbol, day)
    # share window + the K·24 final aggregate
    "q_intraday_profile": 5,
    # bars agg (2) + the one symbol sort carrying all four overlapping-sum
    # horizons + the K-row moment aggregate
    "q_hurst": 3,
    # dedup (1) + the (symbol, minute) count + the K-row span aggregate
    "q_fano": 3,
    # the one token-count aggregate; top-V via TakeOrderedAndProject and
    # the V-row fold add no exchange
    "q_doc_zipf": 1,
    # dedup (1) + the one symbol sort carrying the ranks; the K-row
    # moment aggregate rides its hash partitioning
    "q_gini": 2,
    # bars (2) + the (symbol, day) aggregate + ONE symbol exchange
    # shared by both rank windows (two sorts, one shuffle)
    "q_spearman": 4,
    # dedup (1) + the K-row span aggregate (broadcast back) + the
    # (symbol, size) count + the one symbol exchange shared by the
    # cumulative window and the K-row max
    "q_ks_drift": 5,
    # map-only run-length HOF — zero corpus-grain shuffles
    "q_doc_entropy": 0,
    # dedup (1) + the K-row span aggregate (broadcast back, 2 with its
    # partial) + the (symbol, bin) aggregate + the symbol window over
    # <= K·n_bins rows
    "q_volume_profile": 5,
    # three regexp_extract_all passes per row — zero shuffles
    "q_doc_readability": 0,
    # bars (2) + the one symbol sort carrying the lag; the K-row count
    # aggregate rides the window's hash partitioning
    "q_runs_test": 3,
    # bars (2) + ONE symbol sort shared by the prefix sum, both running
    # extrema, and the full-partition moment windows; the K-row summary
    # aggregate rides the same partitioning
    "q_cusum": 3,
    # dedup (1) + the (symbol, day, hour) aggregate + the (symbol, day)
    # roll-up — calendar-bounded after the first aggregate
    "q_hhi": 3,
    # bars (2) + the one symbol sort under WindowGroupLimit; the K-row
    # array fold rides the window's partitioning
    "q_hill_tail": 3,
    # (source, token) aggregate (1, corpus-sized) + the top-V aggregate
    # + the (source, rank) collapse + the rank/source/global window
    # chain over the <= K·(V+1)-row table
    "q_doc_jsd": 5,
    # bars (2) twice — the percentile branch and the tail-scan branch
    # are separate lineages by design — + the percentile aggregate +
    # the conditional tail aggregate
    "q_var_es": 6,
    # the (token) aggregate with countDistinct partial-expand (2 for
    # the two-phase distinct) + the 1-row doc count
    "q_doc_burstiness": 3,
    # bars (2) + ONE symbol sort shared by every path window
    "q_cusum_path": 3,
    # the exact side's K-query max(struct) aggregate + the LSH side's
    # bucket join feeding its rank window; the corpus scan is map-only
    # against the broadcast query set
    "q_embed_recall_lsh": 2,
    # dedup (1) + the per-symbol count aggregate — map-only cent snap
    "q_price_clustering": 2,
    # dedup (1) + bars (1) + the calendar-bounded (symbol, day) roll-up
    "q_vwap_slippage": 3,
    # bars (2) + the one (symbol, day) sort; the day aggregate rides
    # the window's partitioning
    "q_efficiency_ratio": 3,
    # the K_source percentile aggregate — the counted scan is map-only
    # and joins the broadcast band back
    "q_doc_length_outliers": 1,
    # the per-query top-k rank window (under WindowGroupLimit); the
    # candidate prune and the query set both broadcast
    "q_embed_filtered_search": 1,
    # the exact side's max(struct) aggregate + the multi-table side's
    # (query, neighbor) candidate dedup aggregate feeding its rank
    # window
    "q_embed_recall_lsh_multi": 3,
    # the declared gold plan (7, its own budget) — the audit aggregate
    # rides the gold output's partitioning
    "q_gold_label_balance": 7,
    # bars (2) + the calendar-bounded (symbol, day) aggregate
    "q_bar_completeness": 3,
    # ONE vector-keyed hash aggregate (two exchanges with its partial
    # pair under AQE counting) — the exact-dedup pattern on embeddings
    "q_embed_dup_vectors": 2,
    # dedup (1) + the ONE symbol sort over the quote+trade union; the
    # K-row summary rides the same partitioning
    "q_quote_staleness": 2,
    # bars (2) + the (symbol, day, hod) aggregate + the K·24-row roll-up
    "q_intraday_volatility": 4,
    # the doc-grain count aggregate (countDistinct partial-expand) +
    # the vocabulary countDistinct — the two grains a datasheet needs
    "q_doc_datasheet": 4,
    # dedup (1) + the one per-symbol aggregate (countDistinct
    # partial-expand over active days)
    "q_symbol_datasheet": 3,
}


# r9 second pass: the same guard extended to EVERY registered query —
# measured static exchange counts (sf0.001, AQE initial plan, same
# counting as SHUFFLE_BUDGETS).  The outliers are static-plan counts
# whose shared scans AQE ReusedExchange collapses at runtime (the
# q_markout_sliced precedent): q_feature_drift 22 (per-feature moment
# legs over one gold subtree), q_gold_training_set_1s 19,
# q_dedup_funnel 14 (per-stage counts over one dedup scan).
NON_HEADLINE_SHUFFLE_BUDGETS = {
    "q_anti_processed": 0,
    "q_bba_features": 1,
    "q_categorize": 0,
    "q_corpus_mix": 3,
    "q_corpus_resample": 3,
    "q_corr": 1,
    "q_counts": 1,
    "q_counts_salted": 2,
    "q_cube_sales": 1,
    "q_customer_distribution": 2,
    "q_decimal_cast": 0,
    "q_decimal_string_format": 0,
    "q_dedup_components": 2,
    "q_dedup_funnel": 14,
    "q_dedup_sink_stats": 2,
    "q_depth_features": 1,
    "q_derived_lag": 1,
    "q_derived_time": 0,
    "q_disjunctive_parts": 1,
    "q_distinct_counts": 2,
    "q_doc_bloom_gate": 3,
    "q_doc_chunks": 0,
    "q_doc_decontaminate": 1,
    "q_doc_dsir_weights": 7,
    "q_doc_exact_dedup": 1,
    "q_doc_fingerprint": 0,
    "q_doc_hash_split": 0,
    # r11: capped sigs aggregate localCheckpoint-materialized once (was
    # 20 exchanges / 40 parquet scans of divergent capped-sigs subtrees)
    "q_doc_minhash_dedup_capped": 1,
    "q_doc_pack": 1,
    "q_doc_perplexity_bigram": 5,
    "q_doc_perplexity_bigram_capped": 11,
    "q_doc_quality": 0,
    "q_doc_quality_filter": 0,
    "q_doc_repetition": 2,
    "q_doc_sample": 0,
    "q_doc_scrub": 0,
    "q_doc_split_repair": 4,
    "q_doc_stats": 0,
    "q_doc_substring_dup": 3,
    "q_doc_winnow": 0,
    "q_doc_winnow_pairs": 1,
    "q_embed_ann_lsh": 1,
    "q_embed_ann_lsh_multi": 2,
    # r10: the classic corpus-coupled ANN parameterizations, demoted from
    # the headline to the scale artifact (the _prod rows replaced them)
    "q_embed_ann_ivf": 5,  # r12: see q_embed_ann_ivf_prod note
    "q_embed_ann_ivfpq": 11,
    # r11: the classic corpus-coupled decontamination row, demoted from
    # the headline to the scale artifact (q_embed_decontaminate_prod
    # replaced it)
    "q_embed_decontaminate": 1,
    # r11: the classic corpus-coupled IVF recall audit, demoted from the
    # headline to the scale artifact (q_embed_recall_ivf_prod replaced it)
    "q_embed_recall_ivf": 6,  # r12: see q_embed_ann_ivf_prod note
    "q_embed_cluster_stats": 7,
    "q_embed_cosine_pairs": 0,
    "q_embed_prune_prototypes": 3,
    "q_embed_quantize": 0,
    "q_embed_random_projection": 0,
    "q_feature_drift": 22,
    "q_feature_label_join": 5,
    "q_funnel": 2,
    "q_gap_detect": 1,
    "q_gold_training_set_1s": 19,
    "q_gold_vector_1s": 6,
    "q_grid_ewma": 4,
    "q_group_compare": 2,
    "q_health_rollup": 3,
    "q_higher_moments": 3,
    "q_interval_join": 2,
    "q_kline_parse": 0,
    "q_kyle_lambda": 3,
    "q_labels_10s": 4,
    "q_lang_id": 0,
    "q_large_orders": 1,
    "q_late_shipments": 1,
    "q_latest_per_key": 1,
    "q_lee_ready": 3,
    "q_market_share": 1,
    "q_max_ts": 1,
    "q_min_cost_supplier": 1,
    "q_momentum": 3,
    "q_multimodal_decode": 1,
    "q_multimodal_frames": 0,
    "q_multimodal_meta": 0,
    "q_multimodal_resize": 1,
    "q_ngram_jaccard": 3,
    "q_normalize_trades": 0,
    "q_order_priority": 1,
    "q_orderbook_replay": 3,
    "q_pair_correlation": 10,
    "q_parts_supplier_counts": 2,
    "q_pivot_orderstatus": 1,
    "q_product_profit": 1,
    "q_profile_trades": 2,
    "q_promo_revenue": 1,
    "q_resample_bars_1h": 3,
    "q_return_outliers": 3,
    "q_returned_customers": 1,
    "q_returns": 3,
    "q_roll_spread": 2,
    "q_rolling_volatility": 3,
    "q_rollup_sales": 1,
    "q_sales_opportunity": 2,
    "q_semi_processed": 0,
    "q_session_stats": 1,
    "q_sessionize": 1,
    "q_simhash": 1,
    "q_small_qty_revenue": 2,
    "q_source_consistency": 1,
    "q_supplier_above_avg": 3,
    "q_tfidf": 5,
    "q_time_split": 4,
    "q_token_count": 0,
    "q_topk_recent": 1,
    "q_union_sources": 2,
    "q_unpivot_metrics": 1,
    "q_validate_filter": 0,
    "q_vocab": 3,
    "q_volatility_estimators": 3,
    "q_volume_shipping": 1,
    "q_winsorize": 5,
}


def test_every_query_has_a_shuffle_budget_and_stays_in_it(spark, sf01):
    """EVERY registered query — headline or not — has a pinned static
    shuffle budget and stays within it, so adding a query without a
    budget (or a refactor that quietly adds an exchange anywhere in the
    239-query surface) fails loudly here instead of surfacing as a
    wall-clock regression at scale."""
    import __spark_entry__ as E

    qs = E.queries()
    all_budgets = {**SHUFFLE_BUDGETS, **NON_HEADLINE_SHUFFLE_BUDGETS}
    assert set(all_budgets) == set(qs), (
        set(all_budgets) ^ set(qs)
    )
    over = {}
    for name, budget in NON_HEADLINE_SHUFFLE_BUDGETS.items():
        p = _plan(spark, qs[name](spark, sf01), mode="simple")
        n = (
            p.count("Exchange hashpartitioning")
            + p.count("Exchange rangepartitioning")
            + p.count("Exchange SinglePartition")
        )
        if n > budget:
            over[name] = (n, budget)
    assert not over, f"shuffle budget exceeded: {over}"


def test_headline_shuffle_budgets(spark, sf01):
    """Every headline query's shuffle count stays within its recorded
    budget (see SHUFFLE_BUDGETS)."""
    import __spark_entry__ as E
    import bench

    # a headline query added without a budget would silently escape the
    # guard — keep the two lists in lockstep
    assert set(SHUFFLE_BUDGETS) == set(bench.HEADLINE)

    qs = E.queries()
    over = {}
    for name, budget in SHUFFLE_BUDGETS.items():
        # simple mode: one line per operator, same representation the
        # budgets were measured from
        p = _plan(spark, qs[name](spark, sf01), mode="simple")
        n = (
            p.count("Exchange hashpartitioning")
            + p.count("Exchange rangepartitioning")
            + p.count("Exchange SinglePartition")
        )
        if n > budget:
            over[name] = (n, budget)
    assert not over, f"shuffle budget exceeded: {over}"


def test_domain_gate_broadcasts_thresholds(spark, sf01):
    """The per-domain quantile gate's threshold table (one row per
    source) must broadcast back onto the scored scan — the corpus itself
    never shuffles for the filter step."""
    import __spark_entry__ as E

    plan = _plan(spark, E.queries()["q_doc_domain_gate"](spark, sf01))
    assert "BroadcastHashJoin" in plan
    # exactly one corpus-keyed exchange: the source-keyed percentile agg
    assert "partial_percentile" in plan or "percentile" in plan


def test_bloom_gate_broadcasts_filter_bits(spark, sf01):
    """The Bloom membership test must join against a BROADCAST of the
    occupied-position set (<= m rows by construction — the entire point
    of the summary structure at 100 TB)."""
    import __spark_entry__ as E

    plan = _plan(spark, E.queries()["q_doc_bloom_gate"](spark, sf01))
    assert plan.count("BroadcastHashJoin") >= 1


def test_bm25_plan_shape(spark, sf01):
    """BM25: per-doc tf stays map-side (no posting-list shuffle — no
    groupBy on (doc, term)), the corpus stats row broadcasts back, and
    the per-query top-k rank window runs under WindowGroupLimit."""
    import __spark_entry__ as E

    plan = _plan(spark, E.queries()["q_doc_bm25"](spark, sf01))
    assert "WindowGroupLimit" in plan
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    # the only hash exchanges allowed are the stats aggregate + the
    # per-query window — never a (doc_id, term) posting aggregate
    assert "CartesianProduct" not in plan


def test_filtered_search_pushes_predicate_to_doc_scan(spark, sf01):
    """The RAG retrieval composition: the metadata predicate must reach
    the documents parquet scan (row-group pruning at 100 TB), the
    candidate prune must broadcast, and the per-query top-k must run
    under WindowGroupLimit."""
    import __spark_entry__ as E

    plan = _plan(spark, E.queries()["q_embed_filtered_search"](spark, sf01))
    assert re.search(
        r"PushedFilters: \[[^\]]*EqualTo\(lang,en\)"
        r"[^\]]*GreaterThanOrEqual\(n_chars,200\)", plan
    ), "the metadata predicate must reach the documents scan"
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
