"""User-facing API: SQL view registry + query runner.

A user of the reference interacts with derived state (Redis feature hashes,
Postgres analytics tables).  The engine's equivalent surface is a set of
Spark SQL views over the same derived datasets, registered once per
session:

    from bitcoin_datapipeline_spark import api
    api.register_views(spark, "/root/testdata/sf0.1")
    spark.sql("SELECT * FROM bars_1m WHERE symbol = 'CLICK' LIMIT 10")

Views are lazy DataFrames — Catalyst fuses a user's SQL over a view with
the view's own plan (filter pushdown reaches the parquet scan through the
view boundary).  One deliberate exception: filters on ``clean_trades`` stop
at its dedup window — pushing below row_number would change which duplicate
survives.  For scan-level pruning with a selective predicate, filter
``valid_trades`` and dedup the result.

`run(name)` executes any registered driver-contract query by name — also
exposed as a CLI:

    python -m bitcoin_datapipeline_spark.api q_bars_1m --sf /root/testdata/sf0.01
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import tables
from .functions import normalize
from .operators import aggregates, replay, windows
from .operators import grid as grid_ops
from .plans import gold, pipeline


def register_views(
    spark: SparkSession,
    sf_dir: str,
    *,
    grid_slice_s: int | None = grid_ops.GRID_SLICE_S,
    gold_slice_s: int | None = gold.GOLD_SLICE_S,
    replay_slice_min: int | None = replay.REPLAY_SLICE_MIN,
    approx_percentiles: bool = False,
    approx_distinct: bool = False,
) -> list[str]:
    """Register raw tables + the derived analytical views.  Returns the
    registered view names.

    The grid/gold/replay views default to the test-size slices the driver
    correctness gate uses; a production caller passes ``None`` for any of
    the three span knobs to get the FULL data span (grid through the last
    tick, replay through the last minute) without editing engine constants.
    ``approx_percentiles=True`` switches the percentile-bearing views
    (``latency_percentiles``, ``bars_winsorized``) from exact
    ``percentile`` — whose partial buffer holds every group value — to the
    bounded-memory mergeable ``percentile_approx`` sketch, the right
    default on a 100 TB cluster.  ``approx_distinct=True`` does the same
    for the ``distinct_counts`` view: HyperLogLog++ sketches instead of the
    exact expand-based distinct aggregate.
    """
    tables.register_views(spark, sf_dir)
    ev = tables.table(spark, sf_dir, "events")
    grid_1s = pipeline.locf_grid(spark, sf_dir, slice_s=grid_slice_s)
    derived: dict[str, DataFrame] = {
        "trades": normalize.trades(ev),
        "valid_trades": normalize.valid_trades(ev),
        "clean_trades": pipeline.trades_clean(spark, sf_dir),
        "bars_1m": pipeline.bars_pipeline(spark, sf_dir),
        "bba": normalize.bba(ev),
        "depth": normalize.depth(ev),
        "trade_features_1h": aggregates.trade_features(
            pipeline.trades_clean(spark, sf_dir)
        ),
        "daily_summary": aggregates.daily_summary(pipeline.trades_clean(spark, sf_dir)),
        "labels_10m": windows.labels(pipeline.bars_pipeline(spark, sf_dir)),
        "gold_training_set": gold.gold_training_set(spark, sf_dir),
        # round-2 gold-grain surface
        "grid_1s": grid_1s,
        "returns_1s": grid_ops.grid_returns(grid_1s),
        "labels_10s": grid_ops.grid_labels(grid_1s),
        "gold_vector_1s": gold.gold_vector(spark, sf_dir, slice_s=gold_slice_s),
        "gold_vector_2s": gold.gold_vector_2s(spark, sf_dir, slice_s=gold_slice_s),
        "gold_training_set_1s": gold.gold_training_set_1s(
            spark, sf_dir, slice_s=gold_slice_s
        ),
        "orderbook_minutely": replay.orderbook_replay(
            normalize.depth(ev), slice_min=replay_slice_min
        ),
        # round-3 monitoring/QA surface
        "session_stats": windows.session_stats(normalize.valid_trades(ev)),
        "source_consistency": aggregates.source_consistency(
            normalize.valid_trades(ev)
        ),
        "return_outliers": windows.return_outliers(
            pipeline.bars_pipeline(spark, sf_dir)
        ),
        "grid_ewma": grid_ops.grid_ewma(grid_1s),
        # percentile surface — exact by default (oracle contract), sketch
        # at scale via the approx_percentiles knob
        "latency_percentiles": aggregates.latency_percentiles(
            normalize.valid_trades(ev), approx=approx_percentiles
        ),
        "bars_winsorized": aggregates.winsorize_volumes(
            pipeline.bars_pipeline(spark, sf_dir), approx=approx_percentiles
        ),
        # distinct-cardinality observability — exact by default, HLL++
        # sketches at scale via the approx_distinct knob
        "distinct_counts": aggregates.distinct_counts(
            normalize.valid_trades(ev), approx=approx_distinct
        ),
        # round-5 liquidity/microstructure surface
        "kyle_lambda": aggregates.kyle_lambda(pipeline.trades_clean(spark, sf_dir)),
        "vpin": aggregates.vpin(pipeline.trades_clean(spark, sf_dir)),
        "roll_spread": aggregates.roll_spread(pipeline.trades_clean(spark, sf_dir)),
        # round-8 classical-TA surface over the bars
        "rsi_14": windows.rsi(pipeline.bars_pipeline(spark, sf_dir)),
        "atr_14": windows.atr(pipeline.bars_pipeline(spark, sf_dir)),
        "macd_12_26_9": windows.macd(pipeline.bars_pipeline(spark, sf_dir)),
        "bollinger_daily": windows.bollinger_breach(
            pipeline.bars_pipeline(spark, sf_dir)
        ),
        # round-8 execution-quality surface
        "markout": aggregates.markout(
            pipeline.trades_clean(spark, sf_dir), normalize.bba(ev)
        ),
    }
    for name, df in derived.items():
        df.createOrReplaceTempView(name)
    return list(tables.TABLES) + list(derived)


def _load_entry():
    """Import the driver-contract module from the repo root regardless of
    the caller's working directory."""
    import importlib
    import os
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    return importlib.import_module("__spark_entry__")


def run(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    """Execute a driver-contract query by name."""
    entry = _load_entry()

    qs = entry.queries()
    if name not in qs:
        known = ", ".join(sorted(qs))
        raise KeyError(f"unknown query {name!r}; available: {known}")
    return qs[name](spark, sf_dir)


def _main() -> None:
    import argparse
    import sys

    ap = argparse.ArgumentParser(
        prog="bitcoin_datapipeline_spark.api",
        description="Run an engine query and print its rows.",
    )
    ap.add_argument("query", help="query name from __spark_entry__.queries() "
                                  "(or 'list' to enumerate)")
    ap.add_argument("--sf", default=tables.DEFAULT_SF_DIR, help="testdata dir")
    ap.add_argument("--limit", type=int, default=20, help="rows to show")
    args = ap.parse_args()

    from .session import get_spark

    spark = get_spark("api-cli")
    if args.query == "list":
        entry = _load_entry()

        for name in sorted(entry.queries()):
            oracle = "oracle" if name in entry.oracle_sql() else "rows-only"
            print(f"{name}  [{oracle}]")
        return
    df = run(spark, args.query, args.sf)
    df.show(args.limit, truncate=False)
    print(f"({df.count()} rows total)")


if __name__ == "__main__":
    _main()
