"""Flagship bronze→silver pipeline (SURVEY §3.3 / §7.1).

The reference's ETL path (services/data_connector/src/etl_orchestrator.py):
discover bronze files → parse → transform/validate → dedup → write curated.
Re-expressed as one declarative plan: scan → normalize (P1/P3) → validate
(P5) → dedup (D1) → 1-minute bars (A4).  Catalyst pushes the validation
filter into the scan and plans a single shuffle (the groupBy); the dedup
window and the bar aggregation share the `symbol`-hashed exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.normalize import valid_trades
from ..operators.aggregates import bars_1m
from ..operators.dedup import dedup_trades
from ..tables import table


def trades_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → normalized, validated, deduped trade stream."""
    return dedup_trades(valid_trades(table(spark, sf_dir, "events")))


def bars_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship query: full ingest→bars pipeline (driver `entry`)."""
    return bars_1m(trades_clean(spark, sf_dir))


_DEFAULT_SLICE = object()  # sentinel: None is a real value (full span)


def locf_grid(
    spark: SparkSession,
    sf_dir: str,
    step_s: int = 1,
    slice_s=_DEFAULT_SLICE,
) -> DataFrame:
    """events → deduped trades → fixed-second LOCF grid, with the
    dedup-invariant bounds hint wired so the slice-anchor branch reads the
    cheap pre-dedup stream (see grid.locf_resample).  Omit ``slice_s`` for
    the grid module default; pass an int to override or None for the full
    data span."""
    from ..operators import grid as grid_ops

    kwargs = {} if slice_s is _DEFAULT_SLICE else {"slice_s": slice_s}
    return grid_ops.locf_resample(
        trades_clean(spark, sf_dir),
        step_s=step_s,
        valid_bounds_hint=valid_trades(table(spark, sf_dir, "events")),
        **kwargs,
    )
