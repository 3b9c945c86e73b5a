"""Fixed-second LOCF grid resample (SURVEY §7.3(a) — the reference's gold
grain).

The reference computes its gold features and labels on a *fixed time grid*
(2 s features, 10 s-ahead labels), not on event buckets: every grid point
carries the last observed price (last-observation-carried-forward), returns
are over wall-clock offsets {1,5,10,30,60} s, and gaps are surfaced with a
``gap_indicator`` / ``data_age_ms`` pair instead of being silently skipped
(docs/schemas/S3_SCHEMA.md:520-609 feature grid + :600 gap_indicator,
:622-682 labels; docs/architecture/DATA_PIPELINE.md:166-169, :359-381).

Spark-first shape (three stages, each scale-safe):

1. **Per-tick pre-aggregation** — ``groupBy(symbol, event_ts div step_ms)``
   with ``max_by``/``sum``/``count``.  This is the compression step: at
   production tick rates (~10³ trades/s) the shuffle carries one partial row
   per (symbol, tick) per input partition, never raw ticks.
2. **Grid generation** — per-symbol ``sequence(first_tick, slice_end)`` +
   ``explode``.  The grid is *bounded by wall-clock, not by data volume*:
   86 400 rows/symbol/day at 1 s regardless of how many ticks fed it, so the
   grid join and everything downstream is O(symbols × seconds).
3. **LOCF fill** — ``last(x, ignorenulls=True)`` over an unbounded-preceding
   ROWS frame per symbol.  On a cluster this is one exchange + sort over the
   bounded grid.  At 100 TB / multi-year spans you would key the window by
   (symbol, day) and seed each day with the previous day's closing state
   (a tiny 1-row-per-symbol-day broadcast); the single-window form here is
   exact and keeps the oracle twin simple.

``grid_returns`` / ``grid_labels`` then run lag/lead windows **on the
grid**, where a lag of k rows ≡ exactly k·step seconds — the property the
bar-sequence variant (operators/windows.py:46-60) could not give.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import r6
from .windows import DIRECTION_EPS  # shared label dead-zone (windows.py:63)

#: a grid point whose carried-forward observation is older than this is a gap
GRID_GAP_THRESHOLD_S = 60

#: default resample slice: first 12 h of the dataset (bounds the grid to
#: 43 200 points/symbol at 1 s — a test-size decision that also caps the
#: driver correctness gate's hash-compare cost; the grain is unchanged)
GRID_SLICE_S = 43_200


def _buy():
    return F.when(~F.col("is_buyer_maker"), F.col("qty")).otherwise(F.lit(0.0))


def _sell():
    return F.when(F.col("is_buyer_maker"), F.col("qty")).otherwise(F.lit(0.0))


def locf_resample(
    dedup_trades: DataFrame,
    step_s: int = 1,
    slice_s: int = GRID_SLICE_S,
    gap_threshold_s: int = GRID_GAP_THRESHOLD_S,
) -> DataFrame:
    """Resample the deduped trade stream onto a fixed ``step_s``-second grid
    with LOCF price fill, per-tick flow sums, and gap/data-age quality
    columns (S3_SCHEMA.md:596-601).

    Grid coverage: per symbol from its first active tick through the end of
    the slice (``slice_s`` seconds from the global first tick).  The price at
    a grid point is the state *as of the end of that step* (all trades with
    ``event_ts`` inside the step included) — no look-ahead.
    """
    step_ms = step_s * 1000
    per_tick = dedup_trades.groupBy(
        "symbol", F.expr(f"event_ts div {step_ms}").cast("long").alias("tick")
    ).agg(
        F.max_by("price", "event_ts").alias("obs_price"),
        F.max("event_ts").alias("obs_last_ts"),
        F.max_by("source", "event_ts").alias("obs_source"),
        F.sum("qty").alias("obs_volume"),
        F.sum(_buy()).alias("obs_buy_volume"),
        F.sum(_sell()).alias("obs_sell_volume"),
        # decimal-grid sum for cross-engine bit-identity (see bars_1m)
        F.sum((F.col("price") * F.col("qty")).cast("decimal(20,4)"))
        .cast("double")
        .alias("obs_notional"),
        F.count("*").cast("long").alias("obs_trades"),
    )

    n_ticks = slice_s // step_s
    g0 = per_tick.groupBy().agg(F.min("tick").alias("g0"))
    spans = (
        per_tick.groupBy("symbol")
        .agg(F.min("tick").alias("lo"))
        .join(F.broadcast(g0))
        .select("symbol", "lo", (F.col("g0") + F.lit(n_ticks - 1)).alias("hi"))
        .filter(F.col("lo") <= F.col("hi"))
    )
    grid = spans.select(
        "symbol", F.explode(F.sequence("lo", "hi")).alias("tick")
    )

    j = grid.join(per_tick, ["symbol", "tick"], "left")
    cum = (
        Window.partitionBy("symbol")
        .orderBy("tick")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    price = F.last("obs_price", ignorenulls=True).over(cum)
    last_ts = F.last("obs_last_ts", ignorenulls=True).over(cum)
    source = F.last("obs_source", ignorenulls=True).over(cum)
    # age of the carried-forward observation at the end of this grid step
    age_ms = (F.col("tick") + 1) * step_ms - 1 - last_ts
    return j.select(
        "symbol",
        "tick",
        (F.col("tick") * step_s).cast("long").alias("feature_ts"),
        price.alias("price"),
        age_ms.cast("long").alias("data_age_ms"),
        (age_ms > gap_threshold_s * 1000).alias("gap_indicator"),
        source.alias("source"),
        F.coalesce("obs_volume", F.lit(0.0)).alias("volume"),
        F.coalesce("obs_buy_volume", F.lit(0.0)).alias("buy_volume"),
        F.coalesce("obs_sell_volume", F.lit(0.0)).alias("sell_volume"),
        F.coalesce("obs_notional", F.lit(0.0)).alias("notional"),
        F.coalesce("obs_trades", F.lit(0).cast("long")).alias("trades"),
        F.col("obs_price").isNotNull().alias("has_obs"),
    )


def grid_returns(
    grid: DataFrame, step_s: int = 1, horizons_s: tuple[int, ...] = (1, 5, 10, 30, 60)
) -> DataFrame:
    """True k-*second* log returns on the LOCF grid
    (S3_SCHEMA.md:533-537; DATA_PIPELINE.md:166-169): ``lag(k/step)`` on a
    dense grid is exactly k seconds of wall clock — across trade gaps the
    carried-forward price makes the return 0 until the next print, and the
    gap is flagged, matching the reference's quality contract."""
    w = Window.partitionBy("symbol").orderBy("tick")
    cols = [
        F.col("symbol"),
        F.col("feature_ts"),
        r6(F.col("price")).alias("price"),
    ]
    for h in horizons_s:
        if h % step_s:
            raise ValueError(f"horizon {h}s is not a whole number of {step_s}s steps")
        k = h // step_s
        cols.append(r6(F.log(F.col("price") / F.lag("price", k).over(w))).alias(f"ret_{h}s"))
    cols += [F.col("data_age_ms"), F.col("gap_indicator")]
    return grid.select(*cols)


def grid_labels(
    grid: DataFrame,
    step_s: int = 1,
    horizon_s: int = 10,
    extra_horizons_s: tuple[int, ...] = (5, 15, 30),
) -> DataFrame:
    """10-second-ahead prediction labels on the LOCF grid
    (S3_SCHEMA.md:622-682; DATA_PIPELINE.md:359-381): target price exactly
    ``horizon_s`` wall-clock seconds ahead, log return + direction with a
    ±1e-4 dead zone, path statistics over the (t, t+10 s] window, the
    multi-horizon returns, and the validity/gap quality flags
    (S3_SCHEMA.md:676-681).  ``lead``/forward-ROWS frames only — label
    leakage is structurally impossible."""
    for h in (horizon_s, *extra_horizons_s):
        if h % step_s:
            raise ValueError(f"horizon {h}s is not a whole number of {step_s}s steps")
    k = horizon_s // step_s
    w = Window.partitionBy("symbol").orderBy("tick")
    fwd = w.rowsBetween(1, k)
    target = F.lead("price", k).over(w)
    ret = F.log(target / F.col("price"))
    cols = [
        F.col("symbol"),
        F.col("feature_ts"),
        (F.col("feature_ts") + horizon_s).cast("long").alias("target_ts"),
        r6(F.col("price")).alias("current_price"),
        r6(target).alias("target_price"),
        r6(target - F.col("price")).alias("price_change"),
        r6(ret).alias(f"return_{horizon_s}s"),
        r6(F.abs(ret)).alias(f"return_{horizon_s}s_abs"),
        F.when(ret > DIRECTION_EPS, 1)
        .when(ret < -DIRECTION_EPS, -1)
        .otherwise(F.when(ret.isNull(), None).otherwise(0))
        .cast("int")
        .alias("direction"),
        F.when(ret > 0, 1).otherwise(F.when(ret.isNull(), None).otherwise(0))
        .cast("int")
        .alias("direction_binary"),
        r6(F.max("price").over(fwd)).alias(f"max_price_{horizon_s}s"),
        r6(F.min("price").over(fwd)).alias(f"min_price_{horizon_s}s"),
        r6(F.max("price").over(fwd) - F.min("price").over(fwd)).alias(
            f"price_range_{horizon_s}s"
        ),
        r6(F.stddev_samp("price").over(fwd)).alias(f"volatility_{horizon_s}s"),
        r6(F.sum("volume").over(fwd)).alias(f"volume_{horizon_s}s"),
        F.sum("trades").over(fwd).cast("long").alias(f"trade_count_{horizon_s}s"),
    ]
    for h in extra_horizons_s:
        cols.append(
            r6(F.log(F.lead("price", h // step_s).over(w) / F.col("price"))).alias(
                f"return_{h}s"
            )
        )
    cols += [
        (F.max(F.col("gap_indicator").cast("int")).over(fwd) == 1).alias(
            "gap_in_window"
        ),
        (F.count("price").over(fwd) == k).alias("is_valid"),
    ]
    return grid.select(*cols)
