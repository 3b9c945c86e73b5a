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
2. **Gap-fill by lead** — one per-symbol window computes each observation's
   successor tick; ``explode(sequence(tick, next_tick - 1))`` emits the
   grid rows each observation covers, carrying that observation — the LOCF
   fill is positional, no dense-grid join and no second window pass.  The
   grid stays *bounded by wall-clock, not by data volume*: 86 400
   rows/symbol/day at 1 s regardless of how many ticks fed it.
3. **Slice anchor** — a broadcast 1-row aggregate fixes the grid end; the
   dedup-invariant ``valid_bounds_hint`` (pre-dedup stream) keeps that branch a
   shuffle-free pruned scan.  For 100 TB / multi-year spans,
   :func:`locf_resample_daily` keys every window by (symbol, day) with a
   previous-close seed handoff — row-for-row identical output (asserted in
   tests), day-bounded window state.

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
    slice_s: int | None = GRID_SLICE_S,
    gap_threshold_s: int = GRID_GAP_THRESHOLD_S,
    valid_bounds_hint: DataFrame | None = None,
) -> DataFrame:
    """Resample the deduped trade stream onto a fixed ``step_s``-second grid
    with LOCF price fill, per-tick flow sums, and gap/data-age quality
    columns (S3_SCHEMA.md:596-601).

    Grid coverage: per symbol from its first active tick through the end of
    the slice (``slice_s`` seconds from the global first tick), or through
    the global LAST tick when ``slice_s`` is None — the full-span form a
    production caller gets via api.register_views(grid_slice_s=None).  The
    price at a grid point is the state *as of the end of that step* (all
    trades with ``event_ts`` inside the step included) — no look-ahead.

    Plan shape — gap-fill by ``lead``, not grid join: each per-tick row
    learns its successor's tick in the ONE per-symbol window sort the grid
    needs anyway, then explodes ``sequence(tick, next_tick - 1)`` carrying
    its own observation — so the LOCF fill is positional, with no dense-grid
    left join and no second window pass.  The input's expensive
    dedup+per-tick pass therefore runs ONCE for the data path (the previous
    join-based form re-ran it for both grid-bounds branches: column pruning
    made the subtrees non-identical, defeating ReusedExchange — measured 3×
    the dedup pass in the executed plan).  The only other consumer is the
    1-row slice-anchor aggregate, which accepts a ``valid_bounds_hint``
    because min(event_ts) is dedup-invariant (first-wins dedup never drops
    a symbol's earliest row): with the hint the anchor branch is a
    shuffle-free column-pruned scan.  CONTRACT: the hint MUST be the
    VALIDATED pre-dedup stream (normalize.valid_trades — same validity
    filtering as the dedup input, minus the dedup itself).  A raw
    un-validated stream would silently shift the grid anchor/end whenever
    an invalid row owns the min timestamp — there is no runtime check that
    could catch it, hence the parameter name.  Explode skew is bounded by
    the longest single gap (≤ slice length), strictly narrower than the old
    whole-span-per-symbol explode.
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

    if slice_s is None:
        # full span needs the deduped max (a dropped late duplicate may own
        # the raw stream's max ts) — no hint shortcut here
        bounds = per_tick.groupBy().agg(F.max("tick").alias("hi"))
    else:
        n_ticks = slice_s // step_s
        anchor = (
            valid_bounds_hint.select(
                F.expr(f"event_ts div {step_ms}").cast("long").alias("tick")
            )
            if valid_bounds_hint is not None
            else per_tick.select("tick")
        )
        bounds = anchor.groupBy().agg(
            (F.min("tick") + F.lit(n_ticks - 1)).alias("hi")
        )

    w = Window.partitionBy("symbol").orderBy("tick")
    spanned = (
        per_tick.join(F.broadcast(bounds))
        .filter(F.col("tick") <= F.col("hi"))
        .withColumn("next_tick", F.lead("tick").over(w))
        .withColumn(
            "span_end",
            F.least(F.coalesce(F.col("next_tick") - 1, F.col("hi")), F.col("hi")),
        )
        .withColumnRenamed("tick", "obs_tick")
    )
    g = spanned.select(
        "symbol",
        "obs_tick",
        "obs_price",
        "obs_last_ts",
        "obs_source",
        "obs_volume",
        "obs_buy_volume",
        "obs_sell_volume",
        "obs_notional",
        "obs_trades",
        F.explode(F.sequence("obs_tick", "span_end")).alias("tick"),
    )
    is_obs = F.col("tick") == F.col("obs_tick")
    age_ms = (F.col("tick") + 1) * step_ms - 1 - F.col("obs_last_ts")
    return g.select(
        "symbol",
        "tick",
        (F.col("tick") * step_s).cast("long").alias("feature_ts"),
        F.col("obs_price").alias("price"),
        age_ms.cast("long").alias("data_age_ms"),
        (age_ms > gap_threshold_s * 1000).alias("gap_indicator"),
        F.col("obs_source").alias("source"),
        F.when(is_obs, F.col("obs_volume")).otherwise(0.0).alias("volume"),
        F.when(is_obs, F.col("obs_buy_volume")).otherwise(0.0).alias("buy_volume"),
        F.when(is_obs, F.col("obs_sell_volume")).otherwise(0.0).alias("sell_volume"),
        F.when(is_obs, F.col("obs_notional")).otherwise(0.0).alias("notional"),
        F.when(is_obs, F.col("obs_trades")).otherwise(F.lit(0).cast("long")).alias(
            "trades"
        ),
        is_obs.alias("has_obs"),
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


EWMA_ALPHA = 0.2
EWMA_WINDOW = 30


def grid_ewma(
    grid: DataFrame, alpha: float = EWMA_ALPHA, window: int = EWMA_WINDOW
) -> DataFrame:
    """Truncated exponentially-weighted moving average of the grid price —
    the smoothing the reference's feature cache applies to noisy mid-price
    series, on the same fixed-second grid as every other gold feature.

    A true recursive EWMA needs sequential state; the ``window``-term
    truncation (weights (1-α)^i, i = 0 for the current tick) keeps it a
    pure windowed expression: ``collect_list`` over the trailing frame (the
    frame is ordered by tick, so element order is deterministic), then one
    JVM ``aggregate`` fold over ≤window elements.  The dropped tail mass is
    (1-α)^window ≈ 0.12% at the defaults — below the 6-dp parity grain for
    any bounded price.  State per row is the window array — identical cost
    to the rolling stddev next to it in the gold vector."""
    w = (
        Window.partitionBy("symbol")
        .orderBy("tick")
        .rowsBetween(-(window - 1), 0)
    )
    arr = F.reverse(F.collect_list("price").over(w))  # element 0 = current tick
    decay = F.lit(1.0 - alpha)
    num = F.aggregate(
        F.transform(arr, lambda x, i: x * F.pow(decay, i.cast("double"))),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    den = F.aggregate(
        F.transform(arr, lambda x, i: F.pow(decay, i.cast("double"))),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    return grid.select(
        "symbol",
        "feature_ts",
        r6(F.col("price")).alias("price"),
        r6(num / den).alias("ewma_price"),
        r6(F.col("price") - num / den).alias("ewma_dev"),
        F.size(arr).cast("long").alias("n_in_window"),
    )


SECONDS_PER_DAY = 86_400


def locf_resample_daily(
    dedup_trades: DataFrame,
    step_s: int = 1,
    slice_s: int | None = GRID_SLICE_S,
    gap_threshold_s: int = GRID_GAP_THRESHOLD_S,
    valid_bounds_hint: DataFrame | None = None,
) -> DataFrame:
    """Multi-year form of :func:`locf_resample`: every window is keyed by
    (symbol, DAY) instead of symbol alone, with the previous day's closing
    observation handed to each day as a seed — the refinement the
    single-window form's docstring promises for 100 TB / multi-year spans.
    Output is IDENTICAL row-for-row to :func:`locf_resample` (asserted in
    tests/test_grid.py); only the parallelism changes: sort/window state is
    one day of observations per task instead of a symbol's full history,
    and the day count — not the span — bounds the widest partition.

    Mechanics: the per-day gap-fill needs two things the day partition
    cannot see — (a) the first obs tick of the NEXT day with data (to bound
    the last span of the current day) and (b) the previous day's closing
    obs (to seed days that do not start with an observation, including runs
    of EMPTY days).  Both live at (symbol, day) grain: a tiny per-day
    aggregate (one row per symbol-day-with-data) is windowed per symbol —
    thousands of rows per symbol even at decade spans — and broadcast back
    by construction of the union, so no wide window ever sees tick-grain
    data.
    """
    step_ms = step_s * 1000
    ticks_per_day = SECONDS_PER_DAY // step_s
    per_tick = dedup_trades.groupBy(
        "symbol", F.expr(f"event_ts div {step_ms}").cast("long").alias("tick")
    ).agg(
        F.max_by("price", "event_ts").alias("obs_price"),
        F.max("event_ts").alias("obs_last_ts"),
        F.max_by("source", "event_ts").alias("obs_source"),
        F.sum("qty").alias("obs_volume"),
        F.sum(_buy()).alias("obs_buy_volume"),
        F.sum(_sell()).alias("obs_sell_volume"),
        F.sum((F.col("price") * F.col("qty")).cast("decimal(20,4)"))
        .cast("double")
        .alias("obs_notional"),
        F.count("*").cast("long").alias("obs_trades"),
    )

    if slice_s is None:
        bounds = per_tick.groupBy().agg(F.max("tick").alias("hi"))
    else:
        n_ticks = slice_s // step_s
        anchor = (
            valid_bounds_hint.select(
                F.expr(f"event_ts div {step_ms}").cast("long").alias("tick")
            )
            if valid_bounds_hint is not None
            else per_tick.select("tick")
        )
        bounds = anchor.groupBy().agg(
            (F.min("tick") + F.lit(n_ticks - 1)).alias("hi")
        )

    pt = (
        per_tick.join(F.broadcast(bounds))
        .filter(F.col("tick") <= F.col("hi"))
        # integer div, never double division + cast (repo time-arithmetic rule)
        .withColumn("day", F.expr(f"tick div {ticks_per_day}").cast("long"))
    )

    # --- (symbol, day) summary frame: tiny (one row per day with data)
    obs_struct = F.struct(
        "obs_price",
        "obs_last_ts",
        "obs_source",
    )
    day_sum = pt.groupBy("symbol", "day").agg(
        F.min("tick").alias("day_first_tick"),
        F.max_by(obs_struct, "tick").alias("day_close"),
    )
    wd = Window.partitionBy("symbol").orderBy("day")
    day_meta = day_sum.select(
        "symbol",
        "day",
        "day_first_tick",
        F.lag("day_close").over(wd).alias("prev_close"),
        F.lag("day").over(wd).alias("prev_day"),
    )

    # --- seed rows: one synthetic span per day whose first obs is not at
    # the day boundary, carrying the previous close across ALL days in
    # (prev_day, day] — explode over the empty-day run keeps every emitted
    # span inside one day, so the day-keyed explode bound holds
    seed_src = day_meta.filter(F.col("prev_close").isNotNull())
    seed_days = seed_src.select(
        "symbol",
        "day_first_tick",
        "prev_close",
        F.explode(F.sequence(F.col("prev_day") + 1, F.col("day"))).alias("sday"),
    )
    day_start = F.col("sday") * ticks_per_day
    day_end = (F.col("sday") + 1) * ticks_per_day - 1
    seeds = seed_days.select(
        "symbol",
        day_start.alias("span_start"),
        F.when(day_end < F.col("day_first_tick"), day_end)
        .otherwise(F.col("day_first_tick") - 1)
        .alias("span_end"),
        F.col("prev_close").alias("carry"),
    ).filter(F.col("span_start") <= F.col("span_end"))

    # --- trailing seeds: after a symbol's LAST data day, the close carries
    # through hi (the single-window form's tail behavior), one span per day
    last_day = day_sum.groupBy("symbol").agg(
        F.max_by(F.struct("day", "day_close"), "day").alias("last")
    )
    trailing = (
        last_day.join(F.broadcast(bounds))
        .withColumn("hi_day", F.expr(f"hi div {ticks_per_day}").cast("long"))
        .filter(F.col("last.day") < F.col("hi_day"))
        .select(
            "symbol",
            "hi",
            F.col("last.day_close").alias("carry"),
            F.explode(
                F.sequence(F.col("last.day") + 1, F.col("hi_day"))
            ).alias("sday"),
        )
        .select(
            "symbol",
            (F.col("sday") * ticks_per_day).alias("span_start"),
            F.least(
                (F.col("sday") + 1) * ticks_per_day - 1, F.col("hi")
            ).alias("span_end"),
            "carry",
        )
        .filter(F.col("span_start") <= F.col("span_end"))
    )
    seeds = seeds.unionByName(trailing)

    # --- per-day gap-fill over observations (window keyed symbol, day)
    wday = Window.partitionBy("symbol", "day").orderBy("tick")
    spanned = (
        pt.withColumn("next_tick", F.lead("tick").over(wday))
        .withColumn(
            "day_span_cap",
            F.least(
                (F.col("day") + 1) * ticks_per_day - 1,
                F.col("hi"),
            ),
        )
        .withColumn(
            "span_end",
            F.least(
                F.coalesce(
                    F.col("next_tick") - 1,
                    # last obs of the day fills to end-of-day; the NEXT
                    # day's seed row continues the carry
                    F.col("day_span_cap"),
                ),
                F.col("day_span_cap"),
            ),
        )
        .withColumnRenamed("tick", "obs_tick")
        .select(
            "symbol",
            F.col("obs_tick").alias("span_start"),
            "span_end",
            "obs_price",
            "obs_last_ts",
            "obs_source",
            "obs_volume",
            "obs_buy_volume",
            "obs_sell_volume",
            "obs_notional",
            "obs_trades",
            F.col("obs_tick"),
        )
    )
    obs_rows = spanned
    seed_rows = seeds.select(
        "symbol",
        "span_start",
        "span_end",
        F.col("carry.obs_price").alias("obs_price"),
        F.col("carry.obs_last_ts").alias("obs_last_ts"),
        F.col("carry.obs_source").alias("obs_source"),
        F.lit(0.0).alias("obs_volume"),
        F.lit(0.0).alias("obs_buy_volume"),
        F.lit(0.0).alias("obs_sell_volume"),
        F.lit(0.0).alias("obs_notional"),
        F.lit(0).cast("long").alias("obs_trades"),
        F.lit(None).cast("long").alias("obs_tick"),
    )
    allspans = obs_rows.unionByName(seed_rows)
    g = allspans.select(
        "symbol",
        "obs_tick",
        "obs_price",
        "obs_last_ts",
        "obs_source",
        "obs_volume",
        "obs_buy_volume",
        "obs_sell_volume",
        "obs_notional",
        "obs_trades",
        F.explode(F.sequence("span_start", "span_end")).alias("tick"),
    )
    is_obs = F.col("tick") == F.col("obs_tick")
    age_ms = (F.col("tick") + 1) * step_ms - 1 - F.col("obs_last_ts")
    return g.select(
        "symbol",
        "tick",
        (F.col("tick") * step_s).cast("long").alias("feature_ts"),
        F.col("obs_price").alias("price"),
        age_ms.cast("long").alias("data_age_ms"),
        (age_ms > gap_threshold_s * 1000).alias("gap_indicator"),
        F.col("obs_source").alias("source"),
        F.when(is_obs, F.col("obs_volume")).otherwise(0.0).alias("volume"),
        F.when(is_obs, F.col("obs_buy_volume")).otherwise(0.0).alias("buy_volume"),
        F.when(is_obs, F.col("obs_sell_volume")).otherwise(0.0).alias("sell_volume"),
        F.when(is_obs, F.col("obs_notional")).otherwise(0.0).alias("notional"),
        F.when(is_obs, F.col("obs_trades")).otherwise(F.lit(0).cast("long")).alias(
            "trades"
        ),
        F.coalesce(is_obs, F.lit(False)).alias("has_obs"),
    )
