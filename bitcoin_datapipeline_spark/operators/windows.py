"""Ordered / analytic window operators (SURVEY §2.5, W1-W7 + A5 + gap detect).

Shared physical policy: ONE window spec per symbol —
``Window.partitionBy("symbol").orderBy(...)`` — so every per-symbol analytic
in a pipeline stage runs off a single hash-exchange + sort.  Ordering keys
always include a unique tiebreaker (trade_id / bucket) because float lag
results are otherwise nondeterministic under event-time ties, and the DuckDB
oracle must sort identically.

At 100 TB: per-symbol windows are the skew risk (symbol is low-cardinality).
Every operator here is either (a) already bucketed to a coarser grain before
the window (bars → ~1.4 k rows per symbol-day), or (b) a lag-1/rank pattern
that AQE handles with per-partition sorted spill.  Nothing materializes an
unbounded frame over raw ticks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import r6


def _w_sym(*order):
    return Window.partitionBy("symbol").orderBy(*order)


def lag_features(trades: DataFrame) -> DataFrame:
    """W1: previous-row comparison per symbol (transformer.py:262-291 —
    sort by timestamp, compare with previous row of the same symbol;
    first row has NULL derived features per :274-281)."""
    w = _w_sym("event_ts", "trade_id")
    prev = F.lag("price").over(w)
    return trades.select(
        "symbol",
        "trade_id",
        "event_ts",
        "price",
        r6(prev).alias("prev_price"),
        r6(F.col("price") - prev).alias("price_change"),
        r6((F.col("price") - prev) / prev * 100.0).alias("price_change_pct"),
    )


def bar_returns(bars: DataFrame, horizons: tuple[int, ...] = (1, 5, 10)) -> DataFrame:
    """W2: k-bar log returns on the 1-minute bar series
    (spec: docs/schemas/S3_SCHEMA.md:533-537 returns over multiple horizons;
    docs/architecture/DATA_PIPELINE.md:166-169).

    The reference computes returns on a fixed time grid; the engine's grid is
    the bar sequence (k bars back ≡ k minutes when the market is active —
    gaps are surfaced separately by gap_detect, mirroring the reference's
    gap_indicator column, S3_SCHEMA.md:600)."""
    w = _w_sym("bucket")
    cols = [F.col("symbol"), F.col("bucket"), F.col("close")]
    for k in horizons:
        prev_k = F.lag("close", k).over(w)
        cols.append(r6(F.log(F.col("close") / prev_k)).alias(f"ret_{k}"))
    return bars.select(*cols)


DIRECTION_EPS = 1e-4


def labels(bars: DataFrame, horizon: int = 10) -> DataFrame:
    """W3: forward-looking training labels (docs/schemas/S3_SCHEMA.md:622-682;
    DATA_PIPELINE.md:359-381): target price k bars ahead, log return,
    direction in {-1,0,1} with a ±1e-4 dead zone, and path statistics over
    the (t, t+k] window — max/min/volatility/volume/trade count — plus a
    validity flag when the full horizon exists (S3_SCHEMA.md:676-681).

    lead()/forward ROWS frame — label leakage is structurally impossible:
    only rows strictly after t enter the frame."""
    w = _w_sym("bucket")
    fwd = w.rowsBetween(1, horizon)
    target = F.lead("close", horizon).over(w)
    ret = F.log(target / F.col("close"))
    return bars.select(
        "symbol",
        "bucket",
        "close",
        r6(target).alias("target_price"),
        r6(ret).alias(f"return_{horizon}"),
        F.when(ret > DIRECTION_EPS, 1)
        .when(ret < -DIRECTION_EPS, -1)
        .otherwise(F.when(ret.isNull(), None).otherwise(0))
        .cast("int")
        .alias("direction"),
        r6(F.max("high").over(fwd)).alias("path_max"),
        r6(F.min("low").over(fwd)).alias("path_min"),
        r6(F.stddev_samp("close").over(fwd)).alias("path_volatility"),
        r6(F.sum("volume").over(fwd)).alias("path_volume"),
        F.sum("trade_count").over(fwd).cast("long").alias("path_trade_count"),
        (F.count("close").over(fwd) == horizon).alias("is_valid"),
    )


def latest_per_key(trades: DataFrame) -> DataFrame:
    """W4: latest row per key (RDS_SCHEMA.md:573-605 `DISTINCT ON ... ORDER BY
    ts DESC`; Redis `:latest` key semantics, redis_writer.py:89-95)."""
    w = _w_sym(F.desc("event_ts"), F.desc("trade_id"))
    return (
        trades.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_recent(trades: DataFrame, k: int = 5) -> DataFrame:
    """W5: top-K most recent per key (redis_writer.py:158-200 — sort keys by
    embedded timestamp desc, take N)."""
    w = _w_sym(F.desc("event_ts"), F.desc("trade_id"))
    return (
        trades.withColumn("recency_rank", F.row_number().over(w))
        .filter(F.col("recency_rank") <= k)
        .withColumn("recency_rank", F.col("recency_rank").cast("int"))
    )


def momentum(bars: DataFrame) -> DataFrame:
    """W6: momentum / acceleration / volume trend (spec S3_SCHEMA.md:569-578,
    REDIS_SCHEMA.md:210-216) — nested lags of first differences."""
    w = _w_sym("bucket")
    mom = F.col("close") - F.lag("close").over(w)
    bars2 = bars.select("symbol", "bucket", "close", "volume", mom.alias("mom_raw"))
    accel = F.col("mom_raw") - F.lag("mom_raw").over(w)
    vol_trend = F.col("volume") - F.lag("volume").over(w)
    return bars2.select(
        "symbol",
        "bucket",
        "close",
        r6(F.col("mom_raw")).alias("momentum"),
        r6(accel).alias("acceleration"),
        r6(vol_trend).alias("volume_trend"),
    )


def rolling_volatility(bars: DataFrame, nbars: int = 10) -> DataFrame:
    """W7: trailing-window price volatility (feature_builder.py:157-158 batch
    stddev; spec S3_SCHEMA.md:568) over the last `nbars` bars."""
    w = _w_sym("bucket").rowsBetween(-(nbars - 1), 0)
    return bars.select(
        "symbol",
        "bucket",
        "close",
        r6(F.stddev_samp("close").over(w)).alias(f"volatility_{nbars}"),
        F.count("close").over(w).cast("long").alias("n_in_window"),
    )


def rolling_stats(bars: DataFrame, minutes: int = 5) -> DataFrame:
    """A5: rolling hot-window stats (docs/architecture/DATA_PIPELINE.md:109-157,
    REDIS_SCHEMA.md:113-158 — per-symbol rolling count/volume/notional/vwap/
    intensity continuously refreshed).

    RANGE frame over the integer minute bucket — unlike a ROWS frame this is
    gap-correct: a bar after a 3-minute silence only sees bars within the
    trailing `minutes` wall-clock window, exactly the Redis TTL semantics."""
    w = _w_sym("bucket").rangeBetween(-(minutes - 1), 0)
    roll_volume = F.sum("volume").over(w)
    # bar notionals are 4-dec grid values: decimal window sum for
    # cross-engine bit-identity (same policy as the groupBy aggregates)
    roll_notional = F.sum(F.col("notional").cast("decimal(24,6)")).over(w).cast("double")
    roll_trades = F.sum("trade_count").over(w)
    return bars.select(
        "symbol",
        "bucket",
        F.count("close").over(w).cast("long").alias("bars_in_window"),
        roll_trades.cast("long").alias("roll_trade_count"),
        r6(roll_volume).alias("roll_volume"),
        r6(roll_notional).alias("roll_notional"),
        r6(roll_notional / roll_volume).alias("roll_vwap"),
        r6(roll_trades / F.lit(float(minutes * 60))).alias("trade_intensity"),
        r6(roll_notional / F.lit(float(minutes * 60))).alias("dollar_intensity"),
    )


GAP_THRESHOLD_MS = 2 * 3_600_000


def gap_detect(trades: DataFrame, threshold_ms: int = GAP_THRESHOLD_MS) -> DataFrame:
    """Gap detection (services/gap_detector/README.md:1-55; validation list
    DATA_PIPELINE.md:566-571): flag inter-arrival gaps beyond a threshold —
    the batch analog of the gap-monitor that triggers re-anchoring."""
    w = _w_sym("event_ts", "trade_id")
    prev_ts = F.lag("event_ts").over(w)
    out = trades.select(
        "symbol",
        "event_ts",
        "trade_id",
        prev_ts.alias("prev_event_ts"),
        (F.col("event_ts") - prev_ts).alias("gap_ms"),
    )
    return out.filter(F.col("gap_ms") > threshold_ms).select(
        "symbol",
        "prev_event_ts",
        F.col("event_ts").alias("resume_event_ts"),
        "gap_ms",
        r6(F.col("gap_ms") / 1000.0).alias("gap_seconds"),
    )


SESSION_GAP_MS = 30 * 60_000


def sessionize(trades: DataFrame, gap_ms: int = SESSION_GAP_MS) -> DataFrame:
    """Sessionization (batch form of `session_window`): a new session starts
    when the inter-arrival gap exceeds `gap_ms`.  Classic lag + running-sum
    pattern — one exchange on symbol, two window passes over the same sort.

    The reference's analog is connection/stream-session accounting around
    gap-triggered re-anchors (gap_detector + re_anchor_service READMEs):
    a gap closes one continuous data session and opens the next."""
    w = _w_sym("event_ts", "trade_id")
    prev_ts = F.lag("event_ts").over(w)
    is_new = F.when(
        prev_ts.isNull() | ((F.col("event_ts") - prev_ts) > gap_ms), 1
    ).otherwise(0)
    cum = F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    marked = trades.withColumn("is_new", is_new).withColumn("session_id", cum)
    return (
        marked.groupBy("symbol", "session_id")
        .agg(
            F.min("event_ts").alias("session_start"),
            F.max("event_ts").alias("session_end"),
            F.count("*").cast("long").alias("n_trades"),
            F.sum("qty").alias("volume"),
        )
        .select(
            "symbol",
            F.col("session_id").cast("long").alias("session_id"),
            "session_start",
            "session_end",
            r6((F.col("session_end") - F.col("session_start")) / 1000.0).alias(
                "duration_s"
            ),
            "n_trades",
            r6(F.col("volume")).alias("volume"),
        )
    )


def session_stats(trades: DataFrame, gap_ms: int = SESSION_GAP_MS) -> DataFrame:
    """Per-symbol roll-up over :func:`sessionize` output: session counts,
    duration and activity statistics — the session-accounting summary the
    reference's re-anchor monitoring reads.

    Determinism: durations aggregate from exact ms longs (one double
    division at the end), volume goes through a DECIMAL(24,6) sum of the
    already-6dp session volumes — both order-insensitive across engines."""
    s = sessionize(trades, gap_ms)
    dur_ms = F.col("session_end") - F.col("session_start")
    return s.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_sessions"),
        r6(F.sum(dur_ms) / 1000.0 / F.count("*")).alias("avg_duration_s"),
        r6(F.max(dur_ms) / 1000.0).alias("max_duration_s"),
        r6(F.sum("n_trades") / F.count("*")).alias("avg_trades_per_session"),
        F.max("n_trades").cast("long").alias("max_trades_per_session"),
        r6(F.sum(F.col("volume").cast("decimal(24,6)")).cast("double")).alias(
            "total_volume"
        ),
    )


def time_series_split(
    bars: DataFrame, train_frac: float = 0.7, val_frac: float = 0.15
) -> DataFrame:
    """Time-ordered train/val/test split (docs/schemas/S3_SCHEMA.md:731-736):
    the split MUST be by time, never random — random splits leak future
    information into training (SURVEY §7.3 hard part (b)).

    Boundaries are quantiles of the global bucket range (computed as a tiny
    scalar aggregate, broadcast back — no unbounded window)."""
    rng = bars.groupBy().agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    j = bars.join(F.broadcast(rng))
    span = F.col("hi") - F.col("lo")
    train_end = F.col("lo") + F.floor(span * train_frac)
    val_end = F.col("lo") + F.floor(span * (train_frac + val_frac))
    return j.select(
        "symbol",
        "bucket",
        "close",
        F.when(F.col("bucket") <= train_end, "train")
        .when(F.col("bucket") <= val_end, "val")
        .otherwise("test")
        .alias("split"),
    )


OUTLIER_SIGMA_WINDOW = 20
OUTLIER_Z = 3.0


def return_outliers(
    bars: DataFrame, window: int = OUTLIER_SIGMA_WINDOW, z: float = OUTLIER_Z
) -> DataFrame:
    """Data-quality gate: bars whose log return exceeds ``z`` rolling
    standard deviations — the anomaly screen a feature pipeline runs before
    training data leaves silver.

    The rolling σ uses the PRIOR ``window`` returns only (frame ends at
    -1): the candidate observation never contaminates its own baseline, so
    a genuine spike cannot mask itself.  One per-symbol sort shared by the
    return lag and the σ window."""
    w = Window.partitionBy("symbol").orderBy("bucket")
    prior = w.rowsBetween(-window, -1)
    # two projections: the return must materialize as a column before the
    # σ window can aggregate it (window-inside-window is illegal), but both
    # windows share the same (symbol, bucket) sort — one exchange
    r = bars.select(
        "symbol",
        "bucket",
        "close",
        F.log(F.col("close") / F.lag("close", 1).over(w)).alias("ret_raw"),
    )
    d = r.select(
        "symbol",
        "bucket",
        "close",
        "ret_raw",
        F.stddev_samp("ret_raw").over(prior).alias("sigma_raw"),
        F.count("ret_raw").over(prior).alias("n_prior"),
    )
    zscore = F.col("ret_raw") / F.col("sigma_raw")
    return (
        d.filter(
            (F.col("n_prior") >= window)
            & (F.col("sigma_raw") > 0)
            & (F.abs(zscore) > z)
        )
        .select(
            "symbol",
            "bucket",
            r6(F.col("close")).alias("close"),
            r6(F.col("ret_raw")).alias("ret"),
            r6(F.col("sigma_raw")).alias("sigma"),
            r6(zscore).alias("zscore"),
        )
    )


DRIFT_BUCKETS = 10
DRIFT_EPS = 1e-6


def feature_drift(
    bars: DataFrame, buckets: int = DRIFT_BUCKETS, eps: float = DRIFT_EPS
) -> DataFrame:
    """Population-stability-index (PSI) drift report between the time
    split's train and test partitions, per symbol — the distribution-shift
    gate a training pipeline runs before trusting a temporal split:
    PSI = Σ_b (p_test,b − p_train,b) · ln(p_test,b / p_train,b) over
    fixed-width buckets of the close price anchored to the TRAIN min/max
    (test mass outside the train range clamps into the edge buckets — that
    mass is exactly the drift signal).  Rule of thumb: <0.1 stable, >0.25
    shifted.

    Deterministic cross-engine: bucket index is floor((x−lo)/w) of
    identical IEEE doubles; proportions clamp at ``eps`` so empty buckets
    contribute a finite penalty instead of ±inf.  Plan: two scalar-ish
    aggregates (train bounds per symbol, split totals) broadcast back, one
    bucket groupBy with the split pivot folded into conditional sums."""
    s = time_series_split(bars)
    b = (
        s.filter(F.col("split") == "train")
        .groupBy("symbol")
        .agg(F.min("close").alias("lo"), F.max("close").alias("hi"))
    )
    j = s.filter(F.col("split").isin("train", "test")).join(F.broadcast(b), "symbol")
    w_width = (F.col("hi") - F.col("lo")) / buckets
    idx = F.when(
        F.col("hi") > F.col("lo"),
        F.least(
            F.greatest(
                F.floor((F.col("close") - F.col("lo")) / w_width), F.lit(0)
            ),
            F.lit(buckets - 1),
        ),
    ).otherwise(0)
    per_bucket = j.groupBy("symbol", idx.cast("int").alias("b")).agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("n_train"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("n_test"),
    )
    totals = per_bucket.groupBy("symbol").agg(
        F.sum("n_train").alias("t_train"), F.sum("n_test").alias("t_test")
    )
    p_train = F.greatest(F.col("n_train") / F.col("t_train"), F.lit(eps))
    p_test = F.greatest(F.col("n_test") / F.col("t_test"), F.lit(eps))
    term = (p_test - p_train) * F.log(p_test / p_train)
    return (
        per_bucket.join(totals, "symbol")
        .groupBy("symbol")
        .agg(
            F.sum("n_train").cast("long").alias("n_train"),
            F.sum("n_test").cast("long").alias("n_test"),
            F.count("*").cast("long").alias("n_buckets"),
            r6(F.sum(term)).alias("psi"),
        )
    )


PAIR_CORR_WINDOW = 60


def pair_correlation(bars: DataFrame, window: int = PAIR_CORR_WINDOW) -> DataFrame:
    """Rolling correlation of 1-bar log returns between the two
    lexicographically-first symbols — the pair/lead-lag feature a
    cross-asset model reads (and the reference's multi-symbol Redis cache
    makes cheap to serve).

    Plan: per-symbol returns (shared symbol sort), inner-join the pair on
    the bucket (co-partitioned equi-join), rolling ``corr`` window keyed by
    the pair columns — the series is one pair so the window is one
    partition BY CONSTRUCTION (bounded by bars-per-pair, not corpus size);
    cross-pair scale-out partitions by the pair key.  The pair itself is a
    broadcast 1-row aggregate, never a driver-side collect — and a
    degenerate 1-symbol corpus yields self-correlation rows, matching the
    oracle, instead of an engine-side exception."""
    pair = (
        bars.select("symbol")
        .distinct()
        .orderBy("symbol")
        .limit(2)
        .groupBy()
        .agg(F.min("symbol").alias("sym_a"), F.max("symbol").alias("sym_b"))
    )
    w = Window.partitionBy("symbol").orderBy("bucket")
    r = bars.select(
        "symbol",
        "bucket",
        F.log(F.col("close") / F.lag("close").over(w)).alias("ret"),
    ).filter(F.col("ret").isNotNull())
    ra = r.join(
        F.broadcast(pair), r.symbol == F.col("sym_a")
    ).select("sym_a", "sym_b", "bucket", F.col("ret").alias("ret_a"))
    rb = r.join(
        F.broadcast(pair.select("sym_b")), r.symbol == F.col("sym_b")
    ).select("bucket", F.col("ret").alias("ret_b"))
    j = ra.join(rb, "bucket")
    wp = (
        Window.partitionBy("sym_a", "sym_b")
        .orderBy("bucket")
        .rowsBetween(-(window - 1), 0)
    )
    # zero-variance windows: Spark's corr yields NaN, DuckDB NULL — gate on
    # both windowed variances so the engines agree (NULL = undefined corr)
    corr_guarded = F.when(
        (F.var_samp("ret_a").over(wp) > 0) & (F.var_samp("ret_b").over(wp) > 0),
        F.corr("ret_a", "ret_b").over(wp),
    )
    return j.select(
        "sym_a",
        "sym_b",
        "bucket",
        r6(F.col("ret_a")).alias("ret_a"),
        r6(F.col("ret_b")).alias("ret_b"),
        r6(corr_guarded).alias(f"corr_{window}"),
        F.count("ret_a").over(wp).cast("long").alias("n_in_window"),
    )


def trade_runs(trades: DataFrame) -> DataFrame:
    """Order-flow run-length statistics per (symbol, side): maximal runs
    of consecutive same-side trades (the gaps-and-islands VALUE-CHANGE
    segmentation — :func:`sessionize` is the time-gap twin), summarized
    as run count / mean / max length.  Long buy runs are the order-
    splitting signature behind long-memory order flow (Lillo & Farmer
    2004) — the persistence gauge upstream of :func:`~.aggregates.vpin`'s
    toxicity measure.

    Segmentation: boundary = side != lag(side) over the deterministic
    (event_ts, ingest_ts, trade_id) sort; run_id = running boundary count
    — both windows and the per-run aggregate ride ONE partitionBy(symbol)
    sort (run_id preserves symbol partitioning); the final aggregate is
    #runs-sized.

    cf. reference: extends the surface (the reference aggregates
    per-bucket imbalance, `feature_builder.py:119-123`; no sequence
    statistics)."""
    wl = Window.partitionBy("symbol").orderBy(
        "event_ts", "ingest_ts", "trade_id"
    )
    boundary = F.when(
        F.lag("is_buyer_maker").over(wl).isNull()
        | (F.lag("is_buyer_maker").over(wl) != F.col("is_buyer_maker")),
        1,
    ).otherwise(0)
    runs = (
        trades.select(
            "symbol",
            "is_buyer_maker",
            boundary.alias("b"),
            F.col("event_ts"),
            F.col("ingest_ts"),
            F.col("trade_id"),
        )
        .withColumn(
            "run_id",
            F.sum("b").over(wl.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("symbol", "run_id")
        .agg(
            F.first("is_buyer_maker").alias("is_buyer_maker"),
            F.count("*").alias("run_len"),
        )
    )
    return runs.groupBy("symbol", "is_buyer_maker").agg(
        F.count("*").cast("long").alias("n_runs"),
        r6(F.avg("run_len")).alias("avg_run_len"),
        F.max("run_len").cast("long").alias("max_run_len"),
    )


# oracle body over dedup_trades: same deterministic sort + segmentation
TRADE_RUNS_ORACLE_BODY = """
,seg AS (
  SELECT symbol, is_buyer_maker, event_ts, ingest_ts, trade_id,
         CASE WHEN lag(is_buyer_maker) OVER w IS NULL
                OR lag(is_buyer_maker) OVER w != is_buyer_maker
              THEN 1 ELSE 0 END AS b
  FROM dedup_trades
  WINDOW w AS (PARTITION BY symbol ORDER BY event_ts, ingest_ts, trade_id)
),
runs AS (
  SELECT symbol, is_buyer_maker,
         sum(b) OVER (PARTITION BY symbol
                      ORDER BY event_ts, ingest_ts, trade_id
                      ROWS UNBOUNDED PRECEDING) AS run_id
  FROM seg
),
rl AS (
  SELECT symbol, run_id,
         any_value(is_buyer_maker) AS is_buyer_maker,
         count(*) AS run_len
  FROM runs GROUP BY 1, 2
)
SELECT symbol, is_buyer_maker,
       CAST(count(*) AS BIGINT) AS n_runs,
       round(avg(run_len), 6) AS avg_run_len,
       CAST(max(run_len) AS BIGINT) AS max_run_len
FROM rl GROUP BY 1, 2"""


def drawdown(bars: DataFrame) -> DataFrame:
    """Maximum drawdown per symbol over the 1-minute bar closes: running
    peak (cumulative max close), per-bar drawdown close/peak − 1, and the
    deepest point with its location — the risk summary every strategy
    report leads with.  Ties on the minimum drawdown resolve to the
    EARLIEST bar (lexicographic min over (drawdown, bucket) — bucket is
    unique per symbol, so the struct min is total and engine-agnostic).

    Plan shape: the running peak rides ONE partitionBy(symbol) sort;
    the summary is a symbol-count-sized aggregate over the same
    partitioning.

    cf. reference: extends the surface (the reference's daily summary has
    no path-dependent risk statistics, `feature_builder.py:119-123`)."""
    wl = (
        Window.partitionBy("symbol")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    b = bars.select(
        "symbol",
        "bucket",
        "close",
        F.max("close").over(wl).alias("peak"),
    ).withColumn("dd", F.col("close") / F.col("peak") - 1.0)
    worst = F.min(F.struct("dd", "bucket", "peak", "close"))
    return b.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_bars"),
        r6(worst.getField("dd")).alias("max_drawdown"),
        worst.getField("bucket").cast("long").alias("trough_bucket"),
        r6(worst.getField("peak")).alias("peak_close"),
        r6(worst.getField("close")).alias("trough_close"),
    )


# oracle body over the bars CTE: same running peak + struct-min tiebreak
DRAWDOWN_ORACLE_BODY = """
,dd AS (
  SELECT symbol, bucket, close,
         max(close) OVER (PARTITION BY symbol ORDER BY bucket
                          ROWS UNBOUNDED PRECEDING) AS peak
  FROM bars
),
w AS (
  SELECT symbol,
         count(*) AS n_bars,
         min({'dd': close / peak - 1.0, 'bucket': bucket,
              'peak': peak, 'close': close}) AS worst
  FROM dd GROUP BY symbol
)
SELECT symbol, CAST(n_bars AS BIGINT) AS n_bars,
       round(worst.dd, 6) AS max_drawdown,
       CAST(worst.bucket AS BIGINT) AS trough_bucket,
       round(worst.peak, 6) AS peak_close,
       round(worst.close, 6) AS trough_close
FROM w"""


RANK_NTILES = 4


def daily_rank_surface(bars: DataFrame, ntiles: int = RANK_NTILES) -> DataFrame:
    """Cross-sectional ranking surface: per day, every symbol ranked by
    its daily notional — row_number, rank, dense_rank, percent_rank,
    cume_dist, and the ntile quartile in one pass.  The cross-sectional
    "which symbols dominated today" leaderboard (and the engine's parity
    pin for the full SQL rank-function family, which no other query
    exercises).

    Determinism: daily notional is a DECIMAL-exact sum of the 6-dp bar
    notionals, and the window orders by (notional DESC, symbol) so ties
    are impossible by construction — every rank function is then
    value-deterministic in both engines (percent_rank/cume_dist are
    exact small-integer ratios, rounded 6 dp only for the hash).

    Plan shape: one partial-combinable (symbol, day) aggregate, then ONE
    window over partitionBy(day) — K rows per partition (symbol count),
    days partitions.  All six functions share the single sort.

    cf. reference: extends the surface (the reference's daily summary,
    S3_SCHEMA.md:568, has no cross-sectional ranking)."""
    d = bars.groupBy(
        "symbol",
        F.expr("(bucket * 60000) div 86400000").cast("long").alias("day"),
    ).agg(
        F.sum(F.col("notional").cast("decimal(18,6)"))
        .cast("decimal(28,6)")
        .alias("notional_day")
    )
    w = Window.partitionBy("day").orderBy(F.desc("notional_day"), "symbol")
    return d.select(
        "day",
        "symbol",
        F.col("notional_day").cast("double").alias("notional_day"),
        F.row_number().over(w).cast("int").alias("rn"),
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        r6(F.percent_rank().over(w)).alias("pct_rank"),
        r6(F.cume_dist().over(w)).alias("cume"),
        F.ntile(ntiles).over(w).cast("int").alias("quartile"),
    )


RANK_SURFACE_ORACLE_BODY = f"""
,rs AS (
  SELECT symbol, (bucket * 60000) // 86400000 AS day,
         CAST(sum(CAST(notional AS DECIMAL(18,6))) AS DECIMAL(28,6))
             AS notional_day
  FROM bars GROUP BY 1, 2
)
SELECT CAST(day AS BIGINT) AS day, symbol,
       CAST(notional_day AS DOUBLE) AS notional_day,
       CAST(row_number() OVER w AS INT) AS rn,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       CAST(ntile({RANK_NTILES}) OVER w AS INT) AS quartile
FROM rs
WINDOW w AS (PARTITION BY day ORDER BY notional_day DESC, symbol)"""


# --- round 8: classical TA features (exact-decimal window discipline) -------

RSI_PERIOD = 14
BOLL_PERIOD = 20
BOLL_K = 2.0
STOCH_PERIOD = 14


def rsi(bars: DataFrame, period: int = RSI_PERIOD) -> DataFrame:
    """Relative Strength Index per bar, SMA (Cutler) convention:
    RSI = 100·Σgains / (Σgains + Σlosses) over the trailing ``period``
    close-to-close changes — algebraically identical to
    100 − 100/(1 + avg_gain/avg_loss) but with ONE division, so the
    zero-loss branch needs no special case (both-zero windows emit
    NULL).  Wilder's recursive smoothing is deliberately not used: it is
    an infinite-memory EWMA (not SQL-window expressible) and Cutler's
    SMA form is the standard batch-replay convention.

    Exactness: Δclose is an exact DECIMAL(18,6) grid difference; the
    window sums are exact decimal; the single division runs on identical
    doubles in both engines.  Rows emit only when the window holds a
    full ``period`` deltas (the standard warm-up gate).

    Plan shape: ONE partitionBy(symbol) sort carries the lag and both
    rolling sums.

    cf. reference: extends the surface (classical-TA block over the
    engine's own bars; no reference counterpart)."""
    wl = Window.partitionBy("symbol").orderBy("bucket")
    dc = F.col("close").cast("decimal(18,6)") - F.lag(
        F.col("close").cast("decimal(18,6)")
    ).over(wl)
    d = bars.select("symbol", "bucket", dc.alias("dc")).filter(
        F.col("dc").isNotNull()
    )
    wr = (
        Window.partitionBy("symbol")
        .orderBy("bucket")
        .rowsBetween(-(period - 1), 0)
    )
    gain = F.when(F.col("dc") > 0, F.col("dc")).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    loss = F.when(F.col("dc") < 0, -F.col("dc")).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    g = F.sum(gain).over(wr).cast("double")
    l = F.sum(loss).over(wr).cast("double")
    n_in = F.count("dc").over(wr)
    return (
        d.select(
            "symbol",
            "bucket",
            n_in.alias("n_in"),
            g.alias("g"),
            l.alias("l"),
        )
        .filter(F.col("n_in") == period)
        .select(
            "symbol",
            "bucket",
            F.when(
                F.col("g") + F.col("l") > 0.0,
                r6(100.0 * F.col("g") / (F.col("g") + F.col("l"))),
            ).alias("rsi"),
        )
    )


RSI_ORACLE_BODY = f"""
,rsi_d AS (
  SELECT symbol, bucket,
         CAST(close AS DECIMAL(18,6))
           - lag(CAST(close AS DECIMAL(18,6))) OVER (
               PARTITION BY symbol ORDER BY bucket) AS dc
  FROM bars
),
rsi_w AS (
  SELECT symbol, bucket,
         count(dc) OVER w AS n_in,
         CAST(sum(CASE WHEN dc > 0 THEN dc
                       ELSE CAST(0 AS DECIMAL(18,6)) END) OVER w
              AS DOUBLE) AS g,
         CAST(sum(CASE WHEN dc < 0 THEN -dc
                       ELSE CAST(0 AS DECIMAL(18,6)) END) OVER w
              AS DOUBLE) AS l
  FROM rsi_d WHERE dc IS NOT NULL
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket
               ROWS BETWEEN {RSI_PERIOD - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, bucket,
       CASE WHEN g + l > 0.0 THEN round(100.0 * g / (g + l), 6) END AS rsi
FROM rsi_w WHERE n_in = {RSI_PERIOD}"""


def bollinger_breach(
    bars: DataFrame, period: int = BOLL_PERIOD, k: float = BOLL_K
) -> DataFrame:
    """Bollinger-band breach scorecard per (symbol, day): over the
    trailing ``period``-bar close window, count closes above
    mean + k·std and below mean − k·std, plus the mean relative
    bandwidth — the volatility-regime feature a TA block extracts (band
    walks = trends, squeezes = breakout setups).

    Exactness: the window mean and second moment come from exact
    DECIMAL(18,6)/(38,12) sums (close and close² live on the 1e-6 /
    1e-12 grids), so both engines derive band edges from identical
    doubles and the breach compares cannot drift — the
    ``rolling_stats`` decimal-window policy extended to second moments.

    Plan shape: ONE partitionBy(symbol) sort for the rolling sums, one
    (symbol, day) aggregate.

    cf. reference: extends the surface (no reference counterpart)."""
    wr = (
        Window.partitionBy("symbol")
        .orderBy("bucket")
        .rowsBetween(-(period - 1), 0)
    )
    cd = F.col("close").cast("decimal(18,6)")
    s1 = F.sum(cd).over(wr).cast("double")
    s2 = F.sum((cd * cd).cast("decimal(38,12)")).over(wr).cast("double")
    n_in = F.count("close").over(wr)
    mean = s1 / n_in
    var = F.greatest(F.lit(0.0), s2 / n_in - mean * mean)
    std = F.sqrt(var)
    upper = mean + F.lit(k) * std
    lower = mean - F.lit(k) * std
    e = bars.select(
        "symbol",
        "bucket",
        "close",
        n_in.alias("n_in"),
        upper.alias("upper"),
        lower.alias("lower"),
        (2.0 * F.lit(k) * std / mean).alias("bw"),
    ).filter(F.col("n_in") == period)
    return e.groupBy(
        "symbol", F.expr("bucket div 1440").cast("long").alias("day")
    ).agg(
        F.count("*").cast("long").alias("n_eval"),
        F.sum(F.when(F.col("close") > F.col("upper"), 1).otherwise(0))
        .cast("long")
        .alias("n_upper_breach"),
        F.sum(F.when(F.col("close") < F.col("lower"), 1).otherwise(0))
        .cast("long")
        .alias("n_lower_breach"),
        r6(F.avg("bw")).alias("mean_bandwidth"),
    )


BOLLINGER_ORACLE_BODY = f"""
,bb_w AS (
  SELECT symbol, bucket, close,
         count(close) OVER w AS n_in,
         CAST(sum(CAST(close AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1,
         CAST(sum(CAST(CAST(close AS DECIMAL(19,6))
                       * CAST(close AS DECIMAL(19,6)) AS DECIMAL(38,12)))
              OVER w AS DOUBLE) AS s2
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket
               ROWS BETWEEN {BOLL_PERIOD - 1} PRECEDING AND CURRENT ROW)
),
bb_e AS (
  SELECT symbol, bucket // 1440 AS day, close,
         s1 / n_in AS mean,
         sqrt(greatest(0.0, s2 / n_in - (s1 / n_in) * (s1 / n_in))) AS std
  FROM bb_w WHERE n_in = {BOLL_PERIOD}
)
SELECT symbol, day,
       CAST(count(*) AS BIGINT) AS n_eval,
       CAST(sum(CASE WHEN close > mean + CAST({BOLL_K!r} AS DOUBLE) * std
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_upper_breach,
       CAST(sum(CASE WHEN close < mean - CAST({BOLL_K!r} AS DOUBLE) * std
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_lower_breach,
       round(avg(2.0 * CAST({BOLL_K!r} AS DOUBLE) * std / mean), 6)
           AS mean_bandwidth
FROM bb_e GROUP BY symbol, day"""


def stochastic_k(bars: DataFrame, period: int = STOCH_PERIOD) -> DataFrame:
    """Stochastic oscillator per bar: %K = 100·(close − LL)/(HH − LL)
    over the trailing ``period`` bars' high/low extremes, and %D = the
    3-bar SMA of %K.  HH/LL are exact max/min (no accumulation), so %K
    is deterministic by construction; %D sums the 6-dp-rounded %K on the
    DECIMAL grid before its one division — the only way a 3-term double
    average is bit-identical across engines.

    Flat windows (HH = LL) emit NULL %K and drop out of %D's average
    (count only non-null %K — both engines' avg-over-window semantics).

    Plan shape: ONE partitionBy(symbol) sort carries both extremes and
    the %D window.

    cf. reference: extends the surface (no reference counterpart)."""
    wr = (
        Window.partitionBy("symbol")
        .orderBy("bucket")
        .rowsBetween(-(period - 1), 0)
    )
    hh = F.max("high").over(wr)
    ll = F.min("low").over(wr)
    n_in = F.count("close").over(wr)
    k_raw = F.when(
        hh > ll, r6(100.0 * (F.col("close") - ll) / (hh - ll))
    )
    e = bars.select(
        "symbol",
        "bucket",
        n_in.alias("n_in"),
        k_raw.alias("k_pct"),
    ).filter(F.col("n_in") == period)
    wd = (
        Window.partitionBy("symbol").orderBy("bucket").rowsBetween(-2, 0)
    )
    d_pct = (
        F.sum(F.col("k_pct").cast("decimal(18,6)")).over(wd).cast("double")
        / F.count("k_pct").over(wd)
    )
    return e.select(
        "symbol",
        "bucket",
        "k_pct",
        F.when(F.count("k_pct").over(wd) > 0, r6(d_pct)).alias("d_pct"),
    )


STOCHASTIC_ORACLE_BODY = f"""
,st_w AS (
  SELECT symbol, bucket, close,
         count(close) OVER w AS n_in,
         max(high) OVER w AS hh,
         min(low) OVER w AS ll
  FROM bars
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket
               ROWS BETWEEN {STOCH_PERIOD - 1} PRECEDING AND CURRENT ROW)
),
st_k AS (
  SELECT symbol, bucket,
         CASE WHEN hh > ll
              THEN round(100.0 * (close - ll) / (hh - ll), 6) END AS k_pct
  FROM st_w WHERE n_in = {STOCH_PERIOD}
)
SELECT symbol, bucket, k_pct,
       CASE WHEN count(k_pct) OVER d > 0
            THEN round(CAST(sum(CAST(k_pct AS DECIMAL(18,6))) OVER d
                            AS DOUBLE) / count(k_pct) OVER d, 6)
       END AS d_pct
FROM st_k
WINDOW d AS (PARTITION BY symbol ORDER BY bucket
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"""


ATR_PERIOD = 14


def atr(bars: DataFrame, period: int = ATR_PERIOD) -> DataFrame:
    """Average True Range per bar (SMA convention, same rationale as
    :func:`rsi`): TR = max(high − low, |high − prev_close|,
    |low − prev_close|), ATR = the trailing ``period``-bar mean — the
    volatility unit position-sizing rules quote ("risk 1 ATR").  Also
    emits the normalized ATR (ATR / close, the cross-symbol comparable).

    Exactness: every TR operand is an exact DECIMAL(18,6) grid
    difference, the max of decimals is exact, the rolling sum is exact
    decimal; the two divisions run on identical doubles.  The FIRST bar's
    TR is its own range, per Wilder — both engines' ``greatest`` skips
    the NULL prev-close legs.  Warm-up rows (fewer than ``period`` TRs)
    don't emit.

    Plan shape: ONE partitionBy(symbol) sort carries the prev-close lag
    and the rolling sum.

    cf. reference: extends the surface (no reference counterpart)."""
    wl = Window.partitionBy("symbol").orderBy("bucket")
    h = F.col("high").cast("decimal(18,6)")
    l = F.col("low").cast("decimal(18,6)")
    pc = F.lag(F.col("close").cast("decimal(18,6)")).over(wl)
    tr = F.greatest(h - l, F.abs(h - pc), F.abs(l - pc))
    d = bars.select(
        "symbol", "bucket", "close", tr.alias("tr")
    ).filter(F.col("tr").isNotNull())
    wr = (
        Window.partitionBy("symbol")
        .orderBy("bucket")
        .rowsBetween(-(period - 1), 0)
    )
    s = F.sum("tr").over(wr).cast("double")
    n_in = F.count("tr").over(wr)
    av = s / n_in
    return (
        d.select(
            "symbol",
            "bucket",
            "close",
            n_in.alias("n_in"),
            av.alias("av"),
        )
        .filter(F.col("n_in") == period)
        .select(
            "symbol",
            "bucket",
            r6(F.col("av")).alias("atr"),
            r6(F.col("av") / F.col("close")).alias("atr_norm"),
        )
    )


ATR_ORACLE_BODY = f"""
,atr_d AS (
  -- DuckDB's greatest() promotes DECIMAL args to DOUBLE; the re-cast
  -- recovers the exact 1e-6 grid value (6-dp values round-trip through
  -- double losslessly), keeping the window sum exact like Spark's
  -- decimal greatest
  SELECT symbol, bucket, close,
         CAST(greatest(
                CAST(high AS DECIMAL(18,6)) - CAST(low AS DECIMAL(18,6)),
                abs(CAST(high AS DECIMAL(18,6)) - pc),
                abs(CAST(low AS DECIMAL(18,6)) - pc))
              AS DECIMAL(19,6)) AS tr
  FROM (SELECT *, lag(CAST(close AS DECIMAL(18,6))) OVER (
            PARTITION BY symbol ORDER BY bucket) AS pc
        FROM bars)
),
atr_w AS (
  SELECT symbol, bucket, close,
         count(tr) OVER w AS n_in,
         CAST(sum(tr) OVER w AS DOUBLE) AS s
  FROM atr_d WHERE tr IS NOT NULL
  WINDOW w AS (PARTITION BY symbol ORDER BY bucket
               ROWS BETWEEN {ATR_PERIOD - 1} PRECEDING AND CURRENT ROW)
)
SELECT symbol, bucket,
       round(s / n_in, 6) AS atr,
       round(s / n_in / close, 6) AS atr_norm
FROM atr_w WHERE n_in = {ATR_PERIOD}"""


def obv(bars: DataFrame) -> DataFrame:
    """On-Balance Volume per bar: the running sum of signed bar volume
    (+volume on an up close, −volume on a down close, unchanged on a
    flat close) — the classical volume-confirmation line (price up on
    rising OBV = confirmed trend; divergence = distribution).

    Exactness: volumes live on an exact decimal grid and the close
    comparison is a lag of identical doubles, so the cumulative sum is
    an exact DECIMAL(38,6) prefix sum — the CUSUM-family discipline.

    Plan shape: ONE partitionBy(symbol) sort carries the lag and the
    cumulative sum.

    cf. reference: extends the surface (no reference counterpart)."""
    wl = Window.partitionBy("symbol").orderBy("bucket")
    wc = wl.rowsBetween(Window.unboundedPreceding, 0)
    pc = F.lag("close").over(wl)
    signed = (
        F.when(pc.isNull() | (F.col("close") == pc), F.lit(0).cast("decimal(18,6)"))
        .when(F.col("close") > pc, F.col("volume").cast("decimal(18,6)"))
        .otherwise(-F.col("volume").cast("decimal(18,6)"))
    )
    return bars.select(
        "symbol",
        "bucket",
        r6(F.col("volume")).alias("volume"),
        F.sum(signed).over(wc).cast("decimal(38,6)").cast("double").alias("obv"),
    ).select("symbol", "bucket", "volume", r6(F.col("obv")).alias("obv"))


OBV_ORACLE_BODY = """
,obv_d AS (
  SELECT symbol, bucket, volume,
         CASE WHEN pc IS NULL OR close = pc THEN CAST(0 AS DECIMAL(18,6))
              WHEN close > pc THEN CAST(volume AS DECIMAL(18,6))
              ELSE -CAST(volume AS DECIMAL(18,6)) END AS signed_v
  FROM (SELECT *, lag(close) OVER (
            PARTITION BY symbol ORDER BY bucket) AS pc
        FROM bars)
)
SELECT symbol, bucket, round(volume, 6) AS volume,
       round(CAST(CAST(sum(signed_v) OVER (
           PARTITION BY symbol ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DECIMAL(38,6)) AS DOUBLE), 6) AS obv
FROM obv_d"""


MACD_FAST = 12
MACD_SLOW = 26
MACD_SIGNAL = 9
MACD_WINDOW = 64        # truncation for the fast/slow EMAs
MACD_SIGNAL_WINDOW = 32  # truncation for the signal EMA over macd


def _trunc_ewma(col: str, span: int, window: int, order: str = "bucket"):
    """Truncated NORMALIZED EWMA over the trailing ``window`` rows — the
    grid_ewma idiom: collect_list over the frame (deterministic element
    order), reverse so element 0 is the current row, one JVM fold.
    alpha = 2/(span+1), the pandas/TA convention."""
    alpha = 2.0 / (span + 1)
    w = (
        Window.partitionBy("symbol")
        .orderBy(order)
        .rowsBetween(-(window - 1), 0)
    )
    arr = F.reverse(F.collect_list(col).over(w))
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
    return num / den, F.size(arr)


def macd(bars: DataFrame) -> DataFrame:
    """MACD(12, 26, 9) per bar over closes — the momentum crossover
    block completing the TA family: macd = EMA12 − EMA26, signal = EMA9
    of the macd line, histogram = macd − signal, plus a crossover flag
    (sign of the histogram vs the previous bar's).

    EMAs are the TRUNCATED normalized form (the grid_ewma idiom:
    deterministic collect_list fold, identical in both engines — the
    cross-engine contract is "same truncated definition", not an
    approximation claim; tail mass at the 64/32-row truncations is <1%
    of the weight).  The signal EMA folds over the macd COLUMN, which
    both engines compute identically, so the second-level fold is
    deterministic too.

    Plan shape: every window rides ONE partitionBy(symbol) sort.

    cf. reference: extends the surface (no reference counterpart)."""
    e12, _ = _trunc_ewma("close", MACD_FAST, MACD_WINDOW)
    e26, n_in = _trunc_ewma("close", MACD_SLOW, MACD_WINDOW)
    m = bars.select(
        "symbol",
        "bucket",
        "close",
        (e12 - e26).alias("macd_raw"),
        n_in.cast("long").alias("n_in_window"),
    )
    sig, _ = _trunc_ewma("macd_raw", MACD_SIGNAL, MACD_SIGNAL_WINDOW)
    m2 = m.select(
        "symbol",
        "bucket",
        "close",
        "macd_raw",
        sig.alias("sig_raw"),
        "n_in_window",
    )
    # crossover reads the ROUNDED histogram sign: the raw EMA difference
    # of a flat series is +/-1e-13 fold noise whose sign is meaningless
    # (and would flap the flag); the 6-dp value is what a user sees
    hist = r6(F.col("macd_raw") - F.col("sig_raw"))
    wl = Window.partitionBy("symbol").orderBy("bucket")
    prev_hist = F.lag(hist).over(wl)
    cross = F.when(
        prev_hist.isNotNull() & ((hist > 0) != (prev_hist > 0)), True
    ).otherwise(F.when(prev_hist.isNotNull(), False))
    return m2.select(
        "symbol",
        "bucket",
        r6(F.col("macd_raw")).alias("macd"),
        r6(F.col("sig_raw")).alias("signal"),
        hist.alias("histogram"),
        cross.alias("crossover"),
        "n_in_window",
    )


MACD_ORACLE_BODY = f"""
,mc_a AS (
  SELECT symbol, bucket, close,
         list(close) OVER (PARTITION BY symbol ORDER BY bucket
             ROWS BETWEEN {MACD_WINDOW - 1} PRECEDING AND CURRENT ROW) AS arr
  FROM bars
),
mc_m AS (
  SELECT symbol, bucket, close,
         CAST(len(arr) AS BIGINT) AS n_in_window,
         list_sum(list_transform(list_reverse(arr),
             (x, i) -> x * pow({1.0 - 2.0 / (MACD_FAST + 1)!r}, i - 1)))
           / list_sum(list_transform(list_reverse(arr),
             (x, i) -> pow({1.0 - 2.0 / (MACD_FAST + 1)!r}, i - 1)))
         - list_sum(list_transform(list_reverse(arr),
             (x, i) -> x * pow({1.0 - 2.0 / (MACD_SLOW + 1)!r}, i - 1)))
           / list_sum(list_transform(list_reverse(arr),
             (x, i) -> pow({1.0 - 2.0 / (MACD_SLOW + 1)!r}, i - 1)))
         AS macd_raw
  FROM mc_a
),
mc_s AS (
  SELECT symbol, bucket, macd_raw, n_in_window,
         list(macd_raw) OVER (PARTITION BY symbol ORDER BY bucket
             ROWS BETWEEN {MACD_SIGNAL_WINDOW - 1} PRECEDING
             AND CURRENT ROW) AS sarr
  FROM mc_m
),
mc_f AS (
  SELECT symbol, bucket, macd_raw, n_in_window,
         list_sum(list_transform(list_reverse(sarr),
             (x, i) -> x * pow({1.0 - 2.0 / (MACD_SIGNAL + 1)!r}, i - 1)))
           / list_sum(list_transform(list_reverse(sarr),
             (x, i) -> pow({1.0 - 2.0 / (MACD_SIGNAL + 1)!r}, i - 1)))
         AS sig_raw
  FROM mc_s
)
SELECT symbol, bucket,
       round(macd_raw, 6) AS macd,
       round(sig_raw, 6) AS signal,
       h AS histogram,
       CASE WHEN ph IS NULL THEN NULL
            ELSE (h > 0) != (ph > 0) END AS crossover,
       n_in_window
FROM (SELECT *, lag(h) OVER (
          PARTITION BY symbol ORDER BY bucket) AS ph
      FROM (SELECT *, round(macd_raw - sig_raw, 6) AS h FROM mc_f))"""
