"""DuckDB oracle SQL building blocks.

Every operator in this engine ships with an ANSI-SQL twin that DuckDB runs
on the same parquet tables (driver contract in ``__spark_entry__.py``).
These CTE strings are the single source of truth for the normalization
semantics — they MUST stay in lockstep with
``bitcoin_datapipeline_spark/functions/normalize.py``.

DuckDB specifics used deliberately:
- ``epoch_ms(ts)`` on a TIMESTAMP (µs) column == Spark's ``ts div 1000``
  on the same column read as int64 micros (both truncate; all test data is
  post-1970 so floor == trunc).
- integer ``//`` (DuckDB) == ``div`` (Spark) on BIGINT.
- ``arg_min/arg_max`` == Spark ``min_by/max_by``.
- ``quantile_cont`` == Spark ``percentile`` (exact interpolating) ONLY up
  to a last-ulp difference when the two bracketing values are EQUAL:
  Spark (Percentile.scala `getPercentile`) shortcuts to the exact value
  when lowerKey == higherKey, DuckDB always lerps (x*(1-d) + x*d can land
  one ulp off x).  Harmless for r6-ROUNDED outputs; fatal when the
  unrounded quantile feeds a MEMBERSHIP COMPARE (ret <= VaR, volume <
  p_lo, n_tokens < p_lo) — a tie at the quantile flips row counts.
  Found by hypothesis (test_var_es_matches_naive, round 8).  Oracles
  whose quantile feeds a compare use :func:`spark_percentile_sql`,
  which replicates Spark's exact branch structure.
"""

from __future__ import annotations


def spark_percentile_sql(p: float, vs: str = "vs", n: str = "n") -> str:
    """DuckDB expression computing EXACTLY Spark's exact `percentile`
    over a pre-sorted list column ``vs`` (built with
    ``list(x ORDER BY x)``) of length ``n`` — bit-identical, including
    the two no-interpolation shortcuts Spark takes (integral position;
    equal bracketing values) and the exact coefficient/product/sum
    shapes of its lerp `(higher-pos)*lo + (pos-lower)*hi`."""
    # CAST the probability literal: DuckDB parses bare 0.9 as DECIMAL and
    # would compute the position in exact decimal arithmetic, diverging
    # from Spark's double multiply in the last ulp
    pos = f"(CAST({p!r} AS DOUBLE) * ({n} - 1))"
    flo = f"floor({pos})"
    lo_v = f"{vs}[CAST({flo} AS BIGINT) + 1]"
    hi_v = f"{vs}[CAST({flo} AS BIGINT) + 2]"
    return (
        f"CASE WHEN {flo} = ceil({pos}) THEN {lo_v} "
        f"WHEN {lo_v} = {hi_v} THEN {lo_v} "
        f"ELSE ({flo} + 1 - {pos}) * {lo_v} + ({pos} - {flo}) * {hi_v} END"
    )

TS_MIN_MS = 1577836800000
TS_MAX_MS = 1893456000000

# events → canonical trade stream; mirror of normalize.trades().
TRADES_CTE = """
trades AS (
  SELECT upper(event_type)                                        AS symbol,
         epoch_ms(ts)                                             AS event_ts,
         epoch_ms(ts) + (event_id % 250)                          AS ingest_ts,
         event_id - (CASE WHEN event_id % 100 = 7 THEN 1 ELSE 0 END) AS trade_id,
         value                                                    AS price,
         CAST(json_extract(props, '$.k') AS DOUBLE)               AS qty,
         (event_id % 2) = 0                                       AS is_buyer_maker,
         CASE WHEN event_id % 10 < 7 THEN 'sbe' ELSE 'rest' END   AS source
  FROM events
)"""

# + P5 validation filter; mirror of normalize.valid_trades().
VALID_TRADES_CTE = (
    TRADES_CTE
    + f""",
valid_trades AS (
  SELECT * FROM trades
  WHERE price > 0 AND qty > 0
    AND event_ts >= {TS_MIN_MS} AND event_ts < {TS_MAX_MS}
)"""
)

# + D1 dedup: earliest record wins per (symbol, trade_id); mirror of
# operators/dedup.dedup_trades().
DEDUP_TRADES_CTE = (
    VALID_TRADES_CTE
    + """,
dedup_trades AS (
  SELECT * FROM valid_trades
  QUALIFY row_number() OVER (
      PARTITION BY symbol, trade_id ORDER BY event_ts, ingest_ts) = 1
)"""
)

# events → canonical BBA stream; mirror of normalize.bba().
BBA_CTE = """
bba AS (
  SELECT upper(event_type)                                   AS symbol,
         epoch_ms(ts)                                        AS event_ts,
         epoch_ms(ts) + (event_id % 250)                     AS ingest_ts,
         value                                               AS bid_px,
         CAST(json_extract(props, '$.k') AS DOUBLE) + 1.0    AS bid_sz,
         value * (1.0 + (event_id % 50 + 1) / 10000.0)       AS ask_px,
         (CAST(json_extract(props, '$.k') AS DOUBLE) + 1.0)
             * (1.0 + (event_id % 7) / 10.0)                 AS ask_sz,
         CASE WHEN event_id % 10 < 7 THEN 'sbe' ELSE 'rest' END AS source
  FROM events
  WHERE value > 0
)"""

# events → canonical depth stream; mirror of normalize.depth().
DEPTH_CTE = """
depth AS (
  SELECT upper(event_type)  AS symbol,
         epoch_ms(ts)       AS event_ts,
         event_id           AS last_update_id,
         [{'price': value * (1.0 - i / 1000.0),
           'qty': (CAST(json_extract(props, '$.k') AS DOUBLE) + 1.0) / i}
          for i in generate_series(1, 10)]                  AS bids,
         [{'price': value * (1.0 + i / 1000.0),
           'qty': (CAST(json_extract(props, '$.k') AS DOUBLE) + 1.0) / i}
          for i in generate_series(1, 10)]                  AS asks
  FROM events
  WHERE value > 0
)"""

# dedup_trades → 1-minute OHLCV bars; mirror of operators/aggregates.bars_1m().
BARS_1M_CTE = (
    DEDUP_TRADES_CTE
    + """,
bars_raw AS (
  SELECT symbol,
         event_ts // 60000                                   AS bucket,
         arg_min(price, event_ts)                            AS open_raw,
         max(price)                                          AS high_raw,
         min(price)                                          AS low_raw,
         arg_max(price, event_ts)                            AS close_raw,
         sum(qty)                                            AS volume_raw,
         CAST(sum(CAST(price * qty AS DECIMAL(20,4))) AS DOUBLE) AS notional_raw,
         CAST(count(*) AS BIGINT)                            AS trade_count,
         sum(CASE WHEN is_buyer_maker THEN 0.0 ELSE qty END) AS buy_volume_raw,
         sum(CASE WHEN is_buyer_maker THEN qty ELSE 0.0 END) AS sell_volume_raw,
         CAST(sum(CASE WHEN is_buyer_maker THEN 0 ELSE 1 END) AS BIGINT) AS buy_trade_count,
         CAST(sum(CASE WHEN is_buyer_maker THEN 1 ELSE 0 END) AS BIGINT) AS sell_trade_count
  FROM dedup_trades
  GROUP BY symbol, event_ts // 60000
),
bars AS (
  SELECT symbol, bucket,
         round(open_raw, 6)  AS open,
         round(high_raw, 6)  AS high,
         round(low_raw, 6)   AS low,
         round(close_raw, 6) AS close,
         round(volume_raw, 6)   AS volume,
         round(notional_raw, 6) AS notional,
         trade_count, buy_trade_count, sell_trade_count,
         round(buy_volume_raw, 6)  AS buy_volume,
         round(sell_volume_raw, 6) AS sell_volume,
         round(notional_raw / volume_raw, 6) AS vwap,
         round((buy_volume_raw - sell_volume_raw)
               / greatest(volume_raw, 1.0), 6) AS volume_imbalance,
         round(high_raw - low_raw, 6)   AS price_range,
         round(close_raw - open_raw, 6) AS price_change,
         round((close_raw - open_raw) / open_raw * 100.0, 6) AS price_change_pct
  FROM bars_raw
)"""
)


def locf_grid_cte(step_s: int = 1, slice_s: int = 86_400, gap_s: int = 60) -> str:
    """dedup_trades → fixed-``step_s``-second LOCF grid; mirror of
    operators/grid.locf_resample().  Ends in a CTE named ``locf`` with
    columns (symbol, tick, feature_ts, price, data_age_ms, gap_indicator,
    source, volume, buy_volume, sell_volume, notional, trades, has_obs)."""
    step_ms = step_s * 1000
    n_ticks = slice_s // step_s
    return (
        DEDUP_TRADES_CTE
        + f""",
per_tick AS (
  SELECT symbol, event_ts // {step_ms} AS tick,
         arg_max(price, event_ts)  AS obs_price,
         max(event_ts)             AS obs_last_ts,
         arg_max(source, event_ts) AS obs_source,
         sum(qty)                  AS obs_volume,
         sum(CASE WHEN is_buyer_maker THEN 0.0 ELSE qty END) AS obs_buy_volume,
         sum(CASE WHEN is_buyer_maker THEN qty ELSE 0.0 END) AS obs_sell_volume,
         CAST(sum(CAST(price * qty AS DECIMAL(20,4))) AS DOUBLE) AS obs_notional,
         CAST(count(*) AS BIGINT)  AS obs_trades
  FROM dedup_trades GROUP BY 1, 2
),
spans AS (
  SELECT symbol, min(tick) AS lo,
         (SELECT min(tick) FROM per_tick) + {n_ticks - 1} AS hi
  FROM per_tick GROUP BY symbol
),
grid_pts AS (
  SELECT symbol, unnest(generate_series(lo, hi, 1)) AS tick
  FROM spans WHERE lo <= hi
),
locf AS (
  SELECT g.symbol, g.tick,
         CAST(g.tick * {step_s} AS BIGINT) AS feature_ts,
         last_value(p.obs_price IGNORE NULLS) OVER cum AS price,
         CAST((g.tick + 1) * {step_ms} - 1
              - last_value(p.obs_last_ts IGNORE NULLS) OVER cum AS BIGINT)
             AS data_age_ms,
         (g.tick + 1) * {step_ms} - 1
              - last_value(p.obs_last_ts IGNORE NULLS) OVER cum > {gap_s * 1000}
             AS gap_indicator,
         last_value(p.obs_source IGNORE NULLS) OVER cum AS source,
         coalesce(p.obs_volume, 0.0)      AS volume,
         coalesce(p.obs_buy_volume, 0.0)  AS buy_volume,
         coalesce(p.obs_sell_volume, 0.0) AS sell_volume,
         coalesce(p.obs_notional, 0.0)    AS notional,
         coalesce(p.obs_trades, 0)        AS trades,
         p.obs_price IS NOT NULL          AS has_obs
  FROM grid_pts g LEFT JOIN per_tick p ON g.symbol = p.symbol AND g.tick = p.tick
  WINDOW cum AS (PARTITION BY g.symbol ORDER BY g.tick
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)"""
    )


def with_ctes(*ctes: str, body: str) -> str:
    """Compose `WITH a AS (...), b AS (...) <body>`."""
    return "WITH " + ",".join(ctes) + "\n" + body


def spark_round_compat(sql: str) -> str:
    """Rewrite every ``round(expr, 6)`` in a DuckDB oracle to match Spark's
    rounding semantics.

    Spark's ``round(double, 6)`` goes through ``BigDecimal.valueOf`` — it
    rounds the double's SHORTEST DECIMAL STRING half-up.  DuckDB's ``round``
    operates on the exact binary value, so doubles that print as
    ``x.xxxxxx5`` round differently (e.g. 1.0122725 → Spark 1.012273,
    DuckDB 1.012272).  DuckDB's double→VARCHAR cast is also shortest-repr,
    so ``round(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18)), 6)`` reproduces
    Spark exactly (ties away from zero on the decimal string, NULL-safe).

    Applied at ``oracle_sql()`` export time so authored SQL stays readable.
    """
    out: list[str] = []
    i = 0
    token = "round("
    while True:
        j = sql.find(token, i)
        # skip identifiers that merely end in "round(" (none today, be safe)
        while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            j = sql.find(token, j + 1)
        if j == -1:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        k = j + len(token)
        depth = 0
        while True:
            c = sql[k]
            if c == "(":
                depth += 1
            elif c == ")":
                if depth == 0:
                    break
                depth -= 1
            k += 1
        args = sql[j + len(token) : k]
        comma = args.rfind(",")
        expr, scale = args[:comma], args[comma + 1 :].strip()
        assert scale == "6", f"unexpected round scale in oracle SQL: {scale}"
        # recurse for nested round() inside expr
        expr = spark_round_compat(expr)
        out.append(
            f"CAST(round(CAST(CAST(({expr}) AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)"
        )
        i = k + 1
    return "".join(out)


def decimal_double_compat(sql: str) -> str:
    """Rewrite every ``CAST(sum(...) AS DOUBLE)`` in a DuckDB oracle to
    ``CAST(CAST(sum(...) AS VARCHAR) AS DOUBLE)``.

    DuckDB 1.0 converts DECIMAL→DOUBLE by dividing the (up to int128)
    unscaled value in double arithmetic, which is NOT correctly rounded
    once the unscaled value exceeds 2^53 — a DECIMAL(38,8) money sum at
    sf1 magnitude (~2e10 → unscaled ~2e18) lands one ulp off Spark's
    correctly-rounded BigDecimal cast (first seen: q_pricing_summary
    sum_disc_price, 19711023059.593 vs ...593002).  The VARCHAR hop is
    exact both ways: DECIMAL→VARCHAR prints the exact decimal digits and
    VARCHAR→DOUBLE parses correctly rounded; for a DOUBLE-typed sum the
    hop is the shortest-repr round-trip, i.e. a no-op.  Applied at
    ``oracle_sql()`` export time, like spark_round_compat; driver-scale
    (sf0.01) results are unchanged — unscaled sums there sit below 2^53.
    """
    out: list[str] = []
    i = 0
    token = "CAST(sum("
    suffix = " AS DOUBLE"
    while True:
        j = sql.find(token, i)
        if j == -1:
            out.append(sql[i:])
            break
        # find the close paren of this CAST( by depth-walking from its (
        k = j + len("CAST(")
        depth = 1
        while depth:
            c = sql[k]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        body = sql[j + len("CAST("):k - 1]  # "sum(...) AS DOUBLE" or other
        if body.endswith(suffix):
            inner = body[: -len(suffix)]
            out.append(sql[i:j])
            out.append(f"CAST(CAST({inner} AS VARCHAR) AS DOUBLE)")
        else:  # e.g. AS BIGINT / AS DECIMAL casts: leave untouched
            out.append(sql[i:k])
        i = k
    return "".join(out)
