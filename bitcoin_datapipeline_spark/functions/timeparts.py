"""Time-part extraction + cyclic encodings + session flags (P7/P8).

Reference: transformer.py:283-286 derives `hour_of_day`/`day_of_week` from
epoch-ms; the gold feature spec adds cyclic encodings and trading-session
flags (docs/schemas/S3_SCHEMA.md:583-589 — hour_sin/hour_cos/minute_sin/
minute_cos, is_us/asia/europe_hours).

Everything here is pure integer arithmetic on epoch-ms (no tz-dependent
datetime functions), so the DuckDB oracle is trivially identical:

- hour_of_day   = (ms div 3_600_000) % 24           (UTC)
- day_of_week   = ((ms div 86_400_000) + 4) % 7     (0=Sunday; epoch day 0
                  was a Thursday → +4 shift)
- minute_of_hr  = (ms div 60_000) % 60
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import r6

TWO_PI = 2.0 * math.pi

# Session windows in whole UTC hours (S3_SCHEMA.md:586-589 approximated to
# hour granularity: US 14:30-21:00 → [14,21), Asia 00-08, Europe 07-15:30 →
# [7,16)).
US_HOURS = (14, 21)
ASIA_HOURS = (0, 8)
EUROPE_HOURS = (7, 16)


def derived_time(trades: DataFrame) -> DataFrame:
    hour = (F.expr("event_ts div 3600000") % 24).cast("int")
    minute = (F.expr("event_ts div 60000") % 60).cast("int")
    dow = ((F.expr("event_ts div 86400000") + 4) % 7).cast("int")

    def _sin(c, period):
        return r6(F.sin(F.lit(TWO_PI) * c / F.lit(float(period))))

    def _cos(c, period):
        return r6(F.cos(F.lit(TWO_PI) * c / F.lit(float(period))))

    def _in(c, lohi):
        return (c >= lohi[0]) & (c < lohi[1])

    return trades.select(
        "symbol",
        "trade_id",
        "event_ts",
        hour.alias("hour_of_day"),
        minute.alias("minute_of_hour"),
        dow.alias("day_of_week"),
        _sin(hour, 24).alias("hour_sin"),
        _cos(hour, 24).alias("hour_cos"),
        _sin(minute, 60).alias("minute_sin"),
        _cos(minute, 60).alias("minute_cos"),
        _in(hour, US_HOURS).alias("is_us_hours"),
        _in(hour, ASIA_HOURS).alias("is_asia_hours"),
        _in(hour, EUROPE_HOURS).alias("is_europe_hours"),
    )


# Mirror for the DuckDB oracle (same bodies, SQL dialect).
ORACLE_BODY = f"""
SELECT symbol, trade_id, event_ts,
       CAST((event_ts // 3600000) % 24 AS INTEGER)       AS hour_of_day,
       CAST((event_ts // 60000) % 60 AS INTEGER)         AS minute_of_hour,
       CAST(((event_ts // 86400000) + 4) % 7 AS INTEGER) AS day_of_week,
       round(sin(2*pi() * ((event_ts // 3600000) % 24) / 24.0), 6) AS hour_sin,
       round(cos(2*pi() * ((event_ts // 3600000) % 24) / 24.0), 6) AS hour_cos,
       round(sin(2*pi() * ((event_ts // 60000) % 60) / 60.0), 6)   AS minute_sin,
       round(cos(2*pi() * ((event_ts // 60000) % 60) / 60.0), 6)   AS minute_cos,
       (event_ts // 3600000) % 24 >= {US_HOURS[0]}
           AND (event_ts // 3600000) % 24 < {US_HOURS[1]}     AS is_us_hours,
       (event_ts // 3600000) % 24 >= {ASIA_HOURS[0]}
           AND (event_ts // 3600000) % 24 < {ASIA_HOURS[1]}   AS is_asia_hours,
       (event_ts // 3600000) % 24 >= {EUROPE_HOURS[0]}
           AND (event_ts // 3600000) % 24 < {EUROPE_HOURS[1]} AS is_europe_hours
FROM valid_trades"""
