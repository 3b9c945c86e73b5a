"""Skew mitigation — explicit salting for hot aggregation keys
(SCALING.md: "skewed keys → salting or AQE skew-join").

AQE's skew handling covers JOINS (it splits oversized shuffle partitions),
but a skewed AGGREGATION key still funnels every row of the hot key through
one reducer for the final merge.  Classic fix: salt the key into ``salt``
sub-keys, aggregate the sub-keys (parallelism = keys × salt), then merge
the sub-aggregates — correct for any algebraic aggregate (sum / count /
min / max), and the second shuffle carries only keys × salt rows.

The salt must be DETERMINISTIC for the oracle to replay it (and for
retried tasks to land rows in the same sub-key): a hash of a stable column
mod salt, never ``rand()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import r6

SALT_BUCKETS = 8


def salted_counts(
    valid_trades: DataFrame, salt: int = SALT_BUCKETS
) -> DataFrame:
    """Per-symbol row counts and volume via two-phase salted aggregation —
    semantically identical to the naive ``groupBy(symbol)`` (the oracle IS
    the naive form) but with the hot-key reduce fanned out over ``salt``
    sub-keys first.  Volume merges exactly because the partial sums are
    DECIMAL (order-insensitive)."""
    sub = F.pmod(F.xxhash64(F.col("trade_id")), F.lit(salt))
    partial = valid_trades.groupBy("symbol", sub.alias("__salt")).agg(
        F.count("*").alias("n_part"),
        F.sum(F.col("qty").cast("decimal(20,8)")).alias("vol_part"),
    )
    return (
        partial.groupBy("symbol")
        .agg(
            F.sum("n_part").cast("long").alias("n"),
            F.sum("vol_part").cast("double").alias("vol_raw"),
        )
        .select("symbol", "n", r6(F.col("vol_raw")).alias("volume"))
    )


# the oracle is the UNSALTED form — proving the salted plan is a pure
# physical rewrite with identical results (the salt column never escapes)
SALTED_COUNTS_ORACLE_BODY = """
SELECT symbol,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(qty AS DECIMAL(20,8))) AS DOUBLE), 6) AS volume
FROM valid_trades
GROUP BY symbol"""
