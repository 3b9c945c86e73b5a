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

import os

from pyspark.sql import DataFrame, Window
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


def keyspace_profile(df: DataFrame, key: str = "symbol") -> DataFrame:
    """One-row distribution profile of a partitioning keyspace — the
    skew gauge for the per-key sort families (the r9 skew decade rows
    showed single-sort as-of/TWA plans at 4.5-5.1x/decade when one key
    carries 90% of rows vs ~1.1x balanced; this measures exactly that
    condition so a pipeline can switch to the `_sliced` rewrites or
    `salted_counts` BEFORE the straggler, the same engine-measures-its-
    own-risk pattern as text.lsh_bucket_balance):

        top1_share    max key share (the straggler bound: one sort
                      partition gets this fraction of the work)
        hhi           Σ share² — effective keyspace = 1/hhi partitions
        entropy       Shannon entropy (nats) of the key distribution

    Plan shape: one partial-combining groupBy to K key rows, then a
    global window + aggregate over those K rows only (bounded by the
    keyspace size, the text.py:vocab global-window precedent — never
    over raw rows).  Count arithmetic stays on exact-integer-valued
    doubles (counts ≪ 2^53), so both engines see identical shares."""
    per = df.groupBy(key).agg(F.count("*").cast("double").alias("n"))
    # global window over K key rows — bounded by keyspace cardinality
    s = F.sum("n").over(Window.partitionBy())
    shares = per.select("n", (F.col("n") / s).alias("share"))
    return shares.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_key_rows"),
        r6(F.max("share")).alias("top1_share"),
        r6(F.sum(F.col("share") * F.col("share"))).alias("hhi"),
        r6(-F.sum(F.col("share") * F.log(F.col("share")))).alias("entropy"),
    ).filter(
        # empty input: the global agg would emit one all-null row where
        # the oracle's GROUP BY s emits zero — agree on zero rows
        F.col("n_keys") > 0
    )


KEYSPACE_PROFILE_ORACLE_BODY = """
,per AS (
  SELECT symbol, CAST(count(*) AS DOUBLE) AS n
  FROM valid_trades GROUP BY 1
),
tot AS (SELECT sum(n) AS s FROM per)
SELECT CAST(count(*) AS BIGINT)  AS n_keys,
       CAST(sum(n) AS BIGINT)   AS n_rows,
       CAST(max(n) AS BIGINT)   AS max_key_rows,
       round(max(n / s), 6)     AS top1_share,
       round(sum((n / s) * (n / s)), 6) AS hhi,
       round(-sum((n / s) * ln(n / s)), 6) AS entropy
FROM per, tot
GROUP BY s"""


# Adaptive plan selection (round 10, VERDICT r9 item 1): the share of the
# tape the hottest key carries decides between a single-sort per-key plan
# and its time-sliced rewrite.  0.5 sits far from both measured regimes —
# the balanced test tapes top out at ~0.20 (5 equal symbols) and the skew
# tape at 0.90 — and marks the point where ONE sort partition owns more
# than half the work, i.e. where adding executors stops helping the
# single-sort form at all.
HOT_KEY_SHARE_THRESHOLD = 0.5


def hot_key_share(df: DataFrame, key: str = "symbol") -> float:
    """Driver-coordinated skew gauge: the hottest key's row share, as ONE
    bounded action (a partial-combining count-by-key reduced to a single
    max/sum row — the same collect class as IVF quantizer training).  The
    full :func:`keyspace_profile` is the queryable audit; this is the
    two-number subset a plan dispatcher needs.

    At 100 TB the gauge is one map-side-combining scan — same order as
    the guarded query's own scan, and a production pipeline runs it once
    per table per ingest (persisting `q_key_skew_profile`) rather than
    per query; the adaptive callers accept a precomputed ``hot_share``
    for exactly that reason.  Empty input gauges as 0.0 (no hot key — the
    single-sort form, which emits zero rows either way)."""
    global _GAUGE_ACTIONS
    _GAUGE_ACTIONS += 1
    row = (
        df.groupBy(key)
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("mx"), F.sum("n").alias("tot"))
        .first()
    )
    if row is None or not row["tot"]:
        return 0.0
    return float(row["mx"]) / float(row["tot"])


# --- session gauge cache (round 11, VERDICT r10 item 4) ----------------------
#
# The r10 adaptive defaults gauged the tape at every query CONSTRUCTION —
# three headline queries on one tape paid three identical full scans
# (~0.5 s each at sf0.1; three extra 100 TB scans at scale).  The tape is an
# immutable snapshot within a session, so the gauge is a pure function of
# (table snapshot, key): cache it driver-side, keyed by the table's on-disk
# identity (path + file count + bytes + max mtime for local paths; the URI
# string for object stores, whose datasets are immutable-by-convention —
# same contract as Spark's own relation cache).  N adaptive queries on one
# tape now gauge ONCE (`tests/test_skew_adaptive.py` pins the action count).

_GAUGE_ACTIONS = 0  # test hook: counts actual gauge scans submitted
_GAUGE_CACHE: dict[tuple, float] = {}


def _snapshot_token(table_path: str) -> tuple:
    """Cheap identity of a parquet file-or-directory: (path, n_entries,
    total_bytes, max_mtime_ns).  Remote URIs (``://``) fall back to the
    path string — immutable-dataset convention."""
    if "://" in table_path:
        return (table_path,)
    try:
        st = os.stat(table_path)
    except OSError:
        return (table_path, "missing")
    if not os.path.isdir(table_path):
        return (table_path, 1, st.st_size, st.st_mtime_ns)
    n = tot = mt = 0
    for e in os.scandir(table_path):
        s = e.stat()
        n += 1
        tot += s.st_size
        mt = max(mt, s.st_mtime_ns)
    return (table_path, n, tot, mt)


def hot_key_share_cached(
    df: DataFrame, table_path: str, key: str = "symbol"
) -> float:
    """:func:`hot_key_share`, memoized per (table snapshot, key).

    ``df`` must be the table at ``table_path`` or a key-distribution-
    preserving derivation of it (the spread/markout callers gauge the raw
    events tape: its per-symbol event-type mix is uniform, so the raw
    share stands for the trade and quote legs alike — and a mis-gauge is
    only ever a PERFORMANCE choice, both dispatch targets being oracle-
    equal by the skew correctness gate)."""
    tok = (_snapshot_token(table_path), key)
    share = _GAUGE_CACHE.get(tok)
    if share is None:
        share = hot_key_share(df, key)
        _GAUGE_CACHE[tok] = share
    return share


def clear_gauge_cache() -> None:
    """Drop memoized gauges (tests; long-lived sessions re-ingesting a
    mutated local path get invalidation from the mtime token instead)."""
    _GAUGE_CACHE.clear()
