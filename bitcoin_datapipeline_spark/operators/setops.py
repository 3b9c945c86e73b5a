"""Set operations (SURVEY §2.8): union of sources with conflict resolution.

The reference's silver layer records `source_mix: sbe|rest|mixed`
(docs/schemas/S3_SCHEMA.md:352) — the SBE hot stream and the REST backfill
cover overlapping time ranges (scheduler re-fetches a ±5-min overlap,
services/rest_ingestor/src/scheduler.py:74-78) and the union is deduped by
trade id so overlap re-reads are idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_trades


def union_sources(valid_trades: DataFrame) -> DataFrame:
    """unionByName of the sbe and rest streams → first-wins dedup → per-symbol
    source accounting with the silver `source_mix` label."""
    sbe = valid_trades.filter(F.col("source") == "sbe")
    rest = valid_trades.filter(F.col("source") == "rest")
    merged = dedup_trades(sbe.unionByName(rest))
    n_sbe = F.sum(F.when(F.col("source") == "sbe", 1).otherwise(0))
    n_rest = F.sum(F.when(F.col("source") == "rest", 1).otherwise(0))
    return merged.groupBy("symbol").agg(
        n_sbe.cast("long").alias("n_sbe"),
        n_rest.cast("long").alias("n_rest"),
        F.count("*").cast("long").alias("n_total"),
        F.when((n_sbe > 0) & (n_rest > 0), "mixed")
        .when(n_sbe > 0, "sbe")
        .otherwise("rest")
        .alias("source_mix"),
    )


UNION_SOURCES_ORACLE_BODY = """
SELECT symbol,
       CAST(sum(CASE WHEN source = 'sbe' THEN 1 ELSE 0 END) AS BIGINT)  AS n_sbe,
       CAST(sum(CASE WHEN source = 'rest' THEN 1 ELSE 0 END) AS BIGINT) AS n_rest,
       CAST(count(*) AS BIGINT) AS n_total,
       CASE WHEN sum(CASE WHEN source = 'sbe' THEN 1 ELSE 0 END) > 0
                 AND sum(CASE WHEN source = 'rest' THEN 1 ELSE 0 END) > 0 THEN 'mixed'
            WHEN sum(CASE WHEN source = 'sbe' THEN 1 ELSE 0 END) > 0 THEN 'sbe'
            ELSE 'rest' END AS source_mix
FROM dedup_trades
GROUP BY symbol"""
