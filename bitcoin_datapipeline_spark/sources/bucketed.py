"""Bucketed-table layout — the co-located-join storage path for repeated
big-big joins (SCALING.md: "bucketing / pre-partitioning for co-located
joins").

The reference's Postgres layer partitions curated tables by time and keys
them for upsert (RDS_SCHEMA.md); at Spark scale the analogous physical
design decision is HASH BUCKETING: write both sides of a hot join
pre-hashed into the same number of buckets on the join key, and every
subsequent join on that key is exchange-free — the scan itself reports the
hash distribution, so SortMergeJoin runs without shuffling either side.
For a fact table joined daily against the same key this converts the
dominant per-query shuffle into a one-time write cost.

Catalog notes (all standard Spark):
- bucketing rides the session catalog (``saveAsTable``) — bucket metadata
  lives in the table definition, not the parquet files;
- both sides must agree on bucket count (or be integer multiples with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- ``sortBy`` the same key so the merge join also skips the per-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a catalog table (bucket metadata attaches automatically)."""
    return spark.table(name)
