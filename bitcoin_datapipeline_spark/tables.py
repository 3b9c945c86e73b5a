"""Testdata table access.

The driver materializes a deterministic TPC-H-ish star schema plus an
``events`` stream table, ``documents`` and ``embeddings`` under
``/root/testdata/sf{0.001,0.01,0.1}/`` (TESTDATA.md).  ``events`` stands in
for the reference's trade stream (FIXTURES.md §1).

All readers go through :func:`table` so the ``nanosAsLong`` conf is applied
before the first parquet footer is parsed (events.ts is TIMESTAMP(NANOS)).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (column-pruned, pushdown-friendly parquet scan)."""
    configure(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
