"""Bronze JSONL IO (S6-S8) — the reference's S3 bronze layer re-expressed.

Reference: `services/rest_ingestor/src/writers/s3_writer.py:216-260` writes
gzipped JSONL under Hive-ish keys `prefix/SYMBOL/type/yyyy=/mm=/dd=/hh=/f`;
`services/data_connector/src/s3_reader.py:154-197` reads them back line by
line, dropping malformed lines (:186-187).

Spark mapping:
- the time-partitioned key layout IS native partitioned writes
  (`partitionBy("symbol","yyyy","mm","dd","hh")`) → partition PRUNING on
  read replaces the reference's hand-rolled prefix filtering
  (s3_reader.py:84-116);
- gzip falls out of `spark.sql.json.compression`/codec option;
- DROPMALFORMED replicates the silent bad-line skip.

The documented "target" bronze format is Parquet (S3_SCHEMA.md:69-90) —
same API with `.parquet`; JSONL kept for wire-format parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.ops import TRADE_SCHEMA

PARTITION_COLS = ("symbol", "yyyy", "mm", "dd", "hh")


def with_time_partitions(trades: DataFrame) -> DataFrame:
    """Derive the bronze partition columns from event time (pure epoch-ms
    arithmetic — matches _build_s3_key's zero-padded parts)."""
    day = F.expr("event_ts div 86400000")
    return (
        trades.withColumn("yyyy", F.year(F.timestamp_millis(F.col("event_ts"))).cast("int"))
        .withColumn("mm", F.month(F.timestamp_millis(F.col("event_ts"))).cast("int"))
        .withColumn("dd", F.dayofmonth(F.timestamp_millis(F.col("event_ts"))).cast("int"))
        .withColumn("hh", ((F.col("event_ts") - day * 86400000) / 3600000).cast("int"))
    )


def write_bronze_jsonl(trades: DataFrame, out_dir: str, compress: bool = True) -> None:
    """S6: partitioned JSONL(.gz) bronze write."""
    w = with_time_partitions(trades).write.mode("overwrite").partitionBy(*PARTITION_COLS)
    if compress:
        w = w.option("compression", "gzip")
    w.json(out_dir)


def read_bronze_jsonl(spark: SparkSession, in_dir: str) -> DataFrame:
    """S8: schema-enforced JSONL read; malformed lines dropped (mode
    DROPMALFORMED ≙ s3_reader.py:186-187)."""
    schema = TRADE_SCHEMA
    df = (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .json(in_dir)
    )
    return df.select([f.name for f in TRADE_SCHEMA.fields])


def write_bronze(trades: DataFrame, out_dir: str, fmt: str = "parquet") -> None:
    """Format-generic partitioned bronze write: 'parquet' (the documented
    lake target, S3_SCHEMA.md:74-90), 'json' (the reference's actual wire
    format), 'csv', or 'orc'.  Same partition layout for all — format choice
    changes codecs and stats, never the pruning contract."""
    w = with_time_partitions(trades).write.mode("overwrite").partitionBy(*PARTITION_COLS)
    if fmt == "json":
        w.option("compression", "gzip").json(out_dir)
    elif fmt == "csv":
        w.option("header", "true").option("compression", "gzip").csv(out_dir)
    elif fmt == "orc":
        w.orc(out_dir)
    elif fmt == "parquet":
        w.parquet(out_dir)
    else:
        raise ValueError(f"unsupported bronze format: {fmt!r}")


def read_bronze(spark: SparkSession, in_dir: str, fmt: str = "parquet") -> DataFrame:
    """Format-generic bronze read with the canonical trade schema enforced
    (no inference — schema drift fails loudly, not silently).

    CSV caveat (observed): DROPMALFORMED only drops a row when at least one
    data column is actually parsed — a bare ``count()`` prunes every column,
    parses nothing, and therefore COUNTS malformed rows.  Any query that
    touches a field sees the dropped-row view; audit counts over csv bronze
    should count a parsed column (e.g. ``count(event_ts)``), not ``*``."""
    schema = TRADE_SCHEMA
    if fmt == "json":
        df = spark.read.schema(schema).option("mode", "DROPMALFORMED").json(in_dir)
    elif fmt == "csv":
        df = (
            spark.read.schema(schema)
            .option("header", "true")
            .option("mode", "DROPMALFORMED")
            .csv(in_dir)
        )
    elif fmt == "orc":
        df = spark.read.schema(schema).orc(in_dir)
    elif fmt == "parquet":
        df = spark.read.schema(schema).parquet(in_dir)
    else:
        raise ValueError(f"unsupported bronze format: {fmt!r}")
    return df.select([f.name for f in TRADE_SCHEMA.fields])


def write_silver_parquet(
    df: DataFrame, out_dir: str, partition_cols: list[str] | None = None
) -> None:
    """Silver-layer parquet writer with Hive partitioning — the layout that
    makes symbol/date predicates PARTITION-PRUNING (directories skipped at
    planning, before any IO) instead of row filters.  Default partitioning
    is the bronze convention (symbol + date parts) when the columns exist;
    pass explicit ``partition_cols`` otherwise."""
    cols = partition_cols
    if cols is None:
        cols = [c for c in ("symbol", "yyyy", "mm", "dd") if c in df.columns]
    w = df.write.mode("overwrite")
    if cols:
        w = w.partitionBy(*cols)
    w.parquet(out_dir)
