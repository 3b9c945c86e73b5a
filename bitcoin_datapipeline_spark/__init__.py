"""bitcoin_datapipeline_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of the reference pipeline
(sleepylee02/bitcoin_datapipeline), re-expressed Spark-first.

The reference is a set of imperative asyncio micro-services (SBE ingest →
Kinesis → window aggregation → Redis; REST backfill → S3 bronze; bronze →
PostgreSQL ETL).  This package reproduces the *semantics* of every stage —
normalization, validation, dedup, windowed feature aggregation, analytic SQL
— as declarative DataFrame / Spark SQL operators so Catalyst + Tungsten pick
the physical plan (see SURVEY.md §2 for the operator-by-operator mapping).

Layout
------
- ``session``    : tuned SparkSession builder (local testing; cluster-ready confs)
- ``tables``     : testdata table loaders (driver parquet at /root/testdata/sf*)
- ``functions/`` : scalar/projection transforms (P1-P12 in SURVEY §2.2)
- ``operators/`` : dedup, aggregates, windows, joins, set ops, text,
                   similarity, multimodal (SURVEY §2.3-§2.9 + extensions)
- ``plans/``     : bronze→silver→gold pipeline compositions (SURVEY §3)
- ``sources/``   : JSONL bronze IO, checkpoint/high-watermark (SURVEY §2.1)
- ``streaming/`` : Structured-Streaming variants (SURVEY §2.10)
"""

__version__ = "0.1.0"
