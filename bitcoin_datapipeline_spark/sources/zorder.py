"""Z-order clustered parquet layout — multi-column data skipping.

The partitioned silver writer (`jsonl.py`) prunes on the partition columns
and the bucketed writer (`bucketed.py`) co-locates one join key; neither
helps a scan filtered on a SECOND high-cardinality column.  Z-ordering
does: interleave the bits of the (binned) cluster columns into one Morton
code, range-partition the data on that code, and sort within each file —
every output file then covers a small TILE of the multi-column space, so
parquet row-group min/max statistics skip it for selective filters on ANY
clustered column (the Delta/Iceberg `OPTIMIZE ZORDER BY` layout, built
from plain DataFrame ops: two tiny min/max aggregates + one range
exchange).

At 100 TB this is the difference between "filter on o_custkey reads every
file" and "reads ~1/files of them": a date-sorted layout gives each file
the FULL custkey span (min/max useless), while a z-ordered layout bounds
both spans per file.  `file_span_report` measures exactly that invariant
and the layout test pins it.

cf. reference: the reference's S3 layout (`s3_uploader`, Hive-style
prefixes) prunes only on its directory keys; this extends the idea to
multi-column clustering the reference has no analog for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 4  # 16 bins per dimension → 256 z-codes


def _bin_col(c: Column, lo: Column, hi: Column, bins: int) -> Column:
    """Equi-width bin index 0..bins-1 (the Morton-code coordinate).

    width_bucket returns 1..bins+1 (the +1 for v == hi); clamp and shift
    to 0-based.  Equi-width (not equi-depth) keeps the oracle-free layout
    deterministic and needs only min/max — skewed columns trade tile
    balance for zero extra passes, which is the standard engineering
    choice (Delta's OPTIMIZE uses range-based variants for the same
    reason)."""
    return (
        F.least(F.width_bucket(c.cast("double"), lo, hi, bins), F.lit(bins))
        - 1
    ).cast("long")


def zorder_code(binned: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Interleave ``bits`` bits of each binned coordinate, first column in
    the high lanes — pure JVM bit arithmetic, no UDF."""
    n = len(binned)
    z = F.lit(0).cast("long")
    for i in range(bits):  # bit i of every coordinate
        for j, b in enumerate(binned):
            lane = i * n + (n - 1 - j)
            z = z + (F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), lane))
    return z


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    files: int = 16,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as parquet z-ordered on numeric ``cols``.

    One tiny global min/max aggregate (2×len(cols) scalars, broadcast as
    a 1-row frame — no driver collect in the layout path), then ONE range
    exchange on the interleaved code + an in-partition sort.  The z column
    is dropped before the write; the clustering lives in the file layout
    and the parquet row-group stats, not the schema."""
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
        ]
    bounds = df.agg(*aggs)
    # constant column guard: width_bucket needs lo < hi; a degenerate
    # dimension contributes bin 0 everywhere (harmless — the other
    # dimensions still cluster)
    bounds = bounds.select(
        *[
            col
            for c in cols
            for col in (
                F.col(f"_lo_{c}"),
                F.greatest(
                    F.col(f"_hi_{c}"), F.col(f"_lo_{c}") + F.lit(1e-9)
                ).alias(f"_hi_{c}"),
            )
        ]
    )
    with_z = df.join(F.broadcast(bounds))
    binned = [
        _bin_col(
            F.col(c), F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), 2**bits
        )
        for c in cols
    ]
    (
        with_z.withColumn("_z", zorder_code(binned, bits))
        .drop(*[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols])
        .repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_span_report(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max span of each cluster column — the data-skipping
    precondition made measurable: a scan filtered on col c skips every
    file whose [min, max] span misses the predicate, so SMALL per-file
    spans on every clustered column == multi-column skipping works."""
    df = spark.read.parquet(path).withColumn("_file", F.input_file_name())
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    return df.groupBy("_file").agg(*aggs)
