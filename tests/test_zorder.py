"""Z-order layout: every output file must cover a small tile of the
multi-column space (the parquet min/max data-skipping precondition), where
a single-column sort leaves the other column's span at ~full width."""

from __future__ import annotations

from pyspark.sql import functions as F


def _spans(report_rows, col, global_lo, global_hi):
    width = global_hi - global_lo
    return [
        (getattr(r, f"max_{col}") - getattr(r, f"min_{col}")) / width
        for r in report_rows
    ]


def test_zorder_layout_bounds_both_column_spans(spark, tmp_path):
    from bitcoin_datapipeline_spark.sources.zorder import (
        file_span_report,
        zorder_write,
    )
    from bitcoin_datapipeline_spark.tables import table

    orders = table(spark, "/root/testdata/sf0.01", "orders").select(
        "o_orderkey",
        "o_custkey",
        F.unix_date(F.col("o_orderdate").cast("date")).alias("o_epoch"),
    )
    lo_c, hi_c, lo_e, hi_e = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_epoch"), F.max("o_epoch"),
    ).first()

    zpath = str(tmp_path / "z")
    zorder_write(orders, ["o_custkey", "o_epoch"], zpath, files=16)
    zrep = file_span_report(spark, zpath, ["o_custkey", "o_epoch"]).collect()
    assert len(zrep) >= 8  # range partitioner actually spread the files

    # naive contrast: one global sort on o_epoch — date spans are narrow
    # but every file sees (nearly) the full custkey range
    npath = str(tmp_path / "naive")
    (orders.repartitionByRange(16, "o_epoch")
     .sortWithinPartitions("o_epoch").write.parquet(npath))
    nrep = file_span_report(spark, npath, ["o_custkey", "o_epoch"]).collect()

    z_cust = _spans(zrep, "o_custkey", lo_c, hi_c)
    z_date = _spans(zrep, "o_epoch", lo_e, hi_e)
    n_cust = _spans(nrep, "o_custkey", lo_c, hi_c)

    # z-order: BOTH dimensions bounded on average (16 files over a 16x16
    # grid -> ~4x4 tiles; a range cut crossing a high Morton bit can widen
    # individual files, so the skipping guarantee — expected fraction of
    # files a point filter reads — is the MEAN span, not the max)
    assert sum(z_cust) / len(z_cust) <= 0.5, z_cust
    assert sum(z_date) / len(z_date) <= 0.5, z_date
    # naive: the unsorted dimension is useless for skipping in EVERY file
    assert min(n_cust) >= 0.9, n_cust

    # layout preserves the data exactly
    assert (
        spark.read.parquet(zpath).count() == orders.count()
    )
    assert (
        spark.read.parquet(zpath).agg(F.sum("o_orderkey")).first()[0]
        == orders.agg(F.sum("o_orderkey")).first()[0]
    )


def test_zorder_code_is_bijective_on_the_grid(spark):
    """The Morton interleave must map the 16x16 bin grid to 256 DISTINCT
    codes covering exactly 0..255 (bijectivity = no two tiles share a
    z-range; the data-skipping math relies on it)."""
    from bitcoin_datapipeline_spark.sources.zorder import zorder_code

    from pyspark.sql import functions as F

    grid = spark.range(256).select(
        (F.col("id") / 16).cast("long").alias("a"),
        (F.col("id") % 16).cast("long").alias("b"),
    )
    codes = [
        r.z
        for r in grid.select(
            zorder_code([F.col("a"), F.col("b")]).alias("z")
        ).collect()
    ]
    assert sorted(codes) == list(range(256))
