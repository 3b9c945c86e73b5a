"""Replica-scaled testdata generator for scale-evidence benchmarking.

The driver materializes sf0.001/0.01/0.1 only; the scale argument in
SCALING.md ("plan shapes survive a decade of growth") needs one measured
decade to become evidence.  This script derives an sf1-scale dataset from
the READ-ONLY sf0.1 tables (never touching /root/testdata) by stacking R
deterministic replicas of the three tables the superlinear-risk families
touch, with per-replica transforms chosen so the *statistical shape* of the
workload scales the way a real 10x corpus would:

- ``events``: replica k keeps every timestamp (same wall-clock window) but
  suffixes ``event_type`` with ``_k`` → 10x distinct symbols.  Grid/LOCF
  work scales by symbol count within the same slice window, which is
  exactly how a real exchange feed grows (more instruments, same hours).
  ``event_id`` shifts by k·1e9 — a multiple of 100/250/10/2, preserving the
  planted duplicate-id rate, ingest-latency skew, maker/source mixes.
- ``documents``: replica k suffixes every whitespace token with ``_k`` →
  shingles/minhashes NEVER collide across replicas, so near-dup pair
  volume grows ~linearly (10x clusters), not quadratically (a verbatim 10x
  copy would make every LSH bucket 10x deeper → 100x pairs — that measures
  data pathology, not plan shape).  doc_id shifts by k·1e7.
- ``embeddings``: replica k shifts vec_id by k·N keeping ids DENSE
  0..10N-1 (the IVF seed-rank contract); vectors get a per-replica
  deterministic SIGN FLIP (norm-preserving, replica-internal cosines
  exactly preserved, cross-replica cosines decorrelated) so pairwise
  families (semdedup, cosine pairs) grow ~linearly like a real corpus —
  verbatim copies would grow threshold-pair volume quadratically.  ANN
  cost stays row-count-bound either way.

Round 9 additions:

- ``--tpch`` also replicates the seven decision-support tables with
  FK-consistent key strides (customer/supplier/part/orders/lineitem get
  shifted keys per replica; region/nation are copied verbatim — real
  catalogs grow facts, not the country list).  With it, the output dir is
  a FULL 10-table sf1 that `tools/check_oracle.py --sf .scale_data/sf1`
  can sweep — the sf1 CORRECTNESS evidence the r8 verdict asked for.
  Values are replicated exactly (only keys shift): any query whose result
  then diverges between Spark and DuckDB was relying on tie-breaking that
  a real 10x catalog would also break — a determinism bug worth finding.
- ``--skew`` writes an EVENTS-ONLY dataset where one symbol carries ~90 %
  of rows (``event_id % 100 < 90`` → event_type 'hot', constant across
  replicas; the residue keeps the original 5 types, suffixed per replica).
  The modulo-100 rule slices every event_id residue class mod 2/10/100
  uniformly, so the planted duplicate-id rate, maker mix, and source mix
  inside the hot symbol match the balanced corpus.  Build the pair
  ``--skew --replicas 1 --out .scale_data/skew0.1`` and
  ``--skew --replicas 10 --out .scale_data/skew1``: the hot symbol grows
  90k→900k rows in ONE per-symbol sort partition — the decade row for the
  window/LOCF families under the worst single-key growth mode.

Usage:  python tools/make_scale_data.py [--out .scale_data/sf1] [--replicas 10]
                                        [--tpch] [--skew]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
EVENT_ID_STRIDE = 1_000_000_000  # multiple of 100/250/10/2 → patterns preserved
DOC_ID_STRIDE = 10_000_000
# TPC-H key strides (well above the sf0.1 max of each key space; FK pairs
# shift by the SAME stride so every join edge stays replica-internal)
CUST_STRIDE = 1_000_000
SUPP_STRIDE = 1_000_000
PART_STRIDE = 1_000_000
ORDER_STRIDE = 100_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".scale_data/sf1")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--src", default=SRC)
    ap.add_argument("--tpch", action="store_true",
                    help="also replicate the 7 decision-support tables")
    ap.add_argument("--skew", action="store_true",
                    help="events-only: ~90%% of rows on one hot symbol")
    ap.add_argument("--events-only", action="store_true",
                    help="balanced replicas of the events table only "
                         "(the spread/markout-family input) — the r10 "
                         "sf10 decade axis needs no other table")
    args = ap.parse_args()

    from bitcoin_datapipeline_spark.session import get_spark
    from bitcoin_datapipeline_spark.tables import table

    spark = get_spark("make-scale-data")
    # Keep TIMESTAMP columns physically INT64 TIMESTAMP(MICROS) like the
    # driver's testdata — the engine's forced-Long events read needs a
    # plain INT64 page, and the DuckDB oracle views need real TIMESTAMPs
    # (epoch_ms(ts)); INT96 output would break both.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)

    # events replicas keep ts as TIMESTAMP (raw parquet read, NOT the
    # engine's forced-Long table() view) so the output schema is
    # column-for-column identical to /root/testdata — required for the
    # sf1 oracle sweep where DuckDB reads the same files.
    ev = spark.read.parquet(os.path.join(args.src, "events.parquet"))

    if args.skew:
        _build_skew_events(spark, ev, out, args.replicas)
        print("events", spark.read.parquet(f"{out}/events.parquet").count())
        return
    ev_reps = [
        ev.select(
            (F.col("event_id") + F.lit(k * EVENT_ID_STRIDE)).alias("event_id"),
            "ts",
            "user_id",
            (
                F.col("event_type")
                if k == 0
                else F.concat(F.col("event_type"), F.lit(f"_{k}"))
            ).alias("event_type"),
            "value",
            "props",
        )
        for k in range(args.replicas)
    ]
    _union(ev_reps).repartition(32).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )
    if args.events_only:
        print("events", spark.read.parquet(f"{out}/events.parquet").count())
        return

    docs = table(spark, args.src, "documents")
    doc_reps = []
    for k in range(args.replicas):
        if k == 0:
            doc_reps.append(docs)
            continue
        text = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit(f"_{k}")),
            ),
            " ",
        )
        doc_reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * DOC_ID_STRIDE)).alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                F.length(text).cast("long").alias("n_chars"),
            )
        )
    _union(doc_reps).repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    emb = table(spark, args.src, "embeddings")
    n = emb.count()
    dims = len(emb.select("embedding").first()["embedding"])
    emb_reps = []
    for k in range(args.replicas):
        # Per-replica deterministic sign flip (norm-preserving): replica-
        # internal cosine structure is EXACTLY preserved (cos is invariant
        # under a common coordinate sign pattern), while cross-replica
        # cosines decorrelate — so near-dup pair volume for semdedup /
        # cosine-pair queries grows ~linearly with replicas, the way a
        # real 10x corpus grows, instead of quadratically as verbatim
        # copies would (every copy-group of R identical vectors adds
        # R²/2 threshold-crossing pairs — data pathology, not plan shape).
        if k == 0:
            vec = F.col("embedding")
        else:
            signs = _flip_signs(k, dims)
            vec = F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: (x * s).cast("float"),
            )
        emb_reps.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * n)).alias("vec_id"),
                vec.alias("embedding"),
                "label",
            )
        )
    _union(emb_reps).repartition(32).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )

    if args.tpch:
        _build_tpch(spark, args.src, out, args.replicas)

    tables = ["events", "documents", "embeddings"] + (
        "region nation customer supplier part orders lineitem".split()
        if args.tpch
        else []
    )
    for t in tables:
        print(t, spark.read.parquet(f"{out}/{t}.parquet").count())


def _build_skew_events(spark, ev, out: str, replicas: int) -> None:
    """~90/10 hot-key events: event_id%100<90 → symbol 'hot' (SAME name in
    every replica, so the hot key's per-symbol sort partition grows with
    the data); the 10% residue keeps the original 5 types (suffixed per
    replica like the balanced generator).  event_id strides preserve the
    planted modulo patterns inside both populations."""
    hot = F.col("event_id") % 100 < 90
    reps = [
        ev.select(
            (F.col("event_id") + F.lit(k * EVENT_ID_STRIDE)).alias("event_id"),
            "ts",
            "user_id",
            F.when(hot, F.lit("hot"))
            .otherwise(
                F.col("event_type")
                if k == 0
                else F.concat(F.col("event_type"), F.lit(f"_{k}"))
            )
            .alias("event_type"),
            "value",
            "props",
        )
        for k in range(replicas)
    ]
    _union(reps).repartition(32).write.mode("overwrite").parquet(
        f"{out}/events.parquet"
    )


def _build_tpch(spark, src: str, out: str, replicas: int) -> None:
    """Replicate the decision-support tables with FK-consistent strides.
    Dims region/nation copy verbatim (their key spaces are the fixed
    geography); every fact/medium-dim key shifts by k·stride with the SAME
    stride on both ends of each FK edge, so replica k is a self-contained
    catalog shard — joins never cross replicas, per-key group sizes stay
    constant, global aggregates scale linearly.  Value columns replicate
    exactly: a query whose Spark/DuckDB answers then diverge was relying
    on tie-breaking (under-determined ORDER BY / top-k) that real growth
    would also break."""
    for t in ("region", "nation"):
        spark.read.parquet(os.path.join(src, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")

    shifted = {
        "customer": [("c_custkey", CUST_STRIDE)],
        "supplier": [("s_suppkey", SUPP_STRIDE)],
        "part": [("p_partkey", PART_STRIDE)],
        "orders": [("o_orderkey", ORDER_STRIDE), ("o_custkey", CUST_STRIDE)],
        "lineitem": [
            ("l_orderkey", ORDER_STRIDE),
            ("l_partkey", PART_STRIDE),
            ("l_suppkey", SUPP_STRIDE),
        ],
    }
    for t, keys in shifted.items():
        df = spark.read.parquet(os.path.join(src, f"{t}.parquet"))
        strides = dict(keys)
        reps = [
            df.select(
                *[
                    (F.col(c) + F.lit(k * strides[c])).alias(c)
                    if c in strides
                    else F.col(c)
                    for c in df.columns
                ]
            )
            for k in range(replicas)
        ]
        _union(reps).repartition(32).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )


def _flip_signs(k: int, dims: int) -> list[float]:
    """±1 per dimension from md5(replica) bits — reproducible, no RNG state."""
    import hashlib

    bits = []
    i = 0
    while len(bits) < dims:
        for byte in hashlib.md5(f"flip|{k}|{i}".encode()).digest():
            for b in range(8):
                bits.append(1.0 if (byte >> b) & 1 else -1.0)
        i += 1
    return bits[:dims]


def _union(frames):
    acc = frames[0]
    for f in frames[1:]:
        acc = acc.unionByName(f)
    return acc


if __name__ == "__main__":
    main()
