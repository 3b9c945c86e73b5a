"""Persistent corpus dedup index — the state behind incremental ingest.

`operators/text.py incremental_dedup` gates a batch against corpus-side
frames computed inline; a production pipeline computes those ONCE and
stores them, so each ingest pays O(batch) work against a read-only index.
This module materializes that index as two parquet tables and runs the
maintain-loop:

- ``hashes/``  (corpus_doc_id, h)        — exact-dup lookup keys
- ``sigs/``    (doc_id, s0..s11, n, shs) — MinHash signatures + shingle
  sets (the `_minhash_sigs` output; shingle sets serve the exact-Jaccard
  verification — a store that keeps only the 12 signatures instead
  verifies by signature agreement, trading exactness for 10-100× less
  index storage; both shapes gate identically through `_dedup_gate`)
- ``bloom/``   (pos)                     — the content-hash Bloom summary
  (operators/text.bloom_gate's positions, <= BLOOM_M rows by
  construction): the gate broadcasts it and only bloom-POSITIVE docs
  probe the exact hash table — on a fresh crawl that prunes the exact
  stage to the few true-dup + FP-rate docs, with results identical to
  the un-pruned gate (no false negatives; pinned in tests)

``ingest_batch`` is the loop body a foreachBatch sink or daily job runs:
gate the batch against the index, collapse intra-batch duplicate groups
to one representative, APPEND the surviving (verdict ``new``) documents'
hashes and signatures, return the verdicts.  Batch k+1 thus dedups
against everything batch k admitted, and duplicates arriving TOGETHER in
one batch admit exactly one copy — both properties pinned by
tests/test_dedup_index.py.

At 100 TB: the index appends are partitioned parquet writes (append mode,
no rewrite); the gate's joins are one-sided (batch ⋈ index) on hash/band
keys; compaction of the append-accumulated small files is
`sources/compact.py`'s job.

cf. reference `services/rest_ingestor/src/checkpoint.py` (processed-id
checkpoint store) — same maintain-state-between-ingests role, upgraded
from exact ids to exact+near content identity.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import (
    BLOOM_K,
    BLOOM_M,
    INCR_NEAR_JACCARD,
    _dedup_gate,
    _minhash_sigs,
    minhash_lsh_pairs,
)


def _hashes(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.col("doc_id").alias("corpus_doc_id"),
        F.md5(F.lower(F.col("text"))).alias("h"),
    )


def _bloom_positions(docs: DataFrame) -> DataFrame:
    """The content-hash Bloom positions — the <= BLOOM_M-row summary the
    index stores alongside the exact hash table.  Delegates to the ONE
    hashing implementation (`text.bloom_doc_positions`) so the stored
    filter and the gate's probe positions can never drift apart: a
    hashing tweak applied to one but not the other would produce Bloom
    false negatives and silently admit exact duplicates."""
    from ..operators.text import bloom_doc_positions

    return bloom_doc_positions(docs, BLOOM_M, BLOOM_K, keep_doc=False).distinct()


def build_dedup_index(
    corpus: DataFrame, index_dir: str, max_shingle_df: int | None = None
) -> None:
    """Materialize the index from an existing corpus (one-time backfill)."""
    _hashes(corpus).write.mode("overwrite").parquet(
        os.path.join(index_dir, "hashes")
    )
    _minhash_sigs(corpus, max_shingle_df).write.mode("overwrite").parquet(
        os.path.join(index_dir, "sigs")
    )
    _bloom_positions(corpus).write.mode("overwrite").parquet(
        os.path.join(index_dir, "bloom")
    )


def _intra_batch_verdicts(
    batch_new: DataFrame,
    threshold: float,
    max_shingle_df: int | None,
) -> DataFrame:
    """Collapse duplicate groups WITHIN a batch to their min-doc_id
    representative.  ``batch_new`` is the subset of a batch the corpus
    gate passed as ``new``; two identical (or near-identical) documents
    arriving in the same batch both pass that gate, so without this step
    the index would permanently store exact duplicates — breaking the
    module invariant that the index holds exactly the corpus plus the
    admitted docs.

    Returns one verdict row per DROPPED doc: exact dups collapse on
    content hash (keep min doc_id per group); the surviving
    representatives then run the same banded MinHash + true-Jaccard
    verification as :func:`minhash_lsh_pairs`, and a doc is dropped as
    ``near_dup`` of its best lower-id match (greedy min-id collapse —
    chains fold onto the lowest id transitively, the standard LSH keep-min
    policy).  NB on chain pointers: a dropped doc's ``match_doc_id``
    names its BEST lower-id match, which may itself have been dropped as
    a near-dup of a still-lower doc (A←B←C drops B and C, C pointing at
    B) — ``verdict == 'new'`` is the admission truth; consumers needing
    the admitted root follow the pointer chain (or run
    ``operators/text.dedup_components`` for the full closure).  All joins
    are band-bucketed within the batch only: O(batch bands), never
    batch x corpus."""
    h = batch_new.select("doc_id", F.md5(F.lower(F.col("text"))).alias("h"))
    rep = h.groupBy("h").agg(F.min("doc_id").alias("rep_id"))
    hr = h.join(rep, "h")
    exact = hr.filter(F.col("doc_id") != F.col("rep_id")).select(
        "doc_id",
        F.lit("exact_dup").alias("verdict"),
        F.col("rep_id").cast("long").alias("match_doc_id"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    reps = batch_new.join(
        hr.filter(F.col("doc_id") == F.col("rep_id")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    near = (
        minhash_lsh_pairs(reps, max_shingle_df)
        .filter(F.col("jaccard") >= threshold)
        .groupBy(F.col("doc_b").alias("doc_id"))
        .agg(
            F.max(
                F.struct(F.col("jaccard").alias("j"), (-F.col("doc_a")).alias("negid"))
            ).alias("best")
        )
        .select(
            "doc_id",
            F.lit("near_dup").alias("verdict"),
            (-F.col("best.negid")).cast("long").alias("match_doc_id"),
            F.col("best.j").alias("jaccard"),
        )
    )
    return exact.unionByName(near)


def ingest_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    threshold: float = INCR_NEAR_JACCARD,
    max_shingle_df: int | None = None,
    verdicts_dir: str | None = None,
) -> DataFrame:
    """Gate ``batch`` against the stored index, collapse intra-batch
    duplicate groups, append the admitted docs, return the verdict frame.

    Two gates compose: the corpus gate (one-sided joins vs the stored
    index) and the intra-batch collapse (:func:`_intra_batch_verdicts`,
    batch-local band joins), so a duplicate pair arriving in ONE batch
    admits exactly one representative — its partner's verdict points at
    the admitted batch doc, keeping ``verdict == 'new'`` equivalent to
    "this doc_id is now in the index".

    The verdicts are WRITTEN to parquet first (``verdicts_dir``, default
    ``<index_dir>/verdicts_last`` — they are the batch's real output) and
    re-read; that one write both materializes the gate (the index is read
    exactly once) and cuts the lineage, so the hash/sig appends below
    never read a path they are writing to.  No driver-side collect: the
    admitted set flows as a left-semi join, distributed end to end."""
    cor_h = spark.read.parquet(os.path.join(index_dir, "hashes"))
    sigs_c = spark.read.parquet(os.path.join(index_dir, "sigs"))
    # stored Bloom summary (indexes built before r6 lack it — gate runs
    # identically without, just un-pruned; see _dedup_gate's contract).
    # Presence is probed through Spark itself, not a driver-local
    # os.path check: index_dir may live on HDFS/S3/`file:` URIs where
    # os.path.isdir is always False and would silently disable pruning
    # AND the bloom append, letting the stored filter go stale.
    bloom_dir = os.path.join(index_dir, "bloom")
    try:
        bloom_bits = spark.read.parquet(bloom_dir).distinct()
    except AnalysisException:
        bloom_bits = None
    vpath = verdicts_dir or os.path.join(index_dir, "verdicts_last")
    gate = _dedup_gate(
        batch, cor_h, sigs_c, threshold, max_shingle_df, bloom_bits
    )
    batch_new = batch.join(
        gate.filter(F.col("verdict") == "new").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    intra = _intra_batch_verdicts(batch_new, threshold, max_shingle_df).select(
        "doc_id",
        F.col("verdict").alias("iv"),
        F.col("match_doc_id").alias("im"),
        F.col("jaccard").alias("ij"),
    )
    # intra only holds corpus-new docs, so coalesce(intra, gate) is exact:
    # non-new gate rows never appear in intra and keep their gate verdict.
    combined = gate.join(intra, "doc_id", "left").select(
        "doc_id",
        F.coalesce("iv", "verdict").alias("verdict"),
        F.coalesce("im", "match_doc_id").cast("long").alias("match_doc_id"),
        F.coalesce("ij", "jaccard").alias("jaccard"),
    )
    combined.write.mode("overwrite").parquet(vpath)
    verdicts = spark.read.parquet(vpath)
    admitted = batch.join(
        verdicts.filter(F.col("verdict") == "new").select("doc_id"),
        "doc_id",
        "left_semi",
    )
    _hashes(admitted).write.mode("append").parquet(
        os.path.join(index_dir, "hashes")
    )
    _minhash_sigs(admitted, max_shingle_df).write.mode("append").parquet(
        os.path.join(index_dir, "sigs")
    )
    if bloom_bits is not None:
        # append-only position rows; readers distinct() — compaction
        # (sources/compact.py) collapses the accumulation like any other
        # append table, and the set is bounded at BLOOM_M rows anyway
        _bloom_positions(admitted).write.mode("append").parquet(bloom_dir)
    return verdicts


def stream_ingest(
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    threshold: float = INCR_NEAR_JACCARD,
    max_shingle_df: int | None = None,
):
    """Streaming form of the ingest loop: every micro-batch runs the same
    gate-then-append body via ``foreachBatch``, with per-batch verdict
    output under ``<index_dir>/verdicts/batch=<id>``.  foreachBatch is the
    right tool (not a stateful operator): the corpus index is far larger
    than any state store wants to hold, lives in parquet either way, and
    the loop body is batch code — so streaming and daily-batch ingest are
    LITERALLY the same function, checkpointed micro-batch ids giving
    exactly-once-ish appends (a replayed batch overwrites its own verdict
    dir and re-appends; dedup of the index itself on replay is the
    documented compaction job's concern).  Returns the started query
    (caller awaits termination)."""

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        ingest_batch(
            batch_df.sparkSession,
            batch_df,
            index_dir,
            threshold,
            max_shingle_df,
            verdicts_dir=os.path.join(index_dir, f"verdicts/batch={batch_id}"),
        )

    return (
        docs_stream.writeStream.foreachBatch(_body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
