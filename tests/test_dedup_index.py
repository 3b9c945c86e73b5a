"""Persistent dedup index: batch k+1 must dedup against documents that
batch k ADMITTED (not just the original corpus) — the cross-batch
maintain-loop property."""

from __future__ import annotations

from pyspark.sql import Row


def _doc(doc_id, text):
    return Row(doc_id=doc_id, text=text, lang="en", source="s",
               n_chars=len(text))


BASE = "alpha beta gamma delta epsilon zeta eta theta"


def test_index_gates_across_batches(spark, tmp_path):
    from bitcoin_datapipeline_spark.sources.dedup_index import (
        build_dedup_index,
        ingest_batch,
    )

    idx = str(tmp_path / "idx")
    corpus = spark.createDataFrame([_doc(0, BASE)])
    build_dedup_index(corpus, idx)

    # batch 1: one dup of the corpus, one genuinely new doc X
    x_text = "uno dos tres cuatro cinco seis siete"
    b1 = spark.createDataFrame([_doc(10, BASE), _doc(11, x_text)])
    v1 = {r.doc_id: r for r in ingest_batch(spark, b1, idx).collect()}
    assert v1[10].verdict == "exact_dup" and v1[10].match_doc_id == 0
    assert v1[11].verdict == "new"

    # batch 2: exact copy of X (admitted in batch 1, never in the corpus)
    # and a near-dup of X -> both must hit the GROWN index
    b2 = spark.createDataFrame(
        [_doc(20, x_text), _doc(21, x_text + " ocho")]
    )
    v2 = {r.doc_id: r for r in ingest_batch(spark, b2, idx).collect()}
    assert v2[20].verdict == "exact_dup" and v2[20].match_doc_id == 11
    assert v2[21].verdict == "near_dup" and v2[21].match_doc_id == 11

    # rejected docs must NOT have been appended: re-sending the batch-1
    # dup still matches the ORIGINAL corpus doc, not doc 10
    b3 = spark.createDataFrame([_doc(30, BASE)])
    v3 = {r.doc_id: r for r in ingest_batch(spark, b3, idx).collect()}
    assert v3[30].verdict == "exact_dup" and v3[30].match_doc_id == 0

    # the index holds exactly the corpus + the admitted docs (0 and 11) —
    # none of the five rejected ids leaked in
    ids = {
        r.corpus_doc_id
        for r in spark.read.parquet(f"{idx}/hashes").collect()
    }
    assert ids == {0, 11}


def test_bloom_summary_maintained_on_uri_index_dir(spark, tmp_path):
    """The Bloom-summary presence probe goes through Spark's reader, not
    a driver-local os.path check: an index_dir addressed as a `file:` URI
    (the local stand-in for HDFS/S3 paths, where os.path.isdir is always
    False) must still LOAD the stored summary and APPEND the admitted
    docs' positions, so the filter never goes stale (ADVICE r6)."""
    from bitcoin_datapipeline_spark.sources.dedup_index import (
        build_dedup_index,
        ingest_batch,
    )

    local = tmp_path / "idx_uri"
    idx = "file:" + str(local)
    corpus = spark.createDataFrame([_doc(0, BASE)])
    build_dedup_index(corpus, idx)
    n_before = spark.read.parquet(f"{idx}/bloom").count()
    assert n_before > 0  # summary written at build time

    new_text = "uno dos tres cuatro cinco seis siete"
    b1 = spark.createDataFrame([_doc(10, BASE), _doc(11, new_text)])
    v1 = {r.doc_id: r for r in ingest_batch(spark, b1, idx).collect()}
    assert v1[10].verdict == "exact_dup" and v1[11].verdict == "new"
    # the admitted doc's positions were appended through the URI path —
    # with a driver-local isdir probe this count never grows and the
    # stored filter silently drifts stale
    assert spark.read.parquet(f"{idx}/bloom").count() > n_before

    # and the maintained summary still gates the next batch correctly
    b2 = spark.createDataFrame([_doc(20, new_text)])
    v2 = {r.doc_id: r for r in ingest_batch(spark, b2, idx).collect()}
    assert v2[20].verdict == "exact_dup" and v2[20].match_doc_id == 11


def test_stream_ingest_dedups_across_micro_batches(spark, tmp_path):
    """File-source stream → foreachBatch ingest loop: a doc arriving in a
    later availableNow run that duplicates one admitted earlier must be
    rejected by the grown index."""
    import glob

    from bitcoin_datapipeline_spark.sources.dedup_index import (
        build_dedup_index,
        stream_ingest,
    )

    idx = str(tmp_path / "idx")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    build_dedup_index(spark.createDataFrame([_doc(0, BASE)]), idx)

    x_text = "uno dos tres cuatro cinco seis siete"
    b1 = spark.createDataFrame([_doc(10, x_text)])
    b1.write.mode("append").parquet(src)
    stream = spark.readStream.schema(b1.schema).parquet(src)
    stream_ingest(stream, idx, ckpt).awaitTermination(120)

    # second delivery: dup of the corpus AND dup of the batch-1 admit
    spark.createDataFrame(
        [_doc(20, BASE), _doc(21, x_text)]
    ).write.mode("append").parquet(src)
    stream = spark.readStream.schema(b1.schema).parquet(src)
    stream_ingest(stream, idx, ckpt).awaitTermination(120)

    verdicts = spark.read.parquet(*glob.glob(f"{idx}/verdicts/batch=*"))
    v = {r.doc_id: r for r in verdicts.collect()}
    assert v[10].verdict == "new"
    assert v[20].verdict == "exact_dup" and v[20].match_doc_id == 0
    assert v[21].verdict == "exact_dup" and v[21].match_doc_id == 10
    ids = {r.corpus_doc_id
           for r in spark.read.parquet(f"{idx}/hashes").collect()}
    assert ids == {0, 10}


def test_intra_batch_duplicates_admit_one_representative(spark, tmp_path):
    """Two identical docs arriving in the SAME batch must not both be
    appended: the min-id representative is admitted, its partner's verdict
    points at it, and a near-dup chain folds onto the lowest id."""
    from bitcoin_datapipeline_spark.sources.dedup_index import (
        build_dedup_index,
        ingest_batch,
    )

    idx = str(tmp_path / "idx")
    build_dedup_index(spark.createDataFrame([_doc(0, BASE)]), idx)

    x_text = "uno dos tres cuatro cinco seis siete"
    b = spark.createDataFrame([
        _doc(10, x_text),            # new -> admitted (group representative)
        _doc(11, x_text),            # intra-batch EXACT dup of 10
        _doc(12, x_text + " ocho"),  # intra-batch NEAR dup of 10
        _doc(13, BASE),              # corpus exact dup -> gate, not intra
    ])
    v = {r.doc_id: r for r in ingest_batch(spark, b, idx).collect()}
    assert v[10].verdict == "new"
    assert v[11].verdict == "exact_dup" and v[11].match_doc_id == 10
    assert v[12].verdict == "near_dup" and v[12].match_doc_id == 10
    assert v[12].jaccard is not None and v[12].jaccard >= 0.5
    assert v[13].verdict == "exact_dup" and v[13].match_doc_id == 0

    # the index holds exactly corpus + the one admitted representative
    ids = {r.corpus_doc_id
           for r in spark.read.parquet(f"{idx}/hashes").collect()}
    assert ids == {0, 10}
    sig_ids = {r.doc_id
               for r in spark.read.parquet(f"{idx}/sigs").collect()}
    assert sig_ids == {0, 10}

    # re-sending the intra-batch dup alone still matches the admitted
    # representative, proving the rejected copy never leaked in
    v2 = {r.doc_id: r for r in ingest_batch(
        spark, spark.createDataFrame([_doc(30, x_text)]), idx).collect()}
    assert v2[30].verdict == "exact_dup" and v2[30].match_doc_id == 10


def test_bloom_summary_prunes_without_changing_verdicts(spark, tmp_path):
    """The stored Bloom summary (r6: bloom/ table) must leave gate
    verdicts IDENTICAL to the un-pruned gate — the no-false-negative
    guarantee applied to the index — while the summary stays bounded at
    BLOOM_M position rows, and cross-batch: a doc admitted in batch 1 is
    caught through the bloom-pruned exact stage in batch 2."""
    import shutil

    from bitcoin_datapipeline_spark.operators.text import BLOOM_M
    from bitcoin_datapipeline_spark.sources.dedup_index import (
        build_dedup_index,
        ingest_batch,
    )

    texts = [f"w{i} x{i} y{i} z{i} common tail words here" for i in range(6)]
    corpus = spark.createDataFrame([_doc(i, t) for i, t in enumerate(texts)])

    idx_b = str(tmp_path / "with_bloom")
    idx_n = str(tmp_path / "no_bloom")
    build_dedup_index(corpus, idx_b)
    build_dedup_index(corpus, idx_n)
    shutil.rmtree(f"{idx_n}/bloom")  # a pre-r6 index: no summary stored

    batch = spark.createDataFrame(
        [_doc(100, texts[2]),                 # exact dup of the corpus
         _doc(101, texts[3] + " extra"),      # near dup
         _doc(102, "totally different words only never seen")]
    )
    vb = sorted(map(tuple, ingest_batch(spark, batch, idx_b).collect()))
    vn = sorted(map(tuple, ingest_batch(spark, batch, idx_n).collect()))
    assert vb == vn  # pruning never changes results

    # the stored summary is bounded and grew with the admitted doc
    bloom = spark.read.parquet(f"{idx_b}/bloom").distinct()
    assert bloom.count() <= BLOOM_M

    # cross-batch through the PRUNED path: the batch-1 admitted doc 102
    # must be exact-caught in batch 2 (its positions were appended)
    b2 = spark.createDataFrame(
        [_doc(200, "totally different words only never seen")]
    )
    v2 = {r.doc_id: r for r in ingest_batch(spark, b2, idx_b).collect()}
    assert v2[200].verdict == "exact_dup" and v2[200].match_doc_id == 102
