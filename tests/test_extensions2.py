"""Tests for coverage-completion operators: kline parsing, string formatting,
sessionization, time split, tf-idf, atomic swap, salted-agg equivalence."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F


def _trade(symbol, event_ts, trade_id, price=10.0, qty=1.0):
    return Row(symbol=symbol, event_ts=event_ts, ingest_ts=event_ts,
               trade_id=trade_id, price=float(price), qty=float(qty),
               is_buyer_maker=False, source="sbe")


def test_parse_klines_positions(spark):
    from bitcoin_datapipeline_spark.functions.klines import parse_klines

    wire = spark.createDataFrame(
        [Row(symbol="BTC", interval="1m",
             k=["60000", "100.5", "101.5", "99.5", "100.75", "7", "119999",
                "703.5", "42", "3.5", "351.75", "0"])]
    )
    r = parse_klines(wire).collect()[0]
    assert r.open_time == 60000 and r.close_time == 119999
    assert r.open_price == 100.5 and r.close_price == 100.75
    assert r.volume == 7.0 and r.trade_count == 42
    assert r.dedup_key == "BTC_1m_60000"
    assert r.vwap == round(703.5 / 7, 6)


def test_decimal_string_format_strips_zeros(spark):
    from bitcoin_datapipeline_spark.functions.klines import decimal_string_format

    rows = [_trade("BTC", 0, 1, price=451.95, qty=100.0),
            _trade("BTC", 0, 2, price=0.5, qty=1234.125)]
    out = {r.trade_id: r for r in decimal_string_format(spark.createDataFrame(rows)).collect()}
    assert out[1].price_str == "451.95" and out[1].qty_str == "100"
    assert out[2].price_str == "0.5" and out[2].qty_str == "1234.125"


def test_sessionize_gap_boundary(spark):
    from bitcoin_datapipeline_spark.operators.windows import sessionize

    m = 60_000
    rows = [_trade("BTC", 0, 1), _trade("BTC", 10 * m, 2),      # same session
            _trade("BTC", 50 * m, 3),                            # > 30 min gap → new
            _trade("ETH", 0, 1)]
    out = sessionize(spark.createDataFrame(rows)).orderBy("symbol", "session_id").collect()
    btc = [r for r in out if r.symbol == "BTC"]
    assert len(btc) == 2
    assert btc[0].n_trades == 2 and btc[0].duration_s == 600.0
    assert btc[1].n_trades == 1 and btc[1].session_start == 50 * m


def test_time_split_ordered_no_leakage(spark):
    from bitcoin_datapipeline_spark.operators.windows import time_series_split

    bars = spark.createDataFrame(
        [Row(symbol="BTC", bucket=b, close=1.0) for b in range(100)]
    )
    out = time_series_split(bars).collect()
    by_split = {}
    for r in out:
        by_split.setdefault(r.split, []).append(r.bucket)
    # every train bucket strictly before every val bucket before every test
    assert max(by_split["train"]) < min(by_split["val"])
    assert max(by_split["val"]) < min(by_split["test"])
    assert len(by_split["train"]) == 70  # buckets 0..69


def test_tfidf_rare_term_wins(spark):
    from bitcoin_datapipeline_spark.operators.text import tfidf_top_terms

    docs = [Row(doc_id=1, text="common common rare", lang="en", source="s", n_chars=1),
            Row(doc_id=2, text="common common other", lang="en", source="s", n_chars=1)]
    out = tfidf_top_terms(spark.createDataFrame(docs), k=1).collect()
    top = {r.doc_id: r.term for r in out}
    # 'common' appears in both docs → idf 0; rare/other unique → win
    assert top[1] == "rare" and top[2] == "other"


def test_atomic_swap(spark, tmp_path):
    from bitcoin_datapipeline_spark.sources.reanchor import atomic_swap_write, retire

    live = str(tmp_path / "state")
    v1 = spark.createDataFrame([Row(x=1)])
    old = atomic_swap_write(v1, live)
    assert old == "" and spark.read.parquet(live).collect()[0].x == 1
    v2 = spark.createDataFrame([Row(x=2)])
    old = atomic_swap_write(v2, live)
    assert spark.read.parquet(live).collect()[0].x == 2
    assert os.path.exists(old)  # previous snapshot retained until retired
    retire(old)
    assert not os.path.exists(old)


def test_salted_aggregation_equivalence(spark, sf_dir):
    """Skew-handling pattern: two-stage salted aggregation must equal the
    direct groupBy.  (symbol is the natural hot key at 100 TB — salting
    splits each symbol into 8 subkeys for the partial stage, then merges.)"""
    from bitcoin_datapipeline_spark.functions.normalize import valid_trades
    from bitcoin_datapipeline_spark.tables import table

    t = valid_trades(table(spark, sf_dir, "events"))
    direct = {
        (r.symbol,): (r.n, round(r.vol, 6))
        for r in t.groupBy("symbol")
        .agg(F.count("*").alias("n"), F.sum("qty").alias("vol"))
        .collect()
    }
    salted = (
        t.withColumn("salt", (F.col("trade_id") % 8).cast("int"))
        .groupBy("symbol", "salt")
        .agg(F.count("*").alias("n"), F.sum("qty").alias("vol"))
        .groupBy("symbol")
        .agg(F.sum("n").alias("n"), F.sum("vol").alias("vol"))
    )
    merged = {(r.symbol,): (r.n, round(r.vol, 6)) for r in salted.collect()}
    assert direct == merged


def test_chunk_documents_overlap_and_tail(spark):
    from pyspark.sql import Row

    from bitcoin_datapipeline_spark.operators.text import chunk_documents

    # 10 tokens, chunk=4, overlap=2 → stride 2 → ceil((10-2)/2)=4 chunks
    text = " ".join(f"w{i}" for i in range(10))
    d = spark.createDataFrame([Row(doc_id=1, text=text, lang="en", source="s",
                                   n_chars=len(text))])
    out = chunk_documents(d, chunk_tokens=4, overlap=2).orderBy("chunk_id").collect()
    assert len(out) == 4
    assert out[0].chunk_text == "w0 w1 w2 w3"
    assert out[1].chunk_text == "w2 w3 w4 w5"       # 2-token overlap
    assert out[3].chunk_text == "w6 w7 w8 w9"
    assert all(c.n_chunks == 4 for c in out)
    # every token appears in at least one chunk
    covered = set(t for c in out for t in c.chunk_text.split())
    assert covered == {f"w{i}" for i in range(10)}


def test_deterministic_sample_stable(spark, sf_dir):
    from bitcoin_datapipeline_spark.operators.text import deterministic_sample
    from bitcoin_datapipeline_spark.tables import table

    d = table(spark, sf_dir, "documents")
    s1 = {r.doc_id for r in deterministic_sample(d).collect()}
    s2 = {r.doc_id for r in deterministic_sample(d).collect()}
    assert s1 == s2                      # reproducible, no RNG state
    frac = len(s1) / d.count()
    assert 0.15 < frac < 0.35            # ~25% by construction


def test_decontaminate_ngram_matches_python_model(spark):
    """decontaminate_ngram vs an independent pure-Python recomputation on a
    corpus designed so some train docs share 4-grams with eval docs (via a
    common phrase) and others cannot (unique vocabularies)."""
    import hashlib

    from bitcoin_datapipeline_spark.operators.text import (
        NGRAM_DECON_N,
        SAMPLE_KEEP_HEX_MAX,
        decontaminate_ngram,
    )

    phrase = "alpha beta gamma delta"          # one shared 4-gram
    texts = {}
    for i in range(20):
        if i % 3 == 0:
            texts[i] = f"u{i}a u{i}b {phrase} u{i}c u{i}d"   # carries phrase
        else:
            texts[i] = f"v{i}a v{i}b v{i}c v{i}d v{i}e"      # unique grams
    d = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
         for i, t in texts.items()]
    )
    out = {
        r.train_doc_id: (r.n_shared_ngrams, r.n_eval_docs, r.n_hits)
        for r in decontaminate_ngram(d).collect()
    }

    def grams(t, n=NGRAM_DECON_N):
        toks = t.split(" ")
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    def is_eval(i):
        return hashlib.md5(f"en|{i}".encode()).hexdigest()[0] <= SAMPLE_KEEP_HEX_MAX

    eval_grams = {}  # gram -> set of eval doc ids
    for i, t in texts.items():
        if is_eval(i):
            for g in grams(t):
                eval_grams.setdefault(g, set()).add(i)
    expected = {}
    for i, t in texts.items():
        if is_eval(i):
            continue
        shared = {g: eval_grams[g] for g in grams(t) if g in eval_grams}
        if shared:
            docs = set().union(*shared.values())
            hits = sum(len(v) for v in shared.values())
            expected[i] = (len(shared), len(docs), hits)

    assert out == expected
    assert expected, "corpus must produce at least one contaminated train doc"
    clean_train = [i for i in texts if not is_eval(i) and i not in expected]
    assert clean_train, "corpus must keep at least one clean train doc"


def test_semdedup_greedy_keep_rule(spark):
    """Groups of identical vectors land in one cluster; only the smallest id
    of each group survives, with dup_of/neighbor counts per the greedy rule;
    orthogonal groups never cross-contaminate (cos 0 < threshold)."""
    from bitcoin_datapipeline_spark.operators.similarity import semdedup

    basis = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
    rows = [Row(vec_id=i, embedding=basis[i // 4], label=i // 4)
            for i in range(16)]
    out = {r.vec_id: r for r in semdedup(
        spark.createDataFrame(rows), train_mod=1).collect()}

    assert len(out) == 16
    for i in range(16):
        g0 = (i // 4) * 4                      # group's smallest id
        if i == g0:
            assert out[i].keep and out[i].dup_of is None
            assert out[i].n_dup_neighbors == 0
        else:
            assert not out[i].keep and out[i].dup_of == g0
            assert out[i].n_dup_neighbors == i - g0
        # identical vectors must share a cluster
        assert out[i].cluster == out[g0].cluster


def test_semdedup_calibration_ties_to_audit(spark):
    """The calibration curve must tie out with the semdedup audit table at
    the operating threshold: n_dropped(τ₀) = dropped audit rows and
    n_pairs(τ₀) = Σ n_dup_neighbors (every counted pair claims exactly one
    cand); the curve is monotone nonincreasing in τ and drop_rate =
    n_dropped / corpus."""
    from bitcoin_datapipeline_spark.operators.similarity import (
        SEMDEDUP_THRESHOLD,
        semdedup,
        semdedup_calibration,
    )
    from bitcoin_datapipeline_spark.tables import table

    e = table(spark, "/root/testdata/sf0.001", "embeddings")
    audit = semdedup(e).collect()
    cal = {
        r.threshold: r for r in semdedup_calibration(e).collect()
    }
    at = cal[SEMDEDUP_THRESHOLD]
    assert at.n_dropped == sum(1 for r in audit if not r.keep)
    assert at.n_pairs == sum(r.n_dup_neighbors for r in audit)
    assert at.drop_rate == round(at.n_dropped / len(audit), 6)
    ts = sorted(cal)
    for lo, hi in zip(ts, ts[1:]):
        assert cal[lo].n_pairs >= cal[hi].n_pairs
        assert cal[lo].n_dropped >= cal[hi].n_dropped


def test_semdedup_persist_knob_equivalent(spark):
    """persist_assignment=True must not change results (it only swaps
    recompute-per-branch for a materialized assignment)."""
    from bitcoin_datapipeline_spark.operators.similarity import semdedup
    from bitcoin_datapipeline_spark.tables import table

    e = table(spark, "/root/testdata/sf0.001", "embeddings")
    base = sorted(map(tuple, semdedup(e, train_mod=1).collect()))
    fast = semdedup(e, train_mod=1, persist_assignment=True)
    assert sorted(map(tuple, fast.collect())) == base
    spark.catalog.clearCache()


def test_unigram_logloss_orders_by_rarity(spark):
    """Docs made of corpus-common tokens must score lower perplexity than
    docs of corpus-rare tokens; ppl == exp(avg_nll) consistency."""
    import math

    from bitcoin_datapipeline_spark.operators.text import unigram_logloss

    common = "the the the the the the the the"          # dominates vocab
    rare = "zeta theta kappa sigma omega lambda mu nu"  # singletons
    d = spark.createDataFrame(
        [Row(doc_id=0, text=common, lang="en", source="s", n_chars=len(common)),
         Row(doc_id=1, text=rare, lang="en", source="s", n_chars=len(rare))]
    )
    out = {r.doc_id: r for r in unigram_logloss(d).collect()}
    assert out[0].ppl < out[1].ppl
    for r in out.values():
        assert abs(r.ppl - math.exp(r.avg_nll)) < 1e-4
    # common-token doc: p(the)=8/16 → avg_nll = ln 2
    assert abs(out[0].avg_nll - math.log(2)) < 1e-6


def test_resize_signal_bins_and_short_payload(spark):
    """Block boundaries floor(i*n/bins); payloads shorter than n_bins drop."""
    from bitcoin_datapipeline_spark.operators.multimodal import (
        media_table,
        resize_signal,
    )

    long_text = "".join(chr(65 + (i % 26)) for i in range(20))   # 20 bytes
    d = spark.createDataFrame(
        [Row(doc_id=0, text=long_text, lang="en", source="s", n_chars=20),
         Row(doc_id=1, text="abc", lang="en", source="s", n_chars=3)]
    )
    out = resize_signal(media_table(d), n_bins=4).orderBy("bin_idx").collect()
    assert {r.doc_id for r in out} == {0}           # short payload dropped
    assert [r.bin_start for r in out] == [0, 5, 10, 15]
    assert all(r.bin_len == 5 for r in out)
    b = long_text.encode()
    for r in out:
        seg = b[r.bin_start:r.bin_start + r.bin_len]
        assert r.bin_mean == sum(seg) / len(seg)


def test_incremental_dedup_verdict_classes(spark):
    """All three verdicts on a hand-built corpus: exact copy, near-dup
    (shares most shingles), and genuinely new content."""
    from bitcoin_datapipeline_spark.operators.text import incremental_dedup

    base = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [Row(doc_id=0, text=base, lang="en", source="s", n_chars=len(base)),
         Row(doc_id=2, text="uno dos tres cuatro cinco seis", lang="en",
             source="s", n_chars=30)]
    )
    near = base + " iota"                      # one extra token -> high jaccard
    incoming = spark.createDataFrame(
        [Row(doc_id=1, text=base, lang="en", source="s", n_chars=len(base)),
         Row(doc_id=3, text=near, lang="en", source="s", n_chars=len(near)),
         Row(doc_id=5, text="red green blue cyan magenta yellow", lang="en",
             source="s", n_chars=34)]
    )
    out = {r.doc_id: r for r in incremental_dedup(incoming, corpus).collect()}
    assert out[1].verdict == "exact_dup" and out[1].match_doc_id == 0
    assert out[1].jaccard is None              # exact verdicts carry no jaccard
    assert out[3].verdict == "near_dup" and out[3].match_doc_id == 0
    assert out[3].jaccard and out[3].jaccard >= 0.5
    assert out[5].verdict == "new" and out[5].match_doc_id is None


def test_incremental_dedup_recall_vs_exhaustive(spark):
    """The banded gate must find (almost) every incoming doc that an
    EXHAUSTIVE shingle join says has a corpus match at j >= threshold.
    On this corpus near-dups sit far above the LSH S-curve knee, so the
    gate's recall is high; the test pins >= 0.9 rather than 1.0 because
    banding is probabilistic by design near the threshold."""
    from pyspark.sql import functions as F

    from bitcoin_datapipeline_spark.operators.text import (
        INCR_CORPUS_MOD,
        INCR_NEAR_JACCARD,
        _shingles,
        incremental_dedup,
    )
    from bitcoin_datapipeline_spark.operators.aggregates import r6
    from bitcoin_datapipeline_spark.tables import table

    docs = table(spark, "/root/testdata/sf0.01", "documents")
    inc = docs.filter(F.col("doc_id") % INCR_CORPUS_MOD != 0)
    cor = docs.filter(F.col("doc_id") % INCR_CORPUS_MOD == 0)
    found = {
        r.doc_id
        for r in incremental_dedup(inc, cor)
        .filter(F.col("verdict") != "new")
        .collect()
    }

    shi = _shingles(inc)
    shc = _shingles(cor).select(
        F.col("doc_id").alias("cid"), F.col("shingle")
    )
    ni = shi.groupBy("doc_id").agg(F.count("*").alias("ni"))
    nc = shc.groupBy("cid").agg(F.count("*").alias("nc"))
    shared = (
        shi.join(shc, "shingle")
        .groupBy("doc_id", "cid")
        .agg(F.count("*").alias("c"))
    )
    jac = r6(F.col("c") / (F.col("ni") + F.col("nc") - F.col("c")))
    truth = {
        r.doc_id
        for r in shared.join(ni, "doc_id").join(nc, "cid")
        .filter(jac >= INCR_NEAR_JACCARD)
        .select("doc_id").distinct().collect()
    }
    assert truth, "corpus must contain at least one true cross near-dup"
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, (recall, sorted(truth - found))


def test_prune_prototypes_drops_cluster_heads(spark):
    """Per cluster: exactly floor(frac*n) dropped, and every dropped vector
    is at least as centroid-typical as every kept one."""
    import math
    from collections import defaultdict

    from bitcoin_datapipeline_spark.operators.similarity import (
        PROTO_PRUNE_FRAC,
        prune_prototypes,
    )
    from bitcoin_datapipeline_spark.tables import table

    e = table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = prune_prototypes(e, train_mod=1).collect()
    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r.cluster].append(r)
    assert len(rows) == e.count()
    for members in by_cluster.values():
        dropped = [r for r in members if not r.keep]
        kept = [r for r in members if r.keep]
        assert len(dropped) == math.floor(PROTO_PRUNE_FRAC * len(members))
        if dropped and kept:
            # the drop set is a prefix of the prototypicality ranking
            assert max(r.proto_rank for r in dropped) < min(
                r.proto_rank for r in kept
            )


def test_random_projection_jl_distortion_bounded(spark):
    """JL property on real data: distortion concentrates around 1 — the
    mean is near 1 and the tails stay within the k=16 concentration band."""
    from bitcoin_datapipeline_spark.operators.similarity import (
        random_projection_audit,
    )
    from bitcoin_datapipeline_spark.tables import table

    rows = random_projection_audit(
        table(spark, "/root/testdata/sf0.01", "embeddings")
    ).collect()
    d = [r.distortion for r in rows]
    assert len(d) == 500
    mean = sum(d) / len(d)
    assert 0.9 < mean < 1.1
    # k=16 gives sd ~ 1/sqrt(2k) ~ 0.18; 4-sigma band
    assert min(d) > 0.2 and max(d) < 1.8, (min(d), max(d))


def test_dsir_weights_match_python_model(spark):
    """dsir_weights vs a pure-Python recomputation of the hashed-bigram
    importance weights on the sf0.001 corpus."""
    import hashlib
    import math
    from collections import Counter

    from bitcoin_datapipeline_spark.operators.text import (
        DSIR_NBUCKETS,
        DSIR_SMOOTH,
        SAMPLE_KEEP_HEX_MAX,
        dsir_weights,
    )
    from bitcoin_datapipeline_spark.tables import table

    docs = {
        r.doc_id: (r.lang, r.text)
        for r in table(spark, "/root/testdata/sf0.001", "documents").collect()
    }
    out = {
        r.doc_id: r
        for r in dsir_weights(
            table(spark, "/root/testdata/sf0.001", "documents")
        ).collect()
    }

    def is_eval(i, lang):
        return (
            hashlib.md5(f"{lang}|{i}".encode()).hexdigest()[0]
            <= SAMPLE_KEEP_HEX_MAX
        )

    def buckets(text):
        toks = text.split(" ")
        return [
            hashlib.md5(f"{a} {b}".encode()).hexdigest()[0]
            for a, b in zip(toks, toks[1:])
        ]

    tgt, src = Counter(), Counter()
    for i, (lang, t) in docs.items():
        (tgt if is_eval(i, lang) else src).update(buckets(t))
    lr = {
        b: math.log(
            ((tgt[b] + DSIR_SMOOTH) / (sum(tgt.values()) + DSIR_SMOOTH * DSIR_NBUCKETS))
            / ((src[b] + DSIR_SMOOTH) / (sum(src.values()) + DSIR_SMOOTH * DSIR_NBUCKETS))
        )
        for b in set(tgt) & set(src)
    }
    for i, (lang, t) in docs.items():
        if is_eval(i, lang):
            assert i not in out
            continue
        bs = [b for b in buckets(t) if b in lr]
        if not bs:
            assert i not in out
            continue
        w = sum(lr[b] for b in bs)
        assert out[i].n_features == len(bs)
        assert abs(out[i].log_weight - w) < 1e-4
        assert out[i].keep == (out[i].log_weight > 0)
    assert any(r.keep for r in out.values())
    assert any(not r.keep for r in out.values())


def test_bigram_logloss_detects_broken_order(spark):
    """The order-sensitivity property that separates n=2 from n=1: a
    shuffled-word copy of a coherent doc has IDENTICAL unigram score but
    strictly higher bigram perplexity (its transitions are unseen)."""
    from bitcoin_datapipeline_spark.operators.text import (
        bigram_logloss,
        unigram_logloss,
    )

    phrase = "the cat sat on the mat and the dog sat on the rug"
    toks = phrase.split(" ")
    shuffled = " ".join(toks[::2] + toks[1::2])  # same multiset, new order
    d = spark.createDataFrame(
        [Row(doc_id=0, text=phrase, lang="en", source="s", n_chars=1),
         Row(doc_id=1, text=phrase, lang="en", source="s", n_chars=1),
         Row(doc_id=2, text=shuffled, lang="en", source="s", n_chars=1)]
    )
    uni = {r.doc_id: r.ppl for r in unigram_logloss(d).collect()}
    bi = {r.doc_id: r.ppl for r in bigram_logloss(d).collect()}
    assert uni[0] == uni[2]          # unigram can't see the difference
    assert bi[2] > bi[0]             # bigram can
    assert bi[0] == bi[1]            # deterministic


def test_capped_bigram_unk_sentinel_is_unspoofable(spark):
    """A corpus token literally spelled `<unk>` must stay a DISTINCT
    vocabulary entry under the capped LM — the UNK sentinel carries a
    space, which no space-split token can contain, so data cannot merge
    into the UNK bucket and perturb transition counts (ADVICE r6).

    Construction: `<unk>` is the most frequent literal token (in top-V),
    `z` is out-of-vocabulary.  With a spoofable sentinel the collapsed
    `z` merges with the literal `<unk>` counts (cw 3 → 4, V 3 → 2) and
    doc 0's mean NLL collapses to ln 2 ≈ 0.693147; the un-spoofable
    sentinel keeps them apart, giving the hand-computed 0.828302."""
    import math

    from bitcoin_datapipeline_spark.operators.text import bigram_logloss
    from bitcoin_datapipeline_spark.streaming.vpin import _round6

    d = spark.createDataFrame(
        [Row(doc_id=0, text="<unk> <unk> <unk> b", lang="en", source="s",
             n_chars=1),
         Row(doc_id=1, text="z b", lang="en", source="s", n_chars=1)]
    )
    out = {r.doc_id: r for r in
           bigram_logloss(d, vocab_top_v=2).collect()}
    # naive reference with a truly distinct UNK symbol:
    # counts <unk>:3 b:2 z:1, top-2 = {<unk>, b}, z -> UNK
    # mapped uni: <unk>:3 b:2 UNK:1, V=3
    # bigrams: (<unk>,<unk>):2 (<unk>,b):1 (UNK,b):1
    # p = (cbg+1)/(cw(w1)+V): uu=3/6, ub=2/6, UNKb=2/4
    d0 = -(math.log(3 / 6) + math.log(3 / 6) + math.log(2 / 6)) / 3
    d1 = -math.log(2 / 4)
    assert out[0].n_transitions == 3 and out[1].n_transitions == 1
    assert out[0].avg_nll == _round6(d0)
    assert out[1].avg_nll == _round6(d1)
    # and the collision value it must NOT equal
    assert out[0].avg_nll != _round6(math.log(2.0))
