"""Round-10 skew-adaptive plan selection (VERDICT r9 item 1): the DEFAULT
spread/markout names gauge the tape's hottest-symbol share and pick the
single-sort plan on balanced keyspaces but the hot-key-safe sliced rewrite
when one symbol dominates.  These tests pin (a) the gauge arithmetic,
(b) WHICH physical form the dispatcher returns on each tape shape, and
(c) that the two forms are row-identical on the skewed tape (the
dispatch is a pure physical choice — the driver oracle only ever sees
one balanced condition, so the skew-side equality lives here)."""

from __future__ import annotations

import pytest

from bitcoin_datapipeline_spark.operators import aggregates
from bitcoin_datapipeline_spark.operators.skew import (
    HOT_KEY_SHARE_THRESHOLD,
    hot_key_share,
)

DAY_MS = 86_400_000


def _tape(spark, hot_rows: int, cold_rows_per_sym: int):
    """Deterministic quote+trade tape: symbol HOT carries ``hot_rows``
    of each kind, four cold symbols carry ``cold_rows_per_sym`` each;
    rows spread over ~3 day-slices so the sliced rewrite genuinely
    splits the hot key's sort."""
    trades, quotes = [], []
    syms = [("HOT", hot_rows)] + [(s, cold_rows_per_sym) for s in "ABCD"]
    for sym, n in syms:
        for i in range(n):
            ts = 1_600_000_000_000 + (i * 3 * DAY_MS) // max(n, 1)
            px = 100.0 + (i % 7)
            quotes.append((sym, ts, ts + 1, px - 0.5, px + 0.5, 1.0, 2.0))
            trades.append((sym, ts + 2, ts + 3, px, i % 2 == 0))
    t = spark.createDataFrame(
        trades,
        "symbol string, event_ts long, ingest_ts long, price double,"
        " is_buyer_maker boolean",
    )
    q = spark.createDataFrame(
        quotes,
        "symbol string, event_ts long, ingest_ts long, bid_px double,"
        " ask_px double, bid_sz double, ask_sz double",
    )
    return t, q


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_hot_key_share_gauge(spark):
    t, _ = _tape(spark, hot_rows=90, cold_rows_per_sym=3)
    assert hot_key_share(t) == pytest.approx(90 / 102)
    bal, _ = _tape(spark, hot_rows=5, cold_rows_per_sym=5)
    assert hot_key_share(bal) == pytest.approx(0.2)
    empty = t.filter("event_ts < 0")
    assert hot_key_share(empty) == 0.0


def test_threshold_separates_measured_regimes():
    # balanced test tapes gauge ~0.20, the skew tape 0.90 — the 0.5
    # threshold must stay strictly between them with wide margin
    assert 0.25 < HOT_KEY_SHARE_THRESHOLD < 0.85


def test_effective_spread_adaptive_picks_form_by_skew(spark):
    t, q = _tape(spark, hot_rows=90, cold_rows_per_sym=3)
    hot_plan = _analyzed(aggregates.effective_spread_adaptive(t, q))
    assert "carry_in" in hot_plan, "skewed tape must run the sliced form"
    bt, bq = _tape(spark, hot_rows=5, cold_rows_per_sym=5)
    bal_plan = _analyzed(aggregates.effective_spread_adaptive(bt, bq))
    assert "carry_in" not in bal_plan, "balanced tape must run single-sort"


def test_twa_spread_adaptive_picks_form_by_skew(spark):
    _, q = _tape(spark, hot_rows=90, cold_rows_per_sym=3)
    assert "next_slice_first" in _analyzed(aggregates.twa_spread_adaptive(q))
    _, bq = _tape(spark, hot_rows=5, cold_rows_per_sym=5)
    assert "next_slice_first" not in _analyzed(
        aggregates.twa_spread_adaptive(bq)
    )


def test_markout_adaptive_picks_form_by_skew(spark):
    t, q = _tape(spark, hot_rows=90, cold_rows_per_sym=3)
    assert "carry_in" in _analyzed(aggregates.markout_adaptive(t, q))
    bt, bq = _tape(spark, hot_rows=5, cold_rows_per_sym=5)
    assert "carry_in" not in _analyzed(aggregates.markout_adaptive(bt, bq))


def test_precomputed_hot_share_skips_gauge_and_forces_form(spark):
    # the production path: a persisted q_key_skew_profile value is passed
    # straight through — no gauge job, the caller's number decides
    bt, bq = _tape(spark, hot_rows=5, cold_rows_per_sym=5)
    forced = aggregates.effective_spread_adaptive(bt, bq, hot_share=0.95)
    assert "carry_in" in _analyzed(forced)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_adaptive_equals_single_sort_on_skewed_tape(spark):
    """The sliced form the dispatcher picks under skew is row-identical
    to the single-sort form on the SAME skewed tape — all three
    families."""
    t, q = _tape(spark, hot_rows=90, cold_rows_per_sym=3)
    assert _rows(aggregates.effective_spread_adaptive(t, q)) == _rows(
        aggregates.effective_spread(t, q)
    )
    assert _rows(aggregates.twa_spread_adaptive(q)) == _rows(
        aggregates.twa_spread(q)
    )
    got = _rows(aggregates.markout_adaptive(t, q))
    want = _rows(aggregates.markout(t, q))
    assert got == want and len(got) > 0


# --- round 11: session gauge cache (VERDICT r10 item 4) ----------------------


def test_session_gauge_cache_one_action_per_snapshot(spark, sf_dir):
    """N adaptive-default constructions on one tape snapshot submit exactly
    ONE gauge scan — the r10 design paid one scan per construction (three
    extra full-tape scans per headline run; at 100 TB, three extra table
    scans)."""
    import __spark_entry__ as entry
    from bitcoin_datapipeline_spark.operators import skew

    skew.clear_gauge_cache()
    before = skew._GAUGE_ACTIONS
    for _ in range(2):
        entry.QUERIES["q_effective_spread"](spark, sf_dir)
        entry.QUERIES["q_twa_spread"](spark, sf_dir)
        entry.QUERIES["q_markout"](spark, sf_dir)
    assert skew._GAUGE_ACTIONS - before == 1
    skew.clear_gauge_cache()


def test_gauge_cache_invalidates_on_snapshot_change(spark, tmp_path):
    """The cache key is the on-disk snapshot (path + files + bytes + max
    mtime): rewriting the table re-gauges; re-reading the same snapshot
    does not."""
    from bitcoin_datapipeline_spark.operators import skew

    path = str(tmp_path / "tape.parquet")
    spark.createDataFrame(
        [("HOT",)] * 9 + [("A",)], "event_type string"
    ).write.mode("overwrite").parquet(path)
    skew.clear_gauge_cache()
    before = skew._GAUGE_ACTIONS
    df = spark.read.parquet(path)
    s1 = skew.hot_key_share_cached(df, path, key="event_type")
    s2 = skew.hot_key_share_cached(df, path, key="event_type")
    assert s1 == s2 == pytest.approx(0.9)
    assert skew._GAUGE_ACTIONS - before == 1

    spark.createDataFrame(
        [("HOT",)] * 5 + [("A",)] * 5, "event_type string"
    ).write.mode("overwrite").parquet(path)
    s3 = skew.hot_key_share_cached(spark.read.parquet(path), path, key="event_type")
    assert s3 == pytest.approx(0.5)
    assert skew._GAUGE_ACTIONS - before == 2
    skew.clear_gauge_cache()


def test_raw_tape_share_stands_for_derived_legs(spark, sf_dir):
    """The entry-level gauge runs on the RAW events tape (event_type);
    the legs it stands for (valid_trades / bba, symbol) are symbol-uniform
    filters, so the shares agree to well within dispatch margin."""
    from bitcoin_datapipeline_spark.functions import normalize
    from bitcoin_datapipeline_spark.tables import table as t

    events = t(spark, sf_dir, "events")
    raw = hot_key_share(events, key="event_type")
    trade_leg = hot_key_share(normalize.valid_trades(events))
    quote_leg = hot_key_share(normalize.bba(events))
    assert raw == pytest.approx(trade_leg, abs=0.05)
    assert raw == pytest.approx(quote_leg, abs=0.05)
    # and all three land on the same side of the dispatch threshold
    side = raw >= HOT_KEY_SHARE_THRESHOLD
    assert (trade_leg >= HOT_KEY_SHARE_THRESHOLD) == side
    assert (quote_leg >= HOT_KEY_SHARE_THRESHOLD) == side


def test_dispatch_is_share_only_no_volume_axis(spark):
    """Round 11 (VERDICT r10 item 3): the controlled-heap sf10 block
    (BENCH_SCALE_r11.json) showed the r10 single-sort instability was host
    saturation (q_twa_spread sf10: 25.6 s median saturated → 6.2 s ± 0.6
    controlled) and single-sort stays at-or-below sliced cost on balanced
    tapes at 21.6 M rows.  DECISION: dispatch is a pure function of
    hot-key share — volume does not enter.  This pins the contract: the
    same share dispatches identically at any volume."""
    for scale in (1, 20):
        bt, bq = _tape(spark, hot_rows=5 * scale, cold_rows_per_sym=5 * scale)
        assert "carry_in" not in _analyzed(
            aggregates.effective_spread_adaptive(bt, bq)
        ), f"balanced tape at scale {scale} must stay single-sort"
        ht, hq = _tape(spark, hot_rows=90 * scale, cold_rows_per_sym=3 * scale)
        assert "carry_in" in _analyzed(
            aggregates.markout_adaptive(ht, hq)
        ), f"skewed tape at scale {scale} must dispatch sliced"
