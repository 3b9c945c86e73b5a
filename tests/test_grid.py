"""Edge-semantics unit tests for the fixed-second LOCF grid (the oracle
sweep proves cross-engine parity on the corpus; these pin the contract on
constructed edges: carry-forward across gaps, gap flagging, zero returns on
carried prices, label validity at the series tail)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bitcoin_datapipeline_spark.operators import grid


def _trades(spark, rows):
    return spark.createDataFrame(
        rows,
        "symbol string, event_ts long, trade_id long, price double, qty double,"
        " is_buyer_maker boolean, source string",
    )


def test_locf_carries_price_and_flags_gap(spark):
    t = _trades(
        spark,
        [
            ("A", 0, 1, 100.0, 1.0, False, "sbe"),
            ("A", 90_000, 2, 110.0, 2.0, True, "rest"),  # 90 s later
        ],
    )
    g = grid.locf_resample(t, step_s=1, slice_s=120, gap_threshold_s=60)
    rows = {r["feature_ts"]: r for r in g.collect()}
    assert len(rows) == 120  # seconds 0..119
    # carried price between prints, new price at/after the second print
    assert rows[45]["price"] == 100.0 and rows[45]["volume"] == 0.0
    assert rows[90]["price"] == 110.0 and rows[90]["trades"] == 1
    # gap flips on once the carried observation exceeds the threshold
    assert not rows[30]["gap_indicator"]
    assert rows[75]["gap_indicator"]
    assert not rows[90]["gap_indicator"]
    # data age grows by exactly 1000 ms per grid step inside the gap
    assert rows[50]["data_age_ms"] - rows[49]["data_age_ms"] == 1000


def test_full_span_grid_reaches_last_tick(spark):
    """slice_s=None (the api's full-span knob) extends every symbol's grid
    to the GLOBAL last tick instead of a fixed horizon."""
    t = _trades(
        spark,
        [
            ("A", 0, 1, 100.0, 1.0, False, "sbe"),
            ("A", 10_000, 2, 101.0, 1.0, False, "sbe"),
            ("B", 5_000, 3, 50.0, 1.0, False, "sbe"),
            ("B", 250_000, 4, 51.0, 1.0, False, "sbe"),  # global last tick: 250
        ],
    )
    g = grid.locf_resample(t, step_s=1, slice_s=None)
    spans = {
        r["symbol"]: r
        for r in g.groupBy("symbol")
        .agg(F.min("tick").alias("lo"), F.max("tick").alias("hi"))
        .collect()
    }
    assert spans["A"]["lo"] == 0 and spans["A"]["hi"] == 250
    assert spans["B"]["lo"] == 5 and spans["B"]["hi"] == 250


def test_returns_zero_on_carried_prices(spark):
    t = _trades(
        spark,
        [
            ("A", 0, 1, 100.0, 1.0, False, "sbe"),
            ("A", 30_000, 2, 120.0, 1.0, False, "sbe"),
        ],
    )
    r = grid.grid_returns(
        grid.locf_resample(t, step_s=1, slice_s=60), horizons_s=(1, 5)
    )
    rows = {x["feature_ts"]: x for x in r.collect()}
    assert rows[10]["ret_1s"] == 0.0  # carried → zero return, not NULL
    assert rows[30]["ret_1s"] == pytest.approx(0.182322, abs=1e-6)
    assert rows[0]["ret_1s"] is None  # nothing 1 s before the first print


def test_labels_tail_invalid_and_leak_free(spark):
    t = _trades(
        spark,
        [("A", i * 1000, i + 1, 100.0 + i, 1.0, False, "sbe") for i in range(30)],
    )
    lab = grid.grid_labels(grid.locf_resample(t, step_s=1, slice_s=30))
    rows = {x["feature_ts"]: x for x in lab.collect()}
    # full horizon exists → valid, exact 10 s ahead target
    assert rows[5]["is_valid"] and rows[5]["target_price"] == 115.0
    # the last 10 grid seconds cannot have a full forward window
    assert not rows[25]["is_valid"]
    assert rows[29]["target_price"] is None


def test_non_divisible_horizon_rejected(spark):
    t = _trades(spark, [("A", 0, 1, 100.0, 1.0, False, "sbe")])
    g = grid.locf_resample(t, step_s=2, slice_s=10)
    with pytest.raises(ValueError, match="whole number"):
        grid.grid_returns(g, step_s=2, horizons_s=(5,))


def test_daily_grid_matches_single_window(spark):
    """locf_resample_daily (day-keyed windows + previous-close seed
    handoff — the documented multi-year scale path) must be row-for-row
    identical to the single-window form, including cross-day carries,
    entirely-empty days, and the trailing fill after the last observation."""
    d = 86_400_000  # one day in ms
    t = _trades(
        spark,
        [
            ("A", 1 * 3_600_000, 1, 100.0, 1.0, False, "sbe"),   # day 0 morning
            ("A", 20 * 3_600_000, 2, 105.0, 2.0, True, "rest"),  # day 0 evening
            ("A", 2 * d + 5_000, 3, 110.0, 1.0, False, "sbe"),   # day 2 (day 1 empty)
            ("B", 1 * d + 7_200_000, 4, 50.0, 3.0, False, "sbe"),  # day 1 only
        ],
    )
    step_s = 60
    slice_s = 5 * 86_400  # trailing fill covers days 3-4
    single = grid.locf_resample(t, step_s=step_s, slice_s=slice_s)
    daily = grid.locf_resample_daily(t, step_s=step_s, slice_s=slice_s)
    a = sorted(map(tuple, single.collect()))
    b = sorted(map(tuple, daily.collect()))
    assert len(a) == len(b)
    assert a == b
