"""Unit tests for the oracle checker's canonicalizers (tools/check_oracle.py).

The vectorized fast path must reach the SAME verdict as the reference
per-cell path on every frame pair — the 234-query A/B audit
(tools/ab_normalize.py) proves it on real query output; these tests pin
the adversarial corners that real output never exercises (separator
characters inside cells, int-vs-string equivalence, signed zero, NaN).
No SparkSession needed — both canonicalizers are pure pandas/numpy.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import (  # noqa: E402
    _fast_capable,
    normalize_frame,
    normalize_frame_fast,
)


def _verdict(norm, a, b):
    na, nb = norm(a), norm(b)
    return (na[0] == nb[0], na[1] == nb[1], na[2] == nb[2])


def test_separator_in_string_cells_cannot_shift_boundaries():
    """Without length-prefixed v-cells, ('x\\x1fv|y', 'z') and
    ('x', 'y\\x1fv|z') BOTH joined to 'v|x\\x1fv|y\\x1fv|z' — a literal
    false PASS in the correctness gate.  Both paths must say NOT equal,
    on the exact colliding pair and on the simpler separator pair."""
    a = pd.DataFrame({"x": ["x\x1fv|y"], "y": ["z"]})
    b = pd.DataFrame({"x": ["x"], "y": ["y\x1fv|z"]})
    assert _fast_capable(a) and _fast_capable(b)
    assert _verdict(normalize_frame, a, b) == (True, True, False)
    assert _verdict(normalize_frame_fast, a, b) == (True, True, False)
    c = pd.DataFrame({"x": ["a\x1fb"], "y": ["c"]})
    d = pd.DataFrame({"x": ["a"], "y": ["b\x1fc"]})
    assert _verdict(normalize_frame, c, d) == (True, True, False)
    assert _verdict(normalize_frame_fast, c, d) == (True, True, False)


def test_separator_stress_agreement_random_frames():
    """Fast and reference verdicts agree on frames whose string cells are
    built FROM the separator alphabet (\\x1f, 'v', digits, '|', 'N',
    'f') — the characters that could forge another cell's encoding."""
    rng = np.random.default_rng(7)
    alphabet = list("\x1fv|Nf01")
    frames = []
    for _ in range(12):
        n = int(rng.integers(1, 5))
        frames.append(
            pd.DataFrame(
                {
                    "s": [
                        "".join(rng.choice(alphabet, size=rng.integers(0, 6)))
                        for _ in range(n)
                    ],
                    "k": rng.integers(0, 3, size=n),
                }
            )
        )
    for a in frames:
        for b in frames:
            slow = _verdict(normalize_frame, a, b)
            fast = _verdict(normalize_frame_fast, a, b)
            assert slow == fast, (a.to_dict(), b.to_dict(), slow, fast)


def test_int_and_string_cells_stay_equivalent():
    """The reference path tags both int 5 and string '5' as ('v', '5');
    the fast path's length prefix must preserve that equivalence class
    (prefix applied to ALL v-cells, not only strings)."""
    a = pd.DataFrame({"x": [5, 7]})
    b = pd.DataFrame({"x": ["5", "7"]})
    assert _verdict(normalize_frame, a, b) == (True, True, True)
    assert _verdict(normalize_frame_fast, a, b) == (True, True, True)


def test_float_policy_corners():
    """Signed zero collapses; NaN is the null class; 6-dp rounding
    decides equality — identically on both paths."""
    a = pd.DataFrame({"x": [-0.0, float("nan"), 1.0000004]})
    b = pd.DataFrame({"x": [0.0, float("nan"), 1.0]})
    assert _verdict(normalize_frame, a, b) == (True, True, True)
    assert _verdict(normalize_frame_fast, a, b) == (True, True, True)
    c = pd.DataFrame({"x": [1.000001]})
    d = pd.DataFrame({"x": [1.0]})
    assert _verdict(normalize_frame, c, d) == (True, True, False)
    assert _verdict(normalize_frame_fast, c, d) == (True, True, False)


def test_nullable_int_nulls_match_reference():
    a = pd.DataFrame({"x": pd.array([1, None], dtype="Int64")})
    b = pd.DataFrame({"x": pd.array([None, 1], dtype="Int64")})
    assert _verdict(normalize_frame, a, b) == (True, True, True)
    assert _verdict(normalize_frame_fast, a, b) == (True, True, True)


def test_empty_frame_roundtrip():
    a = pd.DataFrame({"x": pd.Series([], dtype="float64")})
    b = pd.DataFrame({"x": pd.Series([], dtype="float64")})
    assert _verdict(normalize_frame_fast, a, b) == (True, True, True)
    assert math.isfinite(1.0)  # keep the math import honest
