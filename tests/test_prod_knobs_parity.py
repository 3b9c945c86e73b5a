"""Round-11 closure of ADVICE r10 finding 3: ``prod_knobs`` (Python) and the
oracle's ``knobs``/``knobs2`` CTEs are CLAIMED IEEE-identical — same formula,
same double op order, same floor(x+0.5) rounding — but nothing pinned the
parity.  A divergence at an untested corpus size (sqrt or the division
landing on a .5 boundary) would surface only as an oracle mismatch at that
specific scale factor.

These tests sweep n over 1..10^7: exhaustively through the small range,
log-spaced through the large one, plus every value adjacent to a
k-transition boundary (where ``8*sqrt(n/500)+0.5`` crosses an integer) and
a family of EXACT .5 landings for the train_mod division (``15.625·k``
divides ``n`` to x.5 exactly when 16 | k, since 15.625 = 125/8).  The SQL
expressions are lifted VERBATIM from ``similarity._PROD_KNOB_CTES`` (not
re-typed) so the test can never drift from the shipped oracle text, and a
smaller subset additionally runs the genuine two-CTE pipeline end-to-end
against a DuckDB ``embeddings`` view."""

from __future__ import annotations

import math
import re

import duckdb

from bitcoin_datapipeline_spark.operators import similarity as S


def _candidate_ns() -> list[int]:
    ns = set(range(1, 5001))  # exhaustive small range (covers k=4..25)
    x = 1.0
    while x <= 1e7:  # log-spaced through the large range
        ns.add(int(x))
        x *= 1.07
    ns.add(10**7)
    # k-transition boundaries: 8*sqrt(n/500)+0.5 crossing integer kk
    k_max = int(S.PROD_K_BASE * math.sqrt(1e7 / S.PROD_N_BASE)) + 2
    for kk in range(4, k_max):
        n = S.PROD_N_BASE * ((kk - 0.5) / S.PROD_K_BASE) ** 2
        for d in (-2, -1, 0, 1, 2):
            v = int(math.floor(n)) + d
            if 1 <= v <= 10**7:
                ns.add(v)
    # exact .5 landings of the train_mod division: n = 125*k*(2m-1)/16 is an
    # integer when 16 | k; then n/(15.625*k)+0.5 is EXACTLY integral — the
    # floor-round-half-up edge ADVICE flagged.  k=16 region: n in
    # [500*(15.5/8)^2, 500*(16.5/8)^2) ∋ 2125 = 125*17; k=32: n ∋ 8125, 8375…
    for kk in (16, 32, 48, 64, 128, 256, 512, 1024):
        lo = S.PROD_N_BASE * ((kk - 0.5) / S.PROD_K_BASE) ** 2
        hi = S.PROD_N_BASE * ((kk + 0.5) / S.PROD_K_BASE) ** 2
        m = int(lo / (15.625 * kk)) + 1
        while True:
            n = 125 * kk * (2 * m - 1) // 16
            if n > min(hi, 1e7):
                break
            if lo <= n:
                for d in (-1, 0, 1):
                    ns.add(int(n) + d)
            m += 1
    return sorted(ns)


def _lift_exprs() -> tuple[str, str]:
    """Pull the k and tm expressions verbatim out of the shipped CTE text."""
    k_expr = re.search(
        r"SELECT nall,\s*(greatest.*?)\s+AS k", S._PROD_KNOB_CTES[0], re.S
    ).group(1)
    tm_expr = re.search(
        r"SELECT nall, k,\s*(greatest.*?)\s+AS tm", S._PROD_KNOB_CTES[1], re.S
    ).group(1)
    return k_expr, tm_expr


def test_prod_knobs_matches_oracle_expressions_wide_sweep():
    ns = _candidate_ns()
    k_expr, tm_expr = _lift_exprs()
    con = duckdb.connect()
    con.execute("CREATE TABLE cand(n BIGINT)")
    con.executemany("INSERT INTO cand VALUES (?)", [(n,) for n in ns])
    rows = con.execute(
        f"""WITH base AS (SELECT n, CAST(n AS DOUBLE) AS nall FROM cand),
k1 AS (SELECT n, nall, {k_expr} AS k FROM base)
SELECT n, k, {tm_expr} AS tm FROM k1 ORDER BY n"""
    ).fetchall()
    assert len(rows) == len(ns)
    for n, k_sql, tm_sql in rows:
        k_py, tm_py = S.prod_knobs(n)
        assert (k_py, tm_py) == (k_sql, tm_sql), (
            f"knob divergence at n={n}: python {(k_py, tm_py)} "
            f"vs oracle SQL {(k_sql, tm_sql)}"
        )


def test_prod_knobs_matches_full_cte_pipeline_on_subset():
    """End-to-end form: the genuine two-CTE text over a real ``embeddings``
    relation of each size (the exact SQL the oracle embeds)."""
    subset = [1, 4, 499, 500, 501, 2124, 2125, 2126, 8125, 50_000, 10**6]
    con = duckdb.connect()
    for n in subset:
        con.execute("DROP VIEW IF EXISTS embeddings")
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM range({n})"
        )
        k_sql, tm_sql = con.execute(
            "WITH "
            + ",\n".join(S._PROD_KNOB_CTES)
            + "\nSELECT k, tm FROM knobs2"
        ).fetchone()
        assert (k_sql, tm_sql) == S.prod_knobs(n), f"n={n}"


def test_exact_half_landing_regression():
    """n=2125, k=16: 2125/(15.625·16) = 8.5 exactly — both sides must
    round half UP to tm=9 (floor(x+0.5) convention, no banker's round)."""
    k, tm = S.prod_knobs(2125)
    assert k == 16 and tm == 9
