"""A/B equivalence audit for check_oracle's two canonicalizers.

Runs every query + oracle at the given SF, feeds BOTH result frames to
the reference per-cell `normalize_frame` AND (when eligible) the
vectorized `normalize_frame_fast`, and asserts the two paths reach the
SAME verdict (row-count / column-set / row-multiset equality booleans).
The fast path is only trusted because this audit passes — re-run it
after touching either canonicalizer.

Usage:  python tools/ab_normalize.py [--sf /root/testdata/sf0.01] [--only a,b]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import (  # noqa: E402
    _fast_capable,
    connect_oracle,
    normalize_frame,
    normalize_frame_fast,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from bitcoin_datapipeline_spark.session import get_spark

    spark = get_spark("ab_normalize")
    con = connect_oracle(args.sf)

    qs = entry.queries()
    oracles = entry.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    n_agree = n_disagree = n_fallback = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        t0 = time.time()
        sdf = fn(spark, args.sf).toPandas()
        ddf = con.sql(oracles[name]).df()
        # eligibility BEFORE the expensive reference canonicalization —
        # fallback queries never use the slow verdict
        if not (_fast_capable(sdf) and _fast_capable(ddf)):
            n_fallback += 1
            print(f"fallback {name}: fast path ineligible "
                  f"({time.time() - t0:.1f}s)")
            continue
        sn, dn = normalize_frame(sdf), normalize_frame(ddf)
        slow = (sn[0] == dn[0], sn[1] == dn[1], sn[2] == dn[2])
        sf_, df_ = normalize_frame_fast(sdf), normalize_frame_fast(ddf)
        fast = (sf_[0] == df_[0], sf_[1] == df_[1], sf_[2] == df_[2])
        if slow == fast:
            n_agree += 1
            print(f"agree {name}: verdict={all(slow)} "
                  f"({time.time() - t0:.1f}s)")
        else:
            n_disagree += 1
            print(f"DISAGREE {name}: slow={slow} fast={fast}")
    print(f"\n{n_agree} agree, {n_disagree} disagree, "
          f"{n_fallback} reference-only")
    return 1 if n_disagree else 0


if __name__ == "__main__":
    sys.exit(main())
