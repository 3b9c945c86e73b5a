"""Six-row spread/markout scale block under a CONTROLLED heap (round 11,
VERDICT r10 item 3).

The r10 sf10 medians were saturation-noisy (q_twa_spread median 25.6 s vs
min 7.2 s), leaving open whether the single-sort forms hit memory pressure
before the sliced forms at high volume — which would mean the adaptive
dispatch needs a VOLUME axis, not just a skew axis.  This runner pins the
heap explicitly (SPARK_DRIVER_MEMORY, default 8g = the bench default),
runs on an otherwise-idle box, does one warmup + N measured runs per
query per scale dir, and reports median/min/max so the two statistics can
be compared under controlled conditions.

    python tools/bench_scale_block.py --dirs .scale_data/sf1,.scale_data/sf10 \
        --runs 5 --out /tmp/scale_block.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    "q_effective_spread_sliced",
    "q_twa_spread_sliced",
    "q_markout_sliced",
    "q_effective_spread",
    "q_twa_spread",
    "q_markout",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", required=True)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated query names (default: the six-row "
        "spread/markout block)",
    )
    args = ap.parse_args()
    queries = tuple(args.queries.split(",")) if args.queries else QUERIES

    import __spark_entry__ as entry
    from bitcoin_datapipeline_spark.session import get_spark
    from bitcoin_datapipeline_spark.tables import table

    spark = get_spark("scale-block")
    qs = entry.queries()
    out = {
        "metric": "spread_markout_scale_block_controlled_heap",
        "unit": "sec",
        "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count())),
        "runs_per_query": args.runs,
        "dirs": {},
    }
    for d in args.dirs.split(","):
        label = os.path.basename(d.rstrip("/"))
        table(spark, d, "events").count()  # warm footer/page cache
        block = {}
        for name in queries:
            qs[name](spark, d).count()  # un-billed codegen warmup
            secs, rows = [], 0
            for _ in range(args.runs):
                t0 = time.time()
                rows = qs[name](spark, d).count()
                secs.append(round(time.time() - t0, 3))
            block[name] = {
                "sec": round(statistics.median(secs), 3),
                "min": min(secs),
                "max": max(secs),
                "all": secs,
                "rows": rows,
            }
            print(f"[scale] {label} {name}: {block[name]}", flush=True)
        out["dirs"][label] = block
    dirs = list(out["dirs"])
    if len(dirs) == 2:
        a, b = dirs
        out["growth_median"] = {
            q: round(out["dirs"][b][q]["sec"] / out["dirs"][a][q]["sec"], 2)
            for q in queries
        }
        out["growth_min"] = {
            q: round(out["dirs"][b][q]["min"] / out["dirs"][a][q]["min"], 2)
            for q in queries
        }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out.get(k) for k in ("growth_median", "growth_min")}))


if __name__ == "__main__":
    main()
