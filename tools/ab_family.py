"""Interleaved same-host A/B of a QUERY FAMILY across two git trees.

The host drifts ±40 % between phases (r11: BENCH_AB_r11.json), so every
optimization decision is made from alternating-arm runs in ONE host
session, never cross-session absolutes.  This is the family-sized
variant of tools/ab_headline.py: instead of the full 124-query bench
(~10 min/run) each arm times only the named queries (median-of-3 after
one warm-up, bench._median3 methodology) in a fresh subprocess session.

    python tools/ab_family.py --a /tmp/ab_old --b . \
        --queries q_markout,q_realized_spread,q_markout_sliced \
        --rounds 3 --out plans/r12/AB_MARKOUT_FAMILY.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

_RUNNER = r"""
import json, os, sys
sys.path.insert(0, os.getcwd())
import __spark_entry__ as entry
import bench
from bitcoin_datapipeline_spark.session import get_spark
from bitcoin_datapipeline_spark.tables import table

names = json.loads(os.environ["AB_QUERIES"])
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-family")
table(spark, sf, "events").count()  # warm footers/codegen
qs = entry.queries()
out = {}
for n in names:
    m = bench._median3(lambda: qs[n](spark, sf).count())
    out[n] = m
print("ABRESULT " + json.dumps(out))
"""


def run_once(tree: str, queries: list[str], env: dict) -> dict:
    env = dict(env)
    env["AB_QUERIES"] = json.dumps(queries)
    p = subprocess.run(
        [sys.executable, "-c", _RUNNER],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(f"no ABRESULT line from {tree}:\n{p.stdout[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="baseline tree")
    ap.add_argument("--b", required=True, help="candidate tree")
    ap.add_argument("--label-a", default="a")
    ap.add_argument("--label-b", default="b")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    queries = [q.strip() for q in args.queries.split(",") if q.strip()]

    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")

    runs: dict[str, list[dict]] = {args.label_a: [], args.label_b: []}
    for i in range(args.rounds):
        for label, tree in ((args.label_a, args.a), (args.label_b, args.b)):
            r = run_once(tree, queries, env)
            runs[label].append(r)
            tot = round(sum(v["sec"] for v in r.values()), 2)
            print(f"[ab] round {i + 1} {label}: family_total={tot}s", flush=True)

    def stat(label, q, key):
        return [r[q][key] for r in runs[label]]

    table = {}
    for q in queries:
        amin = min(stat(args.label_a, q, "min"))
        bmin = min(stat(args.label_b, q, "min"))
        amed = statistics.median(stat(args.label_a, q, "sec"))
        bmed = statistics.median(stat(args.label_b, q, "sec"))
        table[q] = {
            f"{args.label_a}_min": amin,
            f"{args.label_b}_min": bmin,
            "delta_min_pct": round((bmin / amin - 1) * 100, 1) if amin else None,
            f"{args.label_a}_median": round(amed, 3),
            f"{args.label_b}_median": round(bmed, 3),
            "delta_median_pct": round((bmed / amed - 1) * 100, 1) if amed else None,
        }
    result = {
        "metric": "family_ab_interleaved",
        "host_session": "single, alternating tree order, same env",
        "sf_dir": env["SPARK_GRAFT_SF_DIR"],
        "rounds_per_tree": args.rounds,
        "stat": "per-round median_of_3 after warm-up; min/median over rounds",
        "queries": table,
        "raw": runs,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
