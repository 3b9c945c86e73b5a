"""Interleaved same-host A/B of the headline bench across two git trees
(round 11, VERDICT r10 item 1).

The r10 sidecar showed 122.2 s vs r9's 100.3 s (+22 %), adjudicated
environmental on circumstantial evidence (uniform per-query drift on
untouched, budget-asserted queries).  This script produces the missing
direct evidence: it runs `python bench.py` ALTERNATELY in two worktrees
(r9 tree / r10 tree), N rounds each, in one host session — same box, same
hour, same JVM settings — and reports per-tree medians plus the per-query
delta restricted to the queries both trees share.

    python tools/ab_headline.py --a /tmp/ab_r9 --b /tmp/ab_r10 \
        --label-a r9_0560b58 --label-b r10_19ab1af --rounds 3 \
        --out /tmp/ab/AB_HEADLINE.json

If the r9/r10 delta tracks the HOST (both trees land in the same band
today), the environmental claim is proven; if it tracks the TREE, the
five r10 code commits get bisected.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def run_once(tree: str, env: dict) -> dict:
    t0 = time.time()
    subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    wall = time.time() - t0
    with open(os.path.join(tree, "BENCH_LOCAL_LATEST.json")) as f:
        payload = json.load(f)
    payload["wall_sec"] = round(wall, 1)
    return payload


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True)
    ap.add_argument("--b", required=True)
    ap.add_argument("--label-a", default="a")
    ap.add_argument("--label-b", default="b")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")

    runs = {args.label_a: [], args.label_b: []}
    order = []
    for i in range(args.rounds):
        for label, tree in (
            (args.label_a, args.a),
            (args.label_b, args.b),
        ):
            r = run_once(tree, env)
            runs[label].append(r)
            order.append({"label": label, "total": r["value"]})
            print(
                f"[ab] round {i + 1} {label}: total={r['value']}s "
                f"(wall {r['wall_sec']}s)",
                flush=True,
            )

    def totals(label):
        return [r["value"] for r in runs[label]]

    common = set(runs[args.label_a][0]["queries"]) & set(
        runs[args.label_b][0]["queries"]
    )

    def per_query_median(label):
        out = {}
        for q in common:
            out[q] = statistics.median(
                r["queries"][q] for r in runs[label]
            )
        return out

    pa, pb = per_query_median(args.label_a), per_query_median(args.label_b)
    deltas = sorted(
        ((q, round(pb[q] - pa[q], 3), round(pb[q] / pa[q], 3)) for q in common),
        key=lambda t: -abs(t[1]),
    )
    result = {
        "metric": "headline_ab_interleaved",
        "host_session": "single, alternating tree order, same env",
        "sf_dir": env["SPARK_GRAFT_SF_DIR"],
        "rounds_per_tree": args.rounds,
        "run_order_totals": order,
        args.label_a: {
            "totals": totals(args.label_a),
            "median_total": round(statistics.median(totals(args.label_a)), 2),
            "common_query_sum": round(sum(pa.values()), 2),
        },
        args.label_b: {
            "totals": totals(args.label_b),
            "median_total": round(statistics.median(totals(args.label_b)), 2),
            "common_query_sum": round(sum(pb.values()), 2),
        },
        "n_common_queries": len(common),
        "worst_10_b_minus_a": deltas[:10],
        "best_10_b_minus_a": deltas[-10:][::-1],
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in (
        args.label_a, args.label_b, "n_common_queries")}))


if __name__ == "__main__":
    main()
