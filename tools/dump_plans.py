"""Dump ``explain("formatted")`` for headline queries to plans/<tag>/.

Usage::

    python tools/dump_plans.py <tag> [query ...]   # default: all HEADLINE

Writes ``plans/<tag>/<query>_<suffix>.txt`` (suffix via $PLAN_SUFFIX,
default ``before``) plus a one-line-per-query summary of Exchange counts
to stdout.  Plans are captured at the bench scale ($SPARK_GRAFT_SF_DIR)
so PushedFilters/ReadSchema match what the bench executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit("usage: dump_plans.py <tag> [query ...]")
    tag = sys.argv[1]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    import bench
    from bitcoin_datapipeline_spark.session import get_spark

    names = sys.argv[2:] or bench.HEADLINE
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark("dump-plans")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = (
            plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning")
            + plan.count("Exchange SinglePartition")
        )
        print(
            f"{name}: exchanges={n_ex} reused={plan.count('ReusedExchange')} "
            f"bytes={len(plan)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
