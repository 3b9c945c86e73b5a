"""Execute a query and print its AQE-final executed plan + stage stats.

The static `explain` shows the initial plan; ReusedExchange decisions and
AQE coalescing only appear in the executed plan.  Usage::

    python tools/executed_plan.py q_minhash_lsh [more ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from bitcoin_datapipeline_spark.session import get_spark

    spark = get_spark("executed-plan")
    qs = entry.queries()
    for name in sys.argv[1:]:
        df = qs[name](spark, sf_dir)
        df.collect()  # finalize THIS DataFrame's AQE plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        out = f"/tmp/executed_{name}.txt"
        with open(out, "w") as f:
            f.write(plan)
        n_sh = plan.count("ShuffleQueryStage")
        n_re = plan.count("ReusedExchange") + plan.count("ReusedQueryStage")
        n_scan = plan.count("Scan parquet")
        print(f"{name}: shuffle_stages={n_sh} reused={n_re} "
              f"parquet_scans={n_scan} -> {out}")


if __name__ == "__main__":
    main()
