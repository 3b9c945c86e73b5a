"""Per-query cost breakdown: construction vs planning vs execution.

For each named headline query, time separately
  (a) DataFrame construction  — ``fn(spark, sf_dir)`` (py4j + analysis)
  (b) physical planning       — ``explainString`` on the built frame
  (c) first count()           — execution incl. AQE re-planning rounds
  (d) second count()          — re-execution on the SAME frame (no (a)/(b))

This splits the driver-side Python/Catalyst overhead from the executed
cost so optimization effort goes where the time actually is (guide §1.1:
empirical loop).  Usage::

    python tools/profile_breakdown.py [query ...]    # default: top headline
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "q_doc_minhash_calibration",
    "q_gold_feature_screen",
    "q_embed_ann_ivfpq_prod",
    "q_markout_sliced",
    "q_realized_spread",
    "q_markout",
    "q_gold_label_balance",
    "q_doc_source_overlap",
    "q_doc_split_leakage",
    "q_leadlag_xcorr",
    "q_minhash_lsh",
    "q_doc_jaccard_hist",
    "q_gold_vector_2s",
    "q_effective_spread",
    "q_effective_spread_sliced",
    "q_atr",
    "q_realized_beta",
    "q_rsi",
    "q_acf",
    "q_bars_1m",
    "q_top_customers",
    "q_twa_spread_sliced",
    "q_semdedup",
    "q_embed_semdedup_calibration",
    "q_var_es",
]


def main() -> None:
    import bench
    names = sys.argv[1:] or DEFAULT
    if names == ["--all"]:
        names = bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from bitcoin_datapipeline_spark.session import get_spark
    from bitcoin_datapipeline_spark.tables import table

    spark = get_spark("profile-breakdown")
    qs = entry.queries()
    table(spark, sf_dir, "events").count()  # warm footers / JVM
    table(spark, sf_dir, "lineitem").count()

    out = {}
    for name in names:
        fn = qs[name]
        # warm-up pass (codegen etc.) — same discipline as bench.py
        fn(spark, sf_dir).count()

        t0 = time.time()
        df = fn(spark, sf_dir)
        t_construct = time.time() - t0

        t0 = time.time()
        df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        t_plan = time.time() - t0

        t0 = time.time()
        df.count()
        t_exec1 = time.time() - t0

        t0 = time.time()
        df.count()
        t_exec2 = time.time() - t0

        out[name] = {
            "construct": round(t_construct, 3),
            "plan": round(t_plan, 3),
            "exec_first": round(t_exec1, 3),
            "exec_again": round(t_exec2, 3),
            "total_bench_shape": round(t_construct + t_exec1, 3),
        }
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"metric": "profile_breakdown", "queries": out}))


if __name__ == "__main__":
    main()
