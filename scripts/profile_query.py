"""Phase profile for named queries: where does the wall time go?

For each query: time (a) fn() construction (eager side-actions included),
(b) physical planning (explain), (c) noop execution x reps. Also prints
plan-shape stats: Exchange count, join strategies, Python eval nodes.

Usage: python scripts/profile_query.py [--reps 3] q1 q2 ...
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from severless_data_pipeline_aws_spark import registry  # noqa: E402
from severless_data_pipeline_aws_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-query")
    specs = registry.load_all()
    # warm the JVM once
    specs["flagship_revenue_by_status_year"].fn(spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    for name in args:
        spark.sparkContext.setJobDescription(f"profile: {name}")
        t0 = time.perf_counter()
        df = specs[name].fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        t_plan = time.perf_counter() - t0
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        # fresh-build repeat (what bench actually times per rep)
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        t_full = time.perf_counter() - t0
        spark.catalog.clearCache()
        stats = {
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "smj": len(re.findall(r"SortMergeJoin", plan)),
            "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
            "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", plan)),
            "py": len(re.findall(r"EvalPython|MapInPandas|FlatMapGroupsInPandas|MapInArrow", plan)),
            "window": len(re.findall(r"\bWindow\b", plan)),
            "plan_lines": plan.count("\n"),
        }
        print(
            json.dumps(
                {
                    "query": name,
                    "build_s": round(t_build, 3),
                    "plan_s": round(t_plan, 3),
                    "exec_s": runs,
                    "exec_min": min(runs),
                    "fullrep_s": round(t_full, 3),
                    **stats,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
