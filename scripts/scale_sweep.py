"""Scale sweep: prove the bucket-offset rewrites at ~sf1 (10x bench SF).

Runs every query in the single-partition-window scale gate
(``tests.test_plans._SCALABLE_WINDOW_CAPS``) plus the heaviest headline
queries against the replicated dataset from ``make_scale_data.py``,
asserting for each gated query that the plan STILL contains no
fact-grain single-partition window (cap respected + bucket-partitioned
window present) at the larger input, then timing one full noop-sink
execution.  A bucket-offset rewrite that silently fell back to a global
window would fail the cap here before it fails in production.

Prints one JSON line and records it to SCALE_SWEEP_r{N}.json; bench.py
embeds the latest recorded sweep summary in its own output.

Usage: python scripts/scale_sweep.py [DATA_DIR] [ROUND]
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from severless_data_pipeline_aws_spark import registry
from severless_data_pipeline_aws_spark.plans.inspect import (
    explain_str,
    single_partition_window_count,
)
from severless_data_pipeline_aws_spark.session import get_spark

#: heavy headline queries swept alongside the window-gated set
_HEAVY = [
    "text_ngram_novelty_score",
    "text_char_trigram_profile",
    "sampling_poisson_bootstrap",
    "dedup_decontaminate_eval_overlap",
    "text_rake_keyword_extraction",
    "tpch_q9_product_type_profit",
    "tpch_q18_large_volume_orders",
    "funnel_market_basket_lift",
    "similarity_topk_cosine_exact",
    "dedup_exact_keep_first",
    "pricing_summary",
    "funnel_cohort_retention",
    "window_cumulative_distinct",
    "anomaly_mad_robust",
]


def main() -> None:
    data_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_HERE, "localdata", "sf1x")
    rnd = sys.argv[2] if len(sys.argv) > 2 else "04"
    from tests.test_plans import _BUCKETED, _SCALABLE_WINDOW_CAPS

    spark = get_spark(app_name="scale-sweep")
    specs = registry.load_all()
    names = list(_SCALABLE_WINDOW_CAPS) + [n for n in _HEAVY if n in specs]

    timings: dict[str, float] = {}
    caps_report: dict[str, dict] = {}
    failures: list[str] = []
    for name in names:
        df = specs[name].fn(spark, data_dir)
        if name in _SCALABLE_WINDOW_CAPS:
            got = single_partition_window_count(df)
            cap = _SCALABLE_WINDOW_CAPS[name]
            bucketed = (
                "hashpartitioning(__bkt" in explain_str(df)
                or "hashpartitioning(bkt" in explain_str(df)
                if name in _BUCKETED
                else None
            )
            caps_report[name] = {"single_partition_windows": got, "cap": cap,
                                 "bucket_window_in_plan": bucketed}
            if got > cap or bucketed is False:
                failures.append(name)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        print(f"  {name}: {timings[name]}s", file=sys.stderr)

    doc = {
        "metric": "scale_sweep_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "dir": data_dir,
        "sf_equiv": "~1 (10x key-shifted replication of sf0.1)",
        "queries": timings,
        "window_caps": caps_report,
        "caps_ok": not failures,
        "failures": failures,
    }
    out = os.path.join(_HERE, f"SCALE_SWEEP_r{rnd}.json")
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc))
    spark.stop()
    if failures:
        raise SystemExit(f"scale sweep FAILED window caps: {failures}")


if __name__ == "__main__":
    main()
