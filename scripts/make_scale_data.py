"""Build a larger-SF dataset by key-shifted replication of sf0.1.

The driver's testdata tops out at sf0.1 (600k lineitem / 100k events),
which verifies correctness but cannot exercise the bucket-offset
rewrites at a scale where a single-partition window would actually
hurt.  This script unions K key-shifted copies of sf0.1 (default K=10
~ "sf1"): every key column (and each foreign key, consistently) shifts
by copy * stride so joins stay referentially intact, while timestamps
stay put so time windows get K-fold density — the harder case for
interval/concurrency operators.

Strides are rounded to a multiple of 2520 (LCM 1..10, also divisible
by 20) so doc_id/user_id mod-class populations (e.g. the eval slice
``doc_id % 20 == 7``) keep their proportions in every copy.
Region/nation are fixed-cardinality dimensions and copy as-is;
embedding query vectors (vec_id < 5) exist only in copy 0, so ANN
queries keep 5 queries against a K-fold corpus.

Output is written with 32-file parallelism per table (the driver's
single-row-group files serialize scans; scale data must not).

Usage: python scripts/make_scale_data.py [K] [OUT_DIR]
       defaults: K=10, OUT_DIR=localdata/sf1x (gitignored)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from severless_data_pipeline_aws_spark.io import TABLES, load_table
from severless_data_pipeline_aws_spark.session import get_spark

SRC = "/root/testdata/sf0.1"

#: key columns shifted per copy, per table (FKs shift by the OWNING
#: table's stride so referential integrity survives replication)
_OWN_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": [],  # keyed by (l_orderkey, l_linenumber); shifts via FKs
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_FOREIGN = {
    "orders": {"o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
}


def _stride(max_key: int) -> int:
    return int(math.ceil((max_key + 1) / 2520.0)) * 2520


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "localdata", "sf1x"
    )
    # optional table subset (r10: the dedup probe replicates ONLY the
    # documents corpus 30x — replicating 18M lineitem rows for a
    # documents-only probe would be wasted minutes per round)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    spark = get_spark(app_name="make-scale-data")
    os.makedirs(out_dir, exist_ok=True)

    strides: dict[str, int] = {}
    for name in _OWN_KEYS:
        if only is not None and name not in only:
            continue
        df = load_table(spark, SRC, name)
        keys = _OWN_KEYS[name] or []
        mx = 0
        for key in keys:
            mx = max(mx, df.agg(F.max(key)).collect()[0][0])
        strides[name] = _stride(mx) if keys else 0

    for name in TABLES:
        if only is not None and name not in only:
            continue
        df = load_table(spark, SRC, name)
        if name in ("region", "nation"):
            out = df
        else:
            copies = []
            for c in range(k):
                cp = df
                for key in _OWN_KEYS.get(name, []):
                    cp = cp.withColumn(key, (F.col(key) + c * strides[name]).cast("long"))
                for fk, owner in _FOREIGN.get(name, {}).items():
                    cp = cp.withColumn(fk, (F.col(fk) + c * strides[owner]).cast("long"))
                copies.append(cp)
            out = copies[0]
            for cp in copies[1:]:
                out = out.unionByName(cp)
        target = os.path.join(out_dir, f"{name}.parquet")
        n_files = 1 if name in ("region", "nation") else 32
        out.repartition(n_files).write.mode("overwrite").parquet(target)
        print(f"{name}: {spark.read.parquet(target).count()} rows -> {target}")
    spark.stop()


if __name__ == "__main__":
    main()
