"""Similarity search over the ``embeddings`` table (SURVEY §2.9 X3/X5).

Embeddings are ``array<float>`` columns (the X5 typed-column story: the
vector is data, not a UDT). All math runs in DOUBLE with *sequential*
folds (``F.aggregate``) so results are bit-identical to the DuckDB
oracle's ``list_dot_product`` — verified empirically, which is what
makes the exact top-k query hash-checkable including its scores.

Two tiers:
* **exact brute-force top-k** — broadcast the (small) query set against
  all candidates, score per-row, per-query ``row_number`` keeps k.
  At 100 TB of vectors this is one scan + one shuffle of (q × k) rows.
* **LSH-bucketed ANN** — random-hyperplane signatures over L tables;
  candidates come from bucket equi-joins only, then exact re-scoring.
  The scale path: scoring cost drops from |Q|·|C| to |Q|·bucket size·L,
  and every join is an equi-join Catalyst can shuffle-partition.

No Python UDFs anywhere — higher-order functions keep the fold inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import Tables
from ..registry import register

_TOP_K = 10
_N_QUERIES = 5  # vec_id < 5 are the query vectors

#: LSH parameters: 8 hash tables × 4 hyperplanes = 16 buckets per table.
#: The fixture's clusters are noisy (mean own-centroid cosine ~0.14), so
#: recall needs many short signatures rather than few long ones:
#: P(candidate) = 1-(1-p^4)^8 ≈ 0.83 at pair-cosine 0.5.
_LSH_TABLES = 8
_LSH_PLANES = 4


def _dot(a, b):
    """Sequential double-precision dot product (order-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _as_double(col):
    return F.col(col).cast("array<double>")


@register(
    "similarity_embedding_norms",
    oracle="""
        SELECT vec_id, label,
               sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS l2_norm
        FROM embeddings WHERE vec_id < 200
    """,
    doc="X5: vector column plumbing — per-row L2 norm in double (bit-identical fold).",
    tags=("similarity", "llm"),
)
def similarity_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    v = _as_double("embedding")
    return t.embeddings.filter(F.col("vec_id") < 200).select(
        "vec_id", "label", F.sqrt(_dot(v, v)).alias("l2_norm")
    )


@register(
    "similarity_topk_cosine_exact",
    oracle=f"""
        WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < {_N_QUERIES}),
        c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings WHERE vec_id >= {_N_QUERIES}),
        scored AS (
            SELECT qid, cid,
                   list_dot_product(qv, cv) /
                   (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
            FROM q CROSS JOIN c
        ),
        ranked AS (
            SELECT qid, cid, cosine,
                   row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
            FROM scored
        )
        SELECT qid AS query_id, cid AS neighbor_id, cosine, rank
        FROM ranked WHERE rank <= {_TOP_K}
    """,
    doc=(
        "X3 (exact tier): brute-force top-k cosine — broadcast query "
        "vectors, double-precision sequential fold per pair, per-query "
        "row_number keeps k. Scores are hash-verified against DuckDB "
        "(identical IEEE fold order)."
    ),
    tags=("similarity", "llm", "topk"),
)
def similarity_topk_cosine_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    emb = t.embeddings
    # norms are precomputed per side BEFORE the cross join: the query norm
    # would otherwise be re-folded for every one of |C| candidate rows
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        _as_double("embedding").alias("qv"),
    ).withColumn("qnorm", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    c = emb.filter(F.col("vec_id") >= _N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double("embedding").alias("cv"),
    ).withColumn("cnorm", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm"))).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(spark: SparkSession, dim: int) -> DataFrame:
    """Deterministic random hyperplanes as a small broadcastable table."""
    import numpy as np

    rng = np.random.default_rng(42)
    planes = rng.standard_normal((_LSH_TABLES, _LSH_PLANES, dim))
    rows = [
        (t, p, [float(x) for x in planes[t, p]])
        for t in range(_LSH_TABLES)
        for p in range(_LSH_PLANES)
    ]
    return spark.createDataFrame(rows, "table_id int, plane_id int, plane array<double>")


def lsh_buckets(spark: SparkSession, emb: DataFrame, dim: int = 64) -> DataFrame:
    """(vec_id, table_id, bucket): sign-bit signature per hash table.

    One broadcast join against L×P tiny plane rows + one groupBy — both
    scale-safe (the groupBy key count is |vectors|·L).
    """
    planes = _hyperplanes(spark, dim)
    signs = emb.select("vec_id", _as_double("embedding").alias("v")).crossJoin(
        F.broadcast(planes)
    )
    return (
        signs.select(
            "vec_id",
            "table_id",
            F.when(_dot(F.col("v"), F.col("plane")) > 0, F.expr("shiftleft(1L, plane_id)"))
            .otherwise(F.lit(0).cast("long"))
            .alias("bit"),
        )
        .groupBy("vec_id", "table_id")
        .agg(F.sum("bit").alias("bucket"))
    )


@register(
    "similarity_ann_lsh",
    oracle=None,  # approximate by construction; recall vs exact checked in pytest
    doc=(
        "X3 (scale tier): LSH-bucketed approximate nearest neighbors. "
        "Random-hyperplane signatures over 4 tables × 8 planes; candidates "
        "= union of same-bucket vectors across tables (equi-join, no cross "
        "join), then exact cosine re-scoring and per-query top-k. Recall "
        "vs similarity_topk_cosine_exact asserted in pytest."
    ),
    tags=("similarity", "llm", "lsh", "ann"),
)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    emb = t.embeddings
    buckets = lsh_buckets(spark, emb)

    qb = buckets.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "table_id", "bucket"
    )
    cb = buckets.filter(F.col("vec_id") >= _N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), "table_id", "bucket"
    )
    candidates = qb.join(cb, ["table_id", "bucket"]).select("query_id", "neighbor_id").distinct()

    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qv")
    ).withColumn("qnorm", F.sqrt(_dot(F.col("qv"), F.col("qv"))))
    c = emb.filter(F.col("vec_id") >= _N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), _as_double("embedding").alias("cv")
    ).withColumn("cnorm", F.sqrt(_dot(F.col("cv"), F.col("cv"))))
    scored = (
        candidates.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qnorm") * F.col("cnorm"))).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


@register(
    "similarity_label_centroid_agreement",
    oracle=None,  # aggregates computed doubles; asserted as invariants in pytest
    doc=(
        "Ground-truth sanity: each vector's cosine to its own label "
        "centroid vs the global centroid. Centroids via per-dimension "
        "posexplode + avg (one shuffle on (label, dim)) — the scalable "
        "dense-centroid pattern. pytest asserts own-label similarity wins "
        "on average (labels are the generator's 10 clusters)."
    ),
    tags=("similarity", "llm"),
)
def similarity_label_centroid_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select("vec_id", "label", _as_double("embedding").alias("v"))

    dims = emb.select("label", F.posexplode("v").alias("dim", "x"))
    centroids = (
        dims.groupBy("label", "dim")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cx"))).alias("pairs"))
        .select("label", F.expr("transform(pairs, p -> p.cx)").alias("centroid"))
    )
    joined = emb.join(F.broadcast(centroids), "label")
    return joined.select(
        "vec_id",
        "label",
        (
            _dot(F.col("v"), F.col("centroid"))
            / (
                F.sqrt(_dot(F.col("v"), F.col("v")))
                * F.sqrt(_dot(F.col("centroid"), F.col("centroid")))
            )
        ).alias("cosine_to_own_centroid"),
    )
