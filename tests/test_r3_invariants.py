"""Round-3-continuation invariants: statistical identities and
strategy-equivalence properties the oracle hash alone can't express
(a hash proves engine agreement; these prove the MATH is in range),
plus plan audits for the new operators."""

from __future__ import annotations

import math

from severless_data_pipeline_aws_spark import plans, registry

SPECS = registry.load_all()


def _rows(name, spark, sf_dir):
    return SPECS[name].fn(spark, sf_dir).collect()


def test_kendall_tau_in_range_and_pairs_account(spark, sf_dir):
    (r,) = _rows("stats_kendall_tau_daily", spark, sf_dir)
    assert -1.0 <= r["tau_b"] <= 1.0
    # concordant + discordant never exceed the non-tied pair count
    assert r["concordant"] + r["discordant"] <= r["n_pairs"]
    assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2


def test_kruskal_h_nonnegative_and_tie_adj_larger(spark, sf_dir):
    (r,) = _rows("stats_kruskal_wallis", spark, sf_dir)
    assert r["h_stat"] >= 0.0
    # ties shrink the denominator, so the adjusted H is >= raw H; the
    # operator returns NULL tie-adjustment in the all-tied degenerate
    # case (n^3 - n <= tie sum), so guard rather than TypeError on None
    if r["h_stat_tie_adj"] is not None:
        assert r["h_stat_tie_adj"] >= r["h_stat"]
    assert r["dof"] == r["n_groups"] - 1


def test_cramers_v_in_unit_interval(spark, sf_dir):
    for r in _rows("stats_cramers_v", spark, sf_dir):
        assert 0.0 <= r["cramers_v"] <= 1.0, r
        assert r["chi2"] >= 0.0


def test_acf_in_range(spark, sf_dir):
    for r in _rows("stats_acf_multi_lag", spark, sf_dir):
        if r["acf"] is not None:
            assert -1.0 <= r["acf"] <= 1.0, r


def test_wilson_interval_brackets_rate(spark, sf_dir):
    for r in _rows("stats_wilson_conversion_intervals", spark, sf_dir):
        assert 0.0 <= r["ci_low"] <= r["rate"] <= r["ci_high"] <= 1.0, r


def test_markov_absorption_probabilities_valid(spark, sf_dir):
    for r in _rows("funnel_markov_absorbing_conversion", spark, sf_dir):
        # 12-step absorption includes the 1-step direct probability
        assert 0.0 <= r["p_step1"] <= r["p_convert_12"] <= 1.0, r


def test_markov_removal_effects_nonnegative_and_normalized(spark, sf_dir):
    rows = _rows("funnel_markov_removal_attribution", spark, sf_dir)
    for r in rows:
        # deleting paths can only lose conversion mass
        assert r["removal_effect"] >= -1e-12, r
        assert r["p_conv_removed"] <= r["p_conv_base"] + 1e-12, r
    shares = [r["attribution_share"] for r in rows if r["attribution_share"] is not None]
    if shares:
        assert math.isclose(sum(shares), 1.0, rel_tol=1e-9)


def test_novelty_fraction_valid_and_first_doc_fully_novel(spark, sf_dir):
    rows = _rows("text_ngram_novelty_score", spark, sf_dir)
    by_doc = {r["doc_id"]: r for r in rows}
    for r in rows:
        assert 0.0 <= r["novelty"] <= 1.0 and r["n_novel"] <= r["n_grams"], r
    # the lowest doc_id with grams saw an empty prior corpus
    first = by_doc[min(by_doc)]
    assert first["novelty"] == 1.0


def test_downweight_effective_size_between_distinct_and_total(spark, sf_dir):
    for r in _rows("sampling_importance_downweight_duplicates", spark, sf_dir):
        # sum of 1/k over docs is bounded by cluster count and doc count
        assert r["n_distinct_texts"] - 1e-6 <= r["n_docs"]
        assert r["n_effective"] <= r["n_docs"] + 1e-9
        assert 0.0 <= r["dup_mass"] < 1.0


def test_topk_strategies_identical_ranking(spark, sf_dir):
    """The GEMM twin and the JVM-fold strategy must agree row-for-row —
    the cross-strategy guarantee the shared oracle asserts per engine."""
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in _rows("similarity_topk_cosine_exact", spark, sf_dir)
    }
    matmul = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in _rows("similarity_topk_cosine_matmul", spark, sf_dir)
    }
    assert exact == matmul


def test_rake_and_novelty_plans_have_no_cartesian(spark, sf_dir):
    for name in (
        "text_rake_keyword_extraction",
        "text_ngram_novelty_score",
        "similarity_topk_cosine_matmul",
        "graph_link_prediction_common_neighbors",
    ):
        s = plans.explain_str(SPECS[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in s, name


def test_rake_windows_all_partitioned(spark, sf_dir):
    """The islands windows partition by doc_id — no fact-grain global
    window may appear (the VERDICT-r2 scale gate, applied to RAKE)."""
    df = SPECS["text_rake_keyword_extraction"].fn(spark, sf_dir)
    assert plans.single_partition_window_count(df) == 0


def test_kaplan_meier_survival_monotone(spark, sf_dir):
    rows = sorted(_rows("funnel_kaplan_meier_conversion", spark, sf_dir),
                  key=lambda r: r["t_days"])
    prev = 1.0
    for r in rows:
        assert 0.0 <= r["survival"] <= prev + 1e-12, r
        prev = r["survival"]
        # the at-risk count can never be smaller than that step's events
        assert r["n_at_risk"] >= r["n_deaths"] + r["n_censored"] - 1e-9


def test_nelson_aalen_cumulative_hazard_monotone(spark, sf_dir):
    rows = sorted(_rows("stats_nelson_aalen_hazard", spark, sf_dir),
                  key=lambda r: r["t_days"])
    prev = 0.0
    for r in rows:
        assert 0.0 <= r["hazard"] <= 1.0, r
        assert r["cumulative_hazard"] >= prev - 1e-12, r
        prev = r["cumulative_hazard"]
