"""Round-4-continuation invariants: mathematical identities the oracle
hash alone can't express for the new r4 operators, plus plan audits."""

from __future__ import annotations

from severless_data_pipeline_aws_spark import plans, registry

SPECS = registry.load_all()


def _rows(name, spark, sf_dir):
    return SPECS[name].fn(spark, sf_dir).collect()


def test_shapley_efficiency_property(spark, sf_dir):
    """Sum of Shapley credits == v(N) - v(empty): total conversions
    minus conversions with no pre-purchase touches (the game's
    efficiency axiom — a direct check the per-channel hash can't see)."""
    from pyspark.sql import functions as F

    from severless_data_pipeline_aws_spark.io import Tables

    rows = _rows("funnel_shapley_attribution", spark, sf_dir)
    assert len(rows) == 4
    total_credit = sum(r["shapley_conversions"] for r in rows)

    t = Tables(spark, sf_dir)
    ev = t.events
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id")).alias("fp"))
    )
    n_converted = fp.count()
    # v(empty) = converted users with zero pre-purchase non-purchase touches
    fp_cols = fp.select(
        "user_id",
        F.col("fp.ts").alias("fp_ts"),
        F.col("fp.event_id").alias("fp_id"),
    )
    touched = (
        ev.filter(F.col("event_type") != "purchase")
        .join(fp_cols, "user_id")
        .filter(
            (F.col("ts") < F.col("fp_ts"))
            | ((F.col("ts") == F.col("fp_ts")) & (F.col("event_id") < F.col("fp_id")))
        )
        .select("user_id")
        .distinct()
        .count()
    )
    v_empty = n_converted - touched
    assert abs(total_credit - (n_converted - v_empty)) < 1e-6


def test_shapley_plan_broadcasts_lookup(spark, sf_dir):
    df = SPECS["funnel_shapley_attribution"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_wav_features_bounds(spark, sf_dir):
    """Decoded PCM invariants: peak <= 32768, energy <= n * peak^2,
    zero-crossings < n, and every clip round-trips."""
    for r in _rows("multimodal_wav_pcm_features", spark, sf_dir):
        assert r["wav_valid"] is True
        assert 0 <= r["peak_abs"] <= 32768
        assert r["energy"] <= r["n_samples"] * r["peak_abs"] ** 2
        assert 0 <= r["zero_crossings"] < r["n_samples"]


def test_wav_decoder_rejects_malformed():
    """The WAV parse is a decoder, not a header sniffer: corrupt magic,
    truncated data, and non-PCM formats must all raise."""
    import struct

    import pytest

    from severless_data_pipeline_aws_spark.operators.multimodal import (
        _wav_header,
        wav_decode,
    )

    good = _wav_header(4) + struct.pack("<4h", 1, -2, 3, -4)
    assert list(wav_decode(good)) == [1, -2, 3, -4]
    with pytest.raises(ValueError):
        wav_decode(b"RIFX" + good[4:])
    with pytest.raises(ValueError):
        wav_decode(good[:-2])  # truncated data chunk
    bad_fmt = bytearray(good)
    bad_fmt[20] = 3  # audio_format = IEEE float
    with pytest.raises(ValueError):
        wav_decode(bytes(bad_fmt))


def test_geo_nearest_plan_broadcasts_service_table(spark, sf_dir):
    """The candidate join must be a broadcast hash equi-join on the
    cell key — never a cartesian/BNLJ against the hub table."""
    df = SPECS["geo_nearest_hub_grid"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_geo_nearest_partitions_all_points(spark, sf_dir):
    """Every event is assigned to exactly one hub: per-hub counts sum
    to the full event count."""
    from severless_data_pipeline_aws_spark.io import Tables

    rows = _rows("geo_nearest_hub_grid", spark, sf_dir)
    n_events = Tables(spark, sf_dir).events.count()
    assert sum(r["n_points"] for r in rows) == n_events
    assert all(r["min_d2"] <= r["max_d2"] for r in rows)


def test_brown_forsythe_nonnegative_and_decomposition(spark, sf_dir):
    """W >= 0 and both sums of squares are nonnegative (the z-variable
    ANOVA identity the single-row hash can't independently confirm)."""
    (r,) = _rows("stats_brown_forsythe_levene", spark, sf_dir)
    assert r["w_stat"] >= 0.0
    assert r["ss_between"] >= 0.0 and r["ss_within"] >= 0.0
    assert r["k"] == 5 and r["n_total"] > 0


def test_window_funnel_partitions_users_and_nests_in_unwindowed(spark, sf_dir):
    """Levels partition the user base, and the 3-day windowed level-3
    count can never exceed the unwindowed ordered-funnel completions."""
    from severless_data_pipeline_aws_spark.io import Tables

    rows = {r["level"]: r["n_users"] for r in _rows("funnel_window_funnel_levels", spark, sf_dir)}
    n_users = Tables(spark, sf_dir).events.select("user_id").distinct().count()
    assert sum(rows.values()) == n_users
    assert all(0 <= lv <= 3 for lv in rows)
    unwindowed = {
        r["step"]: r["n_users"] for r in _rows("funnel_conversion_ordered", spark, sf_dir)
    }
    assert rows.get(3, 0) <= unwindowed["3_purchase"]


def test_jackknife_se_positive_and_mean_near_theta(spark, sf_dir):
    """jk_se > 0 on real data, and the leave-one-out mean stays close
    to the full-sample ratio (day contributions are ~1/n each)."""
    (r,) = _rows("stats_jackknife_ratio_se", spark, sf_dir)
    assert r["jk_se"] > 0.0
    assert r["n_days"] >= 28
    assert abs(r["theta_loo_mean"] - r["theta_all"]) < 0.05 * abs(r["theta_all"])


def test_sax_words_well_formed(spark, sf_dir):
    """Every SAX word uses only the alphabet, has one symbol per
    segment, and segments tile the observed days in 5-day blocks."""
    for r in _rows("timeseries_sax_symbolic", spark, sf_dir):
        assert len(r["sax_word"]) == r["n_segments"]
        assert set(r["sax_word"]) <= set("abcd")
        assert r["n_segments"] == -(-r["n_days"] // 5)  # ceil


def test_pps_systematic_draw_count_and_weighting(spark, sf_dir):
    """Total PPS multiplicity equals the configured draw count, and
    every drawn doc's interval genuinely straddles a stride threshold
    (n_hits is bounded by ceil(size/stride) + 1)."""
    rows = _rows("sampling_pps_systematic", spark, sf_dir)
    from severless_data_pipeline_aws_spark.operators.sampling import _PPS_K

    assert sum(r["n_hits"] for r in rows) == _PPS_K
    assert all(r["n_hits"] >= 1 for r in rows)
