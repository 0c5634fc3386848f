"""Property-based oracle equivalence (hypothesis).

The per-query oracle gate pins FIXED predicates; these properties pin
the PARAMETRIC behavior — for randomized filter bounds and group keys,
the Spark plan and the DuckDB SQL must agree exactly (same decimal
accumulation discipline as operators/_helpers.py). Catches predicate-
boundary bugs (<= vs <, double literal parsing, null handling) that a
single fixed choice can miss.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from severless_data_pipeline_aws_spark.io import Tables
from severless_data_pipeline_aws_spark.operators._helpers import (
    dsum_double,
    dsum_double_sql,
)
from tests.oracle import compare, duckdb_connect


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connect(sf_dir)
    yield c
    c.close()

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    qty=st.integers(min_value=1, max_value=50),
    dlo_pct=st.integers(min_value=0, max_value=8),
    width_pct=st.integers(min_value=0, max_value=4),
    key=st.sampled_from(["l_returnflag", "l_linestatus"]),
)
def test_filter_agg_matches_oracle(spark, sf_dir, con, qty, dlo_pct, width_pct, key):
    dlo, dhi = dlo_pct / 100.0, (dlo_pct + width_pct) / 100.0
    df = (
        Tables(spark, sf_dir)
        .lineitem.filter(
            (F.col("l_quantity") < qty)
            & (F.col("l_discount") >= dlo)
            & (F.col("l_discount") <= dhi)
        )
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum_double("l_extendedprice * (1 - l_discount)").alias("revenue"),
        )
    )
    sql = f"""
        SELECT {key}, COUNT(*) AS n,
               {dsum_double_sql("l_extendedprice * (1 - l_discount)")} AS revenue
        FROM lineitem
        WHERE l_quantity < {qty} AND l_discount >= {dlo!r} AND l_discount <= {dhi!r}
        GROUP BY {key}
    """
    assert not compare(df, con, sql)


@settings(**_SETTINGS)
@given(
    n=st.integers(min_value=1, max_value=200),
    desc=st.booleans(),
)
def test_topk_matches_oracle(spark, sf_dir, con, n, desc):
    order = F.desc("o_totalprice") if desc else F.asc("o_totalprice")
    df = (
        Tables(spark, sf_dir)
        .orders.select("o_orderkey", "o_totalprice")
        .orderBy(order, F.asc("o_orderkey"))
        .limit(n)
    )
    direction = "DESC" if desc else "ASC"
    sql = f"""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice {direction}, o_orderkey LIMIT {n}
    """
    assert not compare(df, con, sql)


@given(
    steps=st.lists(
        st.sampled_from(["view", "click", "purchase", "signup", "error"]),
        min_size=2,
        max_size=4,
    )
)
@settings(**_SETTINGS)
def test_ordered_funnel_matches_bruteforce(spark, sf_dir, steps):
    """For ANY step sequence (repeats allowed), the windowed funnel must
    equal an imperative per-user replay: counts are non-increasing down
    the funnel and exactly match the brute force."""
    from severless_data_pipeline_aws_spark.io import Tables
    from severless_data_pipeline_aws_spark.operators.funnel import ordered_funnel

    e = Tables(spark, sf_dir).events.select("user_id", "event_type", "ts")
    got = {
        r["step"]: r["n_users"] for r in ordered_funnel(e, steps).collect()
    }

    pdf = e.toPandas().sort_values(["user_id", "ts"])
    want = [0] * len(steps)
    for _, grp in pdf.groupby("user_id", sort=False):
        t_prev = None
        for i, ev in enumerate(steps):
            sel = grp[grp["event_type"] == ev]
            if t_prev is not None:
                sel = sel[sel["ts"] > t_prev]
            if sel.empty:
                break
            t_prev = sel["ts"].min()
            want[i] += 1
    assert got == {f"{i + 1}_{ev}": n for i, (ev, n) in enumerate(zip(steps, want))}
    ns = [got[f"{i + 1}_{ev}"] for i, ev in enumerate(steps)]
    assert all(a >= b for a, b in zip(ns, ns[1:]))


def test_session_gap_and_cap_equals_bruteforce(spark, sf_dir):
    """Exact replay: the applyInPandas sessionizer must equal a
    straight-line Python implementation of the gap+cap recurrence,
    and every emitted session must satisfy both invariants."""
    from severless_data_pipeline_aws_spark.io import Tables
    from severless_data_pipeline_aws_spark.operators.windows import (
        _SESS_CAP_S,
        _SESS_GAP_S,
        session_window_gap_and_cap,
    )

    got = {
        (r["user_id"], r["session_idx"]): (
            r["session_start"], r["session_end"], r["n_events"]
        )
        for r in session_window_gap_and_cap(spark, sf_dir).collect()
    }

    rows = (
        Tables(spark, sf_dir)
        .events.select("user_id", "ts", "event_id")
        .collect()
    )
    per_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        per_user.setdefault(r["user_id"], []).append(r["ts"])
    want = {}
    for uid, tss in per_user.items():
        idx, start, end, n = -1, None, None, 0
        for ts in tss:
            if (
                idx < 0
                or (ts - end).total_seconds() > _SESS_GAP_S
                or (ts - start).total_seconds() > _SESS_CAP_S
            ):
                if idx >= 0:
                    want[(uid, idx)] = (start, end, n)
                idx, start, n = idx + 1, ts, 0
            end = ts
            n += 1
        if idx >= 0:
            want[(uid, idx)] = (start, end, n)

    assert got == want
    assert any(k[1] > 0 for k in want), "fixture never splits a session — vacuous"
    for (uid, idx), (start, end, n) in want.items():
        assert (end - start).total_seconds() <= _SESS_CAP_S + _SESS_GAP_S, (
            "session span exceeds cap+gap bound"
        )
        assert n >= 1


def test_ewma_equals_sequential_replay(spark, sf_dir):
    """The distributed EWMA must be BIT-equal to a single-threaded
    recurrence replay per user, and invariant to the input partitioning
    (the groupBy shuffle must fully re-serialize each key)."""
    from severless_data_pipeline_aws_spark.io import Tables
    from severless_data_pipeline_aws_spark.operators.windows import (
        _EWMA_ALPHA,
        timeseries_ewma_smooth,
    )

    got = {
        r["event_id"]: r["ewma"]
        for r in timeseries_ewma_smooth(spark, sf_dir).collect()
    }

    rows = (
        Tables(spark, sf_dir)
        .events.filter("user_id <= 20")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    want = {}
    per_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        y = per_user.get(r["user_id"])
        y = r["value"] if y is None else _EWMA_ALPHA * r["value"] + (1 - _EWMA_ALPHA) * y
        per_user[r["user_id"]] = y
        want[r["event_id"]] = y
    assert len(got) == len(want) > 0
    assert all(got[k] == want[k] for k in want), "EWMA diverges from sequential replay"

    ev3 = (
        Tables(spark, sf_dir)
        .events.filter("user_id <= 20")
        .select("user_id", "ts", "event_id", "value")
        .repartition(3)
    )

    def _ewma(pdf):
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        pdf["ewma"] = pdf["value"].ewm(alpha=_EWMA_ALPHA, adjust=False).mean()
        return pdf[["user_id", "event_id", "ts", "value", "ewma"]]

    got3 = {
        r["event_id"]: r["ewma"]
        for r in ev3.groupBy("user_id")
        .applyInPandas(_ewma, "user_id bigint, event_id bigint, ts timestamp, value double, ewma double")
        .collect()
    }
    assert got3 == got, "EWMA output depends on input partitioning"


def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    """The two-level bitmap popcount must equal COUNT(DISTINCT) exactly
    — it is an exact algorithm, not a sketch."""
    from pyspark.sql import functions as F

    from severless_data_pipeline_aws_spark.io import Tables
    from severless_data_pipeline_aws_spark.operators.aggregates import (
        agg_bitmap_exact_distinct,
    )

    got = {
        r["event_type"]: r["n_distinct_users"]
        for r in agg_bitmap_exact_distinct(spark, sf_dir).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in Tables(spark, sf_dir)
        .events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_cusum_equals_sequential_recurrence(spark, sf_dir):
    """The window rewrite S_t = P_t - min(0, min prefix P) must equal the
    literal recurrence S_t = max(0, S_{t-1} + y_t) replayed sequentially.
    The DuckDB oracle shares the identity, so this test is the
    independent proof that the identity itself is right."""
    from severless_data_pipeline_aws_spark.io import Tables
    from severless_data_pipeline_aws_spark.registry import load_all

    got = {
        r["event_id"]: r["cusum"]
        for r in load_all()["stats_cusum_drift_detector"].fn(spark, sf_dir).collect()
    }

    rows = (
        Tables(spark, sf_dir)
        .events.select("event_type", "event_id", "ts", "value")
        .collect()
    )
    from collections import defaultdict

    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r)
    want = {}
    for rs in by_type.values():
        rs.sort(key=lambda r: (r["ts"], r["event_id"]))
        xs = [round(r["value"] * 10000) for r in rs]
        n, sx = len(xs), sum(xs)
        s = 0
        for r, x in zip(rs, xs):
            s = max(0, s + x * n - sx)
            want[r["event_id"]] = s / (float(n) * 10000.0)
    assert want and got == want
    assert any(v > 0 for v in got.values()), "vacuous: no positive excursion"


def test_skyline_dominance_property(spark, sf_dir):
    """Semantic property, independent of the oracle: no kept point is
    strictly dominated, and every dropped point is dominated by some
    kept point."""
    from severless_data_pipeline_aws_spark.io import Tables
    from severless_data_pipeline_aws_spark.registry import load_all

    kept = [
        (r["o_totalprice"], r["o_orderdate"])
        for r in load_all()["relational_pareto_skyline_2d"].fn(spark, sf_dir).collect()
    ]
    allpts = [
        (r["o_totalprice"], r["d"])
        for r in Tables(spark, sf_dir)
        .orders.selectExpr("o_totalprice", "CAST(o_orderdate AS DATE) AS d")
        .collect()
    ]
    kset = set(kept)

    def dominated(p, q):  # standard weak dominance: >= both dims, > in one
        return q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])

    assert all(not any(dominated(p, q) for q in kept if q != p) for p in kept)
    dropped = [p for p in allpts if p not in kset]
    assert all(any(dominated(p, q) for q in kept) for p in dropped)
    assert 0 < len(kept) < len(allpts)
