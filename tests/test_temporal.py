"""Temporal operators: sessionize / asof_join / bucketed_range_join.

Oracles: pandas.merge_asof (whose backward/forward/allow_exact/tolerance
semantics asof_join deliberately matches) and brute-force double loops.
Plan shape: the asof path must be ONE Exchange by key (union+window),
and the range join must NOT plan a BroadcastNestedLoop/Cartesian.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.temporal import (
    US,
    asof_join,
    bucketed_range_join,
    session_stats,
    sessionize,
    ts_micros,
)


def _ts(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def events(spark):
    rng = np.random.default_rng(7)
    n = 800
    rows = [
        (
            i,
            _ts(float(rng.integers(0, 40_000))),
            int(rng.integers(0, 12)),
            str(rng.choice(["click", "error", "view"])),
            float(i) / 8.0,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double")


# ---------------------------------------------------------------------------
# ts_micros
# ---------------------------------------------------------------------------


def test_ts_micros_ntz_is_timezone_independent(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    # one winter and one summer value: a DST session zone must not leak
    # into either (the offsets differ, so a session-TZ cast would skew
    # the two rows by different amounts)
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0, 7, 179575),),
         (dt.datetime(2024, 7, 1, 12, 0, 0),)], "ts timestamp_ntz")
    want = {1_704_067_207_179_575, 1_719_835_200_000_000}
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo",
                   "Australia/Lord_Howe"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = {r.us for r in
                   df.select(ts_micros(df, "ts").alias("us")).collect()}
            assert got == want, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_ts_micros_long_passthrough_and_bad_type(spark):
    df = spark.createDataFrame([(123,)], "t long")
    assert df.select(ts_micros(df, "t").alias("u")).collect()[0].u == 123
    sdf = spark.createDataFrame([("x",)], "t string")
    with pytest.raises(TypeError, match="unsupported"):
        ts_micros(sdf, "t")


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------


def test_sessionize_gap_rule_and_null_drop(spark):
    # gaps: 10s (same), exactly 30s (SAME — strictly-greater rule), 31s (new)
    rows = [
        (1, "a", _ts(0)), (2, "a", _ts(10)), (3, "a", _ts(40)),
        (4, "a", _ts(71)), (5, "b", _ts(0)), (6, None, _ts(5)),
        (7, "b", None),
    ]
    df = spark.createDataFrame(rows, "event_id long, k string, ts timestamp_ntz")
    out = sessionize(df, "k", "ts", 30.0, order_cols=("event_id",))
    got = {r.event_id: r.session_idx for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}


def test_sessionize_matches_pandas_recomputation(spark, events):
    gap = 3000.0
    out = sessionize(events, "user_id", "ts", gap,
                     order_cols=("event_id",)).toPandas()
    pdf = events.toPandas().sort_values(["user_id", "ts", "event_id"])
    expect = {}
    for uid, g in pdf.groupby("user_id"):
        idx = 0
        prev = None
        for _, r in g.iterrows():
            if prev is None or (r.ts - prev).total_seconds() > gap:
                idx += 1
            expect[r.event_id] = idx
            prev = r.ts
    got = dict(zip(out.event_id, out.session_idx))
    assert got == expect


def test_session_stats_shapes_and_durations(spark, events):
    st = session_stats(events, "user_id", "ts", 3000.0,
                       order_cols=("event_id",))
    pdf = st.toPandas()
    assert (pdf.duration_us == pdf.end_us - pdf.start_us).all()
    assert (pdf.n_events >= 1).all()
    assert int(pdf.n_events.sum()) == events.count()
    # single-event sessions have zero duration
    assert (pdf.loc[pdf.n_events == 1, "duration_us"] == 0).all()


def test_sessionize_reserved_collision_and_bad_gap(spark, events):
    with pytest.raises(ValueError, match="gap_seconds"):
        sessionize(events, "user_id", "ts", 0.0)
    bad = events.withColumn("session_idx", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        sessionize(bad, "user_id", "ts", 10.0)


def test_sessionize_single_exchange(spark, events):
    plan = sessionize(events, "user_id", "ts", 3000.0,
                      order_cols=("event_id",))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------


def _asof_oracle(left, right, direction, allow_exact, tol):
    lo = left.sort_values("lus").reset_index(drop=True)
    ro = right.sort_values("rus").reset_index(drop=True)
    m = pd.merge_asof(
        lo, ro, left_on="lus", right_on="rus", by="uid",
        direction=direction, allow_exact_matches=allow_exact,
        tolerance=tol,
    )
    return dict(zip(m.event_id, m.rus))


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_matches_pandas_merge_asof(spark, direction, allow_exact):
    rng = np.random.default_rng(11)
    nl, nr = 400, 300
    lp = pd.DataFrame({
        "event_id": np.arange(nl),
        "uid": rng.integers(0, 9, nl),
        # coarse grid forces plenty of exact-timestamp ties
        "lus": rng.integers(0, 50, nl) * US,
    })
    rp = pd.DataFrame({
        "uid": rng.integers(0, 9, nr),
        "rus": rng.integers(0, 50, nr) * US,
        "val": np.arange(nr, dtype=float),
    })
    # dedupe right on (uid, ts): payload ties are documented-unspecified
    rp = rp.drop_duplicates(["uid", "rus"]).reset_index(drop=True)

    left = spark.createDataFrame(lp, "event_id long, uid long, lus long")
    right = spark.createDataFrame(rp, "uid long, rus long, val double")
    out = asof_join(left, right, "uid", "lus", "rus",
                    payload_cols=("val",), direction=direction,
                    allow_exact_match=allow_exact).toPandas()

    expect = _asof_oracle(lp, rp, direction, allow_exact, None)
    got = dict(zip(out.event_id, out.asof_ts_us))
    assert len(got) == nl
    for eid, want in expect.items():
        g = got[eid]
        if pd.isna(want):
            assert pd.isna(g), eid
        else:
            assert g == want, (eid, g, want)
    # payload follows the matched row (right deduped => deterministic)
    val_by = dict(zip(zip(rp.uid, rp.rus), rp.val))
    for r in out.itertuples():
        if pd.notna(r.asof_ts_us):
            assert r.val == val_by[(r.uid, r.asof_ts_us)]
        else:
            assert pd.isna(r.val)


def test_asof_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "a", 100 * US), (2, "a", 200 * US)], "event_id long, uid string, lus long")
    right = spark.createDataFrame(
        [("a", 95 * US), ("a", 50 * US)], "uid string, rus long")
    out = asof_join(left, right, "uid", "lus", "rus",
                    tolerance_seconds=10.0).toPandas()
    by = dict(zip(out.event_id, out.asof_ts_us))
    assert by[1] == 95 * US          # 5s away, within tolerance
    assert pd.isna(by[2])            # nearest is 105s away -> nulled


def test_asof_null_payload_rides_with_its_own_row(spark):
    """A matched right row whose payload is NULL must yield NULL — not a
    stale payload from an earlier row (per-column last(ignorenulls)
    would pair ts=t2 with t1's value; the struct carrier must not)."""
    left = spark.createDataFrame([(1, "a", 300 * US)],
                                 "event_id long, uid string, lus long")
    right = spark.createDataFrame(
        [("a", 100 * US, 5.0), ("a", 200 * US, None)],
        "uid string, rus long, val double")
    out = asof_join(left, right, "uid", "lus", "rus",
                    payload_cols=("val",)).collect()[0]
    assert out.asof_ts_us == 200 * US
    assert out.val is None


def test_asof_forward_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "a", 100 * US), (2, "a", 200 * US)],
        "event_id long, uid string, lus long")
    right = spark.createDataFrame(
        [("a", 104 * US), ("a", 260 * US)], "uid string, rus long")
    out = asof_join(left, right, "uid", "lus", "rus",
                    direction="forward", tolerance_seconds=10.0).toPandas()
    by = dict(zip(out.event_id, out.asof_ts_us))
    assert by[1] == 104 * US         # 4s ahead, within tolerance
    assert pd.isna(by[2])            # nearest-after is 60s ahead -> nulled


def test_range_join_suffix_collision_raises(spark):
    left = spark.createDataFrame([(1, "a", 100)], "ts long, uid string, x long")
    right = spark.createDataFrame([("a", 100, 1, 2)],
                                  "uid string, ts long, x long, x_r long")
    with pytest.raises(ValueError, match="collide"):
        bucketed_range_join(left, right, "uid", "x", "ts", -1.0, 1.0)


def test_asof_timestamp_ntz_inputs(spark, events):
    errs = events.where(F.col("event_type") == "error") \
        .select("event_id", "user_id", "ts")
    clicks = events.where(F.col("event_type") == "click") \
        .select(F.col("user_id").alias("uid"), F.col("ts").alias("cts"),
                "value")
    j = asof_join(errs.withColumnRenamed("user_id", "uid"), clicks,
                  "uid", "ts", "cts", payload_cols=("value",))
    pdf = j.toPandas()
    assert len(pdf) == errs.count()
    # recompute with pandas merge_asof on micros
    ep = errs.select("event_id", F.col("user_id").alias("uid"),
                     ts_micros(errs, "ts").alias("lus")).toPandas()
    cp = clicks.select("uid", ts_micros(clicks, "cts").alias("rus")).toPandas()
    cp = cp.drop_duplicates(["uid", "rus"])
    expect = _asof_oracle(ep, cp, "backward", True, None)
    got = dict(zip(pdf.event_id, pdf.asof_ts_us))
    for eid, want in expect.items():
        if pd.isna(want):
            assert pd.isna(got[eid])
        else:
            assert got[eid] == want


def test_asof_validation(spark, events):
    with pytest.raises(ValueError, match="direction"):
        asof_join(events, events.select("user_id", "ts"), "user_id",
                  "ts", "ts", direction="nearest")
    with pytest.raises(ValueError, match="payload_cols"):
        asof_join(events, events.select("user_id", "ts"), "user_id",
                  "ts", "ts", payload_cols=("nope",))
    with pytest.raises(ValueError, match="collide"):
        asof_join(events.withColumn("asof_ts_us", F.lit(1)),
                  events.select("user_id", "ts"), "user_id", "ts", "ts")


def test_asof_single_exchange(spark, events):
    errs = events.where(F.col("event_type") == "error") \
        .select("event_id", F.col("user_id").alias("uid"), "ts")
    clicks = events.where(F.col("event_type") == "click") \
        .select(F.col("user_id").alias("uid"), F.col("ts").alias("cts"))
    plan = asof_join(errs, clicks, "uid", "ts", "cts")._jdf \
        .queryExecution().executedPlan().toString()
    # one hash Exchange by key feeding the window over the union
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


# ---------------------------------------------------------------------------
# bucketed_range_join
# ---------------------------------------------------------------------------


def _range_oracle(lp, rp, lo_s, hi_s):
    pairs = set()
    for l in lp.itertuples():
        for r in rp.itertuples():
            if l.uid == r.uid and \
               l.lus + lo_s * US <= r.rus <= l.lus + hi_s * US:
                pairs.add((l.event_id, r.rid))
    return pairs


@pytest.mark.parametrize("lo_s,hi_s", [(-20, 0), (-5, 5), (0, 0), (3, 17)])
def test_range_join_matches_bruteforce(spark, lo_s, hi_s):
    rng = np.random.default_rng(13)
    lp = pd.DataFrame({
        "event_id": np.arange(250),
        "uid": rng.integers(0, 7, 250),
        "lus": rng.integers(0, 60, 250) * US,
    })
    rp = pd.DataFrame({
        "rid": np.arange(200),
        "uid": rng.integers(0, 7, 200),
        "rus": rng.integers(0, 60, 200) * US,
    })
    left = spark.createDataFrame(lp, "event_id long, uid long, lus long")
    right = spark.createDataFrame(rp, "rid long, uid long, rus long")
    out = bucketed_range_join(left, right, "uid", "lus", "rus",
                              float(lo_s), float(hi_s)).toPandas()
    got = set(zip(out.event_id, out.rid))
    assert got == _range_oracle(lp, rp, lo_s, hi_s)
    # no duplicate pairs from the bucket explode
    assert len(out) == len(got)


def test_range_join_boundary_inclusive_and_suffix(spark):
    left = spark.createDataFrame([(1, "a", 100 * US)],
                                 "event_id long, uid string, ts long")
    right = spark.createDataFrame(
        [(10, "a", 90 * US), (11, "a", 110 * US), (12, "a", 89 * US),
         (13, "a", 111 * US)],
        "event_id long, uid string, ts long")
    out = bucketed_range_join(left, right, "uid", "ts", "ts", -10.0, 10.0)
    pdf = out.toPandas()
    assert set(pdf.event_id_r) == {10, 11}          # inclusive bounds
    assert set(pdf.columns) >= {"event_id", "event_id_r", "ts_r",
                                "left_us", "right_us"}


def test_range_join_validation_and_plan(spark, events):
    with pytest.raises(ValueError, match="lower_seconds"):
        bucketed_range_join(events, events, "user_id", "ts", "ts", 5.0, -5.0)
    bad = events.withColumn("left_us", F.lit(1))
    with pytest.raises(ValueError, match="reserved"):
        bucketed_range_join(bad, events, "user_id", "ts", "ts", -1.0, 1.0)
    errs = events.where(F.col("event_type") == "error")
    clicks = events.where(F.col("event_type") == "click")
    plan = bucketed_range_join(errs, clicks, "user_id", "ts", "ts",
                               -3600.0, 0.0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_range_join_ntz_matches_bruteforce(spark, events):
    errs = events.where(F.col("event_type") == "error")
    clicks = events.where(F.col("event_type") == "click") \
        .select(F.col("event_id").alias("rid"), "user_id", "ts")
    out = bucketed_range_join(errs, clicks, "user_id", "ts", "ts",
                              -1800.0, 0.0).toPandas()
    ep = errs.select("event_id", F.col("user_id").alias("uid"),
                     ts_micros(errs, "ts").alias("lus")).toPandas()
    cp = clicks.select("rid", F.col("user_id").alias("uid"),
                       ts_micros(clicks, "ts").alias("rus")).toPandas()
    got = set(zip(out.event_id, out.rid))
    assert got == _range_oracle(ep, cp, -1800, 0)
