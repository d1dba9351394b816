"""hll_grouping_sets / hll_cube — one-scan approximate CUBE.

Pins (a) SQL CUBE shape parity (full 2^k group set, GROUPING_ID
bitmask markers, empty-set grand-total-only on empty input), (b) the
merge-from-finest law byte-exactly on a NON-prefix set (the case rollup
never exercises), and (c) set validation (outside columns, duplicates,
2^k guard).
"""

import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.sketches.cube import hll_cube, hll_grouping_sets
from cuckoo_filter_spark.sketches.hll import HLLSketch


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        ("click", "2024-01-0%d" % (1 + i % 3), "u%04d" % (i % 157))
        for i in range(2000)
    ] + [
        ("view", "2024-01-0%d" % (1 + i % 2), "v%04d" % (i % 311))
        for i in range(3000)
    ]
    return spark.createDataFrame(
        rows, "event_type string, day string, user_id string")


def test_cube_matches_sql_cube_shape_and_bounds(spark, events):
    got = {(r["event_type"], r["day"], r["gid"]): r["est_distinct"]
           for r in hll_cube(events, ["event_type", "day"],
                             "user_id", p=12).collect()}
    exact = {
        (r["event_type"], r["day"], r["gid"]): r["n"]
        for r in events.cube("event_type", "day")
        .agg(F.countDistinct("user_id").alias("n"),
             # same bit convention as hll_grouping_sets: left col = MSB
             (F.grouping("event_type") * 2 + F.grouping("day"))
             .cast("int").alias("gid"))
        .collect()
    }
    assert set(got) == set(exact)  # all 4 grouping sets, incl. day-only
    tol = 4 * HLLSketch(p=12).relative_error()
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(n, 1) * tol, (k, got[k], n)


def test_non_prefix_set_merges_byte_exact(spark, events):
    """The day-only set (NOT a prefix of [event_type, day]) must carry
    registers byte-identical to an HLL built directly over that day's
    slice — merge-from-finest loses nothing on any axis."""
    from cuckoo_filter_spark.sketches.base import build_sketch

    got = hll_grouping_sets(
        events, ["event_type", "day"], [["day"]], "user_id", p=12,
        keep_blobs=True)
    blobs = {r["day"]: bytes(r["blob"]) for r in got.collect()}
    assert set(blobs) == {"2024-01-01", "2024-01-02", "2024-01-03"}
    for day, blob in blobs.items():
        direct, _ = build_sketch(
            events.where(F.col("day") == day), "user_id",
            lambda: HLLSketch(p=12))
        assert blob == direct.to_bytes(), day


def test_set_validation(spark, events):
    with pytest.raises(ValueError, match="outside group_cols"):
        hll_grouping_sets(events, ["event_type"], [["day"]], "user_id")
    with pytest.raises(ValueError, match="duplicate grouping set"):
        hll_grouping_sets(events, ["event_type", "day"],
                          [["day", "event_type"], ["event_type", "day"]],
                          "user_id")
    with pytest.raises(ValueError, match="raise max_cols"):
        hll_cube(events, ["a"] * 7, "user_id")


def test_empty_input_emits_only_grand_total(spark):
    df = spark.createDataFrame([], "g string, k string")
    got = hll_grouping_sets(df, ["g"], [["g"], []], "k", p=10).collect()
    assert [(r["g"], r["gid"], r["est_distinct"]) for r in got] == [
        (None, 1, 0.0)]


def test_all_null_key_group_emits_zero(spark):
    """SQL CUBE parity for a group whose EVERY key is NULL: the group
    row must still surface (count 0) — COUNT(DISTINCT) skips null keys
    but GROUP BY keeps the group (the r5 review repro)."""
    df = spark.createDataFrame(
        [("a", "u1"), ("a", "u2"), ("b", None)], "g string, k string")
    got = {(r["g"], r["gid"]): r["est_distinct"]
           for r in hll_cube(df, ["g"], "k", p=12).collect()}
    assert set(got) == {("a", 0), ("b", 0), (None, 1)}
    assert got[("b", 0)] == 0.0
    assert got[("a", 0)] == pytest.approx(2, abs=0.1)
    assert got[(None, 1)] == pytest.approx(2, abs=0.1)


def test_output_name_collision_raises(spark, events):
    with pytest.raises(ValueError, match="collide"):
        hll_cube(events.withColumnRenamed("day", "gid"),
                 ["event_type", "gid"], "user_id")
