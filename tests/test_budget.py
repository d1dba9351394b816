"""Budget-capped selection: prefix semantics vs a python recompute,
straddle policy, column budgets, guards, plan shape (ONE Exchange),
and DuckDB parity of the emitted predicate."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.budget import (
    budget_oracle_sql,
    take_until_budget,
)

ROWS = [
    # (id, grp, rank, amount)
    (0, "a", 1, 40), (1, "a", 2, 40), (2, "a", 3, 40), (3, "a", 4, 5),
    (4, "b", 1, 200),                      # first row alone overflows
    (5, "b", 2, 10),
    (6, "c", 1, 100),                      # exactly the budget
    (7, "c", 2, 1),
    (8, "d", 1, 0), (9, "d", 2, 0),        # zero-cost rows
]
BUDGET = 100


def brute(policy):
    kept = []
    bygrp = {}
    for rid, g, rank, amt in sorted(ROWS, key=lambda r: (r[1], r[2])):
        run = bygrp.get(g, 0) + amt
        if run <= BUDGET or (policy == "straddle"
                             and run - amt < BUDGET < run):
            kept.append(rid)
        bygrp[g] = run
    return sorted(kept)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        ROWS, "id long, grp string, rank int, amount long")


@pytest.mark.parametrize("policy", ["strict", "straddle"])
def test_matches_bruteforce(df, policy):
    got = take_until_budget(
        df, ["grp"], [F.col("rank")], "amount", BUDGET, policy=policy)
    assert sorted(r["id"] for r in got.collect()) == brute(policy)


def test_strict_semantics_detail(df):
    got = {r["id"] for r in take_until_budget(
        df, ["grp"], ["rank"], "amount", BUDGET).collect()}
    # a: 40+40 fits, third 40 would reach 120 > 100, the 5 after it is
    # also excluded (running sum stays over budget)
    assert got & {0, 1, 2, 3} == {0, 1}
    assert 4 not in got and 5 not in got      # b: nothing fits
    assert got & {6, 7} == {6}                # c: exact fit, then over
    assert {8, 9} <= got                      # d: zero-cost always fits


def test_straddle_keeps_first_overflower(df):
    got = {r["id"] for r in take_until_budget(
        df, ["grp"], ["rank"], "amount", BUDGET,
        policy="straddle").collect()}
    assert got & {0, 1, 2, 3} == {0, 1, 2}    # the 120-run row straddles
    assert 4 in got and 5 not in got          # even a lone overflower
    assert got & {6, 7} == {6}                # exact fit: 7's prefix==100
    # zero budget: only zero-COST rows fit (they spend nothing); the
    # straddle clause never fires (prefix < 0 is impossible)
    zero = take_until_budget(df, ["grp"], ["rank"], "amount", 0,
                             policy="straddle")
    assert {r["id"] for r in zero.collect()} == {8, 9}


def test_column_budget_and_running_col(df):
    b = F.when(F.col("grp") == "a", F.lit(45)).otherwise(F.lit(1000))
    got = take_until_budget(df, ["grp"], ["rank"], "amount", b,
                            running_col="spent")
    rows = {r["id"]: r["spent"] for r in got.collect()}
    assert set(rows) == {0, 4, 5, 6, 7, 8, 9}  # a capped at 45 -> 1 row
    assert rows[0] == 40 and rows[5] == 210


def test_guards_and_bad_amounts(spark, df):
    with pytest.raises(ValueError, match="policy"):
        take_until_budget(df, ["grp"], ["rank"], "amount", 1, policy="x")
    with pytest.raises(ValueError, match="group_cols"):
        take_until_budget(df, [], ["rank"], "amount", 1)
    with pytest.raises(ValueError, match="order_by"):
        take_until_budget(df, ["grp"], [], "amount", 1)
    bad = spark.createDataFrame(
        [(0, "a", 1, -5)], "id long, grp string, rank int, amount long")
    with pytest.raises(Exception, match="NULL/negative"):
        take_until_budget(bad, ["grp"], ["rank"], "amount", 10).collect()
    nullamt = spark.createDataFrame(
        [(0, "a", 1, None)], "id long, grp string, rank int, amount long")
    with pytest.raises(Exception, match="NULL/negative"):
        take_until_budget(nullamt, ["grp"], ["rank"], "amount", 10).collect()


def test_single_exchange_plan(df):
    import io
    from contextlib import redirect_stdout
    import re

    out = take_until_budget(df, ["grp"], ["rank"], "amount", BUDGET)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    # no Python EXECUTION nodes (the local-relation source's
    # applySchemaToPythonRDD provenance string is not execution)
    assert not any(s in p for s in
                   ("BatchEvalPython", "ArrowEvalPython", "InPandas"))


@pytest.mark.parametrize("policy", ["strict", "straddle"])
def test_duckdb_parity(df, policy):
    got = sorted(
        r["id"] for r in take_until_budget(
            df, ["grp"], ["rank"], "amount", BUDGET, policy=policy
        ).collect())
    pred = budget_oracle_sql("grp", "rank", "amount", str(BUDGET), policy)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(
        ROWS, columns=["id", "grp", "rank", "amount"]))
    want = [r[0] for r in con.execute(
        f"SELECT id FROM t QUALIFY {pred} ORDER BY id").fetchall()]
    assert got == want


def test_internal_column_collision_guards(df):
    with pytest.raises(ValueError, match="__run"):
        take_until_budget(df.withColumn("__run", F.lit(1)),
                          ["grp"], ["rank"], "amount", 1)
    with pytest.raises(ValueError, match="already exists"):
        take_until_budget(df, ["grp"], ["rank"], "amount", 1,
                          running_col="amount")


# -------------------------------------------------------------------------
# threshold pre-pass (two-pass mitigation of the one-task-per-group bound)
# -------------------------------------------------------------------------


@pytest.fixture(scope="module")
def big_df(spark):
    # two groups x 5000 rows; amounts vary so bucket sums are irregular
    return spark.range(10_000).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, "x").otherwise("y").alias("grp"),
        F.col("id").alias("rank"),
        (F.col("id") % 7 + 1).alias("amount"),
    )


@pytest.mark.parametrize("policy", ["strict", "straddle"])
@pytest.mark.parametrize("budget", [0, 37, 500, 10**9])
def test_prepass_selection_identical(big_df, policy, budget):
    base = sorted(r["id"] for r in take_until_budget(
        big_df, ["grp"], ["rank", "id"], "amount", budget,
        policy=policy).collect())
    pre = sorted(r["id"] for r in take_until_budget(
        big_df, ["grp"], ["rank", "id"], "amount", budget, policy=policy,
        prepass_on="rank", prepass_buckets=16).collect())
    assert pre == base


@pytest.mark.parametrize("policy", ["strict", "straddle"])
def test_prepass_adversarial_distributions(spark, policy):
    """Boundary-logic stressors: (a) ALL order keys tied (every row in
    bucket 0 — threshold must never clip mid-tie), (b) one huge amount
    among trivial ones (cutoff lands immediately), (c) singleton
    groups, (d) two-valued keys with buckets >> distinct values
    (duplicate quantile boundaries)."""
    rows = (
        [(i, "tied", 7, 3) for i in range(200)]
        + [(1000, "big", 1, 10**6), (1001, "big", 2, 1), (1002, "big", 3, 1)]
        + [(2000, "solo", 5, 42)]
        + [(3000 + i, "twoval", i % 2, 5) for i in range(100)]
    )
    df = spark.createDataFrame(
        rows, "id long, grp string, rank int, amount long")
    for budget in (0, 10, 300, 10**7):
        base = sorted(r["id"] for r in take_until_budget(
            df, ["grp"], ["rank", "id"], "amount", budget,
            policy=policy).collect())
        pre = sorted(r["id"] for r in take_until_budget(
            df, ["grp"], ["rank", "id"], "amount", budget, policy=policy,
            prepass_on="rank", prepass_buckets=32).collect())
        assert pre == base, (policy, budget)


def test_prepass_actually_discards(big_df):
    # the pre-pass must shrink the window input: count the rows that
    # survive the threshold filter (run the prepass alone)
    from cuckoo_filter_spark.operators.budget import _budget_prepass

    survivors = _budget_prepass(
        big_df, ["grp"], "rank", F.col("amount"), 500, 16).count()
    assert survivors < 10_000 / 4  # far-tail discarded map-side
    # and the full operator still selects from the survivors only
    kept = take_until_budget(big_df, ["grp"], ["rank", "id"], "amount",
                             500, prepass_on="rank").count()
    assert kept <= survivors


def test_prepass_zero_amount_group_kept_whole(spark):
    # all-zero amounts + zero budget: strict keeps EVERY row (run==0);
    # a >=-based cutoff would clip to the first bucket — regression pin
    df0 = spark.range(1000).select(
        F.lit("g").alias("grp"), F.col("id").alias("rank"),
        F.lit(0).alias("amount"), "id")
    got = take_until_budget(df0, ["grp"], ["rank"], "amount", 0,
                            prepass_on="rank", prepass_buckets=8)
    assert got.count() == 1000


def test_prepass_guards(spark, big_df):
    with pytest.raises(ValueError, match="scalar budget"):
        take_until_budget(big_df, ["grp"], ["rank"], "amount",
                          F.lit(10), prepass_on="rank")
    with pytest.raises(ValueError, match="order_by\\[0\\]"):
        take_until_budget(big_df, ["grp"], ["id", "rank"], "amount", 10,
                          prepass_on="rank")
    with pytest.raises(ValueError, match="order_by\\[0\\]"):
        take_until_budget(big_df, ["grp"], [F.col("rank")], "amount", 10,
                          prepass_on="rank")
    with pytest.raises(ValueError, match="prepass_buckets"):
        take_until_budget(big_df, ["grp"], ["rank"], "amount", 10,
                          prepass_on="rank", prepass_buckets=1)
    nullkey = spark.createDataFrame(
        [(0, "a", None, 5), (1, "a", 2, 5)],
        "id long, grp string, rank int, amount long")
    with pytest.raises(Exception, match="NULL 'rank'"):
        take_until_budget(nullkey, ["grp"], ["rank"], "amount", 10,
                          prepass_on="rank").collect()
