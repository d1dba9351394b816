"""Exact-substring (repeated token-window) detection: window semantics,
brute-force parity, fingerprint-vs-string equality, the drop
composition, and DuckDB parity of the emitted window spelling."""

from collections import Counter

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.spans import (
    filter_repeated_spans,
    repeated_span_stats,
    spans_oracle_exprs,
    token_windows_expr,
)

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a shared span of exactly six tokens appears here first"),
    (2, "prefix text then a shared span of exactly six tokens appears"),
    (3, "totally unique words nowhere else repeated anywhere at all"),
    (4, "loop loop loop loop loop loop loop loop"),  # self-repetition
    (5, "short"),
    (6, ""),
    (7, None),
]


def brute(rows, k, stride, min_count):
    wins = {}
    for i, t in rows:
        toks = (t or "").split()
        ws = [" ".join(toks[j:j + k])
              for j in range(0, len(toks) - k + 1, stride)]
        if ws:
            wins[i] = ws
    c = Counter(w for ws in wins.values() for w in ws)
    return {
        i: (len(ws), sum(1 for w in ws if c[w] >= min_count))
        for i, ws in wins.items()
    }


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(CORPUS, "id long, text string")


def test_window_semantics(spark):
    d = spark.createDataFrame([(0, "a b  c\td e")], "id long, t string")
    got = lambda k, s: d.select(  # noqa: E731
        token_windows_expr("t", k, s)).first()[0]
    assert got(3, 1) == ["a b c", "b c d", "c d e"]
    assert got(3, 2) == ["a b c", "c d e"]
    assert got(5, 1) == ["a b c d e"]
    assert got(6, 1) == []
    blanks = spark.createDataFrame([(0, ""), (1, None), (2, "  ")],
                                   "id long, t string")
    assert [r[0] for r in blanks.select(
        token_windows_expr("t", 2)).collect()] == [[], [], []]


@pytest.mark.parametrize("k,stride,min_count", [
    (3, 1, 2), (2, 1, 2), (4, 2, 2), (1, 1, 3),
])
def test_stats_match_bruteforce(df, k, stride, min_count):
    got = {
        r["id"]: (r["n_windows"], r["n_repeated"])
        for r in repeated_span_stats(
            df, "id", "text", k=k, stride=stride, min_count=min_count
        ).collect()
    }
    assert got == brute(CORPUS, k, stride, min_count)


def test_fingerprint_modes_agree(df):
    a = repeated_span_stats(df, "id", "text", k=3).collect()
    b = repeated_span_stats(df, "id", "text", k=3,
                            fingerprint=False).collect()
    c = repeated_span_stats(df, "id", "text", k=3,
                            fingerprint="xxhash64").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sorted(map(tuple, a)) == sorted(map(tuple, c))
    with pytest.raises(ValueError, match="fingerprint"):
        repeated_span_stats(df, "id", "text", fingerprint="sha1")


def test_self_repetition_counts(df):
    # doc 4 is 8x "loop": every 2-gram is "loop loop" (7 windows, all
    # repeated within the one doc)
    row = {r["id"]: r for r in
           repeated_span_stats(df, "id", "text", k=2).collect()}[4]
    assert (row["n_windows"], row["n_repeated"]) == (7, 7)


def test_filter_composition(df):
    kept = filter_repeated_spans(df, "id", "text", 0.5, k=2)
    ids = {r["id"] for r in kept.select("id").collect()}
    # doc 4 (all windows repeated) dropped; windowless docs 5-7 kept
    assert 4 not in ids
    assert {5, 6, 7} <= ids
    # zero threshold drops every doc with ANY repeated window
    strict = filter_repeated_spans(df, "id", "text", 0.0, k=3)
    want_drop = {i for i, (n, r) in brute(CORPUS, 3, 1, 2).items() if r > 0}
    assert {r["id"] for r in strict.select("id").collect()} == (
        {i for i, _ in CORPUS} - want_drop)


def test_filter_broadcast_escape_hatch(df):
    # broadcast_flagged=False (shuffle anti join) must be output-identical
    want = sorted(r["id"] for r in
                  filter_repeated_spans(df, "id", "text", 0.5, k=2).collect())
    got = sorted(r["id"] for r in
                 filter_repeated_spans(df, "id", "text", 0.5, k=2,
                                       broadcast_flagged=False).collect())
    assert got == want


def test_guards(df):
    for bad in (0, -1):
        with pytest.raises(ValueError, match="k must"):
            token_windows_expr("text", bad)
        with pytest.raises(ValueError, match="stride"):
            token_windows_expr("text", 2, bad)
        with pytest.raises(ValueError, match="k must"):
            spans_oracle_exprs("text", bad)
    with pytest.raises(ValueError, match="min_count"):
        repeated_span_stats(df, "id", "text", min_count=1)
    with pytest.raises(ValueError, match="max_repeated_frac"):
        filter_repeated_spans(df, "id", "text", 1.5)


@pytest.mark.parametrize("k,stride", [(1, 1), (2, 1), (3, 2), (5, 3)])
def test_duckdb_window_parity(df, k, stride):
    """spans_oracle_exprs' window spelling reproduces
    token_windows_expr row-for-row (the oracle contract)."""
    got = (
        df.select("id", token_windows_expr("text", k, stride).alias("w"))
        .orderBy("id").collect()
    )
    o = spans_oracle_exprs("text", k, stride)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(CORPUS, columns=["id", "text"]))
    want = con.execute(
        f"SELECT id, {o['windows']} AS w FROM t ORDER BY id").fetchall()
    assert [(r["id"], r["w"]) for r in got] == [(i, list(w)) for i, w in want]


def test_id_col_collision_guard(spark):
    d = spark.createDataFrame([(0, "a b c")], "gram long, text string")
    with pytest.raises(ValueError, match="collides"):
        repeated_span_stats(d, "gram", "text")
