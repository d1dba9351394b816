"""Property tests for the spans / budget oracle emitters (DuckDB per
example — no Spark): the emitted SQL must agree with a direct python
recompute on arbitrary inputs. The Spark==emitted-SQL parity is pinned
by the deterministic tests in test_spans.py / test_budget.py; these
close the triangle (python brute == emitted SQL == Spark)."""

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from cuckoo_filter_spark.operators.budget import budget_oracle_sql
from cuckoo_filter_spark.operators.spans import spans_oracle_exprs

_token = st.text(alphabet="abc", min_size=1, max_size=3)
_text = st.one_of(
    st.none(),
    st.just(""),
    st.lists(_token, max_size=12).map(" ".join),
)


@given(st.lists(_text, min_size=1, max_size=8),
       st.integers(1, 5), st.integers(1, 3))
@settings(max_examples=60, deadline=None)
def test_spans_sql_windows_match_brute(texts, k, stride):
    o = spans_oracle_exprs("text", k, stride)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(
        {"id": range(len(texts)), "text": pd.array(texts, dtype="string")}))
    got = con.execute(
        f"SELECT id, {o['windows']} AS w FROM t ORDER BY id").fetchall()
    for (i, w) in got:
        toks = (texts[i] or "").split()
        want = [" ".join(toks[j:j + k])
                for j in range(0, len(toks) - k + 1, stride)]
        assert list(w) == want, (texts[i], k, stride)


_rows = st.lists(
    st.tuples(st.sampled_from("ab"), st.integers(0, 50)),
    min_size=1, max_size=20,
)


@given(_rows, st.integers(0, 120), st.sampled_from(["strict", "straddle"]))
@settings(max_examples=80, deadline=None)
def test_budget_sql_predicate_matches_brute(rows, budget, policy):
    df = pd.DataFrame(
        [(i, g, i, a) for i, (g, a) in enumerate(rows)],
        columns=["id", "grp", "rank", "amount"])
    pred = budget_oracle_sql("grp", "rank", "amount", str(budget), policy)
    con = duckdb.connect()
    con.register("t", df)
    got = sorted(r[0] for r in con.execute(
        f"SELECT id FROM t QUALIFY {pred}").fetchall())

    kept, run = [], {}
    for _, r in df.sort_values(["grp", "rank"]).iterrows():
        new = run.get(r["grp"], 0) + r["amount"]
        if new <= budget or (
            policy == "straddle" and run.get(r["grp"], 0) < budget < new
        ):
            kept.append(r["id"])
        run[r["grp"]] = new
    assert got == sorted(kept)


@given(st.lists(_text, min_size=1, max_size=8),
       st.integers(1, 6), st.integers(0, 5))
@settings(max_examples=60, deadline=None)
def test_chunks_sql_starts_match_brute(texts, k, overlap):
    import math

    from cuckoo_filter_spark.operators.chunks import chunks_oracle_exprs

    if overlap >= k:
        return  # invalid combo, guarded elsewhere
    o = chunks_oracle_exprs("text", k, overlap)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(
        {"id": range(len(texts)), "text": pd.array(texts, dtype="string")}))
    got = con.execute(
        f"SELECT id, {o['starts']} AS s FROM t ORDER BY id").fetchall()
    s = k - overlap
    for (i, starts) in got:
        toks = (texts[i] or "").split()
        n = len(toks)
        if n == 0:
            want = []
        elif n <= k:
            want = [0]
        else:
            want = [min(j * s, n - k)
                    for j in range(math.ceil((n - k) / s) + 1)]
        assert list(starts) == want, (texts[i], k, overlap)
        # coverage + exact-k laws on the brute side double-check the rule
        covered = set()
        for st_ in want:
            covered |= set(range(st_, min(st_ + k, n)))
        assert covered == set(range(n))
