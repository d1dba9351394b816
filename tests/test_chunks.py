"""Overlapping token chunking: coverage/size laws vs a python
recompute, the right-aligned-final-chunk rule, edge cases, and DuckDB
parity of the emitted start arithmetic."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.chunks import (
    chunk_starts_expr,
    chunk_tokens,
    chunks_oracle_exprs,
)

TEXTS = [
    (0, "a b c d e f g h i j"),          # 10 tokens
    (1, "one two three"),                  # n < k cases
    (2, "x"),
    (3, ""),
    (4, None),
    (5, " ".join(f"t{i}" for i in range(23))),  # awkward remainder
    (6, "p q r s"),                        # n == k for k=4
]


def brute_starts(text, k, overlap):
    toks = (text or "").split()
    n = len(toks)
    s = k - overlap
    if n == 0:
        return []
    if n <= k:
        return [0]
    import math
    return [min(i * s, n - k)
            for i in range(math.ceil((n - k) / s) + 1)]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(TEXTS, "id long, text string")


@pytest.mark.parametrize("k,overlap", [(4, 0), (4, 1), (4, 3), (5, 2), (1, 0)])
def test_starts_match_brute(df, k, overlap):
    got = {r["id"]: list(r["s"]) for r in df.select(
        "id", chunk_starts_expr("text", k, overlap).alias("s")).collect()}
    for i, t in TEXTS:
        assert got[i] == brute_starts(t, k, overlap), (i, t, k, overlap)


@pytest.mark.parametrize("k,overlap", [(4, 0), (4, 2), (7, 3)])
def test_chunk_rows_cover_all_tokens(df, k, overlap):
    rows = chunk_tokens(df, "id", "text", k, overlap).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    for i, t in TEXTS:
        toks = (t or "").split()
        if not toks:
            assert i not in by_id          # empty docs emit nothing
            continue
        chunks = sorted(by_id[i], key=lambda r: r["chunk_idx"])
        # indices are dense from 0
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        # every chunk has exactly k tokens unless the doc is short
        for c in chunks:
            want = len(toks) if len(toks) <= k else k
            assert c["chunk_tokens"] == want
        # concatenated coverage: union of chunk token positions == all
        starts = brute_starts(t, k, overlap)
        covered = set()
        for st in starts:
            covered |= set(range(st, min(st + k, len(toks))))
        assert covered == set(range(len(toks)))
        # chunk text matches the token slice
        for c, st in zip(chunks, starts):
            assert c["chunk_text"] == " ".join(toks[st:st + k])


def test_guards(df):
    with pytest.raises(ValueError, match="k must"):
        chunk_starts_expr("text", 0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_starts_expr("text", 4, 4)
    with pytest.raises(ValueError, match="overlap"):
        chunk_tokens(df, "id", "text", 4, -1)
    with pytest.raises(ValueError, match="already exists"):
        chunk_tokens(df.withColumn("chunk_idx", F.lit(1)), "id", "text", 4)
    with pytest.raises(ValueError, match="collides"):
        chunk_tokens(df.withColumnRenamed("id", "__start"),
                     "__start", "text", 4)


@pytest.mark.parametrize("k,overlap", [(4, 0), (4, 2), (6, 5)])
def test_duckdb_parity(df, k, overlap):
    got = (
        chunk_tokens(df, "id", "text", k, overlap)
        .orderBy("id", "chunk_idx")
        .toPandas()
    )
    o = chunks_oracle_exprs("text", k, overlap)
    con = duckdb.connect()
    con.register("t", pd.DataFrame(TEXTS, columns=["id", "text"]))
    want = con.execute(f"""
        WITH base AS (
            SELECT id, {o['tokens']} AS w, unnest({o['starts']}) AS st,
                   generate_subscripts({o['starts']}, 1) - 1 AS chunk_idx
            FROM t)
        SELECT id, CAST(chunk_idx AS INT) AS chunk_idx,
               array_to_string(w[st + 1 : st + {k}], ' ') AS chunk_text,
               CAST(len(w[st + 1 : st + {k}]) AS BIGINT) AS chunk_tokens
        FROM base ORDER BY id, chunk_idx
    """).df()
    for col in ("id", "chunk_idx", "chunk_text", "chunk_tokens"):
        assert list(got[col]) == list(want[col]), (col, k, overlap)
