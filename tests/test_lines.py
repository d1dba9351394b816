"""dedup_lines / chunk_lines_expr — global keep-first line dedup."""

import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.lines import chunk_lines_expr, dedup_lines


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_keep_first_across_docs(spark):
    df = _df(spark, [
        (1, "alpha\nbeta\ngamma"),
        (2, "beta\ndelta"),          # beta repeats -> removed from doc 2
        (3, "gamma\nbeta\nalpha"),   # all three repeat -> doc empties
    ])
    out = {r["doc_id"]: r for r in dedup_lines(df, "text", "doc_id").collect()}
    assert out[1]["text"] == "alpha\nbeta\ngamma"
    assert out[1]["n_lines_removed"] == 0
    assert out[2]["text"] == "delta"
    assert out[2]["n_lines_removed"] == 1
    assert out[3]["text"] == ""
    assert out[3]["n_lines_removed"] == 3


def test_within_doc_duplicates_removed(spark):
    df = _df(spark, [(1, "x\ny\nx\nx")])
    row = dedup_lines(df, "text", "doc_id").collect()[0]
    assert row["text"] == "x\ny"
    assert row["n_lines_removed"] == 2


def test_blank_lines_structural(spark):
    # blank / sub-min_chars lines are never dedup candidates
    df = _df(spark, [(1, "a\n\nb"), (2, "\nc\n\n")])
    out = {r["doc_id"]: r for r in dedup_lines(df, "text", "doc_id").collect()}
    assert out[1]["text"] == "a\n\nb"
    assert out[2]["text"] == "\nc\n\n"
    assert out[1]["n_lines_removed"] == out[2]["n_lines_removed"] == 0


def test_min_chars_exempts_short_lines(spark):
    df = _df(spark, [(1, "ab\nlong line here"), (2, "ab\nlong line here")])
    out = {r["doc_id"]: r for r in
           dedup_lines(df, "text", "doc_id", min_chars=3).collect()}
    # "ab" (< 3 chars) kept in both; the long line deduped
    assert out[2]["text"] == "ab"
    assert out[2]["n_lines_removed"] == 1
    assert out[1]["n_lines_removed"] == 0


def test_null_and_empty_text(spark):
    df = spark.createDataFrame([(1, None), (2, "")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df, "text", "doc_id").collect()}
    assert out[1]["n_lines_removed"] == 0
    assert out[2]["n_lines_removed"] == 0


def test_other_columns_preserved(spark):
    df = spark.createDataFrame([(1, "a\nb", "web"), (2, "a", "books")],
                               ["doc_id", "text", "source"])
    out = {r["doc_id"]: r for r in dedup_lines(df, "text", "doc_id").collect()}
    assert out[2]["source"] == "books"
    assert out[2]["text"] == ""


def test_column_clash_raises(spark):
    df = spark.createDataFrame([(1, "a", 0)], ["doc_id", "text", "n_lines_removed"])
    with pytest.raises(ValueError, match="collide"):
        dedup_lines(df, "text", "doc_id")
    with pytest.raises(ValueError, match="id_col"):
        dedup_lines(_df(spark, [(1, "a")]).withColumnRenamed("doc_id", "fp"),
                    "text", "fp")


def test_chunk_lines_expr(spark):
    df = _df(spark, [(1, "a b c d e"), (2, "  "), (3, None)])
    out = {r["doc_id"]: r["chunked"] for r in
           df.select("doc_id", chunk_lines_expr("text", 2).alias("chunked")).collect()}
    assert out[1] == "a b\nc d\ne"
    assert out[2] == ""
    assert out[3] == ""


def test_chunk_then_dedup_roundtrip(spark):
    # shared 4-token run aligned to chunk boundaries dedupes exactly once
    df = _df(spark, [(1, "p q r s t u"), (2, "p q r s x y")])
    chunked = df.withColumn("text", chunk_lines_expr("text", 2))
    out = {r["doc_id"]: r for r in dedup_lines(chunked, "text", "doc_id").collect()}
    assert out[1]["text"] == "p q\nr s\nt u"
    assert out[2]["text"] == "x y"
    assert out[2]["n_lines_removed"] == 2


def test_hot_line_at_scale(spark):
    # one boilerplate line duplicated 10^5 times across docs: the
    # partial-agg keep-first must survive this without a single-task
    # Window sort on the line (the r5 scale hazard), and the plan must
    # contain no Window at all
    n = 100_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("COOKIE BANNER\nunique line "),
                 F.col("id").cast("string")).alias("text"))
    out = dedup_lines(df, "text", "doc_id")
    assert "Window" not in out._jdf.queryExecution().executedPlan().toString()
    agg = out.agg(
        F.sum("n_lines_removed").alias("removed"),
        F.sum(F.when(F.col("text").startswith("COOKIE"), 1)
              .otherwise(0)).alias("keepers")).collect()[0]
    assert agg["removed"] == n - 1   # every copy but doc 0's removed
    assert agg["keepers"] == 1


def test_broadcast_escape_hatches_identical(spark):
    df = _df(spark, [
        (1, "alpha\nbeta\ngamma"),
        (2, "beta\ndelta"),
        (3, "gamma\nbeta\nalpha"),
        (4, "delta\nalpha"),
    ])
    want = sorted(tuple(r) for r in dedup_lines(df, "text", "doc_id").collect())
    # flip BOTH non-default sides: shuffle-join removed, force-broadcast firsts
    got = sorted(tuple(r) for r in dedup_lines(
        df, "text", "doc_id",
        broadcast_removed=False, broadcast_firsts=True).collect())
    assert got == want


def test_randomized_bruteforce_parity(spark):
    # seeded random corpus vs a direct python keep-first recompute —
    # lines drawn from a tiny alphabet so cross-doc repeats, within-doc
    # repeats, blanks, and short lines all occur
    import random

    rng = random.Random(0xC6)
    vocab = ["alpha", "beta", "gamma", "delta", "x", "", "  ", "longer line"]
    docs = []
    for i in range(120):
        n = rng.randint(0, 6)
        docs.append((i, "\n".join(rng.choice(vocab) for _ in range(n))))

    min_chars = 2
    seen, want = set(), {}
    for i, text in docs:
        kept, removed = [], 0
        for line in text.split("\n"):
            if len(line.strip()) < min_chars:
                kept.append(line)
            elif line not in seen:
                seen.add(line)
                kept.append(line)
            else:
                removed += 1
        want[i] = ("\n".join(kept), removed)

    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = dedup_lines(df, "text", "doc_id", min_chars=min_chars)
    got = {r["doc_id"]: (r["text"], r["n_lines_removed"])
           for r in out.collect()}
    assert got == want


def test_validation(spark):
    df = _df(spark, [(1, "a")])
    with pytest.raises(ValueError, match="min_chars"):
        dedup_lines(df, "text", "doc_id", min_chars=0)
    with pytest.raises(ValueError, match="tokens_per_chunk"):
        chunk_lines_expr("text", 0)
