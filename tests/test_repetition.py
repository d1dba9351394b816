"""repetition_features / top_ngram_count_udf — Gopher-style signals."""

import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.functions.text import (
    repetition_features,
    tokens_expr,
    top_ngram_count_udf,
)


def _feat(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = repetition_features("text")
    out = df.select("doc_id", *[v.alias(k) for k, v in feats.items()])
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_dup_line_fractions(spark):
    got = _feat(spark, [
        (1, "aaa\nbbb\naaa\naaa"),   # 4 lines, 2 dups of "aaa"
        (2, "xx\nyy"),
        (3, None),
        (4, "one\n\n\none"),         # blanks skipped; one dup
    ])
    assert got[1]["n_lines"] == 4 and got[1]["n_dup_lines"] == 2
    assert got[1]["dup_line_frac"] == pytest.approx(0.5)
    # 12 chars total, 6 in distinct -> 0.5 of chars are repeats
    assert got[1]["dup_line_char_frac"] == pytest.approx(0.5)
    assert got[2]["n_dup_lines"] == 0 and got[2]["dup_line_frac"] == 0.0
    assert got[3]["n_lines"] == 0 and got[3]["dup_line_frac"] == 0.0
    assert got[4]["n_lines"] == 2 and got[4]["n_dup_lines"] == 1


def test_dup_char_frac_weighting(spark):
    # long line duplicated, short unique: char-frac >> line-frac
    got = _feat(spark, [(1, "longlonglong\nz\nlonglonglong")])
    assert got[1]["dup_line_frac"] == pytest.approx(1 / 3)
    assert got[1]["dup_line_char_frac"] == pytest.approx(12 / 25)


def test_top_ngram_count(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"),     # "a b" bigram x3
         (2, "u v w x y z"),     # all distinct -> 1
         (3, "a"),               # < n tokens -> 0
         (4, None),
         (5, "")],
        "doc_id long, text string",
    )
    udf2 = top_ngram_count_udf(2)
    got = {r["doc_id"]: r["c"] for r in
           df.select("doc_id", udf2("text").alias("c")).collect()}
    assert got == {1: 3, 2: 1, 3: 0, 4: 0, 5: 0}


def test_top_ngram_matches_sql_recount(spark):
    # UDF count == explode+groupBy recount on real-ish text
    df = spark.createDataFrame(
        [(i, " ".join(["tok%d" % (j % 7) for j in range(i, i + 40)]))
         for i in range(10)],
        "doc_id long, text string",
    )
    from cuckoo_filter_spark.functions.text import word_ngrams_expr

    udf3 = top_ngram_count_udf(3)
    got = {r["doc_id"]: r["c"] for r in
           df.select("doc_id", udf3("text").alias("c")).collect()}
    ref = {r["doc_id"]: r["m"] for r in
           df.select("doc_id", F.explode(word_ngrams_expr("text", 3)).alias("g"))
             .groupBy("doc_id", "g").count()
             .groupBy("doc_id").agg(F.max("count").alias("m")).collect()}
    assert got == ref


def test_tokens_expr_parity(spark):
    df = spark.createDataFrame([(1, "  a  b\tc "), (2, ""), (3, None)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["t"] for r in
           df.select("doc_id", tokens_expr("text").alias("t")).collect()}
    assert got == {1: ["a", "b", "c"], 2: [], 3: []}


def test_validation():
    with pytest.raises(ValueError, match="n must be"):
        top_ngram_count_udf(0)
