"""Text analysis: token counting, quality features, lang-id, fingerprints."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.functions.text import (
    bpe_ish_token_count_expr,
    doc_fingerprint_udf,
    lang_id_udf,
    quality_features,
    quality_score_expr,
    token_count_expr,
)


@pytest.fixture(scope="module")
def texts_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, ""),
        (2, "   "),
        (3, "one"),
        (4, "a b c d e f g"),
        (5, "Hello, world! How are you? I am fine."),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_token_count(spark, texts_df):
    got = {r["id"]: r["n"] for r in texts_df.select("id", token_count_expr("text").alias("n")).collect()}
    assert got == {0: 9, 1: 0, 2: 0, 3: 1, 4: 7, 5: 8}


def test_bpe_ish_token_count(spark, texts_df):
    got = {r["id"]: r["n"] for r in
           texts_df.select("id", bpe_ish_token_count_expr("text").alias("n")).collect()}
    # "Hello, world! How are you? I am fine." → 8 words + 4 punct = 12
    assert got[5] == 12
    assert got[1] == 0


def test_quality_features(spark, texts_df):
    feats = quality_features("text")
    df = texts_df.select("id", *[v.alias(k) for k, v in feats.items()])
    rows = {r["id"]: r for r in df.collect()}
    assert rows[0]["n_tokens"] == 9
    assert rows[0]["stopword_ratio"] > 0.2  # 'the' twice + 'over'
    assert rows[5]["punct_ratio"] > 0.05
    assert rows[1]["punct_ratio"] == 0.0
    df2 = texts_df.select(quality_score_expr("text"))
    vals = [r["quality"] for r in df2.collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_lang_id(spark):
    rows = [
        (0, "the cat and the dog walked to the park and it is raining", "en"),
        (1, "der Hund und die Katze sind in der Schule und das ist gut", "de"),
        (2, "le chat est dans la maison et les enfants sont une famille", "fr"),
        (3, "el perro es grande y la casa es una maravilla de los niños", "es"),
        (4, "这是一个中文句子很长的中文内容测试", "zh"),
        (5, "", "unknown"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, expected string")
    lid = lang_id_udf()
    got = df.withColumn("pred", lid(F.col("text"))).collect()
    for r in got:
        assert r["pred"] == r["expected"], (r["id"], r["pred"], r["expected"])


def test_doc_fingerprint_deterministic(spark, texts_df):
    fp = doc_fingerprint_udf()
    a = texts_df.select("id", fp(F.col("text")).alias("fp")).collect()
    b = texts_df.select("id", fp(F.col("text")).alias("fp")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    vals = {r["fp"] for r in a}
    assert len(vals) == len(a)  # distinct texts → distinct fingerprints


def test_canonical_url_rules(spark):
    """functions/web.py: RFC-3986-lite canonicalization — host/scheme
    case-folding, userinfo drop, default-port strip, query sort,
    fragment drop, empty-path slash; malformed input is identity."""
    from cuckoo_filter_spark.functions.web import canonical_url, host_of

    cases = [
        # (input, expected canonical)
        ("HTTPS://User:Pw@WWW.Ex.COM:443/A/b?b=2&a=1#frag",
         "https://www.ex.com/A/b?a=1&b=2"),
        ("http://EX.com:80/x?z=1", "http://ex.com/x?z=1"),
        ("http://ex.com:8080", "http://ex.com:8080/"),
        ("https://ex.com/", "https://ex.com/"),
        ("https://ex.com/p?single=1", "https://ex.com/p?single=1"),
        ("not a url at all", "not a url at all"),  # identity, not null
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in
           df.select(canonical_url("url")).collect()]
    assert got == [e for _, e in cases], got
    hosts = [r[0] for r in df.select(host_of("url")).collect()]
    assert hosts[:3] == ["www.ex.com", "ex.com", "ex.com"]
    # canonical_url is idempotent
    got2 = [r[0] for r in
            spark.createDataFrame([(g,) for g in got], "url string")
            .select(canonical_url("url")).collect()]
    assert got2 == got


def test_tokenization_boundary_whitespace(spark):
    """Leading/trailing NON-SPACE whitespace must not emit phantom ''
    tokens (F.trim strips only 0x20): 'hello world\n' is 2 tokens, a
    bare '\n' is 0, NULL counts 0 (not NULL)."""
    import duckdb
    import pandas as pd
    from cuckoo_filter_spark.functions.text import (
        token_count_expr, tokens_expr, tokens_sql, word_ngrams_expr)

    rows = [(0, "hello world\n"), (1, "\n"), (2, "\ta  b\r\n"),
            (3, None), (4, ""), (5, " x ")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: (r["n"], r["t"]) for r in df.select(
        "id", token_count_expr("text").alias("n"),
        tokens_expr("text").alias("t")).collect()}
    assert got[0] == (2, ["hello", "world"])
    assert got[1] == (0, [])
    assert got[2] == (2, ["a", "b"])
    assert got[3] == (0, [])      # NULL -> 0, not NULL
    assert got[4] == (0, [])
    assert got[5] == (1, ["x"])
    # no gram may contain a phantom '' token ('hello world\\n' used to
    # produce a second gram 'world ')
    grams = {r["id"]: r["g"] for r in df.select(
        "id", word_ngrams_expr("text", 2).alias("g")).collect()}
    assert grams[0] == ["hello world"]
    assert grams[2] == ["a b"]
    assert all(not g for i, g in grams.items() if i not in (0, 2))
    # the ONE SQL emitter reproduces it row-for-row
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["id", "text"]))
    want = {i: list(v) for i, v in con.execute(
        f"SELECT id, {tokens_sql('text')} FROM t ORDER BY id").fetchall()}
    assert want == {k: v[1] for k, v in got.items()}


def test_stopword_adjacent_repeats_counted(spark):
    from cuckoo_filter_spark.functions.text import quality_features

    df = spark.createDataFrame([(" the the the ",)], ["text"])
    f = quality_features("text")
    row = df.select((f["stopword_ratio"] * f["n_tokens"]).alias("n_stop"),
                    f["n_tokens"].alias("nt")).collect()[0]
    assert row["nt"] == 3
    assert abs(row["n_stop"] - 3.0) < 1e-9  # split used to count 2
