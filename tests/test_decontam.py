"""Benchmark decontamination via cuckoo-filter n-gram probe."""

import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.functions.text import word_ngrams_expr
from cuckoo_filter_spark.operators.decontam import (
    benchmark_ngrams,
    decontaminate,
    drop_contaminated,
)


@pytest.fixture(scope="module")
def corpora(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "sphinx of black quartz judge my vow today"),
            (4, "the quick brown fox sleeps all day long"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(101, "watch the quick brown fox jumps away"),
         (102, "sphinx of black quartz judge my vow")],
        ["doc_id", "text"],
    )
    return train, bench


def test_word_ngrams_expr(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b"), (3, ""), (4, None)],
                               "doc_id long, text string")
    out = {r["doc_id"]: r["g"] for r in
           df.select("doc_id", word_ngrams_expr("text", 3).alias("g")).collect()}
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []
    assert out[3] == []
    assert out[4] == []


def test_ngram_within_doc_distinct(spark):
    # a gram repeated inside one doc counts once
    train = spark.createDataFrame([(1, "x y z w x y z")], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, "q x y z q")], ["doc_id", "text"])
    rows = decontaminate(train, "doc_id", "text", bench, n=3).collect()
    assert len(rows) == 1 and rows[0]["hit_grams"] == 1  # "x y z" once


def test_decontaminate_counts(corpora):
    train, bench = corpora
    got = {r["doc_id"]: r["hit_grams"]
           for r in decontaminate(train, "doc_id", "text", bench, n=4).collect()}
    # doc 1 shares "the quick brown fox" + "quick brown fox jumps";
    # doc 3 shares 4 of bench 102's 4-grams; doc 4 shares 1; doc 2 clean
    assert got[1] == 2
    assert got[3] == 4
    assert got[4] == 1
    assert 2 not in got


def test_exact_false_superset(corpora):
    train, bench = corpora
    exact = {r["doc_id"] for r in
             decontaminate(train, "doc_id", "text", bench, n=4).collect()}
    approx = {r["doc_id"] for r in
              decontaminate(train, "doc_id", "text", bench, n=4,
                            exact=False).collect()}
    assert exact <= approx


def test_drop_contaminated(corpora):
    train, bench = corpora
    kept = {r["doc_id"] for r in
            drop_contaminated(train, "doc_id", "text", bench, n=4).collect()}
    assert kept == {2}
    kept2 = {r["doc_id"] for r in
             drop_contaminated(train, "doc_id", "text", bench, n=4,
                               min_hits=2).collect()}
    assert kept2 == {2, 4}


def test_drop_broadcast_escape_hatch(corpora):
    train, bench = corpora
    want = sorted(r["doc_id"] for r in
                  drop_contaminated(train, "doc_id", "text", bench,
                                    n=4).collect())
    got = sorted(r["doc_id"] for r in
                 drop_contaminated(train, "doc_id", "text", bench, n=4,
                                   broadcast_flagged=False).collect())
    assert got == want


def test_no_overlap_empty(spark):
    train = spark.createDataFrame([(1, "aa bb cc dd")], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, "ee ff gg hh")], ["doc_id", "text"])
    assert decontaminate(train, "doc_id", "text", bench, n=2).count() == 0


def test_xxhash64_path(corpora):
    train, bench = corpora
    got = {r["doc_id"]: r["hit_grams"]
           for r in decontaminate(train, "doc_id", "text", bench, n=4,
                                  hash_fn="xxhash64").collect()}
    assert got == {1: 2, 3: 4, 4: 1}


def test_benchmark_ngrams_distinct(spark):
    bench = spark.createDataFrame([(1, "a b a b"), (2, "a b a b")],
                                  ["doc_id", "text"])
    grams = sorted(r["gram"] for r in benchmark_ngrams(bench, "text", 2).collect())
    assert grams == ["a b", "b a"]


def test_validation(corpora):
    train, bench = corpora
    with pytest.raises(ValueError, match="n must be"):
        decontaminate(train, "doc_id", "text", bench, n=0)
    with pytest.raises(ValueError, match="n must be"):
        word_ngrams_expr("text", 0)
