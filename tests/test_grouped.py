"""Per-group filters / grouped distinct: exactness (raw-key dedupe, not
fingerprint), no per-group task funnel, per-group membership probes."""

import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.grouped import (
    build_grouped_filters,
    grouped_anti_join,
    grouped_distinct_count,
    grouped_might_contain_udf,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_grouped_distinct_count_exact(spark, docs):
    got = {r["lang"]: r["n_distinct"]
           for r in grouped_distinct_count(docs, "lang", "text").collect()}
    want = {r["lang"]: r["n"]
            for r in docs.groupBy("lang")
            .agg(F.countDistinct("text").alias("n")).collect()}
    assert got == want


def test_grouped_distinct_count_int_group(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = {r["user_id"]: r["n_distinct"]
           for r in grouped_distinct_count(ev, "user_id", "event_type").collect()}
    want = {r["user_id"]: r["n"]
            for r in ev.groupBy("user_id")
            .agg(F.countDistinct("event_type").alias("n")).collect()}
    assert got == want


def test_build_grouped_filters_membership(spark, docs):
    filters = build_grouped_filters(docs, "lang", "text")
    rows = filters.collect()
    want = {r["lang"]: r["n"]
            for r in docs.groupBy("lang")
            .agg(F.countDistinct("text").alias("n")).collect()}
    assert {r["lang"]: r["n_distinct"] for r in rows} == want
    # membership: every (lang, text) hits its own lang's filter
    mc = grouped_might_contain_udf(spark, filters)
    hits = docs.where(mc("lang", "text")).count()
    assert hits == docs.count()
    # cross-group: texts probed against the WRONG group mostly miss
    wrong = docs.withColumn("lang", F.concat(F.lit("zz-"), F.col("lang")))
    assert wrong.where(mc("lang", "text")).count() == 0  # no zz- filters


def test_grouped_anti_join_exact(spark, docs):
    seen = docs.where(F.col("doc_id") < 200)
    got = grouped_anti_join(docs, "lang", "text", seen)
    want = docs.join(
        seen.select("lang", "text").dropDuplicates(["lang", "text"]),
        on=["lang", "text"], how="left_anti")
    assert got.count() == want.count()
    assert got.select("doc_id").subtract(want.select("doc_id")).count() == 0


def test_grouped_filters_xxhash_counts(spark, docs):
    filters = build_grouped_filters(docs, "lang", "text", hash_fn="xxhash64")
    want = {r["lang"]: r["n"]
            for r in docs.groupBy("lang")
            .agg(F.countDistinct("text").alias("n")).collect()}
    assert {r["lang"]: r["n_distinct"] for r in filters.collect()} == want


def test_grouped_anti_join_rejects_xxhash64(spark, docs):
    seen = docs.where(F.col("doc_id") < 100)
    with pytest.raises(ValueError, match="metro64"):
        grouped_anti_join(docs, "lang", "text", seen, hash_fn="xxhash64")


def test_grouped_probe_rejects_prebuilt_xxhash_filters(spark, docs):
    """The filters frame records hash_fn, so even PREBUILT xxhash64
    filters passed via filters= are rejected instead of silently missing
    every member."""
    filters = build_grouped_filters(docs, "lang", "text", hash_fn="xxhash64")
    with pytest.raises(ValueError, match="metro64"):
        grouped_might_contain_udf(spark, filters)
    seen = docs.where(F.col("doc_id") < 100)
    with pytest.raises(ValueError, match="metro64"):
        grouped_anti_join(docs, "lang", "text", seen, filters=filters)
