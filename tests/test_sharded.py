"""Sharded build: membership parity with single-filter build, routing,
and broadcast probe UDF."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.build import build_cuckoo_filter
from cuckoo_filter_spark.operators.sharded import (
    build_sharded_cuckoo_filter,
    sharded_might_contain_udf,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def keys_df(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs.select(F.concat_ws("/", "source", "doc_id").alias("key"))


def test_sharded_matches_single(spark, keys_df):
    n = keys_df.count()
    single = build_cuckoo_filter(keys_df, "key", capacity=n)
    sharded = build_sharded_cuckoo_filter(keys_df, "key", capacity=n, num_shards=8)
    assert sharded.size == n
    members = [r["key"] for r in keys_df.collect()]
    assert sharded.contain(members).all(), "false negative in sharded filter"
    probes = [f"absent{i}" for i in range(20000)]
    sk = single.kernel()
    fp_single = sk.contain(probes).mean()
    fp_sharded = sharded.contain(probes).mean()
    assert fp_sharded <= max(4 * fp_single, 0.001) + 1e-9


def test_sharded_udf(spark, keys_df):
    sharded = build_sharded_cuckoo_filter(keys_df, "key", num_shards=4)
    mc = sharded_might_contain_udf(spark, sharded)
    hits = keys_df.where(mc(F.col("key"))).count()
    assert hits == keys_df.count()


def test_sharded_metrics_lineage(spark, keys_df):
    sharded = build_sharded_cuckoo_filter(keys_df, "key", num_shards=8)
    assert len(sharded.metrics) <= 8
    assert sum(m["stored"] for m in sharded.metrics) == keys_df.count()
    assert all(m["load_factor"] <= 0.97 for m in sharded.metrics)
