"""spread_small_input — the scale-adaptive scan spread (r7).

Tiny under-partitioned inputs get round-robin repartitioned to the
session parallelism; anything whose size estimate exceeds the bound is
returned UNCHANGED (same object — zero added Exchange at scale)."""

from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.spread import (
    plan_size_bytes,
    spread_small_input,
)


def test_spread_fires_on_tiny_single_partition_input(spark):
    df = spark.range(1000).coalesce(1).select(
        F.col("id"), F.concat(F.lit("u"), F.col("id")).alias("key"))
    out = spread_small_input(df)
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == target
    # results identical (round-robin moves rows, never changes them)
    assert sorted(r["key"] for r in out.collect()) == sorted(
        r["key"] for r in df.collect())


def test_spread_noop_above_size_bound(spark):
    df = spark.range(1000).coalesce(1)
    assert spread_small_input(df, max_bytes=0) is df  # "big" input: untouched


def test_spread_noop_when_already_parallel(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target)
    assert spread_small_input(df) is df


def test_spread_materialize_checkpoints_only_when_fired(spark):
    tiny = spark.range(100).coalesce(1)
    out = spread_small_input(tiny, materialize=True)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r["id"] for r in out.collect()) == list(range(100))
    big = spark.range(100).coalesce(1)
    assert spread_small_input(big, max_bytes=0, materialize=True) is big


def test_plan_size_estimate_sane(spark):
    est = plan_size_bytes(spark.range(10_000))
    assert est is not None and est > 0
