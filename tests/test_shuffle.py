"""Deterministic global shuffle: shard balance, cross-engine parity,
writer-path determinism under re-partitioned input."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.operators.shuffle import (
    assign_shards,
    shard_id_expr,
    shuffle_order_expr,
    shuffle_sql,
    shuffle_within_shards,
)

N = 4000


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.range(N).select(F.col("id").alias("k"))


def test_shard_balance_and_range(keys_df):
    counts = (
        assign_shards(keys_df, "k", 16, seed="s")
        .groupBy("shard").count().collect()
    )
    by_shard = {r["shard"]: r["count"] for r in counts}
    assert set(by_shard) == set(range(16))  # full range, no gaps
    # uniform hash: every shard within 40% of the mean at N=4000
    mean = N / 16
    assert all(0.6 * mean < c < 1.4 * mean for c in by_shard.values())


def test_determinism_and_seed_sensitivity(keys_df):
    a1 = assign_shards(keys_df, "k", 8, seed="a").collect()
    a2 = assign_shards(keys_df, "k", 8, seed="a").collect()
    assert sorted(a1) == sorted(a2)
    b = {r["k"]: r["shard"] for r in
         assign_shards(keys_df, "k", 8, seed="b").collect()}
    a = {r["k"]: r["shard"] for r in a1}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > N // 2  # a new seed is a genuinely new permutation


def test_duckdb_parity(keys_df):
    """shuffle_sql's spellings reproduce the Spark order key AND shard
    id row-for-row (the portability contract)."""
    got = (
        keys_df.select(
            "k",
            shuffle_order_expr("k", "p").alias("okey"),
            shard_id_expr("k", 11, "p").alias("shard"),
        ).orderBy("k").toPandas()
    )
    sql = shuffle_sql("k", 11, "p")
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": range(N)}))
    want = con.execute(
        f"SELECT k, {sql['order']} AS okey, {sql['shard']} AS shard "
        "FROM t ORDER BY k").df()
    assert list(got["okey"]) == list(want["okey"])
    assert list(got["shard"]) == list(want["shard"])


def test_null_key_gets_null_shard(spark):
    df = spark.createDataFrame([(1,), (None,)], "k int")
    rows = {r["k"]: r["shard"]
            for r in assign_shards(df, "k", 4).collect()}
    assert rows[1] is not None and rows[None] is None


def test_writer_path_contiguous_sorted_and_chunking_invariant(spark, keys_df):
    def run(df):
        out = shuffle_within_shards(df, "k", 8, seed="w")
        parts = out.select(
            F.spark_partition_id().alias("pid"), "shard", "k",
            shuffle_order_expr("k", "w").alias("okey"),
        ).toPandas()
        return parts

    base = run(keys_df)
    # within every physical partition: (shard, okey) is non-decreasing
    for _, g in base.groupby("pid"):
        keys = list(zip(g["shard"], g["okey"]))
        assert keys == sorted(keys)
    # each shard lives in exactly one partition
    spans = base.groupby("shard")["pid"].nunique()
    assert (spans == 1).all()
    # identical content + order regardless of input partitioning
    alt = run(keys_df.repartition(13))
    merged = base.sort_values(["shard", "okey"]).reset_index(drop=True)
    merged_alt = alt.sort_values(["shard", "okey"]).reset_index(drop=True)
    assert list(merged["k"]) == list(merged_alt["k"])
    # per-shard order equals the declared (okey, k) order
    for _, g in base.groupby("shard"):
        assert list(g["k"]) == [
            k for _, k in sorted(zip(g["okey"], g["k"]))]


def test_guards(keys_df):
    with pytest.raises(ValueError, match="num_shards"):
        shard_id_expr("k", 0)
    with pytest.raises(ValueError, match="num_shards"):
        shuffle_sql("k", 1 << 32)
    with pytest.raises(ValueError, match="single quote"):
        shuffle_sql("k", 4, seed="o'clock")
    with pytest.raises(ValueError, match="already exists"):
        assign_shards(keys_df.withColumn("shard", F.lit(1)), "k", 4)


def test_write_shuffled_shards(spark, keys_df, tmp_path):
    from cuckoo_filter_spark.operators.shuffle import write_shuffled_shards

    path = str(tmp_path / "corpus")
    m = write_shuffled_shards(keys_df, path, "k", 8, seed="w")
    assert m["rows_written"] == N and set(m["shards"]) == set(range(8))
    assert sum(m["shards"].values()) == N
    # the files round-trip the full content and the declared order:
    # within each shard directory, rows come back in (okey, k) order
    back = spark.read.parquet(path)
    got = back.select(
        "shard", "k", shuffle_order_expr("k", "w").alias("okey")
    ).toPandas()
    assert sorted(got["k"]) == list(range(N))
    for shard, g in got.groupby("shard"):
        assert list(g["k"]) == [k for _, k in sorted(zip(g["okey"], g["k"]))]
    # default mode refuses to clobber an existing snapshot
    with pytest.raises(Exception):
        write_shuffled_shards(keys_df, path, "k", 8, seed="w")
    # deliberate overwrite reproduces the identical manifest
    m2 = write_shuffled_shards(keys_df, path, "k", 8, seed="w",
                               mode="overwrite")
    assert m2 == m


def test_write_null_key_fails_loud(spark, tmp_path):
    from cuckoo_filter_spark.operators.shuffle import write_shuffled_shards

    df = spark.createDataFrame([(1,), (None,)], "k long")
    path = str(tmp_path / "nulls")
    with pytest.raises(Exception, match="NULL 'k' key"):
        write_shuffled_shards(df, path, "k", 4)
    # nothing was committed — no parquet part files on disk
    import pathlib
    assert not any(pathlib.Path(path).rglob("*.parquet"))
