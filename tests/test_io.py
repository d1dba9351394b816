"""TableIO writer interface: parquet fallback path (no Iceberg jar here)."""

from cuckoo_filter_spark.sources.io import TableIO, iceberg_available


def test_tableio_parquet_roundtrip(spark, tmp_path):
    io = TableIO(spark, base_path=str(tmp_path))
    assert not io.use_iceberg  # explicit base_path → parquet mode
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    io.write(df, "t1")
    got = io.read("t1").orderBy("id").collect()
    assert [tuple(r) for r in got] == [(1, "a"), (2, "b")]
    # partitioned write
    io.write(df, "t2", partition_by=["v"])
    assert io.read("t2").count() == 2


def test_iceberg_probe_does_not_crash(spark):
    assert iceberg_available(spark) in (True, False)
