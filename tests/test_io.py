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


def test_tableio_without_backend_fails_loud(spark, tmp_path):
    """No Iceberg on the classpath + no base_path must raise, not
    read/write a literal './None/<name>.parquet' directory; and the
    parquet fallback honors append."""
    import pytest

    from cuckoo_filter_spark.sources.io import TableIO, iceberg_available

    if iceberg_available(spark):
        pytest.skip("Iceberg present — the no-backend path can't occur")
    io = TableIO(spark)
    df = spark.range(3).selectExpr("id")
    with pytest.raises(ValueError, match="no backend"):
        io.write(df, "pages")
    with pytest.raises(ValueError, match="no backend"):
        io.read("pages")
    ok = TableIO(spark, base_path=str(tmp_path))
    with pytest.raises(ValueError, match="unsupported mode"):
        ok.write(df, "pages", mode="error_if_exists")
    ok.write(df, "pages")
    ok.write(df, "pages", mode="append")
    assert ok.read("pages").count() == 6
