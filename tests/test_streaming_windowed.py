"""Windowed streaming HLL: per-window estimates within the error bound."""

import os

import numpy as np


def test_windowed_distinct_count(spark, tmp_path):
    from cuckoo_filter_spark.streaming.windowed import windowed_distinct_count

    src = str(tmp_path / "src")
    os.makedirs(src)
    import pandas as pd

    rows = []
    for h in range(3):  # 3 hourly windows
        for i in range(200):
            rows.append((pd.Timestamp("2025-01-01") + pd.Timedelta(hours=h, seconds=i),
                         f"u{h}_{i % (50 * (h + 1))}"))
    pdf = pd.DataFrame(rows, columns=["ts", "uid"])
    spark.createDataFrame(pdf).write.parquet(f"{src}/b0.parquet")

    stream = spark.readStream.schema("ts timestamp, uid string").parquet(src + "/*.parquet")
    agg = windowed_distinct_count(stream, "ts", "uid", window="1 hour",
                                  watermark="2 hours", p=12)
    q = (
        agg.writeStream.format("memory").queryName("win_out").outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = {r["window_start"].hour: r["estimate"]
           for r in spark.sql("select * from win_out").collect()}
    expected = {0: 50, 1: 100, 2: 150}
    assert set(out) == set(expected)
    for h, want in expected.items():
        assert abs(out[h] - want) / want < 0.1, (h, out[h], want)
