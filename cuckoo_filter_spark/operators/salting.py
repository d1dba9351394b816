"""Skew handling: explicit salting of hot keys (north_star "explicit
salting of skewed host partitions").

Web-crawl url tables are Zipfian by host: a groupBy/repartition keyed
by host sends the hottest hosts' rows to single tasks. The fix is the
standard two-phase salted aggregation, packaged:

* ``salted_repartition`` — repartition by (key, salt) where salt ∈
  [0, S) only for keys detected hot (frequency sketch above threshold),
  0 otherwise. Co-location is preserved for cold keys; hot keys spread
  over S tasks.
* ``salted_group_count`` — two-phase count: partial groupBy (key,
  salt) then final groupBy key. Works for any associative aggregate.

Hot-key detection uses the count-min sketch (one pass, mergeable) so no
exact pre-aggregation is needed — at 10^12 rows an exact groupBy to
FIND the skew would itself be the bottleneck.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from cuckoo_filter_spark.sketches.base import build_sketch
from cuckoo_filter_spark.sketches.countmin import CountMinSketch


def detect_hot_keys(
    df: DataFrame, key_col: str, threshold_frac: float = 0.001,
    width: int = 1 << 16, depth: int = 4,
) -> list:
    """Keys whose (overestimated) frequency exceeds threshold_frac of
    rows — one count-min pass + one distinct scan of candidate keys.
    CMS never underestimates, so no hot key is missed (some cold keys
    may be flagged; harmless — they just get salted too)."""
    cms, _ = build_sketch(df, key_col, lambda: CountMinSketch(width=width, depth=depth))
    thresh = cms.total * threshold_frac

    # candidate pass: keys present at least once in a sampled distinct set
    distinct_keys = [r[key_col] for r in df.select(key_col).distinct().collect()]
    est = cms.query(pd.Series(distinct_keys))
    return [k for k, e in zip(distinct_keys, est) if e >= thresh]


def with_salt(
    df: DataFrame, key_col: str, hot_keys: list, num_salts: int = 16,
    salt_col: str = "__salt",
) -> DataFrame:
    """Adds salt ∈ [0, num_salts) for hot keys, 0 for the rest
    (deterministic spread via a hash of a row-local component)."""
    hot = F.array(*[F.lit(k) for k in hot_keys])
    spread = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(num_salts))
    return df.withColumn(
        salt_col,
        F.when(F.array_contains(hot, F.col(key_col)), spread).otherwise(F.lit(0)),
    )


def salted_repartition(
    df: DataFrame, key_col: str, hot_keys: list | None = None,
    num_salts: int = 16, num_partitions: int | None = None,
) -> DataFrame:
    """repartition by (key, salt): cold keys stay co-located, hot keys
    fan out over num_salts tasks."""
    if hot_keys is None:
        hot_keys = detect_hot_keys(df, key_col)
    salted = with_salt(df, key_col, hot_keys, num_salts)
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return salted.repartition(n, F.col(key_col), F.col("__salt")).drop("__salt")


def salted_group_count(
    df: DataFrame, key_col: str, hot_keys: list | None = None, num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe groupBy count → (key, n)."""
    if hot_keys is None:
        hot_keys = detect_hot_keys(df, key_col)
    salted = with_salt(df, key_col, hot_keys, num_salts)
    partial = salted.groupBy(key_col, "__salt").agg(F.count(F.lit(1)).alias("__n"))
    return partial.groupBy(key_col).agg(F.sum("__n").alias("n"))
