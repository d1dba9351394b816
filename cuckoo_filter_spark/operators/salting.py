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

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from cuckoo_filter_spark.sketches.countmin import CountMinSketch


def detect_hot_keys(
    df: DataFrame, key_col: str, threshold_frac: float = 0.001,
    width: int = 1 << 16, depth: int = 4,
) -> list:
    """Keys whose frequency exceeds threshold_frac of rows, in ONE scan
    and without ever materializing the distinct key set (web-crawl host
    columns have 10⁷–10⁸ distinct keys; a distinct().collect() dies).

    Per-partition partial = (CMS blob, local candidates). Candidates are
    batch-level heavy keys: by ratio pigeonhole, a key with global
    frequency ≥ frac·N must have count ≥ frac·batch_rows in at least one
    Arrow batch — if it were below that ratio in every batch, summing
    over batches would put it below frac·N globally. So the candidate
    union is a guaranteed superset of the true hot set, bounded by
    ≤ 1/frac keys per batch. The driver merges the CMS partials (never
    underestimates) and keeps candidates clearing the global threshold:
    no hot key is missed; rare cold keys flagged by CMS collisions are
    harmless (they just get salted too).

    A hot NULL key is reported as ``None`` in the result: groupBy /
    repartition co-locate NULLs like any value (``host_of`` on a dirty
    URL column makes NULL the single hottest "key"), and value_counts /
    CMS silently drop NaN — so NULLs get an EXACT side-count per
    partition instead."""
    key_t = df.schema[key_col].dataType.simpleString()
    schema = f"rows bigint, nulls bigint, blob binary, cands array<{key_t}>"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = CountMinSketch(width=width, depth=depth)
        cands: set = set()
        rows = 0
        nulls = 0
        for pdf in batches:
            vals = pdf[key_col]
            if len(vals) == 0:
                continue
            rows += len(vals)
            nulls += int(vals.isna().sum())
            vals_nn = vals.dropna()
            if len(vals_nn) == 0:
                continue
            sk.update(vals_nn)
            vc = vals_nn.value_counts()
            cands.update(vc[vc >= threshold_frac * len(vals)].index.tolist())
        yield pd.DataFrame(
            {"rows": [rows], "nulls": [nulls], "blob": [sk.to_bytes()],
             "cands": [list(cands)]})

    rows = df.select(key_col).mapInPandas(partial, schema).collect()
    merged = CountMinSketch(width=width, depth=depth)
    all_cands: set = set()
    total_rows = 0
    total_nulls = 0
    for r in rows:
        if r["rows"] > 0:
            merged = merged.merge(CountMinSketch.from_bytes(bytes(r["blob"])))
            all_cands.update(r["cands"])
            total_rows += int(r["rows"])
            total_nulls += int(r["nulls"])
    thresh = total_rows * threshold_frac
    out: list = [None] if total_nulls and total_nulls >= thresh else []
    if not all_cands:
        return out
    cand_list = list(all_cands)
    est = merged.query(pd.Series(cand_list))
    return out + [k for k, e in zip(cand_list, est) if e >= thresh]


def with_salt(
    df: DataFrame, key_col: str, hot_keys: list, num_salts: int = 16,
    salt_col: str = "__salt", spread_cols: list | None = None,
) -> DataFrame:
    """Adds salt ∈ [0, num_salts) for hot keys, 0 for the rest.

    The spread MUST be retry-deterministic: a salt from
    ``monotonically_increasing_id()`` (or rand()) feeding a shuffle is
    the classic Spark retry hazard — a lost executor recomputes its map
    tasks, the id assigns differently on the second attempt, and rows
    land under different salts than the map output already fetched by
    finished reducers (rows double-counted or lost). The salt here is
    xxhash64(all columns, spark_partition_id()): row content spreads
    rows that differ anywhere; the partition id spreads byte-identical
    duplicates sitting in different partitions and is itself stable
    under retry (a partition re-executes with the same id and the same
    rows — Spark sorts before round-robin exchanges to guarantee
    exactly that). The residual degenerate case — byte-identical rows
    of a hot key all inside ONE partition — stays on one salt, which is
    where one map task already held them anyway. Pass ``spread_cols``
    to pick distinguishing columns explicitly when hashing every column
    is wasteful (wide rows).

    ``None`` in ``hot_keys`` marks the NULL key as hot (what
    :func:`detect_hot_keys` reports for NULL-heavy columns) — handled
    explicitly because ``array_contains(hot, NULL)`` is NULL, which a
    ``when()`` treats as false."""
    if salt_col in df.columns:
        raise ValueError(
            f"salt_col {salt_col!r} already exists in the DataFrame")
    null_hot = any(k is None for k in hot_keys)
    hot_nonnull = [k for k in hot_keys if k is not None]
    if hot_nonnull:
        is_hot = F.coalesce(
            F.array_contains(F.array(*[F.lit(k) for k in hot_nonnull]),
                             F.col(key_col)),
            F.lit(False))
    else:
        is_hot = F.lit(False)
    if null_hot:
        is_hot = is_hot | F.col(key_col).isNull()
    cols = spread_cols if spread_cols is not None else df.columns
    spread = F.pmod(
        F.xxhash64(*[F.col(c) for c in cols], F.spark_partition_id()),
        F.lit(num_salts))
    return df.withColumn(
        salt_col, F.when(is_hot, spread).otherwise(F.lit(0)))


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
