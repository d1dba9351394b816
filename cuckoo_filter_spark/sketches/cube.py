"""Sketch cube — approximate COUNT(DISTINCT) at ARBITRARY grouping sets
from ONE scan, generalizing :mod:`cuckoo_filter_spark.sketches.rollup`.

``hll_rollup`` handles the prefix-hierarchy special case; this module
computes any ``GROUP BY GROUPING SETS(...)`` / ``CUBE(...)`` cube: every
requested grouping set is a subset of the finest grouping, so its blobs
merge from the finest level's ALREADY-merged blobs (register max is
associative/commutative — the same merge law the rollup module pins).
The input is scanned exactly once, for any number of sets:

* phase 1 — one ``mapInPandas`` pass on the natural input partitions
  emits a 2^p-byte HLL blob per (partition, finest group); no raw key
  ever crosses a partition boundary.
* phase 2 — blobs merge per finest group; the result is eagerly
  localCheckpoint-ed ONCE and every grouping set merges from it.
* phase 3 — per requested set: a tiny shuffle of G_finest blobs keyed
  by that set's columns. Cost per set is blobs-only, independent of
  input size.

The exact plan (Spark's Expand) multiplies the input by the number of
grouping sets and shuffles raw keys per set — at 10^12 rows × a 2^k
cube that is 2^k full-corpus shuffles. Here it is one scan + 2^k
blob-merges over ``G_finest × 2^p`` bytes.

Output marks rolled-up columns with SQL ``GROUPING_ID`` semantics
(bit i, counting from the LEFT of ``group_cols``, set when that column
is rolled up — ``GROUPING_ID(a,b) = grouping(a)*2 + grouping(b)``),
which disambiguates a real NULL group value from a rollup marker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cuckoo_filter_spark.sketches.hll import HLLSketch
from cuckoo_filter_spark.sketches.rollup import (
    _build_partials,
    _estimate_udf,
    _merge_level,
    _validate_cols,
)


def hll_grouping_sets(
    df: DataFrame,
    group_cols: list[str],
    sets: list[list[str]],
    key_col: str,
    p: int = 12,
    est_col: str = "est_distinct",
    keep_blobs: bool = False,
) -> DataFrame:
    """Approximate ``GROUP BY GROUPING SETS(sets) COUNT(DISTINCT
    key_col)`` from ONE scan — see module docstring for the plan shape.

    Each entry of ``sets`` must be a subset of ``group_cols`` (order
    within a set is irrelevant; output column order follows
    ``group_cols``). Returns one row per group across all sets with
    columns ``group_cols..., gid int, est_col double`` (+ ``blob`` when
    ``keep_blobs``); ``gid`` is the SQL GROUPING_ID bitmask and
    rolled-up columns are NULL. Estimates carry HLL's published
    ±1.04/√2^p relative error and are deterministic given (p, data).
    """
    if not group_cols:
        raise ValueError("hll_grouping_sets needs at least one group column")
    _validate_cols(group_cols, key_col, est_col, "gid")
    canon: list[tuple[str, ...]] = []
    seen: set[tuple[str, ...]] = set()
    for s in sets:
        extra = set(s) - set(group_cols)
        if extra:
            raise ValueError(
                f"grouping set {s!r} has columns {sorted(extra)} "
                f"outside group_cols {group_cols}")
        key = tuple(c for c in group_cols if c in set(s))
        if key in seen:
            raise ValueError(f"duplicate grouping set {s!r}")
        seen.add(key)
        canon.append(key)
    if not canon:
        raise ValueError("hll_grouping_sets needs at least one grouping set")

    partials, ddl_of = _build_partials(df, group_cols, key_col, p)
    # ONE checkpointed finest level; every set merges from these blobs
    finest = _merge_level(partials, group_cols, ddl_of, p).localCheckpoint()

    est = _estimate_udf(p)
    pieces = []
    for keep in canon:
        gid = sum((1 << (len(group_cols) - 1 - i))
                  for i, c in enumerate(group_cols) if c not in keep)
        lv = (finest if keep == tuple(group_cols)
              else _merge_level(finest, list(keep), ddl_of, p))
        out = lv.withColumn("gid", F.lit(gid))
        for c in group_cols:
            if c not in keep:
                out = out.withColumn(
                    c, F.lit(None).cast(df.schema[c].dataType))
        out = out.withColumn(est_col, est(F.col("blob")))
        if not keep_blobs:
            out = out.drop("blob")
        pieces.append(out.select(*group_cols, "gid", est_col,
                                 *(["blob"] if keep_blobs else [])))
    result = pieces[0]
    for piece in pieces[1:]:
        result = result.unionByName(piece)
    return result


def hll_cube(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    p: int = 12,
    est_col: str = "est_distinct",
    keep_blobs: bool = False,
    max_cols: int = 6,
) -> DataFrame:
    """Approximate ``GROUP BY CUBE(group_cols) COUNT(DISTINCT key_col)``
    — all 2^k grouping sets from ONE scan via :func:`hll_grouping_sets`.

    ``max_cols`` guards the 2^k set blow-up (the scan cost is constant,
    but each set is a blob-merge job; 2^6 = 64 is already generous).
    """
    k = len(group_cols)
    if k > max_cols:
        raise ValueError(
            f"hll_cube over {k} columns = {2 ** k} grouping sets; "
            f"raise max_cols (= {max_cols}) explicitly if intended")
    sets = [[c for i, c in enumerate(group_cols) if mask & (1 << i)]
            for mask in range(2 ** k)]
    return hll_grouping_sets(df, group_cols, sets, key_col, p=p,
                             est_col=est_col, keep_blobs=keep_blobs)
