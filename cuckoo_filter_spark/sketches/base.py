"""Shared sketch contract + distributed build (mergeable-UDAF pattern).

Every sketch implements:
* ``update(items)`` — vectorized batch update (keys via the shared
  metro64 Arrow path; numeric sketches take numeric arrays directly)
* ``merge(other)`` — associative, commutative combine
* ``to_bytes()/from_bytes()`` — blob round-trip for shuffle/persist

``build_sketch`` distributes any of them exactly like the cuckoo build:
per-partition partial in mapInPandas, partials collected (one small blob
row each) and reduced on the driver. Shuffle-free below
``TREE_MERGE_AT`` source partitions; above it (the 100 TB regime —
10^5-10^6 scan tasks would otherwise collect tens of GB of blobs and
run a serial million-iteration reduce loop on the driver, VERDICT r6
#1) ONE distributed tree level merges each of ~sqrt(P) groups in
``applyInPandas`` first — only blob rows cross that Exchange, and the
driver then collects/reduces O(sqrt(P)) rows (same shape as
rollup._merge_level and the sharded cuckoo combine).
"""

from __future__ import annotations

import math
import time
from functools import reduce
from typing import Callable, Iterator

import pandas as pd

#: partial-blob rows above this many source partitions go through one
#: executor-side tree-merge level before the driver collect. At local/
#: bench partition counts the direct collect is faster and keeps the
#: pre-r7 plan byte-identical; at corpus scale (>= thousands of scan
#: tasks) the tree keeps the driver at O(sqrt(P)) rows.
TREE_MERGE_AT = 256


def _num_plan_partitions(df) -> int:
    """Partition count the mapInPandas partials will run with (driver-
    side only, no job)."""
    try:
        return df.rdd.getNumPartitions()
    except Exception:
        return 0


def tree_merge_level(parts_df, makes, n_groups: int):
    """ONE executor-side merge level over a partial-blob frame
    (schema: partition_id int, sketch_id int, rows bigint, wall_ms
    double, blob binary): partials land in ``pmod(partition_id,
    n_groups)`` merge groups, each group's blobs merge per sketch_id in
    ``applyInPandas`` (associativity is the pinned sketch merge law),
    and one row per (group, sketch) comes back — rows summed, wall_ms
    the group max, partition_id = the merge group id. Only blob rows
    cross the Exchange; raw keys are long gone."""
    from pyspark.sql import functions as F

    schema = ("partition_id int, sketch_id int, rows bigint, "
              "wall_ms double, blob binary")

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        sid = int(pdf["sketch_id"].iloc[0])
        proto = makes[sid]()
        for rows_n, blob in zip(pdf["rows"], pdf["blob"]):
            if rows_n > 0:
                proto = proto.merge(type(proto).from_bytes(bytes(blob)))
        return pd.DataFrame(
            {
                "partition_id": [int(pdf["__g"].iloc[0])],
                "sketch_id": [sid],
                "rows": [int(pdf["rows"].sum())],
                "wall_ms": [float(pdf["wall_ms"].max())],
                "blob": [proto.to_bytes()],
            }
        )

    return (
        parts_df.withColumn(
            "__g", F.pmod(F.col("partition_id"), F.lit(int(n_groups))))
        .groupBy("__g", "sketch_id")
        .applyInPandas(combine, schema)
    )


def collect_and_merge(parts_df, makes, n_partitions: int,
                      tree_merge_at: int = TREE_MERGE_AT):
    """Collect a partial-blob frame and merge per sketch_id.

    Returns (merged sketches in sketch_id order, collected rows).
    Below ``tree_merge_at`` source partitions: direct collect + driver
    reduce (the classic path, plan-identical to pre-r7). Above: one
    ``tree_merge_level`` of ceil(sqrt(P)) groups runs on executors and
    the driver reduces the O(sqrt(P)) group rows."""
    if n_partitions > tree_merge_at:
        parts_df = tree_merge_level(
            parts_df, makes, int(math.ceil(math.sqrt(n_partitions))))
    rows = parts_df.collect()
    merged = []
    for sid, make in enumerate(makes):
        proto = make()
        parts = (type(proto).from_bytes(bytes(r["blob"])) for r in rows
                 if r["sketch_id"] == sid and r["rows"] > 0)
        merged.append(reduce(lambda a, b: a.merge(b), parts, proto))
    return merged, rows


def build_sketch(df, col: str, make_sketch: Callable[[], object],
                 value_kind: str = "keys",
                 tree_merge_at: int = TREE_MERGE_AT):
    """Distributed build of any mergeable sketch over df[col].

    value_kind: 'keys' → sketch.update(batch) gets the raw column
    (hashed inside); 'numeric' → gets a float64 numpy array.
    Returns (sketch, metrics list). Above ``tree_merge_at`` source
    partitions the combine runs one executor-side tree level first
    (module docstring) and metrics carry one row per MERGE GROUP
    (partition_id = group id, rows summed) instead of per partition.
    """
    schema = ("partition_id int, sketch_id int, rows bigint, "
              "wall_ms double, blob binary")

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        sk = make_sketch()
        rows = 0
        t0 = time.perf_counter()
        for pdf in batches:
            # SQL aggregate NULL semantics: NULLs are excluded (a NULL
            # key would otherwise hash as the '' phantom / crash on
            # numerics; a NaN would poison quantile sketches), and
            # integral key identity is restored for null-bearing
            # batches (the canon_int_keys hazard)
            from cuckoo_filter_spark.hashing import canon_int_keys

            vals = pdf[col].dropna()
            if len(vals) == 0:
                continue
            rows += len(vals)
            if value_kind == "numeric":
                sk.update(vals.to_numpy(dtype="float64"))
            else:
                sk.update(canon_int_keys(vals))
        yield pd.DataFrame(
            {
                "partition_id": [pid],
                "sketch_id": [0],
                "rows": [rows],
                "wall_ms": [(time.perf_counter() - t0) * 1000.0],
                "blob": [sk.to_bytes()],
            }
        )

    sel = df.select(col)
    parts = sel.mapInPandas(partial, schema)
    (merged,), rows = collect_and_merge(
        parts, [make_sketch], _num_plan_partitions(sel), tree_merge_at)
    metrics = [
        {"partition_id": r["partition_id"], "rows": r["rows"], "wall_ms": r["wall_ms"]}
        for r in rows
    ]
    return merged, metrics


def build_flagged_sketches(df, specs: list[tuple],
                           tree_merge_at: int = TREE_MERGE_AT):
    """ONE scan -> one mergeable sketch per (col, make_sketch) spec,
    NULLs excluded per column, schema-aware key identity.

    The null exclusion is the subset-composition hook: pre-project row
    predicates as ``F.when(cond, key_col)`` columns and a single pass
    builds a sketch per SUBSET without re-scanning per predicate (same
    pattern as theta.build_theta_sketches; this is the generic version
    for any str-identity sketch). Integral Spark columns are restored
    to int64 even when NULLs force pandas to a float dtype, so key
    identity stays '402' (the CAST(x AS VARCHAR) convention), never
    '402.0' — values must fit float64's 2^53 integer range on
    int-with-nulls columns, true for any id column this library
    targets.

    Scale shape: per-partition partials in mapInPandas, one small blob
    row per (partition, sketch) collected, driver reduce — zero raw-key
    shuffle. Returns ([sketch per spec], metrics rows with per-sketch
    non-null counts).
    """
    from pyspark.sql import types as T

    if not specs:
        raise ValueError("build_flagged_sketches needs at least one spec")
    cols = [c for c, _ in specs]
    # project each column once even when several specs share it (a
    # duplicated name would make pdf[c] a frame, not a Series)
    sel = list(dict.fromkeys(cols))
    fields = {f.name: f.dataType for f in df.select(*sel).schema.fields}
    integral = tuple(
        isinstance(fields[c], (T.LongType, T.IntegerType,
                               T.ShortType, T.ByteType))
        for c in cols
    )
    schema = ("partition_id int, sketch_id int, rows bigint, "
              "wall_ms double, blob binary")

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        sks = [make() for _, make in specs]
        counts = [0] * len(specs)
        t0 = time.perf_counter()
        for pdf in batches:
            for i, c in enumerate(cols):
                vals = pdf[c].dropna()
                if len(vals) == 0:
                    continue
                counts[i] += len(vals)
                if integral[i]:
                    vals = vals.astype("int64")
                sks[i].update(vals)
        wall = (time.perf_counter() - t0) * 1000.0
        yield pd.DataFrame(
            {
                "partition_id": [pid] * len(sks),
                "sketch_id": list(range(len(sks))),
                "rows": counts,
                "wall_ms": [wall] * len(sks),
                "blob": [sk.to_bytes() for sk in sks],
            }
        )

    seldf = df.select(*sel)
    parts = seldf.mapInPandas(partial, schema)
    merged, rows = collect_and_merge(
        parts, [make for _, make in specs], _num_plan_partitions(seldf),
        tree_merge_at)
    metrics = [
        {"partition_id": r["partition_id"], "sketch_id": r["sketch_id"],
         "rows": r["rows"], "wall_ms": r["wall_ms"]}
        for r in rows
    ]
    return merged, metrics


def build_sketches(df, specs: list[tuple],
                   tree_merge_at: int = TREE_MERGE_AT):
    """Build SEVERAL mergeable sketches in ONE scan (one mapInPandas
    pass; one small blob row per (partition, sketch)).

    specs: list of (col, make_sketch, value_kind) triples — columns may
    differ between sketches; the scan projects their union. Returns the
    list of merged sketches in spec order. Halves (or better) the wall
    time of workloads that previously called build_sketch per sketch.
    """
    cols = list(dict.fromkeys(c for c, _, _ in specs))
    schema = "partition_id int, sketch_id int, rows bigint, wall_ms double, blob binary"

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        sks = [make() for _, make, _ in specs]
        rows = 0
        t0 = time.perf_counter()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows += len(pdf)
            for sk, (col, _, kind) in zip(sks, specs):
                from cuckoo_filter_spark.hashing import canon_int_keys

                vals = pdf[col].dropna()  # same NULL/identity rule
                if len(vals) == 0:
                    continue
                if kind == "numeric":
                    sk.update(vals.to_numpy(dtype="float64"))
                else:
                    sk.update(canon_int_keys(vals))
        wall = (time.perf_counter() - t0) * 1000.0
        yield pd.DataFrame(
            {
                "partition_id": [pid] * len(sks),
                "sketch_id": list(range(len(sks))),
                "rows": [rows] * len(sks),
                "wall_ms": [wall] * len(sks),
                "blob": [sk.to_bytes() for sk in sks],
            }
        )

    seldf = df.select(*cols)
    parts = seldf.mapInPandas(partial, schema)
    merged, _rows = collect_and_merge(
        parts, [make for _, make, _ in specs], _num_plan_partitions(seldf),
        tree_merge_at)
    return merged
