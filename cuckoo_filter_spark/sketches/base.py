"""Shared sketch contract + distributed build (mergeable-UDAF pattern).

Every sketch implements:
* ``update(items)`` — vectorized batch update (keys via the shared
  metro64 Arrow path; numeric sketches take numeric arrays directly)
* ``merge(other)`` — associative, commutative combine
* ``to_bytes()/from_bytes()`` — blob round-trip for shuffle/persist

``build_sketch`` distributes any of them exactly like the cuckoo build:
per-partition partial in mapInPandas, partials collected (one small blob
row each) and reduced on the driver. Shuffle-free; the only data
movement is one blob per partition.
"""

from __future__ import annotations

import time
from functools import reduce
from typing import Callable, Iterator

import pandas as pd


def build_sketch(df, col: str, make_sketch: Callable[[], object], value_kind: str = "keys"):
    """Distributed build of any mergeable sketch over df[col].

    value_kind: 'keys' → sketch.update(batch) gets the raw column
    (hashed inside); 'numeric' → gets a float64 numpy array.
    Returns (sketch, metrics list).
    """
    schema = "partition_id int, rows bigint, wall_ms double, blob binary"

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
                "rows": [rows],
                "wall_ms": [(time.perf_counter() - t0) * 1000.0],
                "blob": [sk.to_bytes()],
            }
        )

    rows = df.select(col).mapInPandas(partial, schema).collect()
    metrics = [
        {"partition_id": r["partition_id"], "rows": r["rows"], "wall_ms": r["wall_ms"]}
        for r in rows
    ]
    proto = make_sketch()
    sketches = (type(proto).from_bytes(bytes(r["blob"])) for r in rows if r["rows"] > 0)
    merged = reduce(lambda a, b: a.merge(b), sketches, proto)
    return merged, metrics


def build_flagged_sketches(df, specs: list[tuple]):
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

    rows = df.select(*sel).mapInPandas(partial, schema).collect()
    metrics = [
        {"partition_id": r["partition_id"], "sketch_id": r["sketch_id"],
         "rows": r["rows"], "wall_ms": r["wall_ms"]}
        for r in rows
    ]
    merged = []
    for sid, (_, make) in enumerate(specs):
        proto = make()
        parts = (type(proto).from_bytes(bytes(r["blob"])) for r in rows
                 if r["sketch_id"] == sid and r["rows"] > 0)
        merged.append(reduce(lambda a, b: a.merge(b), parts, proto))
    return merged, metrics


def build_sketches(df, specs: list[tuple]):
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

    rows = df.select(*cols).mapInPandas(partial, schema).collect()
    merged = []
    for sid, (_, make, _) in enumerate(specs):
        proto = make()
        parts = (type(proto).from_bytes(bytes(r["blob"])) for r in rows
                 if r["sketch_id"] == sid and r["rows"] > 0)
        merged.append(reduce(lambda a, b: a.merge(b), parts, proto))
    return merged
