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
            vals = pdf[col]
            if len(vals) == 0:
                continue
            rows += len(vals)
            if value_kind == "numeric":
                sk.update(vals.to_numpy(dtype="float64"))
            else:
                sk.update(vals)
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
                vals = pdf[col]
                if kind == "numeric":
                    sk.update(vals.to_numpy(dtype="float64"))
                else:
                    sk.update(vals)
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
