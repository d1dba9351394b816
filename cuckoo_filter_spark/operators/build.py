"""Distributed cuckoo-filter build (build plan M2, lifecycle SURVEY.md §3).

The build is the mergeable-UDAF pattern Spark uses for its own partial
aggregates: a per-partition *partial* filter is built inside
``mapInPandas`` (Arrow batches → vectorized metro64 fingerprinting →
frontier batch insert; no per-row Python), then partials are combined
with the associative merge (SURVEY.md §2.3 — sound because the
alt-index is an involution, cuckoofilter.go:105-108).

All partials share the final filter's exact (b, f, num_buckets,
table_type), so merged indices align. Partition count does not affect
membership answers (asserted in tests at local[2]/local[8]).

Scale notes (100 TB / 10^12 rows):
* plain mode is shuffle-free: partials build on whatever partitioning
  the scan produced; only the (small per partition count) blob rows move.
* ``unique=True`` adds exactly one shuffle — ``repartition(key)`` — so
  duplicate keys co-locate and partition-local AddUnique is globally
  exact. This is the dedup-build used by distinct-url workloads.
* for filters whose table exceeds executor memory, use
  ``cuckoo_filter_spark.operators.sharded`` (shard by fingerprint top
  bits; each shard built/merged independently).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import reduce
from typing import Iterator

import pandas as pd

from cuckoo_filter_spark.kernel.filter import CuckooKernel
from cuckoo_filter_spark.params import TABLE_SINGLE, CuckooParams

BUILD_SCHEMA = (
    "partition_id int, rows bigint, stored bigint, kicks bigint, "
    "victim_used boolean, load_factor double, wall_ms double, blob binary"
)

# Default headroom over the observed/declared key count when sizing the
# table, so merged partials stay under max_load_factor (SURVEY.md §7 M5).
DEFAULT_HEADROOM = 1.15


@dataclass
class CuckooBuild:
    """Result of a distributed build: the final blob + per-partition lineage."""

    params: CuckooParams
    blob: bytes
    metrics: list[dict] = field(default_factory=list)

    def kernel(self) -> CuckooKernel:
        return CuckooKernel.from_bytes(self.blob)

    @property
    def size(self) -> int:
        return self.kernel().size()

    def metrics_df(self, spark):
        cols = [
            "partition_id",
            "rows",
            "stored",
            "kicks",
            "victim_used",
            "load_factor",
            "wall_ms",
        ]
        rows = [tuple(m[c] for c in cols) for m in self.metrics]
        return spark.createDataFrame(
            rows,
            "partition_id int, rows bigint, stored bigint, kicks bigint, "
            "victim_used boolean, load_factor double, wall_ms double",
        )


def _partial_builder(params: CuckooParams, key_col: str, unique: bool):
    """mapInPandas function: one partial filter per partition."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        kern = CuckooKernel(params, seed=0x1337C0FFEE ^ pid)
        rows = 0
        stored = 0
        t0 = time.perf_counter()
        for pdf in batches:
            keys = pdf[key_col]
            n = len(keys)
            if n == 0:
                continue
            rows += n
            if unique:
                ok = kern.add_unique(keys)
            else:
                ok = kern.add(keys)
            stored += int(ok.sum())
        wall_ms = (time.perf_counter() - t0) * 1000.0
        yield pd.DataFrame(
            {
                "partition_id": [pid],
                "rows": [rows],
                "stored": [stored],
                "kicks": [kern.kicks],
                "victim_used": [kern.victim_used],
                "load_factor": [kern.load_factor()],
                "wall_ms": [wall_ms],
                "blob": [kern.to_bytes()],
            }
        )

    return build


def build_cuckoo_filter(
    df,
    key_col: str,
    capacity: int | None = None,
    tags_per_bucket: int = 4,
    bits_per_item: int = 16,
    table_type: int = TABLE_SINGLE,
    unique: bool = False,
    num_partitions: int | None = None,
    headroom: float = DEFAULT_HEADROOM,
    params: CuckooParams | None = None,
) -> CuckooBuild:
    """Build one global cuckoo filter over ``df[key_col]``.

    capacity: expected number of keys; if None, counted with a cheap
    ``df.count()`` (column-pruned scan). ``unique=True`` shuffles by key
    so AddUnique is globally exact (exactly one stored copy per key).
    """
    sel = df.select(key_col)
    if params is None:
        if capacity is None:
            capacity = sel.count()
        params = CuckooParams.for_capacity(
            max(int(capacity * headroom), 64), tags_per_bucket, bits_per_item, table_type
        )

    if unique:
        from pyspark.sql import functions as F

        n = num_partitions or sel.sparkSession.sparkContext.defaultParallelism
        sel = sel.repartition(n, F.col(key_col))
    elif num_partitions:
        sel = sel.repartition(num_partitions)

    parts = sel.mapInPandas(_partial_builder(params, key_col, unique), BUILD_SCHEMA)
    rows = parts.collect()  # one small row per partition (blob + metrics)

    metrics = [
        {k: r[k] for k in ("partition_id", "rows", "stored", "kicks", "victim_used",
                           "load_factor", "wall_ms")}
        for r in rows
    ]
    kernels = (CuckooKernel.from_bytes(bytes(r["blob"])) for r in rows if r["rows"] > 0)
    try:
        first = next(kernels)
    except StopIteration:
        first = CuckooKernel(params)
    merged = reduce(lambda a, b: a.merge(b), kernels, first)
    return CuckooBuild(params=params, blob=merged.to_bytes(), metrics=metrics)
