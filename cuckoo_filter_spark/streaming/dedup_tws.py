"""Streaming approximate dedup on the Spark 4.x stateful API
(``transformWithStateInPandas`` / StatefulProcessor) — same semantics
as :mod:`cuckoo_filter_spark.streaming.dedup` (applyInPandasWithState
with a cuckoo blob per shard), expressed through the newer handle/
ValueState surface so the library covers both stateful APIs; migrate
callers here if applyInPandasWithState ever deprecates.

State remains the reference §1.5 blob (one ValueState per shard), so
batch jobs can decode/merge/inspect streaming state with the kernel
either way.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from cuckoo_filter_spark.kernel.filter import CuckooKernel
from cuckoo_filter_spark.params import CuckooParams


class CuckooDedupProcessor(StatefulProcessor):
    """One cuckoo-filter blob per grouping key (shard) in a ValueState;
    emits only first-seen rows. Overflow semantics mirror
    streaming_dedup's on_overflow contract."""

    def __init__(self, params: CuckooParams, key_col: str, cols: list[str],
                 on_overflow: str, shard_capacity: int):
        self._params = params
        self._key_col = key_col
        self._cols = cols
        self._on_overflow = on_overflow
        self._shard_capacity = shard_capacity

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._blob = handle.getValueState("blob", "blob binary")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        from cuckoo_filter_spark.streaming.dedup import run_dedup_batches

        if self._blob.exists():
            (blob,) = self._blob.get()
            kern = CuckooKernel.from_bytes(bytes(blob))
        else:
            kern = CuckooKernel(self._params)
        holder = [kern]
        # the micro-batch core (overflow / rotate / at-least-once
        # semantics) is SHARED with streaming_dedup — one definition
        yield from run_dedup_batches(rows, self._key_col, self._cols,
                                     self._on_overflow, self._shard_capacity,
                                     self._params, key, holder)
        self._blob.update((bytearray(holder[0].to_bytes()),))

    def close(self) -> None:
        pass


def streaming_dedup_tws(
    stream_df: DataFrame,
    key_col: str,
    num_shards: int = 16,
    shard_capacity: int = 1 << 20,
    bits_per_item: int = 16,
    output_mode: str = "append",
    on_overflow: str = "passthrough",
) -> DataFrame:
    """stream → stream of first-seen rows, via transformWithStateInPandas.

    Same contract as streaming.dedup.streaming_dedup (see its docstring
    for the on_overflow modes); requires the RocksDB state store
    provider that transformWithState mandates — the caller's stream
    config, not this function, selects it."""
    if on_overflow not in ("passthrough", "rotate", "error"):
        raise ValueError(f"unknown on_overflow {on_overflow!r}")
    from cuckoo_filter_spark.streaming.compat import require_protobuf

    require_protobuf("streaming.dedup.streaming_dedup")
    params = CuckooParams.for_capacity(shard_capacity, 4, bits_per_item, 0)
    # null-key rows dropped — same contract as streaming_dedup (see its
    # docstring: NaN bytes crash the core; string NULL aliases '')
    stream_df = stream_df.where(F.col(key_col).isNotNull())
    cols = [f.name for f in stream_df.schema.fields]
    shards = stream_df.withColumn(
        "__shard", F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_shards))
    )
    return shards.groupBy("__shard").transformWithStateInPandas(
        CuckooDedupProcessor(params, key_col, cols, on_overflow,
                             shard_capacity),
        outputStructType=stream_df.schema,
        outputMode=output_mode,
        timeMode="None",
    )
