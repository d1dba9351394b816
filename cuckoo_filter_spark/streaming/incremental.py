"""Incremental filter build over a stream — foreachBatch + blob merge.

Each micro-batch builds a batch filter (the normal distributed build)
and merges it into a persisted blob via the associative union
(SURVEY.md §2.3): the whole point of mergeable sketches is that
streaming ingestion is just repeated merge."""

from __future__ import annotations

import os

from cuckoo_filter_spark.kernel.filter import CuckooKernel
from cuckoo_filter_spark.params import CuckooParams


class incremental_filter_build:
    """foreachBatch sink: maintains <path>/filter.bin as the running
    union of all micro-batches' keys.

    Usage::

        sink = incremental_filter_build(path, key_col='url',
                                        capacity=10**7)
        q = (stream.writeStream.foreachBatch(sink)
             .option('checkpointPath', ...).start())
    """

    def __init__(self, path: str, key_col: str, capacity: int,
                 bits_per_item: int = 16, mode: str = "unique_local"):
        self.path = path
        self.key_col = key_col
        self.params = CuckooParams.for_capacity(int(capacity * 1.15), 4,
                                                bits_per_item, 0)
        self.mode = mode
        os.makedirs(path, exist_ok=True)

    @property
    def blob_path(self) -> str:
        return os.path.join(self.path, "filter.bin")

    def current(self) -> CuckooKernel:
        if os.path.exists(self.blob_path):
            with open(self.blob_path, "rb") as f:
                return CuckooKernel.from_bytes(f.read())
        return CuckooKernel(self.params)

    def __call__(self, batch_df, batch_id: int) -> None:
        from cuckoo_filter_spark.operators.build import build_cuckoo_filter

        build = build_cuckoo_filter(
            batch_df, self.key_col, params=self.params, mode=self.mode
        )
        merged = self.current()
        merged.merge(build.kernel(), dedupe=self.mode != "multiset")
        tmp = self.blob_path + f".tmp{batch_id}"
        with open(tmp, "wb") as f:
            f.write(merged.to_bytes())
        os.replace(tmp, self.blob_path)  # atomic publish
