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

    @property
    def _state_path(self) -> str:
        # authoritative (batch_id, blob) pair — ONE os.replace commits
        # both, so there is no window where the blob contains a batch
        # the recorded id does not (which a replay would double-merge)
        return os.path.join(self.path, "filter.state")

    def _load_state(self) -> tuple[int, "CuckooKernel"]:
        import struct

        if os.path.exists(self._state_path):
            with open(self._state_path, "rb") as f:
                raw = f.read()
            (bid,) = struct.unpack_from("<q", raw, 0)
            return bid, CuckooKernel.from_bytes(raw[8:])
        return -1, CuckooKernel(self.params)

    def current(self) -> CuckooKernel:
        return self._load_state()[1]

    def __call__(self, batch_df, batch_id: int) -> None:
        import struct

        from cuckoo_filter_spark.operators.build import build_cuckoo_filter

        # foreachBatch is AT-LEAST-ONCE on restart: if the query died
        # between our publish and the streaming checkpoint commit, Spark
        # replays this batch_id — merging it twice would double-count
        # every key under mode='multiset' (wrong delete accounting,
        # possible overflow). The committed state already contains this
        # batch → exactly-once by skipping.
        last_id, merged = self._load_state()
        if batch_id <= last_id:
            return
        build = build_cuckoo_filter(
            batch_df, self.key_col, params=self.params, mode=self.mode
        )
        merged.merge(build.kernel(), dedupe=self.mode != "multiset")
        blob = merged.to_bytes()
        tmp = self._state_path + f".tmp{batch_id}"
        with open(tmp, "wb") as f:
            f.write(struct.pack("<q", batch_id) + blob)
        os.replace(tmp, self._state_path)  # atomic commit (id + blob)
        # convenience copy in the reference §1.5 blob format (readers
        # that crash-land between the two replaces still see a blob
        # that is at most one committed batch behind filter.state)
        btmp = self.blob_path + f".tmp{batch_id}"
        with open(btmp, "wb") as f:
            f.write(blob)
        os.replace(btmp, self.blob_path)
