"""Distributed cuckoo-filter build (build plan M2, lifecycle SURVEY.md §3).

The build is the mergeable-UDAF pattern Spark uses for its own partial
aggregates: a per-partition *partial* is computed inside ``mapInPandas``
(Arrow batches → vectorized metro64 fingerprinting; no per-row Python),
partials are combined with the associative merge (SURVEY.md §2.3 —
sound because the alt-index is an involution, cuckoofilter.go:105-108).

Two partial representations:

* ``sparse`` (default) — a partial is the array of (bucket, tag) pairs
  (locally deduped in unique modes). This is a cuckoo filter whose
  eviction work is deferred: insertion order is free, so running the
  kick loop once at combine time yields the same membership. Partial
  size ∝ keys in the partition (8 bytes/key), NOT table size — at 10^12
  rows the collected/shuffled volume is the data's fingerprint volume,
  and no executor ever materializes a full table during the scan.
* ``table`` — a partial is a full-size filter blob (§1.5 bytes); merge
  is merge-by-reinsertion of occupied slots. Demonstrates blob-level
  merge associativity; preferred when partials are reused standalone.

Scale notes (100 TB / 10^12 rows):
* plain/unique_local modes are shuffle-free: partials build on the scan
  partitioning; only pair blobs move to the combiner.
* ``unique_global`` adds exactly one shuffle — ``repartition(key)`` — so
  duplicate keys co-locate and partition-local dedupe is globally exact.
* one driver-combined filter caps out around 10^8 keys; beyond that use
  ``cuckoo_filter_spark.operators.sharded`` (shard by fingerprint top
  bits; each shard built/combined independently on executors).
"""

from __future__ import annotations

import struct
import time
from dataclasses import dataclass, field
from functools import reduce
from typing import Iterator

import numpy as np
import pandas as pd

from cuckoo_filter_spark.hashing import metro64_batch
from cuckoo_filter_spark.kernel.filter import CuckooKernel
from cuckoo_filter_spark.params import TABLE_SINGLE, CuckooParams

BUILD_SCHEMA = (
    "partition_id int, rows bigint, stored bigint, distinct_keys bigint, "
    "kicks bigint, victim_used boolean, load_factor double, wall_ms double, "
    "blob binary"
)

# Default headroom over the observed/declared key count when sizing the
# table, so merged partials stay under max_load_factor (SURVEY.md §7 M5).
DEFAULT_HEADROOM = 1.15

# Above this many keys the single-blob build auto-routes to the sharded
# build: the classic path collects 8 B/key of pair/hash blobs to the
# driver, which is fine to ~10^7-10^8 keys and a driver OOM at 10^12.
# The sharded path's combine runs per shard on executors. NOTE the
# routed build still collects the finished shard TABLE blobs (~2.1 B/key
# at f=16) unless shard_output_path is given — fine to ~10^9 keys
# (~2.3 GB); beyond that pass shard_output_path so executors write the
# blobs to storage and only metrics rows reach the driver (the
# build_sharded_cuckoo_filter output_path contract).
AUTO_SHARD_THRESHOLD = 10_000_000

# Routed builds above this many keys warn if no shard_output_path is
# given (the driver-side blob dict would exceed ~2 GB).
BLOB_COLLECT_WARN_KEYS = 1_000_000_000

_SPARSE_MAGIC = b"SPRS"
_HASH_MAGIC = b"HSH8"


def pack_hashes(h: np.ndarray) -> bytes:
    return _HASH_MAGIC + struct.pack("<Q", len(h)) + h.astype("<u8").tobytes()


def unpack_hashes(blob: bytes) -> np.ndarray:
    assert blob[:4] == _HASH_MAGIC
    (n,) = struct.unpack_from("<Q", blob, 4)
    return np.frombuffer(blob, dtype="<u8", count=n, offset=12)


def pack_pairs(bi: np.ndarray, tags: np.ndarray) -> bytes:
    return (
        _SPARSE_MAGIC
        + struct.pack("<Q", len(bi))
        + bi.astype("<u4").tobytes()
        + tags.astype("<u4").tobytes()
    )


def unpack_pairs(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    assert blob[:4] == _SPARSE_MAGIC
    (n,) = struct.unpack_from("<Q", blob, 4)
    bi = np.frombuffer(blob, dtype="<u4", count=n, offset=12).astype(np.int64)
    tags = np.frombuffer(blob, dtype="<u4", count=n, offset=12 + 4 * n).astype(np.uint32)
    return bi, tags


@dataclass
class CuckooBuild:
    """Result of a distributed build: the final blob + per-partition lineage."""

    params: CuckooParams
    blob: bytes
    metrics: list[dict] = field(default_factory=list)
    hash_fn: str = "metro64"

    def kernel(self) -> CuckooKernel:
        return CuckooKernel.from_bytes(self.blob)

    @property
    def size(self) -> int:
        return self.kernel().size()

    def metrics_df(self, spark):
        cols = ["partition_id", "rows", "stored", "kicks", "victim_used",
                "load_factor", "wall_ms"]
        rows = [tuple(m[c] for c in cols) for m in self.metrics]
        return spark.createDataFrame(
            rows,
            "partition_id int, rows bigint, stored bigint, kicks bigint, "
            "victim_used boolean, load_factor double, wall_ms double",
        )


class DistinctAccum:
    """Vectorized exact distinct accumulator over pandas Series OR
    DataFrames — replaces the per-row Python ``set.update(tolist())``
    pattern (hash-based pandas dedupe, no per-row object churn).
    With dropna=True (default, Series key columns): COUNT(DISTINCT)
    semantics — nulls and NaN are dropped, so a float-NaN key can never
    inflate the count (NaN != NaN made Python sets accumulate one entry
    per NaN batch). Frame inputs (e.g. (group, key) pairs, where null
    GROUPS must survive) pass dropna=False and filter nulls themselves.

    Memory: holds the partition's distinct values. Consolidation is
    amortized-linear: new batches buffer until the buffered volume
    reaches max(threshold, size of the consolidated base) — a fixed
    threshold alone would re-dedupe the whole base on EVERY batch once
    the base outgrew it (quadratic at 10^7+ distinct keys/partition).
    ONE definition of this policy — grouped._partial_emitter shares it."""

    __slots__ = ("_parts", "_pending", "_base_len", "_dropna")
    _CONSOLIDATE_AT = 4_000_000

    def __init__(self, dropna: bool = True) -> None:
        self._parts: list = []
        self._pending = 0  # buffered rows NOT yet in the consolidated base
        self._base_len = 0
        self._dropna = dropna

    def add(self, keys) -> None:
        u = (keys.dropna() if self._dropna else keys).drop_duplicates()
        if len(u) == 0:
            return
        self._parts.append(u)
        self._pending += len(u)
        if self._pending >= max(self._CONSOLIDATE_AT, self._base_len):
            self._consolidate()

    def _consolidate(self) -> None:
        if len(self._parts) > 1 or self._pending:
            self._parts = [
                pd.concat(self._parts, ignore_index=True).drop_duplicates()]
            self._base_len = len(self._parts[0])
            self._pending = 0

    def consolidated(self):
        """The deduped accumulation (Series or DataFrame; empty Series
        when nothing was added)."""
        self._consolidate()
        return self._parts[0] if self._parts else pd.Series(dtype=object)

    def __len__(self) -> int:
        self._consolidate()
        return self._base_len


# per-partition key budget for count_distinct_exact's in-memory
# DistinctAccum (raw keys, no spill): ~20M URL-sized keys ≈ 1-3 GB of
# pandas string storage — safely inside one executor task's memory.
# Mirrors _choose_num_shards' ~8M-keys-per-shard sizing rule.
KEYS_PER_COUNT_PARTITION = 20_000_000


def choose_count_partitions(default_parallelism: int, est_rows: int | None) -> int:
    """Auto partition count for count_distinct_exact: enough partitions
    that no DistinctAccum holds more than ~KEYS_PER_COUNT_PARTITION raw
    keys, floored at the session parallelism."""
    if est_rows is None:
        return default_parallelism
    return max(default_parallelism, -(-est_rows // KEYS_PER_COUNT_PARTITION))


def count_distinct_exact(
    df: DataFrame,
    key_col: str,
    num_partitions: int | None = None,
    est_rows: int | None = None,
) -> int:
    """Exact global COUNT(DISTINCT key_col) with NO blob emission and no
    per-key driver traffic — the count-only companion of the
    ``mode='unique_global'`` build (which exists to produce a FILTER and
    pays 8 B/key of pair blobs for it; at 10^9+ distinct keys that
    collect is a driver OOM the count never needed).

    Shape: repartition(key) co-locates duplicates, a mapInPandas pass
    dedupes RAW keys per partition (vectorized DistinctAccum —
    COUNT(DISTINCT) null semantics, exact under co-location), and the
    per-partition counts are summed JVM-side; exactly ONE aggregated row
    reaches the driver. Same two-phase shape as grouped_distinct_count
    (grouped.py) with a single global group.

    ``df.select(key).distinct().count()`` is the pure-JVM equivalent —
    use it when no lineage is needed; this path exists so callers of the
    build API get the identical raw-key semantics (and partition-local
    dedupe, which never shuffles more than one row per partition after
    the key shuffle) without constructing a filter.

    Partition sizing (VERDICT r4 #3): each partition's DistinctAccum
    holds its slice of the DISTINCT raw keys in memory (no spill), so
    at 10^12-key scale ``defaultParallelism`` partitions would OOM the
    executors. Pass ``est_rows`` (an upper bound is fine — extra
    partitions only add tiny 1-row outputs) and the default becomes
    ``max(defaultParallelism, ceil(est_rows / KEYS_PER_COUNT_PARTITION))``
    — ~20M keys ≈ 1-3 GB of string storage per partition. With neither
    ``num_partitions`` nor ``est_rows``, the small-input default of
    ``defaultParallelism`` applies (right below ~10^9 keys on a
    32-way session; declare the size above that).
    """
    from pyspark.sql import functions as F

    dp = df.sparkSession.sparkContext.defaultParallelism
    n = num_partitions or choose_count_partitions(dp, est_rows)
    sel = df.select(key_col).repartition(n, F.col(key_col))

    def counter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = DistinctAccum()
        for pdf in batches:
            acc.add(pdf[key_col])
        yield pd.DataFrame({"distinct_keys": [len(acc)]})

    parts = sel.mapInPandas(counter, "distinct_keys bigint")
    row = parts.agg(F.sum("distinct_keys").alias("n")).collect()[0]
    return int(row["n"] or 0)


def canon_dedupe_pairs(params: CuckooParams, bi: np.ndarray,
                       tags: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Keep the first occurrence per canonical (bucket-pair, tag) —
    set semantics on the fingerprint space; orientation-independent via
    the alt involution. Shared by the sparse builder, the shard pair
    emitter and the deferred-route explode (one definition, one future
    fix)."""
    if len(bi) == 0:
        return bi, tags
    alt = params.alt(bi, tags)
    canon = (np.minimum(bi, alt).astype(np.uint64) << np.uint64(32)) | tags
    _, first = np.unique(canon, return_index=True)
    first = np.sort(first)
    return bi[first], tags[first]


def hashes_of(pdf_col, hash_fn: str) -> np.ndarray:
    """Column batch → uint64 hashes. 'metro64' hashes key bytes in numpy
    (reference parity); '__prehashed__' means the column already holds
    a JVM-computed 64-bit hash (e.g. F.xxhash64 — whole-stage codegen,
    no Python hashing cost). Callers must have EXCLUDED null keys;
    integral identity is restored here (a bigint column's null-bearing
    batches reach pandas as float64 — hashing those bytes would split
    fingerprint identity from the int64 batches)."""
    from cuckoo_filter_spark.hashing import canon_int_keys

    if hash_fn == "__prehashed__":
        return pdf_col.to_numpy(dtype="int64").view(np.uint64)
    return metro64_batch(canon_int_keys(pdf_col))


def _sparse_partial_builder(params: CuckooParams, key_col: str, unique: bool,
                            hash_fn: str = "metro64", count_keys: bool = False):
    """mapInPandas: fingerprint + locally dedupe; emit (bucket, tag) pairs.

    count_keys: additionally dedupe on the RAW key value (vectorized
    DistinctAccum) and report the count as ``distinct_keys``.
    Fingerprints collide on the ~nb·2^f canon space, so ``stored``
    under-counts distinct keys with probability growing ~n²/canon_space;
    the raw-key count is exact within the partition (and globally exact
    under ``unique_global`` co-location, COUNT(DISTINCT) null semantics:
    nulls/NaN excluded)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        rows = 0
        t0 = time.perf_counter()
        bis: list[np.ndarray] = []
        tgs: list[np.ndarray] = []
        seen: DistinctAccum | None = DistinctAccum() if count_keys else None
        for pdf in batches:
            # NULL keys are EXCLUDED (the library convention; a NULL
            # string slot would alias '' and a NULL numeric slot
            # crashes the flat-bytes path); rows counts non-null keys
            keys = pdf[key_col].dropna()
            if len(keys) == 0:
                continue
            rows += len(keys)
            if seen is not None:
                seen.add(keys)
            idx, tag = params.split(hashes_of(keys, hash_fn))
            bis.append(idx)
            tgs.append(tag)
        bi = np.concatenate(bis) if bis else np.zeros(0, dtype=np.int64)
        tags = np.concatenate(tgs) if tgs else np.zeros(0, dtype=np.uint32)
        if unique:
            bi, tags = canon_dedupe_pairs(params, bi, tags)
        wall_ms = (time.perf_counter() - t0) * 1000.0
        yield pd.DataFrame(
            {
                "partition_id": [pid],
                "rows": [rows],
                "stored": [len(bi)],
                "distinct_keys": [len(seen) if seen is not None else None],
                "kicks": [0],
                "victim_used": [False],
                "load_factor": [len(bi) / params.size_in_tags],
                "wall_ms": [wall_ms],
                "blob": [pack_pairs(bi, tags)],
            }
        )

    return build


def _hash_partial_builder(key_col: str, unique: bool, hash_fn: str = "metro64",
                          count_keys: bool = False):
    """mapInPandas partial that emits raw 64-bit hashes (8 B/key, the
    same volume as split pairs) instead of (bucket, tag) pairs. Used
    when no capacity hint exists: table params are then sized at combine
    time from the DEDUPED global count — one scan total, no separate
    count() pass, and the table is sized on distinct keys rather than
    row count (tighter at high duplication)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        rows = 0
        t0 = time.perf_counter()
        hs: list[np.ndarray] = []
        seen: DistinctAccum | None = DistinctAccum() if count_keys else None
        for pdf in batches:
            # NULL keys are EXCLUDED (the library convention; a NULL
            # string slot would alias '' and a NULL numeric slot
            # crashes the flat-bytes path); rows counts non-null keys
            keys = pdf[key_col].dropna()
            if len(keys) == 0:
                continue
            rows += len(keys)
            if seen is not None:
                seen.add(keys)
            hs.append(hashes_of(keys, hash_fn))
        h = np.concatenate(hs) if hs else np.zeros(0, dtype=np.uint64)
        if unique and len(h):
            h = np.unique(h)  # same-key copies share a hash; canon-space
            # dedupe happens again at insert time with the final params
        wall_ms = (time.perf_counter() - t0) * 1000.0
        yield pd.DataFrame(
            {
                "partition_id": [pid],
                "rows": [rows],
                "stored": [len(h)],
                "distinct_keys": [len(seen) if seen is not None else None],
                "kicks": [0],
                "victim_used": [False],
                "load_factor": [None],  # table not sized yet
                "wall_ms": [wall_ms],
                "blob": [pack_hashes(h)],
            }
        )

    return build


def _table_partial_builder(params: CuckooParams, key_col: str, unique: bool,
                           count_keys: bool = False):
    """mapInPandas: one full-size partial filter blob per partition."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        kern = CuckooKernel(params, seed=0x1337C0FFEE ^ pid)
        rows = 0
        stored = 0
        t0 = time.perf_counter()
        seen: DistinctAccum | None = DistinctAccum() if count_keys else None
        for pdf in batches:
            # NULL keys are EXCLUDED (the library convention; a NULL
            # string slot would alias '' and a NULL numeric slot
            # crashes the flat-bytes path); rows counts non-null keys
            keys = pdf[key_col].dropna()
            if len(keys) == 0:
                continue
            rows += len(keys)
            if seen is not None:
                seen.add(keys)
            ok = kern.add_unique(keys) if unique else kern.add(keys)
            stored += int(ok.sum())
        wall_ms = (time.perf_counter() - t0) * 1000.0
        yield pd.DataFrame(
            {
                "partition_id": [pid],
                "rows": [rows],
                "stored": [stored],
                "distinct_keys": [len(seen) if seen is not None else None],
                "kicks": [kern.kicks],
                "victim_used": [kern.victim_used],
                "load_factor": [kern.load_factor()],
                "wall_ms": [wall_ms],
                "blob": [kern.to_bytes()],
            }
        )

    return build


def _choose_num_shards(capacity: int) -> int:
    """Shard count for auto-routed builds: ~8M keys per shard (a few MB
    of table each), floored at 32 so the combine parallelizes."""
    from cuckoo_filter_spark.params import next_pow2

    return max(32, next_pow2(max(int(np.ceil(capacity / 8_000_000)), 1)))


def _warn_blob_collect(n_keys: int, shard_output_path: str | None) -> None:
    if shard_output_path is None and n_keys > BLOB_COLLECT_WARN_KEYS:
        import warnings

        warnings.warn(
            f"auto-shard routed build over ~{n_keys} keys will collect "
            f"~{n_keys * 2.1 / 1e9:.1f} GB of shard table blobs to the "
            f"driver; pass shard_output_path so executors write them to "
            f"storage instead (only metrics rows then reach the driver)")


def _sharded_from_hash_partials(parts, est_keys: int, num_shards: int,
                                tags_per_bucket: int, bits_per_item: int,
                                table_type: int, headroom: float, unique: bool,
                                hash_fn: str, output_path: str | None = None,
                                distinct_total: int | None = None):
    """Deferred-sizing build whose observed key count crossed the
    auto-shard threshold: re-shuffle the already-computed per-partition
    hash blobs by shard (NO second scan of the source) and run the
    per-shard kick combine on executors — the driver never sees pair
    blobs. Sizing uses the sum of per-partition deduped counts, an upper
    bound on the global distinct count, so shards land at or below the
    target load."""
    from cuckoo_filter_spark.operators import sharded as sh

    per_shard_cap = max(int(est_keys * headroom / num_shards), 64)
    params = CuckooParams.for_capacity(per_shard_cap, tags_per_bucket,
                                       bits_per_item, table_type)

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for pid, rows_n, blob in zip(pdf["partition_id"], pdf["rows"],
                                         pdf["blob"]):
                if not rows_n:
                    continue
                h = unpack_hashes(bytes(blob))
                shards = sh.shard_of(h, num_shards)
                idx, tag = params.split(h)
                out_shard, out_n, out_blob = [], [], []
                for s_id, rs in sh.iter_shard_groups(shards):
                    bi, tg = idx[rs], tag[rs]
                    if unique:
                        bi, tg = canon_dedupe_pairs(params, bi, tg)
                    out_shard.append(s_id)
                    out_n.append(len(bi))
                    out_blob.append(pack_pairs(bi, tg))
                yield pd.DataFrame(
                    {"shard": out_shard,
                     # the partial's partition_id (unique per input row)
                     # keeps the per-shard combine order deterministic
                     "src_partition": [int(pid)] * len(out_shard),
                     "n": out_n, "rows": [int(rows_n)] * len(out_shard),
                     # per-shard raw-key counts were not computed on this
                     # path (hash partials lost the raw keys); the exact
                     # total travels via distinct_total instead
                     "distinct_keys": pd.array(
                         [None] * len(out_shard), dtype="Int64"),
                     "blob": out_blob})

    pairs = parts.select("partition_id", "rows", "blob").mapInPandas(
        explode, sh.PAIRS_SCHEMA)
    shards_df = pairs.groupBy("shard").applyInPandas(
        sh._shard_combiner(params, unique), sh.SHARD_SCHEMA)
    if output_path is not None:
        # executors write the blobs; only metrics rows reach the driver
        shards_df.write.mode("overwrite").parquet(output_path)
        mrows = parts.sparkSession.read.parquet(output_path).drop(
            "blob").collect()
        blobs = {}
    else:
        mrows = shards_df.collect()
        blobs = {int(r["shard"]): bytes(r["blob"]) for r in mrows}
    metrics = [
        # SAME key set as the declared-capacity route (sharded.py) so
        # consumers see one metrics shape on both routes; per-shard
        # distinct_keys is None here (hash partials lost the raw keys —
        # the exact TOTAL travels via distinct_keys on the build object)
        {k: r[k] for k in ("shard", "rows", "stored", "distinct_keys",
                           "kicks", "victim_used", "load_factor", "wall_ms")}
        for r in mrows
    ]
    return sh.ShardedCuckooBuild(
        params=params, num_shards=num_shards, blobs=blobs,
        metrics=metrics, path=output_path, hash_fn=hash_fn,
        distinct_keys=distinct_total)


def build_cuckoo_filter(
    df,
    key_col: str,
    capacity: int | None = None,
    tags_per_bucket: int = 4,
    bits_per_item: int = 16,
    table_type: int = TABLE_SINGLE,
    mode: str = "unique_local",
    partial_format: str = "sparse",
    num_partitions: int | None = None,
    headroom: float = DEFAULT_HEADROOM,
    params: CuckooParams | None = None,
    hash_fn: str = "metro64",
    auto_shard: int | None = AUTO_SHARD_THRESHOLD,
    shard_output_path: str | None = None,
) -> CuckooBuild:
    """Build one global cuckoo filter over ``df[key_col]``.

    capacity: expected number of keys. If None with sparse partials
    (default), sizing is DEFERRED: partials carry raw 64-bit hashes and
    the table is sized at combine time from the deduped count — one
    scan total (no count() pass) and tighter tables under duplication.
    If None with table partials, a column-pruned ``df.count()`` runs
    first (full-size partial blobs need upfront params).

    mode:
    * ``unique_local`` (default) — set semantics for membership filters:
      per-partition fingerprint dedupe + dedup combine; no shuffle; one
      stored copy per fingerprint. (A key's copies can only occupy its 2
      candidate buckets — ≤ 2b slots — so multiset inserts of heavily
      duplicated keys overflow; membership never needs the copies.)
    * ``unique_global`` — additionally ``repartition(key)`` so duplicate
      keys co-locate; per-partition RAW-key dedupe counts (the
      ``distinct_keys`` metric) then sum to the exact global distinct
      count (one shuffle). ``stored`` stays the fingerprint count, which
      can undercount distinct keys via canon-space collisions — use
      ``distinct_keys`` for exact counting. (With hash_fn='xxhash64' the
      "raw key" is the JVM 64-bit hash, so the count is exact w.r.t. the
      hash and probabilistically exact w.r.t. keys, ~n²/2⁶⁵ collision
      odds.)
    * ``multiset`` — reference Add semantics (one copy per row); needed
      when delete must track per-row copies.

    hash_fn: ``metro64`` (default — reference-parity fingerprints, blobs
    cross-decodable with the Go layout) or ``xxhash64`` — Spark computes
    the 64-bit hash JVM-side in whole-stage codegen and Python only
    splits/inserts; fastest path when reference hash parity isn't needed.
    Probes must use the same hash_fn (might_contain_udf handles this).

    auto_shard: when the (declared or observed) key count exceeds this
    threshold the build routes to ``build_sharded_cuckoo_filter`` and
    returns a :class:`ShardedCuckooBuild` — the classic path collects
    8 B/key of pair blobs to the driver, a driver OOM at 10^9+ keys.
    ``might_contain_udf`` and the semi/anti joins accept both build
    types, so the routing is transparent to query code. Not applied to
    explicit ``params`` or ``partial_format='table'``. ``None``
    disables. ``unique_global`` routes like the rest (the
    repartition(key) co-location and the shard shuffle compose): the
    routed build carries the exact distinct count in
    ``build.distinct_keys``; callers that only need the COUNT should use
    :func:`count_distinct_exact`, which never emits blobs at all.

    shard_output_path: where a ROUTED build's shard blobs are written
    (by the executors; only metrics rows reach the driver). Without it
    a routed build driver-collects the shard table blobs (~2.1 B/key at
    f=16) — fine to ~10^9 keys, warned about beyond. Ignored when the
    build does not route.
    """
    if mode not in ("unique_local", "unique_global", "multiset"):
        raise ValueError(f"unknown mode {mode!r}")
    if partial_format not in ("sparse", "table"):
        raise ValueError(f"unknown partial_format {partial_format!r}")
    if hash_fn not in ("metro64", "xxhash64"):
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    may_route = (auto_shard is not None and params is None
                 and partial_format == "sparse")
    if may_route and capacity is not None and capacity > auto_shard:
        from cuckoo_filter_spark.operators.sharded import (
            build_sharded_cuckoo_filter,
        )

        _warn_blob_collect(capacity, shard_output_path)
        if num_partitions and mode != "unique_global":
            # honor the caller's parallelism request on the routed path
            # too — EXCEPT for unique_global, whose sharded build
            # immediately repartitions by key anyway: a round-robin
            # shuffle first would just move the whole input twice
            df = df.repartition(num_partitions)
        return build_sharded_cuckoo_filter(
            df, key_col, capacity=capacity,
            num_shards=_choose_num_shards(capacity),
            tags_per_bucket=tags_per_bucket, bits_per_item=bits_per_item,
            table_type=table_type, mode=mode, headroom=headroom,
            hash_fn=hash_fn, output_path=shard_output_path)
    inner_hash = hash_fn
    if hash_fn == "xxhash64":
        from pyspark.sql import functions as F

        if partial_format != "sparse":
            raise ValueError("hash_fn='xxhash64' requires partial_format='sparse'")
        # drop nulls BEFORE hashing: F.xxhash64(NULL) = seed 42 (a
        # non-null bigint) would store a phantom fingerprint — the
        # metro64 route's notna() null exclusion must hold here too
        df = df.where(F.col(key_col).isNotNull()).select(
            F.xxhash64(key_col).alias(key_col))
        inner_hash = "__prehashed__"
    sel = df.select(key_col)
    # No capacity hint + sparse partials → defer table sizing to combine
    # time (partials carry raw hashes): avoids a dedicated count() scan.
    deferred = params is None and capacity is None and partial_format == "sparse"
    if params is None and not deferred:
        if capacity is None:
            capacity = sel.count()  # table partials need upfront params
        params = CuckooParams.for_capacity(
            max(int(capacity * headroom), 64), tags_per_bucket,
            bits_per_item, table_type)  # dispatches vacuum sizing

    if mode == "unique_global":
        from pyspark.sql import functions as F

        n = num_partitions or sel.sparkSession.sparkContext.defaultParallelism
        sel = sel.repartition(n, F.col(key_col))
    elif num_partitions:
        sel = sel.repartition(num_partitions)

    unique = mode != "multiset"
    count_keys = mode == "unique_global"
    if deferred:
        builder = _hash_partial_builder(key_col, unique, inner_hash, count_keys)
    elif partial_format == "sparse":
        builder = _sparse_partial_builder(params, key_col, unique, inner_hash,
                                          count_keys)
    else:
        builder = _table_partial_builder(params, key_col, unique, count_keys)
    parts = sel.mapInPandas(builder, BUILD_SCHEMA)
    if deferred and may_route:
        # observe the (partition-deduped) key count from the tiny metric
        # columns BEFORE pulling any blob to the driver; if it crosses
        # the threshold, shuffle the persisted hash partials by shard
        # and combine on executors instead.
        parts = parts.persist()
        try:
            mrows = parts.select("stored", "distinct_keys").collect()
            est = sum(r["stored"] for r in mrows)
            if est > auto_shard:
                _warn_blob_collect(est, shard_output_path)
                # unique_global partials already carry exact raw-key
                # distinct counts (the input was key-partitioned), so
                # the routed build keeps the exact total
                dk_total = (sum(r["distinct_keys"] or 0 for r in mrows)
                            if count_keys else None)
                return _sharded_from_hash_partials(
                    parts, est, _choose_num_shards(est), tags_per_bucket,
                    bits_per_item, table_type, headroom, unique, hash_fn,
                    output_path=shard_output_path, distinct_total=dk_total)
            rows = parts.collect()
        finally:
            parts.unpersist()
    else:
        rows = parts.collect()  # one small row per partition (pairs/metrics)
    rows.sort(key=lambda r: r["partition_id"])  # deterministic combine order

    metrics = [
        {k: r[k] for k in ("partition_id", "rows", "stored", "distinct_keys",
                           "kicks", "victim_used", "load_factor", "wall_ms")}
        for r in rows
    ]

    if deferred:
        hs = [unpack_hashes(bytes(r["blob"])) for r in rows if r["rows"] > 0]
        h = np.concatenate(hs) if hs else np.zeros(0, dtype=np.uint64)
        if unique and len(h):
            h = np.unique(h)
        params = CuckooParams.for_capacity(
            max(int(len(h) * headroom), 64), tags_per_bucket,
            bits_per_item, table_type)  # dispatches vacuum sizing
        merged = CuckooKernel(params)
        idx, tag = params.split(h)
        merged.insert_pairs(idx, tag, dedupe=unique)
        return CuckooBuild(params=params, blob=merged.to_bytes(),
                           metrics=metrics, hash_fn=hash_fn)

    merged = CuckooKernel(params)
    if partial_format == "sparse":
        pairs = [unpack_pairs(bytes(r["blob"])) for r in rows if r["rows"] > 0]
        if pairs:
            bi = np.concatenate([p[0] for p in pairs])
            tags = np.concatenate([p[1] for p in pairs])
            merged.insert_pairs(bi, tags, dedupe=unique)
    else:
        kernels = (
            CuckooKernel.from_bytes(bytes(r["blob"])) for r in rows if r["rows"] > 0
        )
        merged = reduce(lambda a, b: a.merge(b, dedupe=unique), kernels, merged)
    return CuckooBuild(params=params, blob=merged.to_bytes(), metrics=metrics,
                       hash_fn=hash_fn)
