"""Filter configuration and sizing rules.

Replicates the reference's capacity planning exactly:
numBuckets = nextPow2(maxNumKeys/b), doubled once if projected load
exceeds maxLoadFactor(b), min 1 (reference: cuckoofilter.go:74-81,
util.go:16-37).

layout='vacuum' is OUR space-efficiency extension (Vacuum Filters,
VLDB 2019 — PAPERS.md): the table no longer rounds up to a power of
two. Buckets are grouped into power-of-two CHUNKS; the alternate bucket
is idx ⊕ (H(tag) mod L) with L a per-tag range from {chunk, chunk/2,
chunk/4, chunk/8}, each clamped to ≥ min(chunk, 512) (selected by tag's
low bits — the paper's multi-range trick keeps enough randomness for
high load while small ranges keep the size granularity at one chunk;
the clamp is our adaptive-range tweak so small chunks don't strand kick
walks in sub-64-bucket ranges). XOR within an aligned power-of-two
block is still an involution and never leaves [0, num_buckets) because
every range divides the chunk, which divides num_buckets. Net effect:
num_buckets = ceil(need/chunk)·chunk instead of nextPow2(need) — up to
~2× (avg ~1.33×) smaller tables at equal load target. Vacuum blobs use
our own header (table_type=2) and are NOT Go-layout cross-decodable.
"""

from __future__ import annotations

from dataclasses import dataclass

TABLE_SINGLE = 0  # cuckoofilter.go:23
TABLE_PACKED = 1  # cuckoofilter.go:25
TABLE_VACUUM = 2  # our extension (vacuum layout, single-table packing)

# Vacuum BLOB format version (ADVICE r4). The vacuum header is our own
# extension (single/packed headers are byte-exact Go layouts and cannot
# carry one), so it gets a real version byte: r4's adaptive alt-range
# clamp changed vacuum probe semantics, making pre-r4 vacuum blobs
# silently produce false negatives under current code. The constant
# keeps 0xA0 marker bits so the byte can never equal a legal
# tags_per_bucket value (2/4/8) — which is what occupied this position
# in pre-versioning blobs — so stale blobs fail loud on decode.
# Version 3: the header grew 3 pad bytes (slots at offset 28, 4-byte
# aligned for zero-copy probes) — a 0xA2 blob decoded at the new offset
# would fail with an opaque buffer-size error (or worse, misread), so
# the layout change gets its own version per this file's own rule.
VACUUM_BLOB_VERSION = 0xA0 | 3

MAX_CUCKOO_KICKS = 500  # cuckoofilter.go:19

_MURMUR_C = 0x5BD1E995  # shared with alt_index (cuckoofilter.go:105-108)

# Smallest vacuum alternate range (buckets): per-tag ranges chunk>>i are
# clamped to ≥ min(chunk, this) — see CuckooParams.alt. 512 keeps the
# large-chunk multi-range spread (4096>>3 = 512 untouched) while small
# chunks walk their whole chunk.
_VACUUM_MIN_RANGE = 512


def next_pow2(n: int) -> int:
    """Round up to the next power of two (util.go:16-26)."""
    if n <= 1:
        return n if n == 1 else 0
    return 1 << (n - 1).bit_length()


def max_load_factor(tags_per_bucket: int) -> float:
    """0.85 / 0.96 / 0.99 for b = 2 / 4 / other (util.go:28-37)."""
    if tags_per_bucket == 2:
        return 0.85
    if tags_per_bucket == 4:
        return 0.96
    return 0.99


def vacuum_target_load(chunk_buckets: int, tags_per_bucket: int,
                       n_chunks: int = 256) -> float:
    """Safe sizing load for the vacuum layout, (chunk, n_chunks)-aware.

    Two effects bound the achievable load (r4 re-measurement,
    scripts/measure_vacuum_load.py, b=4 f=16, 8 seeds, n_chunks ∈
    {1,4,16,64,256}, WORST chunk governs):

    * the in-chunk kick walk packs a single chunk to ~0.95 (with the
      r4 range clamp; pre-clamp small chunks capped at ~0.78), and
    * balls-in-bins fluctuation: keys hash uniformly across chunks, so
      with C chunks the fullest chunk overshoots the mean by
      ~√(2·ln C) standard deviations — the dominant ceiling at small
      chunks and high chunk counts (measured: chunk 64 packs 0.953
      single-chunk but only 0.782 at 256 chunks). A fixed per-chunk
      target (rounds 2-3) silently sat above the many-chunk minimum
      for several sizes.

    target = walk − √(2·ln C)·√(walk/slots) − 0.02, walk = 0.95,
    slots = b·chunk — checked conservative against EVERY measured
    (chunk, n_chunks) minimum (margin 0.02-0.07). Calibrated at b=4;
    other b reuse the shape, capped at max_load_factor(b)."""
    import math

    base = max_load_factor(tags_per_bucket)
    walk = min(base, 0.95)
    slots = tags_per_bucket * chunk_buckets
    z = math.sqrt(2.0 * math.log(max(n_chunks, 2))) if n_chunks > 1 else 0.0
    target = walk - z * math.sqrt(walk / slots) - 0.02
    return max(min(base, target), 0.5)


@dataclass(frozen=True)
class CuckooParams:
    """Immutable filter configuration, broadcastable to executors.

    tags_per_bucket: b in the paper (2/4/8 recommended).
    bits_per_item:   f, fingerprint bit width, 2..32.
    num_buckets:     power of two.
    table_type:      TABLE_SINGLE or TABLE_PACKED (packed requires b=4).
    """

    tags_per_bucket: int
    bits_per_item: int
    num_buckets: int
    table_type: int = TABLE_SINGLE
    chunk_buckets: int = 0  # vacuum layout only (power of two, ≥ 8)

    def __post_init__(self) -> None:
        if not (2 <= self.bits_per_item <= 32):
            raise ValueError(f"bits_per_item must be in [2, 32], got {self.bits_per_item}")
        if self.table_type == TABLE_VACUUM:
            c = self.chunk_buckets
            # < 64 would degenerate the smallest alternate range
            # (chunk/8) toward 1 bucket: tags with range 1 get alt == idx
            # (a single candidate bucket) and chains can never escape
            if c < 64 or c & (c - 1):
                raise ValueError(f"vacuum chunk_buckets must be a power of two ≥ 64, got {c}")
            if self.num_buckets <= 0 or self.num_buckets % c:
                raise ValueError(
                    f"vacuum num_buckets must be a positive multiple of "
                    f"chunk_buckets={c}, got {self.num_buckets}")
            return
        if self.num_buckets & (self.num_buckets - 1) or self.num_buckets <= 0:
            raise ValueError(f"num_buckets must be a power of two, got {self.num_buckets}")
        if self.table_type == TABLE_PACKED:
            if self.tags_per_bucket != 4:
                raise ValueError("packed table requires tags_per_bucket=4")
            if self.bits_per_item < 4:
                raise ValueError("packed table requires bits_per_item>=4")

    @classmethod
    def for_capacity(
        cls,
        max_num_keys: int,
        tags_per_bucket: int = 4,
        bits_per_item: int = 16,
        table_type: int = TABLE_SINGLE,
    ) -> "CuckooParams":
        """Size like NewFilter (cuckoofilter.go:74-87). TABLE_VACUUM
        dispatches to the vacuum sizing rule (chunk multiple, not pow2),
        so every builder's table_type parameter works uniformly."""
        if table_type == TABLE_VACUUM:
            return cls.for_capacity_vacuum(max_num_keys, tags_per_bucket,
                                           bits_per_item)
        b = tags_per_bucket
        num_buckets = next_pow2(max_num_keys // b)
        if num_buckets == 0:
            num_buckets = 1
        if max_num_keys / (num_buckets * b) > max_load_factor(b):
            num_buckets <<= 1
        return cls(b, bits_per_item, num_buckets, table_type)

    @classmethod
    def for_capacity_vacuum(
        cls,
        max_num_keys: int,
        tags_per_bucket: int = 4,
        bits_per_item: int = 16,
        chunk_buckets: int | None = None,
    ) -> "CuckooParams":
        """Vacuum sizing: num_buckets rounds up to ONE chunk, not the
        next power of two — the whole point of the layout.

        The kick random walk is confined to a chunk, so the achievable
        load grows with chunk size and shrinks with chunk COUNT (the
        fullest of C chunks overshoots the mean occupancy — see
        vacuum_target_load). Auto-chunking picks ~need/8 clamped to
        [256, 4096]: large tables (where space matters) get chunk 4096
        → granularity ≤ 0.1 % and a ~0.90-0.93 load target depending on
        chunk count; small tables trade a lower load target for fine
        granularity, still beating nextPow2 rounding. The target/count
        fixpoint is solved iteratively (target shrinks as the chunk
        count grows, which grows the table — monotone, terminates)."""
        b = tags_per_bucket
        if chunk_buckets is None:
            rough = max(int(max_num_keys / (b * 0.95)) + 1, 8)
            chunk_buckets = min(4096, max(256, next_pow2(max(rough // 8, 1))))
        c = max(max_num_keys // (b * chunk_buckets), 1)
        for _ in range(6):
            target = vacuum_target_load(chunk_buckets, b, n_chunks=c)
            need = max(int(max_num_keys / (b * target)) + 1, chunk_buckets)
            num_buckets = ((need + chunk_buckets - 1) // chunk_buckets) * chunk_buckets
            if num_buckets // chunk_buckets == c:
                break
            c = num_buckets // chunk_buckets
        # never size LARGER than the pow2 rule would (chunk rounding can
        # lose at small capacities): fall back to a pow2-sized vacuum
        # table (chunk == num_buckets), floored at the 64-bucket minimum
        pow2_nb = max(next_pow2(max(max_num_keys // b, 1)), 1)
        if max_num_keys / (pow2_nb * b) > max_load_factor(b):
            pow2_nb <<= 1
        if num_buckets > pow2_nb:
            # fall back to the pow2 size with chunk == table: the alt
            # ranges then span {nb .. nb/8}, i.e. near-global randomness,
            # so the achievable load matches the pow2 rule's 0.96 target
            # (measured ABOVE the 0.95 small-chunk target) — same bytes
            # as the reference sizing. That reasoning holds only up to
            # ~0.96 demanded load: b=8's pow2 rule accepts 0.99, where
            # the vacuum walk DOES overflow (confirmed by stress test),
            # so demands above 0.96 still double.
            num_buckets = max(pow2_nb, 64)
            chunk_buckets = num_buckets
            if max_num_keys / (num_buckets * b) > 0.96:
                num_buckets <<= 1
        return cls(b, bits_per_item, num_buckets, TABLE_VACUUM, chunk_buckets)

    @property
    def size_in_tags(self) -> int:
        return self.tags_per_bucket * self.num_buckets

    @property
    def max_load(self) -> float:
        return max_load_factor(self.tags_per_bucket)

    @property
    def tag_mask(self) -> int:
        return (1 << self.bits_per_item) - 1

    def size_in_bytes(self) -> int:
        """Serialized table byte length (singletable.go:38 / packedtable.go:47-51)."""
        if self.table_type == TABLE_PACKED:
            bits_per_bucket = (self.bits_per_item - 1) * 4
            return ((bits_per_bucket * self.num_buckets + 7) >> 3) + 7
        return (self.bits_per_item * self.tags_per_bucket * self.num_buckets + 7) >> 3

    # -- layout-aware hashing (numpy, vectorized) ------------------------
    def split(self, h):
        """uint64 hashes → (index int64[:], tag uint32[:]). Reference
        split for pow2 layouts (cuckoofilter.go:89-103); vacuum indexes
        by modulo (num_buckets is not a power of two)."""
        import numpy as np

        hi = (h >> np.uint64(32)).astype(np.uint32)
        lo = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        if self.table_type == TABLE_VACUUM:
            idx = (hi.astype(np.uint64) % np.uint64(self.num_buckets)).astype(np.int64)
        else:
            idx = (hi & np.uint32(self.num_buckets - 1)).astype(np.int64)
        f = self.bits_per_item
        tag_mod = np.uint64((1 << f) - 1) if f < 32 else np.uint64(0xFFFFFFFF)
        tag = (lo % tag_mod + np.uint64(1)).astype(np.uint32)
        return idx, tag

    def alt(self, idx, tag):
        """Involution: alt(alt(i,t),t) == i for both layouts. Vacuum XORs
        within a per-tag power-of-two range ∈ {chunk .. chunk/8}, with
        every range clamped to ≥ min(chunk, 512) (adaptive selection in
        the spirit of the paper's Algorithm 1, keyed on chunk size): at
        small chunks the unclamped small ranges ({8..64} buckets at
        chunk 64) confined kick walks to a handful of buckets and capped
        the achievable load at ~0.78; clamped, a chunk-64 walk spans the
        whole chunk and packs like a pow2 table (≥0.95 single-chunk,
        re-measured r4 — vacuum_target_load carries the new targets).
        Large chunks (≥4096) keep the original 4-range spread, which is
        the paper's locality trick. Every range is a power of two
        dividing the chunk, which divides num_buckets, so the XOR stays
        an involution inside [0, num_buckets) without a pow2 table. The
        rule is a pure function of chunk_buckets — serialized blobs need
        no extra header field."""
        import numpy as np

        t = tag.astype(np.uint32)
        if self.table_type == TABLE_VACUUM:
            chunk = np.uint32(self.chunk_buckets)
            min_range = np.uint32(min(self.chunk_buckets, _VACUUM_MIN_RANGE))
            range_m1 = np.maximum(chunk >> (t & np.uint32(3)), min_range) - np.uint32(1)
            delta = (t * np.uint32(_MURMUR_C)) & range_m1
            return (idx.astype(np.uint32) ^ delta).astype(np.int64)
        v = idx.astype(np.uint32) ^ (t * np.uint32(_MURMUR_C))
        return (v & np.uint32(self.num_buckets - 1)).astype(np.int64)
