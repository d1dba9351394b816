"""Filter configuration and sizing rules.

Replicates the reference's capacity planning exactly:
numBuckets = nextPow2(maxNumKeys/b), doubled once if projected load
exceeds maxLoadFactor(b), min 1 (reference: cuckoofilter.go:74-81,
util.go:16-37).
"""

from __future__ import annotations

from dataclasses import dataclass

TABLE_SINGLE = 0  # cuckoofilter.go:23
TABLE_PACKED = 1  # cuckoofilter.go:25

MAX_CUCKOO_KICKS = 500  # cuckoofilter.go:19


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

    def __post_init__(self) -> None:
        if self.num_buckets & (self.num_buckets - 1) or self.num_buckets <= 0:
            raise ValueError(f"num_buckets must be a power of two, got {self.num_buckets}")
        if not (2 <= self.bits_per_item <= 32):
            raise ValueError(f"bits_per_item must be in [2, 32], got {self.bits_per_item}")
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
        """Size like NewFilter (cuckoofilter.go:74-87)."""
        b = tags_per_bucket
        num_buckets = next_pow2(max_num_keys // b)
        if num_buckets == 0:
            num_buckets = 1
        if max_num_keys / (num_buckets * b) > max_load_factor(b):
            num_buckets <<= 1
        return cls(b, bits_per_item, num_buckets, table_type)

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
