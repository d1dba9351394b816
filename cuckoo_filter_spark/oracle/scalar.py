"""Scalar (pure-Python) cuckoo filter — the parity oracle (build plan M0).

A from-scratch re-derivation of the reference's exact semantics and byte
layouts, written for clarity over speed; the product kernel is the numpy
implementation in ``cuckoo_filter_spark.kernel``. Everything here is
pinned against the reference's published behavior:

* hashing / index / tag / alt-index: cuckoofilter.go:89-108
* filter state machine (victim cache, 500-kick bound): cuckoofilter.go:135-213
* SingleTable bit layout: singletable.go:68-169
* PackedTable semi-sorted layout + PermEncoding: packedtable.go, permencoding.go
* serialized format: SURVEY.md §1.5 (cuckoofilter.go:268-314)

Documented deviation: the reference evicts a uniformly random resident tag
(``rand.Int31()``, singletable.go:204 / packedtable.go:425); we use a
deterministic seeded xorshift so builds are reproducible. Membership
semantics are unaffected (any resident choice is sound).
"""

from __future__ import annotations

import struct

from cuckoo_filter_spark.hashing import metro64
from cuckoo_filter_spark.params import (
    MAX_CUCKOO_KICKS,
    TABLE_PACKED,
    TABLE_SINGLE,
    CuckooParams,
)

# ---------------------------------------------------------------------------
# Permutation encoding (semi-sort codec) — permencoding.go
# ---------------------------------------------------------------------------


def _pack4(nibbles) -> int:
    """Pack 4 nibbles into the interleaved u16 (permencoding.go:39-45):
    bits 0-3 ← in[0], 4-7 ← in[2], 8-11 ← in[1], 12-15 ← in[3]."""
    return (
        (nibbles[0] & 0xF)
        | ((nibbles[2] & 0xF) << 4)
        | ((nibbles[1] & 0xF) << 8)
        | ((nibbles[3] & 0xF) << 12)
    )


def _unpack4(v: int):
    """Inverse of _pack4 (permencoding.go:31-36)."""
    return (v & 0xF, (v >> 8) & 0xF, (v >> 4) & 0xF, (v >> 12) & 0xF)


class PermEncoding:
    """Enumerates all C(19,4)=3876 non-decreasing nibble 4-tuples in
    lexicographic order; DecTable[codeword] = packed tuple,
    EncTable[packed tuple] = codeword (permencoding.go:20-28, :63-77)."""

    N_ENTS = 3876

    def __init__(self) -> None:
        from itertools import combinations_with_replacement

        self.dec_table = [0] * self.N_ENTS
        self.enc_table = [0] * (1 << 16)
        for idx, tup in enumerate(combinations_with_replacement(range(16), 4)):
            packed = _pack4(tup)
            self.dec_table[idx] = packed
            self.enc_table[packed] = idx

    def encode(self, lowbits) -> int:
        return self.enc_table[_pack4(lowbits)]

    def decode(self, codeword: int):
        return _unpack4(self.dec_table[codeword])


_PERM = None


def get_perm() -> PermEncoding:
    global _PERM
    if _PERM is None:
        _PERM = PermEncoding()
    return _PERM


# ---------------------------------------------------------------------------
# Bit-stream helpers. Both tables are LSB-first bitstreams over a little-
# endian byte array (singletable.go:71 comment; packedtable.go:50).
# ---------------------------------------------------------------------------


def _read_bits(buf: bytearray, bitpos: int, nbits: int) -> int:
    out = 0
    for k in range(nbits):
        p = bitpos + k
        out |= ((buf[p >> 3] >> (p & 7)) & 1) << k
    return out


def _write_bits(buf: bytearray, bitpos: int, nbits: int, value: int) -> None:
    for k in range(nbits):
        p = bitpos + k
        if (value >> k) & 1:
            buf[p >> 3] |= 1 << (p & 7)
        else:
            buf[p >> 3] &= ~(1 << (p & 7)) & 0xFF


class _Xorshift:
    """Deterministic eviction-slot chooser (documented deviation)."""

    def __init__(self, seed: int = 0x9E3779B97F4A7C15) -> None:
        self.state = seed & ((1 << 64) - 1) or 1

    def next(self) -> int:
        x = self.state
        x ^= (x << 13) & ((1 << 64) - 1)
        x ^= x >> 7
        x ^= (x << 17) & ((1 << 64) - 1)
        self.state = x
        return x


# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------


class SingleTable:
    """Flat bit-packed table: b tags × num_buckets buckets × f bits/tag
    (singletable.go:17-24)."""

    def __init__(self, b: int, f: int, num_buckets: int, buf: bytearray | None = None):
        self.b = b
        self.f = f
        self.num_buckets = num_buckets
        self.tag_mask = (1 << f) - 1
        self.nbytes = (f * b * num_buckets + 7) >> 3
        self.buf = buf if buf is not None else bytearray(self.nbytes)
        assert len(self.buf) == self.nbytes

    def size_in_tags(self) -> int:
        return self.b * self.num_buckets

    def read_tag(self, i: int, j: int) -> int:
        return _read_bits(self.buf, (i * self.b + j) * self.f, self.f)

    def write_tag(self, i: int, j: int, tag: int) -> None:
        _write_bits(self.buf, (i * self.b + j) * self.f, self.f, tag & self.tag_mask)

    def find_tag(self, i1: int, i2: int, tag: int) -> bool:
        return any(
            self.read_tag(i1, j) == tag or self.read_tag(i2, j) == tag for j in range(self.b)
        )

    def delete_tag(self, i: int, tag: int) -> bool:
        for j in range(self.b):
            if self.read_tag(i, j) == tag:
                self.write_tag(i, j, 0)
                return True
        return False

    def insert_tag(self, i: int, tag: int, kick_out: bool, rng: _Xorshift):
        """Returns (ok, old_tag)."""
        for j in range(self.b):
            if self.read_tag(i, j) == 0:
                self.write_tag(i, j, tag)
                return True, 0
        if kick_out:
            r = rng.next() % self.b
            old = self.read_tag(i, r)
            self.write_tag(i, r, tag)
            return False, old
        return False, 0

    def encode(self) -> bytes:
        # [type][b][f][num_buckets u32 LE][bucket bytes] — singletable.go:230-237
        return (
            struct.pack("<BBBI", TABLE_SINGLE, self.b, self.f, self.num_buckets)
            + bytes(self.buf)
        )

    @classmethod
    def decode(cls, data: bytes) -> "SingleTable":
        b, f, nb = struct.unpack_from("<xBBI", data, 0)
        return cls(b, f, nb, bytearray(data[7:]))


class PackedTable:
    """Semi-sorted table, b=4: bucket = 12-bit codeword + 4×(f−4) dir bits,
    (f−1)·4 bits per bucket (packedtable.go:42-59)."""

    B = 4

    def __init__(self, f: int, num_buckets: int, buf: bytearray | None = None):
        self.f = f
        self.b = self.B
        self.num_buckets = num_buckets
        self.dir_bits = f - 4
        self.bits_per_bucket = (f - 1) * 4
        self.nbytes = ((self.bits_per_bucket * num_buckets + 7) >> 3) + 7
        self.buf = buf if buf is not None else bytearray(self.nbytes)
        assert len(self.buf) == self.nbytes
        self.perm = get_perm()

    def size_in_tags(self) -> int:
        return self.B * self.num_buckets

    @staticmethod
    def _sort_tags(tags):
        """5-comparator network on low nibbles (packedtable.go:105-117)."""
        t = list(tags)

        def sp(a, b):
            if (t[a] & 0x0F) > (t[b] & 0x0F):
                t[a], t[b] = t[b], t[a]

        sp(0, 2)
        sp(1, 3)
        sp(0, 1)
        sp(2, 3)
        sp(1, 2)
        return t

    def read_bucket(self, i: int):
        base = i * self.bits_per_bucket
        codeword = _read_bits(self.buf, base, 12)
        low = self.perm.decode(codeword)
        tags = []
        for k in range(4):
            d = _read_bits(self.buf, base + 12 + k * self.dir_bits, self.dir_bits)
            tags.append((d << 4) | low[k])
        return tags

    def write_bucket(self, i: int, tags) -> None:
        tags = self._sort_tags(tags)
        low = [t & 0x0F for t in tags]
        codeword = self.perm.encode(low)
        base = i * self.bits_per_bucket
        _write_bits(self.buf, base, 12, codeword)
        for k in range(4):
            _write_bits(self.buf, base + 12 + k * self.dir_bits, self.dir_bits, tags[k] >> 4)

    def find_tag(self, i1: int, i2: int, tag: int) -> bool:
        return tag in self.read_bucket(i1) or tag in self.read_bucket(i2)

    def delete_tag(self, i: int, tag: int) -> bool:
        tags = self.read_bucket(i)
        for j in range(4):
            if tags[j] == tag:
                tags[j] = 0
                self.write_bucket(i, tags)
                return True
        return False

    def insert_tag(self, i: int, tag: int, kick_out: bool, rng: _Xorshift):
        tags = self.read_bucket(i)
        for j in range(4):
            if tags[j] == 0:
                tags[j] = tag
                self.write_bucket(i, tags)
                return True, 0
        if kick_out:
            r = rng.next() & 3
            old = tags[r]
            tags[r] = tag
            self.write_bucket(i, tags)
            return False, old
        return False, 0

    def encode(self) -> bytes:
        # [type][f][num_buckets u32 LE][bucket bytes incl. +7 pad] — packedtable.go:453-458
        return struct.pack("<BBI", TABLE_PACKED, self.f, self.num_buckets) + bytes(self.buf)

    @classmethod
    def decode(cls, data: bytes) -> "PackedTable":
        f, nb = struct.unpack_from("<xBI", data, 0)
        return cls(f, nb, bytearray(data[6:]))


# ---------------------------------------------------------------------------
# Filter
# ---------------------------------------------------------------------------


class ScalarFilter:
    """Sequential cuckoo filter with reference-exact semantics."""

    def __init__(self, params: CuckooParams, rng_seed: int = 0x1337C0FFEE):
        self.params = params
        if params.table_type == TABLE_PACKED:
            self.table = PackedTable(params.bits_per_item, params.num_buckets)
        else:
            self.table = SingleTable(
                params.tags_per_bucket, params.bits_per_item, params.num_buckets
            )
        self.num_items = 0
        self.victim_index = 0
        self.victim_tag = 0
        self.victim_used = False
        self.rng = _Xorshift(rng_seed)

    @classmethod
    def for_capacity(cls, max_num_keys: int, b: int = 4, f: int = 16, table_type: int = 0):
        return cls(CuckooParams.for_capacity(max_num_keys, b, f, table_type))

    # -- hashing (cuckoofilter.go:89-108) --
    def _index_hash(self, hv32: int) -> int:
        return hv32 & (self.params.num_buckets - 1)

    def _tag_hash(self, hv32: int) -> int:
        return hv32 % ((1 << self.params.bits_per_item) - 1) + 1

    def index_tag(self, item: bytes):
        h = metro64(item)
        return self._index_hash((h >> 32) & 0xFFFFFFFF), self._tag_hash(h & 0xFFFFFFFF)

    def alt_index(self, index: int, tag: int) -> int:
        return self._index_hash((index ^ (tag * 0x5BD1E995)) & 0xFFFFFFFF)

    # -- mutation (cuckoofilter.go:135-175) --
    def add(self, item: bytes) -> bool:
        if self.victim_used:
            return False
        i, tag = self.index_tag(item)
        return self._add_impl(i, tag)

    def add_unique(self, item: bytes) -> bool:
        if self.contain(item):
            return False
        return self.add(item)

    def _add_impl(self, i: int, tag: int) -> bool:
        cur_index, cur_tag = i, tag
        for count in range(MAX_CUCKOO_KICKS):
            kick_out = count > 0
            ok, old_tag = self.table.insert_tag(cur_index, cur_tag, kick_out, self.rng)
            if ok:
                self.num_items += 1
                return True
            if kick_out:
                cur_tag = old_tag
            cur_index = self.alt_index(cur_index, cur_tag)
        self.victim_index = cur_index
        self.victim_tag = cur_tag
        self.victim_used = True
        return True

    # -- queries (cuckoofilter.go:178-213) --
    def contain(self, item: bytes) -> bool:
        i1, tag = self.index_tag(item)
        i2 = self.alt_index(i1, tag)
        hit = self.victim_used and tag == self.victim_tag and self.victim_index in (i1, i2)
        return hit or self.table.find_tag(i1, i2, tag)

    def delete(self, item: bytes) -> bool:
        i1, tag = self.index_tag(item)
        i2 = self.alt_index(i1, tag)
        if self.table.delete_tag(i1, tag) or self.table.delete_tag(i2, tag):
            self.num_items -= 1
            if self.victim_used:
                self.victim_used = False
                self._add_impl(self.victim_index, self.victim_tag)
            return True
        if self.victim_used and tag == self.victim_tag and self.victim_index in (i1, i2):
            self.victim_used = False
            return True
        return False

    # -- stats --
    def size(self) -> int:
        return self.num_items + (1 if self.victim_used else 0)

    def load_factor(self) -> float:
        return self.size() / self.table.size_in_tags()

    # -- serialization (SURVEY.md §1.5) --
    def encode(self) -> bytes:
        head = struct.pack(
            "<IIIB",
            self.num_items & 0xFFFFFFFF,
            self.victim_index & 0xFFFFFFFF,
            self.victim_tag & 0xFFFFFFFF,
            1 if self.victim_used else 0,
        )
        return head + self.table.encode()

    @classmethod
    def decode(cls, data: bytes) -> "ScalarFilter":
        if len(data) < 20:
            raise ValueError("unexpected bytes length")
        num_items, v_index, v_tag, used = struct.unpack_from("<IIIB", data, 0)
        table_type = data[13]
        if table_type == TABLE_PACKED:
            table = PackedTable.decode(data[13:])
            params = CuckooParams(4, table.f, table.num_buckets, TABLE_PACKED)
        elif table_type == 0:  # TABLE_SINGLE
            table = SingleTable.decode(data[13:])
            params = CuckooParams(table.b, table.f, table.num_buckets, TABLE_SINGLE)
        else:
            # the oracle models the two Go layouts ONLY: a vacuum blob
            # (spark extension, type byte 2) or a corrupt byte must fail
            # loud here, not mis-parse as SingleTable (which would read
            # the vacuum version byte as tags_per_bucket and return a
            # garbage filter under python -O)
            raise ValueError(
                f"scalar oracle decodes Go layouts only (type byte "
                f"{table_type}); vacuum blobs belong to CuckooKernel.from_bytes")
        out = cls(params)
        out.table = table
        out.num_items = num_items
        out.victim_index = v_index
        out.victim_tag = v_tag
        out.victim_used = used == 1
        return out

    def false_positive_rate(self, rounds: int = 100000) -> float:
        """Destructive FP self-test (cuckoofilter.go:226-244): fill with
        big-endian u32 keys 0..n−1, probe n+1..n+rounds."""
        self.reset()
        n = self.table.size_in_tags()
        for i in range(n):
            self.add(struct.pack(">I", i & 0xFFFFFFFF))
        fp = 0
        for i in range(rounds):
            if self.contain(struct.pack(">I", (i + n + 1) & 0xFFFFFFFF)):
                fp += 1
        self.reset()
        return fp / rounds

    def reset(self) -> None:
        for k in range(len(self.table.buf)):
            self.table.buf[k] = 0
        self.num_items = 0
        self.victim_index = 0
        self.victim_tag = 0
        self.victim_used = False
