"""Vectorized (un)packing between the in-memory unpacked slot matrix and
the reference's exact bit-packed byte layouts.

The kernel keeps filter state as an unpacked ``uint32[num_buckets,
tags_per_bucket]`` matrix for O(1) vectorized probes; the dense bit
layouts only exist at the serialization boundary (blob rows). Layouts:

* SingleTable: LSB-first bitstream of f-bit tags in slot order
  (singletable.go:68-169; little-endian noted at :71).
* PackedTable: per bucket, 12-bit permutation codeword then 4×(f−4)
  direction-bit fields; (f−1)·4 bits/bucket; +7 trailing pad bytes
  (packedtable.go:42-59, :121-206, :226-343).

Both use numpy packbits/unpackbits with ``bitorder='little'`` which is
exactly the reference's byte/bit order.
"""

from __future__ import annotations

import numpy as np

from cuckoo_filter_spark.kernel import perm


def sort_tags_network(tags: np.ndarray) -> np.ndarray:
    """Vectorized 5-comparator sorting network on low nibbles
    (packedtable.go:105-117). tags: uint32[n, 4]; returns sorted copy.

    Comparators swap only on strict-greater of the low nibble, so the
    result is byte-compatible with the reference's bucket encoding."""
    t = tags.copy()

    def sp(a: int, b: int) -> None:
        swap = (t[:, a] & 0xF) > (t[:, b] & 0xF)
        ta = t[swap, a].copy()
        t[swap, a] = t[swap, b]
        t[swap, b] = ta

    sp(0, 2)
    sp(1, 3)
    sp(0, 1)
    sp(2, 3)
    sp(1, 2)
    return t


# ---------------------------------------------------------------------------
# SingleTable layout
# ---------------------------------------------------------------------------


def pack_single(slots: np.ndarray, bits_per_item: int) -> bytes:
    """uint32[nb, b] → reference SingleTable bucket bytes."""
    f = bits_per_item
    tags = slots.reshape(-1).astype(np.uint32)
    # byte-aligned fast paths (single memcpy-style cast); the LSB-first
    # bitstream at f ∈ {8,16,32} is exactly a little-endian uint array
    if f == 8:
        return tags.astype("<u1").tobytes()
    if f == 16:
        return tags.astype("<u2").tobytes()
    if f == 32:
        return tags.astype("<u4").tobytes()
    n = tags.shape[0]
    bits = np.zeros(n * f, dtype=np.uint8)
    for t in range(f):
        bits[t::f] = (tags >> np.uint32(t)) & np.uint32(1)
    return np.packbits(bits, bitorder="little").tobytes()


def unpack_single(data: bytes, num_buckets: int, b: int, f: int) -> np.ndarray:
    """Reference SingleTable bucket bytes → uint32[nb, b]."""
    n = num_buckets * b
    if f in (8, 16, 32):
        dt = {8: "<u1", 16: "<u2", 32: "<u4"}[f]
        tags = np.frombuffer(data, dtype=dt, count=n).astype(np.uint32)
        return tags.reshape(num_buckets, b)
    raw = np.frombuffer(data, dtype=np.uint8)
    bits = np.unpackbits(raw, count=n * f, bitorder="little")
    tags = np.zeros(n, dtype=np.uint32)
    for t in range(f):
        tags |= bits[t::f].astype(np.uint32) << np.uint32(t)
    return tags.reshape(num_buckets, b)


# ---------------------------------------------------------------------------
# PackedTable layout (semi-sorted, b=4)
# ---------------------------------------------------------------------------


def pack_packed(slots: np.ndarray, bits_per_item: int) -> bytes:
    """uint32[nb, 4] → reference PackedTable bucket bytes (incl. +7 pad)."""
    f = bits_per_item
    dir_bits = f - 4
    bpb = (f - 1) * 4
    nb = slots.shape[0]
    _, enc = perm.get_tables()

    sorted_tags = sort_tags_network(slots)
    low = (sorted_tags & np.uint32(0xF)).astype(np.uint16)
    codeword = enc[perm.pack_lowbits(low)]
    hi = sorted_tags >> np.uint32(4)

    bits = np.zeros((nb, bpb), dtype=np.uint8)
    for t in range(12):
        bits[:, t] = (codeword >> np.uint16(t)) & np.uint16(1)
    for k in range(4):
        base = 12 + k * dir_bits
        for t in range(dir_bits):
            bits[:, base + t] = (hi[:, k] >> np.uint32(t)) & np.uint32(1)
    body = np.packbits(bits.reshape(-1), bitorder="little").tobytes()
    want = ((bpb * nb + 7) >> 3) + 7  # packedtable.go:51
    return body + b"\x00" * (want - len(body))


def unpack_packed(data: bytes, num_buckets: int, f: int) -> np.ndarray:
    """Reference PackedTable bucket bytes → uint32[nb, 4]."""
    dir_bits = f - 4
    bpb = (f - 1) * 4
    dec, _ = perm.get_tables()
    raw = np.frombuffer(data, dtype=np.uint8)
    bits = np.unpackbits(raw, count=num_buckets * bpb, bitorder="little").reshape(
        num_buckets, bpb
    )
    codeword = np.zeros(num_buckets, dtype=np.uint16)
    for t in range(12):
        codeword |= bits[:, t].astype(np.uint16) << np.uint16(t)
    low = perm.unpack_lowbits(dec[codeword])
    tags = np.zeros((num_buckets, 4), dtype=np.uint32)
    for k in range(4):
        base = 12 + k * dir_bits
        hi = np.zeros(num_buckets, dtype=np.uint32)
        for t in range(dir_bits):
            hi |= bits[:, base + t].astype(np.uint32) << np.uint32(t)
        tags[:, k] = (hi << np.uint32(4)) | low[:, k]
    return tags
