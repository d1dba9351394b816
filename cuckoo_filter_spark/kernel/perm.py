"""Permutation-encoding tables as numpy arrays (semi-sort codec).

Enumerates the C(19,4)=3876 non-decreasing nibble 4-tuples in
lexicographic order (reference recursion: permencoding.go:63-77); the
interleaved 16-bit packing is permencoding.go:31-45. Built once per
process and cached at module level (cheap: <1 ms)."""

from __future__ import annotations

from itertools import combinations_with_replacement

import numpy as np

N_ENTS = 3876

_DEC: np.ndarray | None = None
_ENC: np.ndarray | None = None


def _build() -> tuple[np.ndarray, np.ndarray]:
    dec = np.zeros(N_ENTS, dtype=np.uint16)
    enc = np.zeros(1 << 16, dtype=np.uint16)
    for idx, (a, b, c, d) in enumerate(combinations_with_replacement(range(16), 4)):
        packed = a | (c << 4) | (b << 8) | (d << 12)
        dec[idx] = packed
        enc[packed] = idx
    return dec, enc


def get_tables() -> tuple[np.ndarray, np.ndarray]:
    """Returns (dec_table[3876], enc_table[65536])."""
    global _DEC, _ENC
    if _DEC is None:
        _DEC, _ENC = _build()
    return _DEC, _ENC


def pack_lowbits(low: np.ndarray) -> np.ndarray:
    """low: uint[:, 4] nibbles (non-decreasing) → interleaved u16 batch."""
    low = low.astype(np.uint16)
    return low[:, 0] | (low[:, 2] << 4) | (low[:, 1] << 8) | (low[:, 3] << 12)


def unpack_lowbits(packed: np.ndarray) -> np.ndarray:
    """interleaved u16 batch → uint8[:, 4] nibbles."""
    out = np.empty((len(packed), 4), dtype=np.uint8)
    out[:, 0] = packed & 0xF
    out[:, 2] = (packed >> 4) & 0xF
    out[:, 1] = (packed >> 8) & 0xF
    out[:, 3] = (packed >> 12) & 0xF
    return out
