"""Vectorized metro64 == scalar metro64 across lengths (SURVEY.md §5.2)."""

import numpy as np
import pytest

from cuckoo_filter_spark.hashing import metro64, metro64_batch, to_flat_bytes


def test_scalar_known_lengths():
    # deterministic smoke: same input twice → same hash; different → differ
    assert metro64(b"hello") == metro64(b"hello")
    assert metro64(b"hello") != metro64(b"hellp")
    assert metro64(b"", 0) == metro64(b"", 0)


@pytest.mark.parametrize("length", [0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 24, 31, 32, 33,
                                    48, 63, 64, 65, 100, 127, 128, 200])
def test_vectorized_matches_scalar_fixed_length(length, rng):
    keys = [rng.bytes(length) for _ in range(64)]
    expected = np.array([metro64(k) for k in keys], dtype=np.uint64)
    got = metro64_batch(keys)
    assert np.array_equal(got, expected), f"mismatch at length {length}"


def test_vectorized_matches_scalar_mixed_lengths(rng):
    keys = [rng.bytes(int(l)) for l in rng.integers(0, 150, size=500)]
    expected = np.array([metro64(k) for k in keys], dtype=np.uint64)
    got = metro64_batch(keys)
    assert np.array_equal(got, expected)


def test_vectorized_seed_variation(rng):
    keys = [rng.bytes(32) for _ in range(16)]
    a = metro64_batch(keys, seed=1337)
    b = metro64_batch(keys, seed=1338)
    assert not np.array_equal(a, b)
    expected = np.array([metro64(k, 1338) for k in keys], dtype=np.uint64)
    assert np.array_equal(b, expected)


def test_to_flat_bytes_pandas_strings():
    import pandas as pd

    s = pd.Series(["hello", "", "wörld", "x" * 100])
    flat, lens = to_flat_bytes(s)
    parts = [b.encode("utf-8") for b in s]
    assert list(lens) == [len(p) for p in parts]
    assert flat.tobytes() == b"".join(parts)


def test_to_flat_bytes_arrow_sliced():
    import pyarrow as pa

    arr = pa.array(["aaa", "bb", "c", "dddd"]).slice(1, 2)
    flat, lens = to_flat_bytes(arr)
    assert list(lens) == [2, 1]
    assert flat.tobytes() == b"bbc"


def test_batch_matches_scalar_on_pandas_strings():
    import pandas as pd

    s = pd.Series([f"https://host{i}.example.com/p/{i*7}" for i in range(100)])
    got = metro64_batch(s)
    expected = np.array([metro64(x.encode()) for x in s], dtype=np.uint64)
    assert np.array_equal(got, expected)


def test_metro64_flat_chunked_outlier_parity(monkeypatch):
    """Long-document outliers: when the dense pad buffer would blow the
    budget, the sort+chunk path must produce bit-identical hashes with
    bounded per-chunk area."""
    import numpy as np

    import cuckoo_filter_spark.hashing as H

    rng = np.random.default_rng(3)
    parts, lens = [], []
    for i in range(500):
        n = 5000 if i % 97 == 0 else int(rng.integers(0, 80))  # outliers
        b = rng.integers(0, 256, size=n, dtype=np.int64).astype(np.uint8)
        parts.append(b)
        lens.append(n)
    flat = np.concatenate(parts)
    lens = np.array(lens, dtype=np.int64)
    want = H._metro64_flat_masked(flat, lens)
    monkeypatch.setattr(H, "_PAD_BUDGET", 1 << 14)  # force chunking
    got = H.metro64_flat(flat, lens)
    assert (got == want).all()
