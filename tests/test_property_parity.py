"""Property-based parity: the vectorized kernel and the scalar oracle
agree on membership and size under randomized mixed op sequences
(hypothesis). Placement may differ (round-based vs sequential); the
membership multiset must not."""

import numpy as np
import pytest

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

from cuckoo_filter_spark.kernel.filter import CuckooKernel
from cuckoo_filter_spark.oracle.scalar import ScalarFilter
from cuckoo_filter_spark.params import TABLE_PACKED, TABLE_SINGLE, CuckooParams

pytestmark = pytest.mark.skipif(not HAVE_HYP, reason="hypothesis unavailable")


@st.composite
def op_sequences(draw):
    n_keys = draw(st.integers(20, 120))
    keys = [f"key{i}".encode() for i in range(n_keys)]
    ops = draw(
        st.lists(
            st.tuples(
                st.sampled_from(["add_unique", "delete", "contain"]),
                st.integers(0, n_keys - 1),
            ),
            min_size=5,
            max_size=80,
        )
    )
    table_type = draw(st.sampled_from([TABLE_SINGLE, TABLE_PACKED]))
    b = 4 if table_type == TABLE_PACKED else draw(st.sampled_from([2, 4, 8]))
    f = draw(st.sampled_from([8, 12, 16]))
    return keys, ops, b, f, table_type


@settings(max_examples=40, deadline=None)
@given(op_sequences())
def test_kernel_matches_oracle_under_random_ops(seq):
    keys, ops, b, f, tt = seq
    params = CuckooParams.for_capacity(4 * len(keys), b, f, tt)
    kern = CuckooKernel(params)
    orc = ScalarFilter(params)
    for op, ki in ops:
        k = keys[ki]
        if op == "add_unique":
            kv = bool(kern.add_unique([k])[0])
            ov = orc.add_unique(k)
            assert kv == ov, (op, k)
        elif op == "delete":
            kv = bool(kern.delete([k])[0])
            ov = orc.delete(k)
            assert kv == ov, (op, k)
        else:
            kv = bool(kern.contain([k])[0])
            ov = orc.contain(k)
            assert kv == ov, (op, k)
        assert kern.size() == orc.size()
    # final: all keys agree
    kv = kern.contain(keys)
    ov = np.array([orc.contain(k) for k in keys])
    assert np.array_equal(kv, ov)


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**32 - 1), st.sampled_from([8, 16, 32]))
def test_serialization_roundtrip_random(seed, f):
    rng = np.random.default_rng(seed)
    kern = CuckooKernel.for_capacity(200, 4, f)
    kern.add([rng.bytes(16) for _ in range(150)])
    blob = kern.to_bytes()
    assert CuckooKernel.from_bytes(blob).to_bytes() == blob
    orc = ScalarFilter.decode(blob)
    assert orc.encode() == blob


@given(st.integers(0, 2**32 - 1), st.integers(6, 12), st.integers(0, 3))
@settings(max_examples=80, deadline=None)
def test_vacuum_alt_involution_property(seed, chunk_pow, nb_mult):
    """Vacuum alternate mapping: involution + in-range for arbitrary
    chunk sizes and non-pow2 table sizes."""
    from cuckoo_filter_spark.params import TABLE_VACUUM

    chunk = 1 << chunk_pow
    nb = chunk * (nb_mult + 1)
    p = CuckooParams(4, 16, nb, TABLE_VACUUM, chunk)
    rng = np.random.default_rng(seed)
    h = rng.integers(0, 2**64, 512, dtype=np.uint64)
    idx, tag = p.split(h)
    assert idx.max() < nb and idx.min() >= 0
    alt = p.alt(idx, tag)
    assert alt.max() < nb and alt.min() >= 0
    assert np.array_equal(p.alt(alt, tag), idx)


@given(st.integers(0, 2**32 - 1), st.sampled_from([8, 9, 12, 16, 17, 32]))
@settings(max_examples=40, deadline=None)
def test_vacuum_serialization_roundtrip_property(seed, f):
    """Vacuum blobs round-trip byte-identically with identical membership
    for arbitrary fingerprint widths."""
    from cuckoo_filter_spark.params import TABLE_VACUUM

    p = CuckooParams(4, f, 256, TABLE_VACUUM, 64)
    kern = CuckooKernel(p)
    rng = np.random.default_rng(seed)
    keys = [rng.bytes(12) for _ in range(400)]
    kern.add_unique(keys)
    blob = kern.to_bytes()
    k2 = CuckooKernel.from_bytes(blob)
    assert k2.to_bytes() == blob
    assert np.array_equal(k2.contain(keys), kern.contain(keys))


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=30, deadline=None)
def test_batch_add_mask_invariants_property(seed):
    """For any overload level: accepted items are contained, size() ==
    number of Trues, and after deleting some accepted items a rejected
    item can be re-added successfully (no permanent corruption)."""
    rng = np.random.default_rng(seed)
    kern = CuckooKernel.for_capacity(200, 4, 12)
    n = int(rng.integers(50, 3 * kern.params.size_in_tags))
    keys = [rng.bytes(10) for _ in range(n)]
    ok = kern.add(keys)
    assert kern.size() == int(ok.sum())
    acc = [k for k, o in zip(keys, ok) if o]
    rej = [k for k, o in zip(keys, ok) if not o]
    if acc:
        assert kern.contain(acc).all()
    if rej and len(acc) >= 20:
        # free space, then the filter must accept new work again
        gone = acc[:20]
        assert kern.delete(gone).all()
        ok2 = kern.add(rej[:4])
        assert ok2.all(), "rejected items must insert after deletes"
        assert kern.contain(rej[:4]).all()
