"""Property tests for round-5/6 primitives (pure numpy/pandas, no
Spark): _b36_vec vs np.base_repr (the cross-fixture url parity
primitive), exact sketch merge laws (Bloom OR / HLL register-max /
CMS count-add — merge(partial(A), partial(B)) must be BIT-identical to
a single-pass build over A∪B, the soundness condition of the
mergeable-UDAF distribution pattern in sketches/base.py), vectorized
shingle bookkeeping vs a scalar window loop (doc-crossing windows must
never be selected), and the choose_bands geometry law."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from cuckoo_filter_spark.operators.dedup import (
    _POLY_MUL,
    _mix,
    batch_shingle_hashes,
    choose_bands,
)
from cuckoo_filter_spark.sketches.bloom import BloomSketch
from cuckoo_filter_spark.sketches.countmin import CountMinSketch
from cuckoo_filter_spark.sketches.hll import HLLSketch
from cuckoo_filter_spark.sources.pages import _b36_vec


@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=200))
@settings(max_examples=80, deadline=None)
def test_b36_vec_matches_base_repr(vals):
    arr = np.array(vals, dtype=np.uint64)
    got = _b36_vec(arr)
    want = [np.base_repr(int(v), 36).lower() for v in vals]
    assert list(got) == want


_keys = st.lists(st.text(min_size=0, max_size=20), max_size=60)


@given(_keys, _keys)
@settings(max_examples=40, deadline=None)
def test_bloom_merge_equals_union_build(a, b):
    def build(keys):
        sk = BloomSketch(capacity=256, fpp=0.01)
        if keys:
            sk.update(pd.Series(keys))
        return sk

    merged = build(a).merge(build(b))
    union = build(a + b)
    assert merged.bits.tobytes() == union.bits.tobytes()
    assert merged.n_items == union.n_items
    # no false negatives after merge
    for k in a + b:
        assert bool(merged.contains(pd.Series([k]))[0])


@given(_keys, _keys)
@settings(max_examples=40, deadline=None)
def test_hll_merge_equals_union_build(a, b):
    def build(keys):
        sk = HLLSketch(p=6)
        if keys:
            sk.update(pd.Series(keys))
        return sk

    merged = build(a).merge(build(b))
    union = build(a + b)
    assert merged.registers.tobytes() == union.registers.tobytes()


@given(_keys, _keys)
@settings(max_examples=40, deadline=None)
def test_theta_merge_equals_union_build(a, b):
    """Theta/KMV: merge-of-partials is BYTE-identical to a single-shot
    build over the union — the order-independence invariant (retained =
    k smallest distinct hashes) under arbitrary adversarial keys,
    including a tiny k forcing estimation mode."""
    from cuckoo_filter_spark.sketches.theta import ThetaSketch

    def build(keys):
        sk = ThetaSketch(k=16)
        if keys:
            sk.update(pd.Series(keys))
        return sk

    merged = build(a).merge(build(b))
    union = build(a + b)
    assert merged.to_bytes() == union.to_bytes()
    assert merged.estimate() == union.estimate()


@given(st.lists(st.integers(0, 25), min_size=0, max_size=300),
       st.lists(st.integers(0, 25), min_size=0, max_size=300))
@settings(max_examples=60, deadline=None)
def test_mg_exact_mode_merge_order_independent(a, b):
    """Misra-Gries below k distinct: counters are exact frequencies
    and BOTH merge orders are byte-identical to the truth (no trim
    ever fires, so the general MG order-dependence of the retained
    set cannot arise — the regime the contract queries run in)."""
    from collections import Counter

    from cuckoo_filter_spark.sketches.freq import MGSketch

    ia = [f"u{v}" for v in a]
    ib = [f"u{v}" for v in b]
    pa, pb = MGSketch(k=64), MGSketch(k=64)
    pa.update(ia)
    pb.update(ib)
    m1 = MGSketch.from_bytes(pa.to_bytes()).merge(pb)
    m2 = MGSketch.from_bytes(pb.to_bytes()).merge(pa)
    assert m1.counters == dict(Counter(ia + ib)) == m2.counters
    assert m1.to_bytes() == m2.to_bytes()
    assert m1.is_exact() and m1.offset == 0


@given(st.lists(st.integers(0, 40), min_size=1, max_size=500),
       st.integers(2, 10),
       st.lists(st.integers(1, 100), min_size=1, max_size=8))
@settings(max_examples=60, deadline=None)
def test_mg_bounds_hold_under_any_chunking(vals, k, cuts):
    """Estimation mode under adversarial chunking: however the stream
    is split into partials and merged, counter <= f <= counter +
    offset for EVERY item, offset <= n/(k+1), and any f > offset is
    retained — the bounds (not the retained set) are the contract."""
    from collections import Counter
    from functools import reduce

    from cuckoo_filter_spark.sketches.freq import MGSketch

    items = [f"u{v}" for v in vals]
    truth = Counter(items)
    parts, pos = [], 0
    for c in cuts:
        parts.append(items[pos:pos + c])
        pos += c
    parts.append(items[pos:])
    partials = []
    for p in parts:
        s = MGSketch(k=k)
        s.update(p)
        partials.append(s)
    sk = reduce(lambda x, y: x.merge(y), partials)
    n = len(items)
    assert sk.n_items == n
    assert sk.offset <= n / (k + 1)
    assert len(sk.counters) <= k
    for item, f in truth.items():
        lo, up = sk.estimate(item)
        assert lo <= f <= up, (item, f, lo, up, sk.offset)
        if f > sk.offset:
            assert item in sk.counters


@given(_keys, _keys)
@settings(max_examples=40, deadline=None)
def test_cms_merge_equals_concat_build(a, b):
    def build(keys):
        sk = CountMinSketch(width=64, depth=3)
        if keys:
            sk.update(pd.Series(keys))
        return sk

    merged = build(a).merge(build(b))
    both = build(a + b)
    assert np.array_equal(merged.counts, both.counts)
    assert merged.total == both.total
    if a:
        # CMS never underestimates
        est = merged.query(pd.Series(a))
        true = pd.Series(a + b).value_counts()
        for k, e in zip(a, est):
            assert e >= true[k]


@given(st.lists(st.text(min_size=0, max_size=30), min_size=1, max_size=20),
       st.integers(2, 7))
@settings(max_examples=60, deadline=None)
def test_batch_shingle_hashes_matches_scalar_windows(texts, k):
    """The stride-trick batch path must select EXACTLY each doc's own
    windows — a doc-crossing window (bytes spanning two concatenated
    docs) or an off-by-one start would change membership silently."""
    hashes, off = batch_shingle_hashes(pd.Series(texts), k)
    for i, t in enumerate(texts):
        got = hashes[off[i]:off[i + 1]]
        b = t.encode("utf-8")
        want = []
        with np.errstate(over="ignore"):  # uint64 wraparound is the
            # polynomial hash's intended arithmetic
            for s in range(max(len(b) - k + 1, 0)):
                acc = np.uint64(0)
                for j in range(k):
                    acc = acc * _POLY_MUL + np.uint64(b[s + j])
                want.append(int(_mix(np.array([acc]), 0x5349_4D48)[0]))
        assert [int(x) for x in got] == want, (i, t)


@given(st.sampled_from([16, 32, 64, 128]), st.floats(0.3, 0.99))
@settings(max_examples=60, deadline=None)
def test_choose_bands_geometry_law(n_perms, threshold):
    b, r = choose_bands(n_perms, threshold)
    assert b * r == n_perms and b >= 1 and r >= 1
    t = (1.0 / b) ** (1.0 / r)
    # recall-safe: t <= threshold whenever ANY divisor pair achieves it,
    # and among those the largest t (fewest false candidates) is chosen
    feas = [(1.0 / (n_perms // rr)) ** (1.0 / rr)
            for rr in range(1, n_perms + 1) if n_perms % rr == 0]
    ok = [x for x in feas if x <= threshold]
    if ok:
        assert abs(t - max(ok)) < 1e-12
    else:
        assert abs(t - min(feas)) < 1e-12
