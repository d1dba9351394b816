"""Kernel (vectorized) vs oracle (scalar) parity, mirroring the
reference's sweeping config-grid test (cuckoofilter_test.go:25-111)."""

import struct

import numpy as np
import pytest

from cuckoo_filter_spark.kernel.filter import CuckooKernel, FilterFullError
from cuckoo_filter_spark.oracle.scalar import ScalarFilter
from cuckoo_filter_spark.params import TABLE_PACKED, TABLE_SINGLE, CuckooParams

# reference grid (cuckoofilter_test.go:20-23), scaled down for runtime;
# packed skips f=2 and requires b=4 (cuckoofilter_test.go:32-37)
GRID = []
for table_type in (TABLE_SINGLE, TABLE_PACKED):
    for b in (2, 4, 8):
        for f in (2, 4, 5, 8, 9, 12, 13, 16, 17, 23, 31, 32):
            if table_type == TABLE_PACKED and (b != 4 or f < 4):
                continue
            GRID.append((b, f, table_type))

SMALL_GRID = [(4, 16, TABLE_SINGLE), (4, 16, TABLE_PACKED), (2, 8, TABLE_SINGLE),
              (8, 12, TABLE_SINGLE), (4, 9, TABLE_PACKED), (4, 32, TABLE_PACKED)]


def _keys(rng, n, length=32):
    return [rng.bytes(length) for _ in range(n)]


@pytest.mark.parametrize("b,f,tt", GRID)
def test_grid_insert_contain_delete(b, f, tt, rng):
    """Mirror of the reference grid test (cuckoofilter_test.go:25-111):
    AddUnique a batch, assert size == stored count, no false negatives,
    then delete-to-empty."""
    cap = 500
    kern = CuckooKernel.for_capacity(cap, b, f, tt)
    n = int(kern.params.size_in_tags * 0.6)
    keys = _keys(np.random.default_rng(1000 * b + f + tt), n)
    ok = kern.add_unique(keys)
    stored = [k for k, o in zip(keys, ok) if o]
    assert len(stored) > 0
    assert kern.size() == len(stored)
    assert kern.contain(stored).all(), "false negative"
    deleted = kern.delete(stored)
    assert deleted.all()
    assert kern.size() == 0


@pytest.mark.parametrize("b,f,tt", SMALL_GRID)
def test_kernel_matches_oracle_membership(b, f, tt, rng):
    """Same keys into kernel and oracle → identical membership on members
    and identical answers on a shared probe set (placement may differ,
    membership must not — SURVEY.md §5.2)."""
    cap = 400
    kern = CuckooKernel.for_capacity(cap, b, f, tt)
    orc = ScalarFilter(kern.params)
    local = np.random.default_rng(7 * b + f)
    n = int(kern.params.size_in_tags * 0.5)
    keys = _keys(local, n)
    kern.add(keys)
    for k in keys:
        orc.add(k)
    assert kern.size() == orc.size()
    assert kern.contain(keys).all()
    assert all(orc.contain(k) for k in keys)
    # FP answers may differ per-key only if placements differ — but tags and
    # candidate buckets are identical, and both store the same multiset, so
    # Contain is placement-independent. Assert exact equality.
    probes = _keys(local, 2000, 16)
    kv = kern.contain(probes)
    ov = np.array([orc.contain(p) for p in probes])
    assert np.array_equal(kv, ov)


@pytest.mark.parametrize("b,f,tt", SMALL_GRID)
def test_serialization_roundtrip_and_cross(b, f, tt):
    cap = 300
    kern = CuckooKernel.for_capacity(cap, b, f, tt)
    local = np.random.default_rng(13 * b + f)
    keys = _keys(local, int(kern.params.size_in_tags * 0.5))
    kern.add(keys)

    blob = kern.to_bytes()
    # self round-trip: byte-identical re-encode
    kern2 = CuckooKernel.from_bytes(blob)
    assert kern2.to_bytes() == blob
    # packed encode semi-sorts within buckets: compare per-bucket multisets
    assert np.array_equal(np.sort(kern2.slots, axis=1), np.sort(kern.slots, axis=1))
    assert kern2.size() == kern.size()
    assert kern2.contain(keys).all()

    # cross: oracle decodes kernel bytes, same membership + same re-encode
    orc = ScalarFilter.decode(blob)
    assert orc.size() == kern.size()
    assert all(orc.contain(k) for k in keys)
    assert orc.encode() == blob

    # cross: kernel decodes oracle-built bytes
    orc2 = ScalarFilter(kern.params)
    for k in keys[:50]:
        orc2.add(k)
    blob2 = orc2.encode()
    kern3 = CuckooKernel.from_bytes(blob2)
    assert kern3.to_bytes() == blob2
    assert kern3.contain(keys[:50]).all()


def test_overload_no_false_negatives_oracle():
    """Mirror of the reference overload workload (cuckoofilter_test.go:38-48):
    many keys into a small filter via AddUnique; every reported-stored key
    must be found. Sequential semantics → oracle."""
    orc = ScalarFilter.for_capacity(480, 4, 16, TABLE_SINGLE)
    local = np.random.default_rng(99)
    keys = [local.bytes(32) for _ in range(3000)]
    stored = [k for k in keys if orc.add_unique(k)]
    assert 0 < len(stored) <= len(keys)
    assert orc.size() == len(stored)
    for k in stored:
        assert orc.contain(k), "false negative under overload"
    # delete all stored → size 0 (cuckoofilter_test.go:101-105)
    for k in stored:
        assert orc.delete(k)
    assert orc.size() == 0


def test_kernel_add_unique_dedup():
    kern = CuckooKernel.for_capacity(1000, 4, 16)
    keys = [b"k%d" % (i % 50) for i in range(500)]
    ok = kern.add_unique(keys)
    assert ok.sum() == 50
    assert kern.size() == 50
    assert kern.contain([b"k%d" % i for i in range(50)]).all()
    ok2 = kern.add_unique([b"k1", b"new1"])
    assert list(ok2) == [False, True]


def test_load_factor_before_failure_b4():
    """b=4 must reach ≥95% load before the first insert failure
    (util.go:32-33, BASELINE.md)."""
    kern = CuckooKernel.for_capacity(4000, 4, 16)
    local = np.random.default_rng(5)
    cap = kern.params.size_in_tags
    inserted = 0
    try:
        for chunk in range(0, 2 * cap, 64):
            keys = [local.bytes(32) for _ in range(64)]
            kern.add(keys)
            inserted += 64
    except FilterFullError:
        pass
    assert kern.load_factor() >= 0.95, f"load {kern.load_factor():.3f}"


def test_victim_path_and_delete_restores():
    """Fill past capacity so the victim stashes, then delete frees it."""
    kern = CuckooKernel.for_capacity(250, 4, 8)
    local = np.random.default_rng(17)
    keys = [local.bytes(32) for _ in range(kern.params.size_in_tags)]
    try:
        kern.add(keys)
    except FilterFullError:
        pass
    # a full filter rejects new adds once the victim is set
    if kern.victim_used:
        assert not kern.add([b"one-more"]).any()


def test_merge_membership_and_size(rng):
    params = CuckooParams.for_capacity(3000, 4, 16, TABLE_SINGLE)
    local = np.random.default_rng(23)
    parts = []
    all_keys = []
    for p in range(3):
        keys = [local.bytes(32) for _ in range(400)]
        k = CuckooKernel(params)
        k.add(keys)
        parts.append(k)
        all_keys.append(keys)

    import itertools

    sizes = set()
    answer_sets = []
    probes = [local.bytes(16) for _ in range(3000)]
    for order in itertools.permutations(range(3)):
        merged = CuckooKernel(params)
        for i in order:
            src = CuckooKernel.from_bytes(parts[i].to_bytes())
            merged.merge(src)
        sizes.add(merged.size())
        for keys in all_keys:
            assert merged.contain(keys).all(), "merge lost a member"
        answer_sets.append(tuple(merged.contain_hashed(*merged.fingerprints(probes))))
    assert len(sizes) == 1, "Size must be merge-order independent"
    assert sizes.pop() == 1200
    assert len(set(answer_sets)) == 1, "membership answers must be merge-order independent"


def test_merge_overflow_raises():
    params = CuckooParams.for_capacity(100, 4, 8, TABLE_SINGLE)
    local = np.random.default_rng(31)
    a = CuckooKernel(params)
    b = CuckooKernel(params)
    cap = params.size_in_tags
    a.add([local.bytes(32) for _ in range(int(cap * 0.9))])
    b.add([local.bytes(32) for _ in range(int(cap * 0.9))])
    with pytest.raises(FilterFullError):
        a.merge(b)


def test_fp_rate_bound_f16():
    """Empirical FP ≤ 0.02% for (b=4, f=16) at full load; expected
    ≈ 2b/2^f ≈ 0.0122% (README.md:30, FIXTURES.md F5)."""
    kern = CuckooKernel.for_capacity(8000, 4, 16)
    n = kern.params.size_in_tags
    members = [struct.pack(">I", i) for i in range(n)]
    try:
        kern.add(members)
    except FilterFullError:
        pass
    rounds = 100_000
    probes = [struct.pack(">I", i + n + 1) for i in range(rounds)]
    fp = kern.contain(probes).sum() / rounds
    assert fp <= 0.0002, f"FP rate {fp:.6f} exceeds bound"


def test_tag_never_zero():
    kern = CuckooKernel.for_capacity(100, 4, 4)
    local = np.random.default_rng(3)
    _, tags = kern.fingerprints([local.bytes(8) for _ in range(5000)])
    assert (tags >= 1).all()
    assert (tags <= (1 << 4) - 1).all()


def test_alt_index_involution():
    kern = CuckooKernel.for_capacity(1000, 4, 16)
    local = np.random.default_rng(4)
    idx, tag = kern.fingerprints([local.bytes(12) for _ in range(2000)])
    from cuckoo_filter_spark.kernel.filter import alt_index

    i2 = alt_index(idx, tag, kern.params.num_buckets)
    i1 = alt_index(i2, tag, kern.params.num_buckets)
    assert np.array_equal(i1, idx)


def test_multiset_insert_pairs_clips_at_2b():
    """A (pair, tag) fits at most 2b slots; bulk multiset inserts of
    heavily duplicated keys keep 2b copies (reference-equivalent stored
    state) instead of exhausting the kick loop."""
    kern = CuckooKernel.for_capacity(1000, 4, 16)
    idx, tag = kern.fingerprints([b"dup-key"])
    bi = np.repeat(idx, 50)
    tg = np.repeat(tag, 50)
    n = kern.insert_pairs(bi, tg, dedupe=False)
    assert n == 8  # 2b copies kept
    assert kern.size() == 8
    assert kern.contain([b"dup-key"]).all()
    # deleting 8 times drains all copies; the 9th fails
    for i in range(8):
        assert kern.delete([b"dup-key"]).all(), i
    assert not kern.delete([b"dup-key"]).any()
    assert kern.size() == 0


def test_fp_self_test_matches_readme_figures():
    """kernel.false_positive_rate (reference protocol, BE u32 keys)
    lands near the README-quoted expectations: ~0.03 at (4,8)
    (README.md:29) and ~1e-4 at (4,16) (README.md:30)."""
    k8 = CuckooKernel.for_capacity(20000, 4, 8)
    fp8 = k8.false_positive_rate(rounds=50_000)
    assert 0.01 < fp8 < 0.08, fp8
    k16 = CuckooKernel.for_capacity(20000, 4, 16)
    fp16 = k16.false_positive_rate(rounds=100_000)
    assert fp16 < 5e-4, fp16


def test_vectorized_delete_matches_sequential():
    """Vectorized batch delete (empty victim) == per-item sequential
    delete on the same state, including duplicate delete requests."""
    rng_local = np.random.default_rng(55)
    keys = [rng_local.bytes(16) for _ in range(800)]
    dup_heavy = keys[:50] * 3 + keys[400:500] + [rng_local.bytes(16) for _ in range(200)]

    a = CuckooKernel.for_capacity(2000, 4, 12)
    a.add(keys)
    b = CuckooKernel.from_bytes(a.to_bytes())

    got = a.delete(dup_heavy)  # vectorized path (victim empty)
    # sequential reference: item-at-a-time
    import numpy as _np

    exp = _np.zeros(len(dup_heavy), dtype=bool)
    for i, k in enumerate(dup_heavy):
        exp[i] = bool(b.delete([k])[0])
    assert _np.array_equal(got, exp)
    assert a.size() == b.size()
    assert _np.array_equal(_np.sort(a.slots, axis=None), _np.sort(b.slots, axis=None))


def test_vectorized_delete_speed_smoke():
    kern = CuckooKernel.for_capacity(200_000, 4, 16)
    local = np.random.default_rng(8)
    keys = [local.bytes(16) for _ in range(150_000)]
    kern.add(keys)
    import time

    t0 = time.perf_counter()
    ok = kern.delete(keys[:100_000])
    dt = time.perf_counter() - t0
    assert ok.all()
    assert dt < 3.0, f"vectorized delete too slow: {dt:.2f}s"


def test_delete_with_victim_engaged_reinserts():
    """Sequential delete path: a successful table delete frees space and
    re-inserts the stashed victim (cuckoofilter.go:205-212)."""
    kern = CuckooKernel.for_capacity(250, 4, 8)
    local = np.random.default_rng(21)
    keys = [local.bytes(32) for _ in range(kern.params.size_in_tags + 50)]
    try:
        kern.add(keys)
    except FilterFullError:
        pass
    if not kern.victim_used:  # fill further until the stash engages
        for k in ([local.bytes(32) for _ in range(200)]):
            kern.add([k])
            if kern.victim_used:
                break
    assert kern.victim_used
    size_before = kern.size()
    # delete any stored key -> victim must be re-inserted (stash freed)
    target = next(k for k in keys if kern.contain([k])[0])
    assert kern.delete([target]).all()
    assert not kern.victim_used, "victim not re-inserted after delete"
    assert kern.size() == size_before - 1


def test_batch_add_overflow_semantics_match_sequential():
    """Batch Add across the victim-stash boundary (cuckoofilter.go:
    135-141,171-174): the 2b+1'th copy of one key exhausts its chain and
    stashes; every item inserted after the stash — later call, or later
    chunk of the same call — is rejected (False) like sequential Add;
    accepted items are always contained (no false negatives)."""
    import numpy as np

    from cuckoo_filter_spark.kernel.filter import CuckooKernel, FilterFullError

    kern = CuckooKernel.for_capacity(256, 4, 12)
    b = kern.params.tags_per_bucket
    ok = kern.add(["dup"] * (2 * b + 1))  # fills both candidate buckets,
    # then the final copy's chain exhausts and stashes (counts stored)
    assert ok.all()
    assert kern.victim_used
    assert kern.size() == 2 * b + 1
    # sequential semantics: everything after the stash is rejected
    later = kern.add([f"fresh{i}" for i in range(50)])
    assert not later.any()
    assert kern.contain(["dup"]).all()

    # cross-chunk rejection inside ONE batch: chunk 2 starts after the
    # stash from chunk 1 and must be rejected wholesale
    kern2 = CuckooKernel.for_capacity(256, 4, 12)
    idx, tag = kern2.fingerprints(["dup"] * (2 * b + 1) + ["x", "y", "z"])
    mask = kern2._insert_frontier(idx.astype(np.int64), tag.astype(np.uint32),
                                  chunk=2 * b + 1)
    assert mask[:2 * b + 1].all() and not mask[2 * b + 1:].any()
    accepted_size = kern2.size()
    assert accepted_size == 2 * b + 1

    # gross overload (3× more items than slots): Add saturates
    # gracefully — accepted ≈ capacity, rest rejected, accepted items
    # contained, never an exception (reference Add returns false)
    kern3 = CuckooKernel.for_capacity(256, 4, 12)
    total_slots = kern3.params.num_buckets * b
    keys3 = [f"k{i}" for i in range(3 * total_slots)]
    ok3 = kern3.add(keys3)
    assert kern3.victim_used
    assert 0 < int(ok3.sum()) <= total_slots + 1
    assert kern3.size() == int(ok3.sum())
    acc = [k for k, o in zip(keys3, ok3) if o]
    assert kern3.contain(acc).all()

    # insert_pairs (merge/combine path) must instead fail LOUD on
    # overflow — dropping pairs would break no-false-negatives
    kern4 = CuckooKernel.for_capacity(256, 4, 12)
    idx4, tag4 = kern4.fingerprints(keys3)
    with pytest.raises(FilterFullError):
        kern4.insert_pairs(idx4.astype(np.int64), tag4.astype(np.uint32))


@pytest.mark.parametrize("b,f,tt", [(4, 8, 0), (4, 16, 0), (4, 32, 0),
                                    (4, 12, 0), (2, 7, 0), (4, 9, 1),
                                    (4, 17, 1)])
def test_probe_matches_kernel(b, f, tt):
    """CuckooProbe (zero-copy DecodeFrom path for aligned layouts) must
    answer Contain identically to the fully-decoded kernel, including
    the victim cache."""
    from cuckoo_filter_spark.kernel.filter import (
        CuckooKernel,
        CuckooProbe,
        FilterFullError,
    )

    kern = CuckooKernel.for_capacity(400, b, f, tt)
    keys = [f"key{i}" for i in range(500)]
    try:
        kern.add(keys)
    except FilterFullError:
        pass
    blob = kern.to_bytes()
    probe = CuckooProbe(blob)
    assert probe.zero_copy == (tt == 0 and f in (8, 16, 32))
    queries = keys + [f"absent{i}" for i in range(2000)]
    import numpy as np

    assert np.array_equal(probe.contain(queries), kern.contain(queries))
    assert probe.victim_used == kern.victim_used


def test_delete_with_victim_switches_to_vectorized():
    """Occupied-victim deletes: sequential only until TryEliminateVictim
    clears the cache, then the vectorized path — results must preserve
    no-false-negatives on survivors and clear the victim."""
    import numpy as np

    from cuckoo_filter_spark.kernel.filter import CuckooKernel, FilterFullError

    kern = CuckooKernel.for_capacity(1000, 4, 12)
    local = np.random.default_rng(77)
    keys = [local.bytes(24) for _ in range(kern.params.size_in_tags + 64)]
    try:
        ok = kern.add(keys)
    except FilterFullError:
        pytest.skip("did not reach stash cleanly")
    stored = [k for k, o in zip(keys, ok) if o]
    assert kern.victim_used
    gone, keep = stored[: len(stored) // 2], stored[len(stored) // 2:]
    deleted = kern.delete(gone)
    assert deleted.all()
    assert not kern.victim_used  # victim re-inserted after first delete
    assert kern.contain(keep).all(), "false negative on survivor"
    assert kern.size() == len(keep)


@pytest.mark.parametrize("b,f,tt", [(4, 16, 0), (4, 7, 0), (2, 5, 0),
                                    (4, 9, 1), (4, 17, 1)])
def test_encode_chunks_matches_to_bytes(b, f, tt):
    """Streaming encode (reference EncodeReader): chunk concatenation is
    byte-identical to the one-shot encoding at odd chunk sizes."""
    from cuckoo_filter_spark.kernel.filter import CuckooKernel

    kern = CuckooKernel.for_capacity(500, b, f, tt)
    local = np.random.default_rng(b * 100 + f)
    kern.add([local.bytes(16) for _ in range(300)])
    want = kern.to_bytes()
    for cb in (64, 1000, 1 << 20):
        got = b"".join(kern.encode_chunks(chunk_bytes=cb))
        assert got == want, (b, f, tt, cb)


def test_encode_chunks_vacuum():
    from cuckoo_filter_spark.kernel.filter import CuckooKernel
    from cuckoo_filter_spark.params import CuckooParams

    p = CuckooParams.for_capacity_vacuum(5000, 4, 12)
    kern = CuckooKernel(p)
    local = np.random.default_rng(9)
    kern.add([local.bytes(16) for _ in range(4000)])
    assert b"".join(kern.encode_chunks(chunk_bytes=512)) == kern.to_bytes()


def test_poisoned_kernel_blocks_all_ops_and_merge():
    """A kernel poisoned by an unsnapshot kick-chain exhaustion must
    refuse every subsequent operation — including being the SOURCE of a
    merge (harvesting half-moved tags would create silent false
    negatives) — until reset()."""
    import numpy as np
    import pytest

    from cuckoo_filter_spark.kernel.filter import CuckooKernel, FilterFullError
    from cuckoo_filter_spark.params import CuckooParams

    params = CuckooParams(4, 16, 64)
    bad = CuckooKernel(params)
    bad._corrupt = True  # simulate the unsnapshot exhaustion path
    idx = np.array([1], dtype=np.int64)
    tag = np.array([7], dtype=np.uint32)
    for op in (lambda: bad.add_hashed(idx, tag),
               lambda: bad.add_unique_hashed(idx, tag),
               lambda: bad.contain_hashed(idx, tag),
               lambda: bad.delete_hashed(idx, tag),
               lambda: bad.insert_pairs(idx, tag),
               lambda: bad.to_bytes()):
        with pytest.raises(FilterFullError, match="poisoned"):
            op()
    good = CuckooKernel(params)
    with pytest.raises(FilterFullError, match="poisoned"):
        good.merge(bad)
    bad.reset()
    assert bad.add_hashed(idx, tag).all()  # consistent again after reset


def test_split_hash_rejects_non_pow2():
    """The module-level pow2 helpers must fail loud on a vacuum-layout
    bucket count — masking with nb-1 would silently probe wrong
    buckets. Layout-generic code uses CuckooParams.split/alt."""
    import numpy as np
    import pytest

    from cuckoo_filter_spark.kernel.filter import alt_index, split_hash

    h = np.arange(8, dtype=np.uint64)
    with pytest.raises(ValueError, match="pow2-only"):
        split_hash(h, 3000, 16)
    with pytest.raises(ValueError, match="pow2-only"):
        alt_index(np.zeros(4, dtype=np.int64), np.ones(4, dtype=np.uint32),
                  3000)


def test_scalar_oracle_rejects_vacuum_blob():
    """The scalar oracle models the two Go layouts only — a vacuum blob
    (spark extension) must fail loud, not mis-parse as SingleTable."""
    import numpy as np
    import pytest

    from cuckoo_filter_spark.kernel.filter import CuckooKernel
    from cuckoo_filter_spark.oracle.scalar import ScalarFilter
    from cuckoo_filter_spark.params import TABLE_VACUUM, CuckooParams

    kern = CuckooKernel(CuckooParams.for_capacity(5000, 4, 16, TABLE_VACUUM))
    with pytest.raises(ValueError, match="Go layouts only"):
        ScalarFilter.decode(kern.to_bytes())


def test_null_and_dtype_key_identity():
    """NULL keys: excluded on add (False), answer False on contain/
    delete, never alias ''. Int-with-nulls: a bigint batch rendered
    float64 by Arrow (NULL present) must hash identically to the int64
    rendering — the exact-anti-join false-negative hazard."""
    import pandas as pd
    from cuckoo_filter_spark.kernel.filter import CuckooKernel, CuckooProbe

    k = CuckooKernel.for_capacity(1024)
    ok = k.add(pd.Series(["a", None, "b"]))
    assert list(ok) == [True, False, True]
    assert not k.contain(pd.Series([""]))[0]          # no phantom ''
    got = k.contain(pd.Series(["a", None, "", "b"]))
    assert list(got) == [True, False, False, True]
    assert list(k.delete(pd.Series([None, "a"]))) == [False, True]

    # integral identity across batch renderings
    ki = CuckooKernel.for_capacity(1024)
    ki.add(pd.Series([402, 7], dtype="int64"))        # clean int64 batch
    probe_floaty = pd.Series([402, None, 8], dtype="float64")
    got = ki.contain(probe_floaty)                    # null-bearing batch
    assert list(got) == [True, False, False]
    # and the reverse: built from a null-bearing batch, probed clean
    kf = CuckooKernel.for_capacity(1024)
    kf.add(pd.Series([402, None], dtype="float64"))
    assert kf.contain(pd.Series([402], dtype="int64"))[0]
    # zero-copy probe path shares the rule
    pr = CuckooProbe(ki.to_bytes())
    assert list(pr.contain(probe_floaty)) == [True, False, False]
