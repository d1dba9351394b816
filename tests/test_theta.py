"""Theta (KMV) sketch — exactness below k, set-algebra estimates,
byte-level merge laws, and the one-scan flagged distributed build."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cuckoo_filter_spark.sketches.theta import (
    ThetaSketch,
    build_theta_sketches,
    theta_a_not_b,
    theta_intersect,
    theta_jaccard,
    theta_union,
)


def _sk(keys, k=4096):
    s = ThetaSketch(k=k)
    s.update([str(x).encode() for x in keys])
    return s


def test_exact_below_k_full_set_algebra():
    """Until the first trim the sketch holds every distinct hash:
    union/intersect/a-not-b/jaccard are EXACT vs python sets."""
    a_keys = set(range(0, 3000))
    b_keys = set(range(2000, 4500))
    a, b = _sk(a_keys, k=8192), _sk(b_keys, k=8192)
    assert not a.is_estimation_mode() and a.relative_error() == 0.0
    assert a.estimate() == len(a_keys)
    assert theta_union(a, b).estimate() == len(a_keys | b_keys)
    assert theta_intersect(a, b).estimate() == len(a_keys & b_keys)
    assert theta_a_not_b(a, b).estimate() == len(a_keys - b_keys)
    assert theta_jaccard(a, b) == pytest.approx(
        len(a_keys & b_keys) / len(a_keys | b_keys))


def test_estimation_mode_error_bounds():
    """k=1024 over 150k-distinct sets with a planted 50% overlap:
    every estimate within ~4 sigma of its published RSE (1/sqrt(k-1)
    for distinct/union; intersection scales by sqrt(|AuB|/|AnB|))."""
    k = 1024
    a, b = _sk(range(0, 100_000), k=k), _sk(range(50_000, 150_000), k=k)
    rse = 1.0 / np.sqrt(k - 1)
    assert a.is_estimation_mode() and a.relative_error() == pytest.approx(rse)
    assert a.estimate() == pytest.approx(100_000, rel=4 * rse)
    assert theta_union(a, b).estimate() == pytest.approx(150_000, rel=4 * rse)
    scale = np.sqrt(150_000 / 50_000)
    assert theta_intersect(a, b).estimate() == pytest.approx(
        50_000, rel=4 * rse * scale)
    assert theta_a_not_b(a, b).estimate() == pytest.approx(
        50_000, rel=4 * rse * scale)
    assert theta_jaccard(a, b) == pytest.approx(1 / 3, rel=5 * rse * scale)


def test_merge_laws_byte_identical_and_roundtrip():
    """State is provably order-independent (k smallest distinct seen),
    so merge is associative AND commutative at the byte level, and the
    distributed reduce can combine partials in any order. Serialization
    round-trips bit-exactly, including estimation-mode theta."""
    k = 256
    a, b, c = (_sk(range(i, i + 2000), k=k) for i in (0, 1000, 2000))
    ab_c = theta_union(theta_union(a, b), c).to_bytes()
    a_bc = theta_union(a, theta_union(b, c)).to_bytes()
    c_ba = theta_union(theta_union(c, b), a).to_bytes()
    assert ab_c == a_bc == c_ba
    rt = ThetaSketch.from_bytes(ab_c)
    assert rt.to_bytes() == ab_c and rt.is_estimation_mode()
    # single-shot build over the same keys == any merge order
    assert _sk(range(0, 4000), k=k).to_bytes() == ab_c


def test_k_mismatch_and_bad_blob_raise():
    with pytest.raises(ValueError, match="k mismatch"):
        _sk(range(10), k=64).merge(_sk(range(10), k=128))
    with pytest.raises(ValueError, match="k mismatch"):
        theta_intersect(_sk(range(10), k=64), _sk(range(10), k=128))
    with pytest.raises(ValueError, match="not a theta sketch"):
        ThetaSketch.from_bytes(b"XXXX" + b"\0" * 16)
    with pytest.raises(ValueError, match="truncated"):
        ThetaSketch.from_bytes(_sk(range(100), k=64).to_bytes()[:-8])
    with pytest.raises(ValueError, match=">= 16"):
        ThetaSketch(k=4)
    with pytest.raises(ValueError, match="at least one column"):
        build_theta_sketches(None, [])


def test_distributed_flagged_build_matches_local(spark):
    """ONE scan with pre-projected when(cond, key) columns builds one
    sketch per predicate; each is BYTE-identical to a local sketch over
    that subset (order independence makes this exact, not approximate).
    Covers the int-key-with-nulls dtype hazard: the flag columns force
    float64/nullable in pandas, yet must hash via the 8-byte int path."""
    df = spark.range(0, 20_000, 1, 8).select(
        F.col("id"),
        (F.col("id") % 7).alias("m7"),
    )
    flagged = df.select(
        F.when(F.col("m7") < 3, F.col("id")).alias("a_key"),
        F.when(F.col("m7") >= 5, F.col("id")).alias("b_key"),
    )
    (a, b), metrics = build_theta_sketches(flagged, ["a_key", "b_key"], k=512)
    ids = np.arange(20_000)
    la = ThetaSketch(k=512)
    la.update(ids[ids % 7 < 3])  # int64 numpy -> canonical 8-byte path
    lb = ThetaSketch(k=512)
    lb.update(ids[ids % 7 >= 5])
    assert a.to_bytes() == la.to_bytes()
    assert b.to_bytes() == lb.to_bytes()
    assert a.is_estimation_mode()
    # disjoint predicates: intersection estimates 0, a_not_b ~= |A|
    assert theta_intersect(a, b).estimate() == 0.0
    rse = 1.0 / np.sqrt(512 - 1)
    n_a = (ids % 7 < 3).sum()
    assert theta_a_not_b(a, b).estimate() == pytest.approx(n_a, rel=4 * rse)
    by_sketch = {}
    for m in metrics:
        by_sketch[m["sketch_id"]] = by_sketch.get(m["sketch_id"], 0) + m["rows"]
    assert by_sketch[0] == n_a and by_sketch[1] == (ids % 7 >= 5).sum()


def test_compact_results_reject_raw_updates():
    import numpy as np
    from cuckoo_filter_spark.sketches.theta import (
        ThetaSketch, theta_a_not_b, theta_intersect, theta_union)

    a, b = ThetaSketch(k=64), ThetaSketch(k=64)
    a.update_hashed(np.arange(1, 100, dtype=np.uint64))
    b.update_hashed(np.arange(50, 150, dtype=np.uint64))
    inter = theta_intersect(a, b)
    with pytest.raises(ValueError, match="estimate-only"):
        inter.update_hashed(np.array([7], dtype=np.uint64))
    with pytest.raises(ValueError, match="estimate-only"):
        theta_a_not_b(a, b).update(["x"])
    with pytest.raises(ValueError, match="estimate-only"):
        inter.merge(a)
    # union FROM a compact result is sound KMV algebra and must work
    u = theta_union(a, inter)
    assert u.estimate() >= a.estimate() - 1e-9
