"""Negative paths: malformed blobs, invalid params, mode validation."""

import numpy as np
import pytest

from cuckoo_filter_spark.kernel.filter import CuckooKernel
from cuckoo_filter_spark.oracle.scalar import ScalarFilter
from cuckoo_filter_spark.params import TABLE_PACKED, CuckooParams


def test_from_bytes_rejects_short_blob():
    with pytest.raises(ValueError, match="length"):
        CuckooKernel.from_bytes(b"\x00" * 10)
    with pytest.raises(ValueError, match="length"):
        ScalarFilter.decode(b"\x00" * 10)


def test_params_validation():
    with pytest.raises(ValueError, match="power of two"):
        CuckooParams(4, 16, 100, 0)
    with pytest.raises(ValueError, match="bits_per_item"):
        CuckooParams(4, 40, 64, 0)
    with pytest.raises(ValueError, match="tags_per_bucket=4"):
        CuckooParams(8, 16, 64, TABLE_PACKED)
    with pytest.raises(ValueError, match="bits_per_item>=4"):
        CuckooParams(4, 2, 64, TABLE_PACKED)


def test_build_mode_validation(spark):
    from cuckoo_filter_spark.operators.build import build_cuckoo_filter

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="unknown mode"):
        build_cuckoo_filter(df, "k", capacity=10, mode="nope")
    with pytest.raises(ValueError, match="unknown hash_fn"):
        build_cuckoo_filter(df, "k", capacity=10, hash_fn="sha1")


def test_merge_param_mismatch():
    a = CuckooKernel(CuckooParams(4, 16, 64, 0))
    b = CuckooKernel(CuckooParams(4, 16, 128, 0))
    with pytest.raises(ValueError, match="different params"):
        a.merge(b)


def test_sharded_shard_count_validation(spark):
    from cuckoo_filter_spark.operators.sharded import build_sharded_cuckoo_filter

    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="power of two"):
        build_sharded_cuckoo_filter(df, "k", capacity=10, num_shards=10)


def test_corrupt_blob_tail_still_decodes_header():
    """A blob with a mangled table body decodes structurally (no bounds
    crash) — matching the reference's zero-validation Decode."""
    kern = CuckooKernel.for_capacity(100, 4, 16)
    kern.add([b"a", b"b"])
    blob = bytearray(kern.to_bytes())
    blob[-1] ^= 0xFF
    k2 = CuckooKernel.from_bytes(bytes(blob))
    assert k2.params == kern.params
