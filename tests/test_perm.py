"""PermEncoding: Encode∘Decode = id on all 3876 codewords; pack/unpack
interleave order (permencoding.go:31-45, SURVEY.md §5.2)."""

import numpy as np

from cuckoo_filter_spark.kernel import perm
from cuckoo_filter_spark.oracle.scalar import PermEncoding, _pack4, _unpack4


def test_numpy_tables_match_scalar():
    dec, enc = perm.get_tables()
    sp = PermEncoding()
    assert np.array_equal(dec, np.array(sp.dec_table, dtype=np.uint16))
    assert np.array_equal(enc, np.array(sp.enc_table, dtype=np.uint16))


def test_encode_decode_identity_exhaustive():
    dec, enc = perm.get_tables()
    codewords = np.arange(perm.N_ENTS, dtype=np.uint16)
    low = perm.unpack_lowbits(dec[codewords])
    # every decoded tuple is non-decreasing
    assert (np.diff(low.astype(np.int16), axis=1) >= 0).all()
    # re-encode gives back the codeword
    back = enc[perm.pack_lowbits(low)]
    assert np.array_equal(back, codewords)


def test_pack_unpack_interleave():
    # interleaved order: bits 0-3 ← in0, 4-7 ← in2, 8-11 ← in1, 12-15 ← in3
    assert _pack4((1, 2, 3, 4)) == (1 | (3 << 4) | (2 << 8) | (4 << 12))
    for v in (0, 1, 0x1234, 0xFFFF, 0x0F0F):
        assert _pack4(_unpack4(v)) == v


def test_sort_network_matches_scalar():
    from cuckoo_filter_spark.kernel.bitpack import sort_tags_network
    from cuckoo_filter_spark.oracle.scalar import PackedTable

    rng = np.random.default_rng(77)
    tags = rng.integers(0, 2**16, size=(500, 4), dtype=np.uint32)
    got = sort_tags_network(tags)
    for row_in, row_out in zip(tags, got):
        assert list(PackedTable._sort_tags(list(map(int, row_in)))) == list(map(int, row_out))
