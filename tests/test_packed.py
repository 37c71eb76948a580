import numpy as np
import pytest

from nanospring_tpu.io import packed as pk


def test_encode_decode_roundtrip():
    seq = b"ACGTACGTGGTTAACC"
    codes = pk.seq_to_codes(seq)
    assert pk.codes_to_seq(codes) == seq.decode()


def test_pack_unpack_all_lengths():
    rng = np.random.default_rng(0)
    for L in [0, 1, 2, 3, 4, 5, 7, 8, 63, 64, 65, 1000]:
        codes = rng.integers(0, 4, L).astype(np.uint8)
        packed = pk.pack_codes(codes)
        assert packed.shape[0] == (L + 3) // 4
        out = pk.unpack_codes(packed, L)
        np.testing.assert_array_equal(out, codes)


def test_revcomp():
    codes = pk.seq_to_codes("AACGT")
    rc = pk.revcomp_codes(codes)
    assert pk.codes_to_seq(rc) == "ACGTT"
    np.testing.assert_array_equal(pk.revcomp_codes(rc), codes)


def test_exceptions():
    seq = np.frombuffer(b"ACGNTNacg", dtype=np.uint8)
    pos, byte = pk.find_exceptions(seq)
    np.testing.assert_array_equal(pos, [3, 5, 6, 7, 8])
    assert byte.tobytes() == b"NNacg"
