import numpy as np

from nanospring_tpu.io import streams as st


def test_varint_roundtrip():
    rng = np.random.default_rng(1)
    vals = np.concatenate(
        [
            np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32 - 1, 2**40], dtype=np.uint64),
            rng.integers(0, 2**35, 1000).astype(np.uint64),
        ]
    )
    buf = st.encode_varints(vals)
    out = st.decode_varints(buf)
    np.testing.assert_array_equal(out, vals)


def test_varint_empty():
    assert st.encode_varints(np.zeros(0, np.uint64)).size == 0
    assert st.decode_varints(np.zeros(0, np.uint8)).size == 0


def test_id_stream_roundtrip():
    ids = np.array([5, 3, 9, 0, 2**31, 7], dtype=np.uint32)
    buf = st.encode_id_stream(ids)
    out = st.decode_id_stream(buf)
    np.testing.assert_array_equal(out, ids)


def test_exc_stream_roundtrip():
    exc_read = np.array([0, 0, 5, 17], dtype=np.int64)
    exc_pos = np.array([3, 10, 0, 123456], dtype=np.int64)
    exc_byte = np.frombuffer(b"NnXY", dtype=np.uint8)
    buf = st.encode_exc_stream(exc_read, exc_pos, exc_byte)
    r, p, b = st.decode_exc_stream(buf)
    np.testing.assert_array_equal(r, exc_read)
    np.testing.assert_array_equal(p, exc_pos)
    np.testing.assert_array_equal(b, exc_byte)


def test_exc_stream_empty():
    buf = st.encode_exc_stream(
        np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.uint8)
    )
    r, p, b = st.decode_exc_stream(buf)
    assert len(r) == len(p) == len(b) == 0
