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


def test_exc_stream_v1_layout_decodes():
    """Archives written before the v2 exc layout (absolute positions, no
    version marker) must keep decoding: decode_exc_stream distinguishes
    the layouts by the leading varint-0 marker."""
    import numpy as np

    from nanospring_tpu.io import streams as st

    exc_read = np.array([2, 2, 5, 9], dtype=np.int64)
    exc_pos = np.array([10, 400, 7, 123456], dtype=np.int64)
    exc_byte = np.array([78, 78, 82, 89], dtype=np.uint8)
    # v1 writer: [varint n][id deltas][ABSOLUTE pos varints][bytes]
    n = len(exc_read)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = exc_read[0]
    deltas[1:] = np.diff(exc_read).astype(np.uint64)
    buf = np.concatenate([
        st.encode_varints(np.array([n], dtype=np.uint64)),
        st.encode_varints(deltas),
        st.encode_varints(exc_pos.astype(np.uint64)),
        exc_byte,
    ])
    r, p, b = st.decode_exc_stream(buf)
    assert (r == exc_read).all()
    assert (p == exc_pos).all()
    assert (b == exc_byte).all()


def test_exc_stream_v2_many_per_read():
    """Dense within-read exceptions (delta-coded positions) round-trip."""
    import numpy as np

    from nanospring_tpu.io import streams as st

    rng = np.random.default_rng(4)
    reads = np.repeat(np.arange(50, dtype=np.int64),
                      rng.integers(1, 30, 50))
    pos = np.concatenate([
        np.sort(rng.choice(5000, size=(reads == r).sum(), replace=False))
        for r in range(50)
    ]).astype(np.int64)
    byte = rng.integers(60, 90, len(reads)).astype(np.uint8)
    buf = st.encode_exc_stream(reads, pos, byte)
    r, p, b = st.decode_exc_stream(buf)
    assert (r == reads).all() and (p == pos).all() and (b == byte).all()
