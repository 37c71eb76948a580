"""Parity: native anchor prepare/join/accept (native/anchors.cpp) vs the
numpy oracles in ops/minimizers.py."""

import numpy as np
import pytest

from nanospring_tpu.ops import minimizers as mz


@pytest.fixture(scope="module", autouse=True)
def lib():
    from nanospring_tpu import native

    return native.get_lib()


def test_match_prepared_matches_numpy():
    rng = np.random.default_rng(7)
    for _ in range(200):
        na, nb = rng.integers(1, 200, 2)
        pool = rng.integers(0, 500, 1000).astype(np.uint64)
        ha = pool[rng.integers(0, 1000, na)]
        hb = pool[rng.integers(0, 1000, nb)]
        pa = rng.integers(0, 5000, na)
        pb = rng.integers(0, 5000, nb)
        fa = rng.random(na) < 0.5
        fb = rng.random(nb) < 0.5
        ref = mz.match_anchors(ha, pa, fa, hb, pb, fb, 5100, 20,
                               max_anchors=40)
        ha2, pa2, fa2 = mz.prepare_anchors(ha.copy(), pa.copy(), fa.copy())
        hb2, pb2, fb2 = mz.prepare_anchors(hb.copy(), pb.copy(), fb.copy())
        got = mz.match_anchors_prepared(ha2, pa2, fa2, hb2, pb2, fb2,
                                        5100, 20, max_anchors=40)
        assert (ref is None) == (got is None)
        if ref is not None:
            assert ref == got


def test_accept_anchors_matches_numpy():
    rng = np.random.default_rng(8)
    for _ in range(200):
        mlen = int(rng.integers(50, 400))
        ops = []
        q = 0
        while q < mlen:
            o = rng.choice([ord("="), ord("s"), ord("i"), ord("d")],
                           p=[0.8, 0.07, 0.07, 0.06])
            ops.append(o)
            if o != ord("d"):
                q += 1
        ops = np.array(ops, np.uint8)
        n = int(rng.integers(1, 30))
        h = rng.integers(0, 1000, n).astype(np.uint64)
        p = rng.integers(0, max(1, mlen - 20 + 1), n).astype(np.int64)
        f = rng.random(n) < 0.5
        h, p, f = mz.prepare_anchors(h, p, f)
        is_rc = int(rng.random() < 0.5)
        ts = int(rng.integers(-50, 50))
        got = mz.accept_anchors(ops, ts, mlen, is_rc, 20, h, p, f)
        saved = mz._NATIVE
        mz._NATIVE = False
        try:
            ref = mz.accept_anchors(ops, ts, mlen, is_rc, 20, h, p, f)
        finally:
            mz._NATIVE = saved
        for a, b in zip(got, ref):
            assert np.array_equal(a, b)
