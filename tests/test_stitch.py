"""Anchor-stitched aligner (native/align.cpp ns_stitch_align): replay-valid
scripts whose cost stays in the full-banded-DP neighborhood, at a fraction
of the DP work. The stitched path plays minimap2's role in the reference
(chain anchors bound the ksw extensions, minimap2/align.c:864,329)."""

import ctypes

import numpy as np
import pytest

from nanospring_tpu import native

i64p = ctypes.POINTER(ctypes.c_int64)
u8p = ctypes.POINTER(ctypes.c_uint8)
u64p = ctypes.POINTER(ctypes.c_uint64)


def _minimizer_anchors(lib, t, q, k=20, w=50, max_anchors=4000):
    """Anchors via the production minimizer pipeline (tables + join)."""
    def table(codes):
        cap = max(1, len(codes) - k + 1)
        h = np.empty(cap, np.uint64)
        p = np.empty(cap, np.int64)
        f = np.empty(cap, np.uint8)
        n = lib.ns_minimizers(codes.ctypes.data_as(u8p),
                              ctypes.c_int64(len(codes)),
                              ctypes.c_int32(k), ctypes.c_int32(w),
                              h.ctypes.data_as(u64p),
                              p.ctypes.data_as(i64p),
                              f.ctypes.data_as(u8p))
        n = lib.ns_anchor_prepare(h.ctypes.data_as(u64p),
                                  p.ctypes.data_as(i64p),
                                  f.ctypes.data_as(u8p), ctypes.c_int64(n))
        return h[:n], p[:n], f[:n]

    ha, pa, fa = table(t)
    hb, pb, fb = table(q)
    cap = len(hb)
    aq = np.empty(max(cap, 1), np.int64)
    at = np.empty(max(cap, 1), np.int64)
    is_rc = ctypes.c_int32()
    d0 = ctypes.c_int64()
    votes = ctypes.c_int64()
    npins = ctypes.c_int64()
    ok = lib.ns_anchor_join_chain(
        ha.ctypes.data_as(u64p), pa.ctypes.data_as(i64p),
        fa.ctypes.data_as(u8p), ctypes.c_int64(len(ha)),
        hb.ctypes.data_as(u64p), pb.ctypes.data_as(i64p),
        fb.ctypes.data_as(u8p), ctypes.c_int64(len(hb)),
        ctypes.c_int64(len(q)), ctypes.c_int32(k),
        ctypes.c_int32(max_anchors),
        ctypes.byref(is_rc), ctypes.byref(d0), ctypes.byref(votes),
        aq.ctypes.data_as(i64p), at.ctypes.data_as(i64p),
        ctypes.c_int64(cap), ctypes.byref(npins))
    if not ok:
        return None
    return is_rc.value, d0.value, aq[: npins.value], at[: npins.value]


def _stitch(lib, t, q, aq, at, d0, W=64, max_cost_frac=0.5):
    m = len(q)
    max_cost = int(m * max_cost_frac) + 8
    cap = 2 * m + 2 * W + 2
    ops = np.empty(cap, np.uint8)
    ops_len = ctypes.c_int64()
    ts = ctypes.c_int64()
    te = ctypes.c_int64()
    aq = np.ascontiguousarray(aq, np.int64)
    at = np.ascontiguousarray(at, np.int64)
    cost = lib.ns_stitch_align(
        t.ctypes.data_as(u8p), ctypes.c_int64(len(t)),
        q.ctypes.data_as(u8p), ctypes.c_int64(m),
        aq.ctypes.data_as(i64p), at.ctypes.data_as(i64p),
        ctypes.c_int64(len(aq)),
        ctypes.c_int64(int(d0)), ctypes.c_int32(W), ctypes.c_int32(W),
        ctypes.c_int32(max_cost),
        ops.ctypes.data_as(u8p), ctypes.c_int64(cap),
        ctypes.byref(ops_len), ctypes.byref(ts), ctypes.byref(te))
    return cost, ops[: ops_len.value].tobytes(), ts.value, te.value


def _full_dp(lib, t, q, d0, W=64, max_cost_frac=0.5):
    m = len(q)
    max_cost = int(m * max_cost_frac) + 8
    cap = 2 * m + 2 * W + 2
    ops = np.empty(cap, np.uint8)
    ops_len = ctypes.c_int64()
    ts = ctypes.c_int64()
    te = ctypes.c_int64()
    cost = lib.ns_banded_align(
        t.ctypes.data_as(u8p), ctypes.c_int64(len(t)),
        q.ctypes.data_as(u8p), ctypes.c_int64(m),
        ctypes.c_int64(int(d0)), ctypes.c_int32(W),
        ctypes.c_int32(max_cost),
        ops.ctypes.data_as(u8p), ctypes.c_int64(cap),
        ctypes.byref(ops_len), ctypes.byref(ts), ctypes.byref(te))
    return cost, ops[: ops_len.value].tobytes(), ts.value, te.value


def _replay_ok(t, q, ops, ts, te):
    j, qi = int(ts), 0
    for o in ops:
        if o == ord("="):
            if j >= len(t) or t[j] != q[qi]:
                return False
            j += 1
            qi += 1
        elif o == ord("s"):
            j += 1
            qi += 1
        elif o == ord("i"):
            qi += 1
        else:
            j += 1
    return qi == len(q) and j == int(te)


def _mutate(genome, s, e, rng, p_sub=0.013, p_ins=0.006, p_del=0.006):
    out = []
    for c in genome[s:e]:
        r = rng.random()
        if r < p_sub:
            out.append((int(c) + int(rng.integers(1, 4))) % 4)
        elif r < p_sub + p_del:
            pass
        elif r < p_sub + p_del + p_ins:
            out.extend([int(c), int(rng.integers(0, 4))])
        else:
            out.append(int(c))
    return np.array(out, np.uint8)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_stitch_matches_full_dp_quality(seed):
    lib = native.get_lib()
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, 40_000).astype(np.uint8)
    n_pairs = n_stitched = 0
    extra_cost = 0
    for trial in range(8):
        s = int(rng.integers(0, 30_000))
        e = s + int(rng.integers(2_000, 6_000))
        q = _mutate(genome, s, e, rng)
        t = genome[max(0, s - 500): min(len(genome), e + 500)]
        res = _minimizer_anchors(lib, t, q)
        assert res is not None
        is_rc, d0, aq, at = res
        assert is_rc == 0
        cost_s, ops_s, ts_s, te_s = _stitch(lib, t, q, aq, at, d0)
        cost_f, ops_f, ts_f, te_f = _full_dp(lib, t, q, d0)
        assert cost_f >= 0
        n_pairs += 1
        if cost_s >= 0:
            n_stitched += 1
            assert _replay_ok(t, q, ops_s, ts_s, te_s), trial
            # stitched scripts may be slightly suboptimal, never better
            # than the exact banded optimum, and close to it
            assert cost_s >= cost_f
            extra_cost += cost_s - cost_f
    assert n_stitched >= 7 * n_pairs // 8, (n_stitched, n_pairs)
    # within 3% extra edits overall
    assert extra_cost <= max(8, 0.03 * n_pairs * 120), extra_cost


def test_stitch_unusable_chain_falls_back():
    lib = native.get_lib()
    rng = np.random.default_rng(99)
    t = rng.integers(0, 4, 800).astype(np.uint8)
    q = rng.integers(0, 4, 400).astype(np.uint8)  # unrelated
    # one bogus pin -> too short a chain -> must return -4 (fall back)
    aq = np.array([10], np.int64)
    at = np.array([12], np.int64)
    cost, ops, ts, te = _stitch(lib, t, q, aq, at, d0=0)
    assert cost == -4


def test_stitch_rc_pair_replays():
    lib = native.get_lib()
    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, 20_000).astype(np.uint8)
    s, e = 4_000, 8_000
    q_fwd = _mutate(genome, s, e, rng)
    q = (3 - q_fwd)[::-1].copy()  # reverse complement
    t = genome[3_500:8_500]
    res = _minimizer_anchors(lib, t, q)
    assert res is not None
    is_rc, d0, aq, at = res
    assert is_rc == 1
    # orient the query the way the engine does before aligning
    q_or = (3 - q)[::-1].copy()
    cost, ops, ts, te = _stitch(lib, t, q_or, aq, at, d0)
    assert cost >= 0
    assert _replay_ok(t, q_or, ops, ts, te)
