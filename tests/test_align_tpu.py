"""Pallas alignment kernel (ops/align_tpu.py) vs the C++ engine: identical
costs and replay-valid edit scripts (interpret mode; same kernel runs
compiled on a real TPU)."""

import numpy as np
import pytest

from nanospring_tpu.ops.align import banded_align_batch
from nanospring_tpu.ops.align_tpu import banded_align_batch_tpu


def _mkbatch(P, rng, tmin=300, tmax=900, minov=100):
    tf, qf = [], []
    t_off, t_len, q_off, q_len, d0 = [], [], [], [], []
    to = qo = 0
    for _ in range(P):
        n = int(rng.integers(tmin, tmax))
        t = rng.integers(0, 4, n).astype(np.uint8)
        s = int(rng.integers(0, n // 3))
        e = int(rng.integers(s + minov, n))
        out = []
        for c in t[s:e]:
            r = rng.random()
            if r < 0.03:
                out.append(int(rng.integers(0, 4)))
            elif r < 0.06:
                pass
            elif r < 0.09:
                out.extend([int(c), int(rng.integers(0, 4))])
            else:
                out.append(int(c))
        q = np.array(out, np.uint8)
        tf.append(t)
        qf.append(q)
        t_off.append(to)
        t_len.append(n)
        to += n
        q_off.append(qo)
        q_len.append(len(q))
        qo += len(q)
        d0.append(s)
    return (np.concatenate(tf), np.array(t_off), np.array(t_len),
            np.concatenate(qf), np.array(q_off), np.array(q_len),
            np.array(d0))


def _replay_ok(args, res, p) -> bool:
    tfl, t_off, t_len, qfl, q_off, q_len, _ = args
    t = tfl[t_off[p]: t_off[p] + t_len[p]]
    q = qfl[q_off[p]: q_off[p] + q_len[p]]
    j, qi = int(res.tstart[p]), 0
    for o in res.ops(p):
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
    return qi == len(q) and j == int(res.tend[p])


@pytest.mark.parametrize("P", [5, 19])
def test_tpu_kernel_matches_native(P):
    rng = np.random.default_rng(P)
    args = _mkbatch(P, rng)
    ref = banded_align_batch(*args, band=128, use_native=True)
    tpu = banded_align_batch_tpu(*args, interpret=True)
    assert np.array_equal(ref.cost, tpu.cost)
    for p in range(P):
        if ref.cost[p] >= 0:
            assert _replay_ok(args, tpu, p), p


def test_tpu_kernel_rejects_garbage():
    rng = np.random.default_rng(0)
    # unrelated target/query: cost cap must reject
    t = rng.integers(0, 4, 500).astype(np.uint8)
    q = rng.integers(0, 4, 400).astype(np.uint8)
    res = banded_align_batch_tpu(
        t, np.array([0]), np.array([500]), q, np.array([0]), np.array([400]),
        np.array([0]), max_cost_per_kb=100, interpret=True,
    )
    assert res.cost[0] == -1 and res.ops_len[0] == 0
