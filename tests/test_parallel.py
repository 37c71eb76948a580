"""Distributed candidate join (parallel/sharded_join.py) vs the single-host
sort-join index: identical pair sets on the virtual 8-device CPU mesh."""

import numpy as np

from nanospring_tpu.ops import sketch as sk
from nanospring_tpu.parallel import mesh as pm
from nanospring_tpu.parallel import sharded_join as sj
from nanospring_tpu.pipeline import candidates


def _sketches(N=64, L=512, k=23, nh=16, seed=0):
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, 4096).astype(np.uint8)
    codes = np.zeros((N, L), dtype=np.uint8)
    lengths = np.full(N, L, dtype=np.int32)
    for i in range(N):
        s = rng.integers(0, 4096 - L)
        r = genome[s: s + L].copy()
        m = rng.random(L) < 0.05
        r[m] = rng.integers(0, 4, int(m.sum()))
        codes[i] = r
    seeds = np.asarray(sk.make_seeds(nh, 7))
    out = np.asarray(sk.sketch_batch(codes, lengths, seeds, k=k))
    return out


def _single_host_pairs(sketches, threshold):
    index = candidates.SketchIndex(sketches)
    q, r, _ = index.query(sketches, threshold)
    keep = q != r
    return set(zip(q[keep].tolist(), r[keep].tolist()))


def test_sharded_join_matches_single_host():
    sketches = _sketches()
    mesh = pm.make_mesh(8)
    for threshold in (2, 4):
        q, r, _c = sj.sharded_candidate_pairs(mesh, sketches, threshold)
        got = set(zip(q.tolist(), r.tolist()))
        want = _single_host_pairs(sketches, threshold)
        assert got == want, (threshold, len(got), len(want))


def test_sharded_join_empty_and_tiny():
    mesh = pm.make_mesh(8)
    # all-EMPTY sketches (short reads): no pairs, no crash
    empty = np.full((16, 8), sk.EMPTY_SLOT, dtype=np.uint32)
    q, r, _c = sj.sharded_candidate_pairs(mesh, empty, 2)
    assert len(q) == 0 and len(r) == 0
