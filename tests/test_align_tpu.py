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


@pytest.mark.parametrize("P", [19, 33])
def test_tpu16_kernel_matches_native(P):
    """v2 dual-block kernel must match the exact C++ DP at W=63: equal
    costs, replay-valid scripts. P=19 fills 2 blocks (one program);
    P=33 needs 3 blocks and exercises the odd-block-count rounding."""
    from nanospring_tpu.ops.align_tpu import banded_align_batch_tpu16

    rng = np.random.default_rng(3)
    args = _mkbatch(P, rng)
    ref = banded_align_batch(*args, band=63, use_native=True)
    tpu = banded_align_batch_tpu16(*args, interpret=True)
    assert np.array_equal(ref.cost, tpu.cost), (ref.cost, tpu.cost)
    for p in range(P):
        if tpu.cost[p] >= 0:
            assert _replay_ok(args, tpu, p), p


def test_tpu16_rejects_garbage():
    from nanospring_tpu.ops.align_tpu import banded_align_batch_tpu16

    rng = np.random.default_rng(4)
    t = rng.integers(0, 4, 600).astype(np.uint8)
    q = rng.integers(0, 4, 500).astype(np.uint8)  # unrelated
    res = banded_align_batch_tpu16(
        t, np.array([0]), np.array([600]),
        q, np.array([0]), np.array([500]), np.array([50]),
        max_cost_per_kb=300, interpret=True)
    assert res.cost[0] == -1


def test_engine_tpu_backend_graceful_fallback(tmp_path):
    """aligner='tpu' on a host without a usable chip must fall back to the
    native DP inside the engine and stay lossless (the callback returns
    nonzero; dp_run reruns the batch on the host path)."""
    from nanospring_tpu.compressor import compress_file
    from nanospring_tpu.config import CompressConfig
    from nanospring_tpu.decompressor import decompress_file
    from nanospring_tpu.utils import synth

    rng = np.random.default_rng(17)
    genome = synth.random_genome(40_000, rng)
    reads = synth.make_reads(genome, 80, 2_500, rng)
    fq = str(tmp_path / "in.fastq")
    synth.write_fastq(fq, reads, gz=False)
    arc = str(tmp_path / "o.nstpu")
    res = compress_file(fq, arc,
                        CompressConfig(aligner="tpu", pipeline_workers=1),
                        report=False)
    out = str(tmp_path / "o.reads")
    decompress_file(arc, out, report=False)
    with open(out, "rb") as f:
        assert f.read().split(b"\n")[:-1] == reads
    assert res["ratio"] > 1.0


@pytest.mark.parametrize("dual", [True, False])
def test_tpu16_tiled_kernel_matches_native(monkeypatch, dual):
    """v3 row-tiled kernel (checkpoint-and-recompute for reference-length
    reads, hs2 avg 24,492 b) must match the exact C++ DP at W=63. Forced
    onto the tiled path with shrunken caps so interpret mode stays fast
    while still crossing multiple row tiles; dual=False shrinks the
    dual-block cap too so the single-block variant (used above
    M_PAD16T2_MAX) keeps parity coverage."""
    import nanospring_tpu.ops.align_tpu as at

    monkeypatch.setattr(at, "M_PAD16_MAX", 512)   # force the tiled kernel
    monkeypatch.setattr(at, "_TR", 512)           # multiple tiles at 2-3 kb
    if not dual:
        monkeypatch.setattr(at, "M_PAD16T2_MAX", 512)
    rng = np.random.default_rng(7)
    args = _mkbatch(6, rng, tmin=2200, tmax=3400, minov=1500)
    ref = banded_align_batch(*args, band=63, use_native=True)
    tpu = at.banded_align_batch_tpu16(*args, interpret=True)
    assert np.array_equal(ref.cost, tpu.cost), (ref.cost, tpu.cost)
    assert (tpu.cost >= 0).sum() >= 3     # the batch must exercise accepts
    for p in range(6):
        if tpu.cost[p] >= 0:
            assert _replay_ok(args, tpu, p), p


def test_tpu16_quad_kernel_matches_native(monkeypatch):
    """v4 quad-block kernel (HBM-streamed direction words via manual DMA,
    NSTPU_DP_QUAD=1) must match the exact C++ DP. Kept as a routed-off
    experiment: on-chip it ties the dual kernel (~23.6 Mb/s device) —
    with direction stores and traceback included the kernel is no longer
    recurrence-bound, so the extra interleaved chains buy nothing
    (docs/TPU_ALIGNER.md, round 5)."""
    import nanospring_tpu.ops.align_tpu as at

    monkeypatch.setenv("NSTPU_DP_QUAD", "1")
    rng = np.random.default_rng(9)
    args = _mkbatch(21, rng)
    ref = banded_align_batch(*args, band=63, use_native=True)
    tpu = at.banded_align_batch_tpu16(*args, interpret=True)
    assert np.array_equal(ref.cost, tpu.cost), (ref.cost, tpu.cost)
    for p in range(21):
        if tpu.cost[p] >= 0:
            assert _replay_ok(args, tpu, p), p
