"""Chip kernel microbenchmarks -> KERNELS.json (round-4 verdict ask #1).

Measures, on the attached TPU chip, with device-compute wall separated
from tunnel transfer time:

- tunnel health: claim time, first-d2h stall (this host's sick-tunnel
  failure mode: ~0.1 s claim then a one-time 30-300 s stall on the FIRST
  device->host transfer), steady h2d/d2h MB/s, round-trip latency;
- MXU reference rate (bf16 matmul) as a chip-health yardstick;
- sketch kernel (ops/sketch.py): device bases/s and hashes/s;
- DP kernels v2/v3 (ops/align_tpu.py): device cell-updates/s and Mb/s,
  end-to-end (host prep + tunnel + kernel) Mb/s, plus the native C++
  DP on the same pairs for context;
- a computed VPU-utilization estimate for each kernel against the chip's
  vector-lane throughput (v5e: 8x128 lanes x 4 ALUs x ~0.94 GHz
  ~= 3.9e12 lane-ops/s; the ops/cell and ops/hash models are stated in
  the JSON so the arithmetic is checkable).

Writes results incrementally so a mid-run tunnel death still leaves the
phases that completed. Run: python bench_kernels.py  (chip required;
JAX_PLATFORMS=cpu runs a degraded CPU variant for plumbing tests only).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "KERNELS.json")

# v5e vector unit: 8 sublanes x 128 lanes x 4 ALUs at ~940 MHz
VPU_LANE_OPS = 8 * 128 * 4 * 0.94e9
MXU_PEAK_BF16 = 197e12  # v5e bf16 peak FLOP/s

RES: dict = {"host": {}, "tunnel": {}, "kernels": {}}


def _save() -> None:
    with open(OUT_PATH, "w") as f:
        json.dump(RES, f, indent=1)
        f.write("\n")


def _sync(x) -> None:
    np.asarray(x)  # d2h of a small result: full queue drain + sync


def tunnel_health() -> bool:
    import jax

    t0 = time.time()
    try:
        dev = jax.devices()[0]
    except Exception as e:
        RES["tunnel"]["claim_error"] = repr(e)
        _save()
        return False
    RES["tunnel"]["claim_s"] = round(time.time() - t0, 3)
    RES["tunnel"]["device"] = str(dev)
    RES["tunnel"]["platform"] = jax.default_backend()
    RES["host"]["jax"] = jax.__version__
    _save()

    # first d2h: the stall, if any, happens exactly once per process
    x = jax.device_put(np.arange(16, dtype=np.float32))
    t0 = time.time()
    v = np.asarray(x)
    RES["tunnel"]["first_d2h_stall_s"] = round(time.time() - t0, 3)
    assert v[3] == 3.0
    _save()

    mb = 16
    buf = np.zeros(mb << 20, np.uint8)
    t0 = time.time()
    xb = jax.device_put(buf)
    xb.block_until_ready()
    RES["tunnel"]["h2d_mb_s"] = round(mb / (time.time() - t0), 1)
    t0 = time.time()
    _ = np.asarray(xb)
    RES["tunnel"]["d2h_mb_s"] = round(mb / (time.time() - t0), 1)
    lat = []
    for _ in range(10):
        t0 = time.time()
        _ = np.asarray(x)
        lat.append(time.time() - t0)
    RES["tunnel"]["roundtrip_ms_median"] = round(1e3 * sorted(lat)[5], 2)
    _save()
    return True


def mxu_reference() -> None:
    import jax
    import jax.numpy as jnp

    n = 4096
    a = jnp.zeros((n, n), jnp.bfloat16)
    f = jax.jit(lambda a: a @ a)
    _sync(f(a)[:1, :1])
    reps = 20
    t0 = time.time()
    r = None
    for _ in range(reps):
        r = f(a)
    _sync(r[:1, :1])
    dt = (time.time() - t0) / reps
    tf = 2 * n**3 / dt / 1e12
    RES["kernels"]["mxu_matmul"] = {
        "shape": f"{n}x{n}x{n} bf16", "tflop_s": round(tf, 1),
        "mxu_utilization_pct": round(100 * tf * 1e12 / MXU_PEAK_BF16, 1),
    }
    _save()


def sketch_kernel() -> None:
    import jax

    from nanospring_tpu.ops import sketch as sk

    B, L, K, NH = 256, 4096, 23, 60
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (B, L), dtype=np.uint8)
    lengths = np.full(B, L, np.int32)
    seeds = np.asarray(sk.make_seeds(NH, 0x5EEDF00D))
    cd = jax.device_put(codes)
    ld = jax.device_put(lengths)
    sd = jax.device_put(seeds)

    t0 = time.time()
    out = sk.sketch_batch(cd, ld, sd, k=K)
    _sync(out[:1, :1])
    compile_s = time.time() - t0
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        out = sk.sketch_batch(cd, ld, sd, k=K)
    _sync(out[:1, :1])
    dt = (time.time() - t0) / reps
    bases = B * L
    kmers = B * (L - K + 1)
    hashes = kmers * NH
    # ops/hash model: per (k-mer, seed): 2 mul + 1 add + 1 select + 1
    # running-min = 5 lane-ops; k-mer build + fmix amortize to ~2 more
    ops_per_hash = 7
    RES["kernels"]["sketch"] = {
        "batch": f"{B}x{L} k={K} n_hashes={NH}",
        "compile_s": round(compile_s, 2),
        "device_wall_s": round(dt, 4),
        "device_mbases_s": round(bases / dt / 1e6, 1),
        "hashes_per_s": round(hashes / dt / 1e6, 1) * 1e6,
        "ops_per_hash_model": ops_per_hash,
        "vpu_utilization_pct": round(
            100 * hashes * ops_per_hash / dt / VPU_LANE_OPS, 2),
    }
    # end-to-end including h2d of fresh codes each call (the pipeline
    # ships packed bytes; this is the conservative unpacked number)
    t0 = time.time()
    for _ in range(3):
        out = sk.sketch_batch(jax.device_put(codes), ld, sd, k=K)
    _sync(out[:1, :1])
    RES["kernels"]["sketch"]["e2e_mbases_s"] = round(
        3 * bases / (time.time() - t0) / 1e6, 1)
    _save()


def _make_pairs(P: int, m: int, err: float, seed: int = 1):
    """Engine-window-shaped pairs: target = noisy query with 64-slack."""
    rng = np.random.default_rng(seed)
    qs, ts = [], []
    for _ in range(P):
        q = rng.integers(0, 4, m, dtype=np.uint8)
        t = q.copy()
        nsub = int(err * m)
        pos = rng.integers(0, m, nsub)
        t[pos] = (t[pos] + rng.integers(1, 4, nsub)) % 4
        pad = rng.integers(0, 4, 64, dtype=np.uint8)
        t = np.concatenate([pad, t, pad])
        qs.append(q)
        ts.append(t)
    q_flat = np.concatenate(qs)
    t_flat = np.concatenate(ts)
    q_off = np.arange(P, dtype=np.int64) * m
    q_len = np.full(P, m, np.int64)
    t_off = np.arange(P, dtype=np.int64) * (m + 128)
    t_len = np.full(P, m + 128, np.int64)
    d0 = np.full(P, 64, np.int64)
    return t_flat, t_off, t_len, q_flat, q_off, q_len, d0


def dp_kernel_v2() -> None:
    import jax

    from nanospring_tpu.ops import align_tpu as at

    P, m = 512, 4800
    t_flat, t_off, t_len, q_flat, q_off, q_len, d0 = _make_pairs(P, m, 0.05)

    # ---- device-compute only: device-resident padded inputs ----
    m_pad = 8192
    blocks = P // at._SUB16
    tw = m_pad + 3 * at._W16
    qw = m_pad + 2 * at._W16
    tpad = np.full((P, tw), 0xFF, np.uint8)
    qbuf = np.zeros((P, qw), np.uint8)
    for p in range(P):
        qbuf[p, :m] = q_flat[q_off[p]: q_off[p] + m]
        lo = d0[p] - (at._KOFF16 + 1)
        st = max(0, -lo)
        en = min(tw, t_len[p] - lo)
        tpad[p, st:en] = t_flat[t_off[p] + lo + st: t_off[p] + en + lo]
    d0a = d0.astype(np.int32)
    qla = q_len.astype(np.int32)
    tla = t_len.astype(np.int32)
    mca = (q_len * 500 // 1000 + 8).astype(np.int32)
    args = [jax.device_put(a) for a in (
        d0a, qla, tla, mca,
        tpad.reshape(blocks, at._SUB16, tw),
        qbuf.reshape(blocks, at._SUB16, qw))]
    t0 = time.time()
    out = at._align_padded16(*args, m_pad=m_pad)
    _sync(out[0][:1])
    compile_s = time.time() - t0
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = at._align_padded16(*args, m_pad=m_pad)
    _sync(out[0][:1])
    dt = (time.time() - t0) / reps
    cost = np.asarray(out[0])
    bases = int(q_len.sum())
    cells_useful = bases * at._W16
    cells_padded = P * m_pad * at._W16
    # ops/cell model (kernel16 inner row, per band slot): diag/up/left
    # min-chain + match compare + cost clip + trace pack ~= 12 lane-ops
    ops_per_cell = 12
    RES["kernels"]["dp_v2"] = {
        "batch": f"{P} pairs x {m} bases, band 128 (W=63), m_pad {m_pad}",
        "compile_s": round(compile_s, 2),
        "device_wall_s": round(dt, 4),
        "device_mbases_s": round(bases / dt / 1e6, 2),
        "cell_updates_per_s_useful": round(cells_useful / dt / 1e9, 2) * 1e9,
        "cell_updates_per_s_padded": round(cells_padded / dt / 1e9, 2) * 1e9,
        "accept_rate": round(float((cost[:P] >= 0).mean()), 3),
        "ops_per_cell_model": ops_per_cell,
        "vpu_utilization_pct": round(
            100 * cells_padded * ops_per_cell / dt / VPU_LANE_OPS, 2),
        "bytes_h2d_per_base": round((tw + qw) / m, 2),
        "bytes_d2h_per_base": round(m_pad / 4 / m + 0.01, 2),
    }
    _save()

    # ---- end-to-end: full wrapper (host prep + tunnel + kernel + post) ----
    t0 = time.time()
    r = at.banded_align_batch_tpu16(t_flat, t_off, t_len,
                                    q_flat, q_off, q_len, d0)
    e2e = time.time() - t0
    RES["kernels"]["dp_v2"]["e2e_wall_s"] = round(e2e, 3)
    RES["kernels"]["dp_v2"]["e2e_mbases_s"] = round(bases / e2e / 1e6, 2)
    RES["kernels"]["dp_v2"]["e2e_accept_rate"] = round(
        float((np.asarray(r.cost) >= 0).mean()), 3)
    _save()

    # ---- native C++ DP on the same pairs (context) ----
    try:
        import ctypes

        from nanospring_tpu import native

        lib = native.get_lib()
        u8p = ctypes.POINTER(ctypes.c_uint8)
        cap = 2 * m + 2 * 63 + 2
        buf = np.empty(cap, np.uint8)
        ol = ctypes.c_int64()
        s1 = ctypes.c_int64()
        s2 = ctypes.c_int64()
        t0 = time.time()
        for p in range(P):
            tseg = np.ascontiguousarray(
                t_flat[t_off[p]: t_off[p] + t_len[p]])
            qseg = np.ascontiguousarray(q_flat[q_off[p]: q_off[p] + m])
            lib.ns_banded_align(
                tseg.ctypes.data_as(u8p), ctypes.c_int64(len(tseg)),
                qseg.ctypes.data_as(u8p), ctypes.c_int64(m),
                ctypes.c_int64(64), ctypes.c_int32(63),
                ctypes.c_int32(int(mca[p])),
                buf.ctypes.data_as(u8p), ctypes.c_int64(cap),
                ctypes.byref(ol), ctypes.byref(s1), ctypes.byref(s2))
        dtn = time.time() - t0
        RES["kernels"]["dp_native_1core"] = {
            "same_pairs_wall_s": round(dtn, 3),
            "mbases_s": round(bases / dtn / 1e6, 2),
        }
        _save()
    except Exception as e:
        RES["kernels"]["dp_native_1core"] = {"error": repr(e)}
        _save()


def dp_kernel_v3() -> None:
    import jax

    from nanospring_tpu.ops import align_tpu as at

    # hs2-like reads (reference headline avg 24,492 b): m_pad 32768 ->
    # the DUAL-block tiled kernel; plus one ultra-long batch (110 kb ->
    # m_pad 131072, above M_PAD16T2_MAX) on the single-block variant
    # device-compute-only timing for the dual-tiled kernel on the
    # hs2-like shape (device-resident padded inputs, tiny-slice sync)
    P, m = 64, 24_000
    t_flat, t_off, t_len, q_flat, q_off, q_len, d0 = _make_pairs(
        P, m, 0.04, seed=3)
    m_pad = 32768
    blocks = P // at._SUB16
    tw = m_pad + 3 * at._W16
    qw = m_pad + 2 * at._W16
    tpad = np.full((P, tw), 0xFF, np.uint8)
    qbuf = np.zeros((P, qw), np.uint8)
    for p in range(P):
        qbuf[p, :m] = q_flat[q_off[p]: q_off[p] + m]
        lo = d0[p] - (at._KOFF16 + 1)
        st = max(0, -lo)
        en = min(tw, t_len[p] - lo)
        tpad[p, st:en] = t_flat[t_off[p] + lo + st: t_off[p] + en + lo]
    mca = (q_len * 500 // 1000 + 8).astype(np.int32)
    args = [jax.device_put(a) for a in (
        d0.astype(np.int32), q_len.astype(np.int32),
        t_len.astype(np.int32), mca,
        tpad.reshape(blocks, at._SUB16, tw),
        qbuf.reshape(blocks, at._SUB16, qw))]
    t0 = time.time()
    out = at._align_padded16t2(*args, m_pad=m_pad)
    _sync(out[0][:1])
    compile_s = time.time() - t0
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = at._align_padded16t2(*args, m_pad=m_pad)
    _sync(out[0][:1])
    dt = (time.time() - t0) / reps
    bases = int(q_len.sum())
    RES["kernels"]["dp_v3_dual_device"] = {
        "batch": f"{P} pairs x {m} bases, m_pad {m_pad} (dual-block "
                 f"tiled, checkpoint-recompute ~2x forward)",
        "compile_s": round(compile_s, 2),
        "device_wall_s": round(dt, 3),
        "device_mbases_s": round(bases / dt / 1e6, 2),
        "accept_rate": round(
            float((np.asarray(out[0])[:P] >= 0).mean()), 3),
    }
    _save()

    for tag, P, m in (("dp_v3_hs2", 64, 24_000), ("dp_v3_long", 16, 110_000)):
        t_flat, t_off, t_len, q_flat, q_off, q_len, d0 = _make_pairs(
            P, m, 0.04, seed=3)
        t0 = time.time()
        r = at.banded_align_batch_tpu16(t_flat, t_off, t_len,
                                        q_flat, q_off, q_len, d0)
        e2e = time.time() - t0
        bases = int(q_len.sum())
        RES["kernels"][tag] = {
            "batch": f"{P} pairs x {m} bases (row-tiled checkpoint "
                     f"kernel, {'dual' if m <= 65536 else 'single'}-block)",
            "e2e_wall_s": round(e2e, 2),
            "e2e_mbases_s": round(bases / e2e / 1e6, 2),
            "accept_rate": round(
                float((np.asarray(r.cost) >= 0).mean()), 3),
        }
        _save()


def main() -> int:
    RES["host"]["time"] = time.strftime("%Y-%m-%d %H:%M:%S")
    RES["host"]["vpu_lane_ops_model"] = VPU_LANE_OPS
    _save()
    ok = tunnel_health()
    if not ok:
        return 1
    for name, fn in [("mxu", mxu_reference), ("sketch", sketch_kernel),
                     ("dp_v2", dp_kernel_v2), ("dp_v3", dp_kernel_v3)]:
        try:
            fn()
        except Exception as e:
            RES["kernels"][name + "_error"] = repr(e)
            _save()
    print(json.dumps(RES))
    return 0


if __name__ == "__main__":
    sys.exit(main())
