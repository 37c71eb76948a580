"""Banded glocal alignment as a Pallas TPU kernel.

TPU-native replacement for the batched banded DP in native/align.cpp (itself
the from-scratch equivalent of the reference's minimap2 base-level extension,
reference: src/ConsensusGraph.cpp:161-398 -> minimap2/align.c ksw_extz2_sse).

Design — 8 pairs per grid program (sublane = pair, lane = band slot):

- Band of 256 slots, slot k <-> target column j = d0 + i + (k - 128) at query
  row i (antidiagonal coordinates): the 8 pairs' DP rows form one (8, 256)
  int32 block, a full VPU shape. TPU grid programs run sequentially on the
  TensorCore, so all parallelism must be inside the program.
- The host pre-extracts a *diagonal-shifted* target buffer per pair
  ``tpad[x] = t[x + d0 - 129]`` so row i's target characters are the
  contiguous slice ``tpad[:, i : i+256]`` — one aligned (8, 512) load plus a
  dynamic rotate (lane-dim dynamic offsets must be 128-aligned on TPU).
- Unit-cost moves: diag (match 0 / sub 1), up = insertion, left = deletion.
  The in-row left-move chain (cur[k] = cur[k-1] + 1) is an exact prefix-min:
  cur[k] = min(base[k], k + min_{k'<=k}(base[k'] - k')), computed in log2(256)
  = 8 shifted-min steps. No sequential scan.
- Direction+match records (3 bits/cell) for the 8 pairs are packed into one
  (1, 256) int32 row (4 bits per pair, shift by 4*sublane + or-reduce),
  buffered in an (8, 256) register group and stored to the (M_pad+8, 256)
  int32 VMEM scratch every 8th row (dynamic sublane stores must be 8-aligned).
- Traceback is also vectorized across the 8 pairs: one backward pass over
  rows; each row resolves every pair's deletion chain with masked lane
  reductions and writes one packed int32 per (pair, query row)
  (dels | optype<<16 | match<<18) into a (8, 128) register strip, flushed to
  the (8, M_pad) trace scratch every 128 rows. The host expands the per-row
  records into op bytes ('=', 's', 'i', 'd') with numpy — O(ops) work, and
  no DP state ever leaves the device (d2h is 4 B/query-base).
- No early abort: per-pair rejection (cost > max_cost) is decided after the
  final row — row minima are monotone, so the decision is identical to the
  C++ engine's mid-DP abort; only the arithmetic is speculative.

Dummy pairs (q_len == 0) make padding to a fixed batch size free, keeping
the number of compiled (batch, M_pad) shapes small.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .align import AlignResult

_W2 = 256          # band slots (one VPU row)
_KOFF = 128        # slot k <-> diagonal offset k - _KOFF, in [-128, 127]
_INF = np.int32(1 << 30)
_SUB = 8           # pairs per grid program (sublane dimension)
M_PAD_MAX = 8192   # dirs scratch is (M_pad+8)*256 int32 <= ~8.4 MB VMEM


def _kernel(d0_ref, m_ref, n_ref, maxc_ref, tpad_ref, q_ref,
            cost_ref, len_ref, ts_ref, te_ref, trace_out, dirs, trace):
    pid = pl.program_id(0)
    INF = jnp.int32(_INF)
    k = jax.lax.broadcasted_iota(jnp.int32, (1, _W2), 1)       # band slot
    sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0)    # pair-in-block
    sub256 = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _W2), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def col(ref):
        # assemble an (8, 1) per-pair column from 8 SMEM scalars
        out = jnp.zeros((_SUB, 1), jnp.int32)
        for s in range(_SUB):
            out = jnp.where(sub == s, ref[_SUB * pid + s], out)
        return out

    d0 = col(d0_ref)
    m = col(m_ref)
    n = col(n_ref)
    maxc = col(maxc_ref)
    i_max = jnp.max(m)

    j0 = d0 + (k - _KOFF)
    prev0 = jnp.where((j0 >= 0) & (j0 <= n), jnp.int32(0), INF)
    dbuf0 = jnp.broadcast_to(jnp.int32(0x33333333), (_SUB, _W2))  # all dir=3

    def row_group(carry):
        # 8 DP rows per iteration (statically unrolled): one aligned load +
        # one dynamic rotate per group, static 256-lane slices per sub-row.
        i0, prev, _dbuf_prev = carry
        ib = pl.multiple_of(((jnp.maximum(i0, 1) - 1) // 128) * 128, 128)
        rot0 = i0 - ib
        tch = tpad_ref[0, :, pl.ds(ib, 2 * _W2)].astype(jnp.int32)
        trot = pltpu.roll(tch, 2 * _W2 - rot0, axis=1)   # trot[l]=tch[l+rot0]
        qch = q_ref[0, :, pl.ds(ib, _W2)]
        qrot = pltpu.roll(qch, _W2 - (rot0 - 1) % _W2, axis=1)
        dbuf = dbuf0
        for r in range(8):
            i = i0 + r
            tchar = trot[:, r: r + _W2]                  # tpad[:, i : i+256]
            qc = qrot[:, r: r + 1]                       # q[:, i-1]
            j = d0 + i + (k - _KOFF)
            jvalid = (j >= 0) & (j <= n)
            dvalid = (j >= 1) & (j <= n)
            match = tchar == qc
            diag = jnp.where(
                dvalid & (prev < INF),
                prev + jnp.where(match, jnp.int32(0), jnp.int32(1)),
                INF,
            )
            up = pltpu.roll(prev, _W2 - 1, axis=1)       # up[k] = prev[k+1]
            up = jnp.where((k < _W2 - 1) & (up < INF), up + 1, INF)
            base = jnp.where(jvalid, jnp.minimum(diag, up), INF)
            # left-move chains: prefix-min over (base - k), then + k
            x = base - k
            for sh in (1, 2, 4, 8, 16, 32, 64, 128):
                shifted = jnp.where(k >= sh, pltpu.roll(x, sh, axis=1), INF)
                x = jnp.minimum(x, shifted)
            cur = jnp.where(jvalid, jnp.minimum(base, x + k), INF)
            # direction|match<<2: diag ties beat up; left only if strictly <
            d = jnp.where(
                cur == diag, jnp.where(match, jnp.int32(4), jnp.int32(0)),
                jnp.where(cur == up, jnp.int32(1), jnp.int32(2)),
            )
            d = jnp.where(cur >= INF, jnp.int32(3), d)
            live = (i >= 1) & (i <= m)
            prev = jnp.where(live, cur, prev)            # freeze done pairs
            # pack the 8 pairs' 3-bit codes into one int32 row (4 b/pair)
            packed = jnp.sum(d << (4 * sub), axis=0, keepdims=True)
            rowlive = (i >= 1) & (i <= i_max)
            dbuf = jnp.where(
                (sub256 == r) & rowlive,
                jnp.broadcast_to(packed, (_SUB, _W2)), dbuf,
            )
        base_row = pl.multiple_of(i0, 8)
        dirs[pl.ds(base_row, 8), :] = dbuf
        return i0 + 8, prev, dbuf

    _i, prev, _dbuf = jax.lax.while_loop(
        lambda c: c[0] <= i_max, row_group, (jnp.int32(0), prev0, dbuf0)
    )

    jm = d0 + m + (k - _KOFF)
    final = jnp.where((jm >= 0) & (jm <= n), prev, INF)
    best = jnp.min(final, axis=1, keepdims=True)
    # first slot achieving the min (matches np.argmin tie-breaking)
    best_k = jnp.min(
        jnp.where(final == best, k, jnp.int32(_W2)), axis=1, keepdims=True
    )
    ok = (best <= maxc) & (m > 0)

    def tb_group(carry):
        # 8 traceback rows per iteration: one aligned dirs load per group,
        # static sublane slices per sub-row (descending).
        g0, kk, ndel, strip = carry
        base_row = pl.multiple_of(g0, 8)
        blk = dirs[pl.ds(base_row, 8), :]
        for r in range(7, -1, -1):
            i = g0 + r
            active = (i >= 1) & (i <= m) & ok
            rowp = blk[r: r + 1, :]
            row_d = (jnp.broadcast_to(rowp, (_SUB, _W2)) >> (4 * sub)) & 7
            opb = row_d & 3
            nd_mask = (opb != 2) & (k <= kk)
            kp = jnp.max(jnp.where(nd_mask, k, jnp.int32(-1)),
                         axis=1, keepdims=True)
            dval = jnp.max(jnp.where(k == kp, row_d, jnp.int32(-1)),
                           axis=1, keepdims=True)
            optype = dval & 3
            mbit = dval >> 2
            dels = kk - kp
            packed = dels + (optype << 16) + (mbit << 18)
            strip = jnp.where(
                (lane128 == ((i - 1) % 128)) & active, packed, strip
            )
            flush = ((i - 1) % 128 == 0) & (i >= 1)

            @pl.when(flush)
            def _(strip=strip, i=i):
                soff = pl.multiple_of(i - 1, 128)
                trace[:, pl.ds(soff, 128)] = strip

            strip = jnp.where(flush, jnp.int32(0), strip)
            kk = jnp.where(
                active,
                kp + jnp.where(optype == 1, jnp.int32(1), jnp.int32(0)),
                kk,
            )
            ndel = ndel + jnp.where(active, dels, jnp.int32(0))
        return g0 - 8, kk, ndel, strip

    _g, k_fin, ndel, _strip = jax.lax.while_loop(
        lambda c: c[0] >= 0, tb_group,
        ((i_max // 8) * 8, best_k, jnp.zeros((_SUB, 1), jnp.int32),
         jnp.zeros((_SUB, 128), jnp.int32)),
    )

    cost = jnp.where(ok, best, jnp.where(m > 0, jnp.int32(-1), jnp.int32(0)))
    ops_len = jnp.where(ok, m + ndel, 0)
    tstart = jnp.where(ok, d0 + (k_fin - _KOFF), 0)
    tend = jnp.where(ok, d0 + m + (best_k - _KOFF), 0)
    NEG = jnp.int32(-(1 << 30))
    for s in range(_SUB):
        pick = lambda c: jnp.max(jnp.where(sub == s, c, NEG))
        cost_ref[_SUB * pid + s] = pick(cost)
        len_ref[_SUB * pid + s] = pick(ops_len)
        ts_ref[_SUB * pid + s] = pick(tstart)
        te_ref[_SUB * pid + s] = pick(tend)
    trace_out[0, :, :] = trace[:, :]


@functools.partial(jax.jit, static_argnames=("m_pad", "interpret"))
def _align_padded(d0, q_len, t_len, max_cost, tpad, queries,
                  m_pad: int, interpret: bool = False):
    PB = tpad.shape[0]           # number of 8-pair blocks
    grid = (PB,)
    scalar = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # whole array
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            scalar(), scalar(), scalar(), scalar(),
            pl.BlockSpec((1, _SUB, m_pad + 2 * _W2), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB, m_pad + _W2), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            scalar(), scalar(), scalar(), scalar(),
            pl.BlockSpec((1, _SUB, m_pad), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((PB * _SUB,), jnp.int32),
            jax.ShapeDtypeStruct((PB * _SUB,), jnp.int32),
            jax.ShapeDtypeStruct((PB * _SUB,), jnp.int32),
            jax.ShapeDtypeStruct((PB * _SUB,), jnp.int32),
            jax.ShapeDtypeStruct((PB, _SUB, m_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m_pad + 8, _W2), jnp.int32),
            pltpu.VMEM((_SUB, m_pad), jnp.int32),
        ],
        interpret=interpret,
    )(d0, q_len, t_len, max_cost, tpad, queries)
    return out


def banded_align_batch_tpu(
    targets_flat: np.ndarray, t_off: np.ndarray, t_len: np.ndarray,
    queries_flat: np.ndarray, q_off: np.ndarray, q_len: np.ndarray,
    d0: np.ndarray, band: int = 128, max_cost_per_kb: int = 500,
    batch_pad: int = 128, interpret: bool = False,
) -> AlignResult:
    """Drop-in equivalent of ops.align.banded_align_batch on the TPU.

    ``band`` is fixed by the kernel at [-128, +127] around d0; the argument
    is accepted for interface parity and must be <= 128. Queries longer than
    M_PAD_MAX are not supported (route those to the C++ engine).
    """
    assert band <= _KOFF, "TPU kernel band is fixed at 128"
    P = len(q_len)
    if P == 0:
        z = np.zeros(0, np.int64)
        return AlignResult(np.zeros(0, np.int32), z, z,
                           np.zeros(0, np.uint8), z.copy(), z.copy())

    m_pad = 1 << max(9, int(np.max(q_len) - 1).bit_length())
    if m_pad > M_PAD_MAX:
        raise ValueError(f"query length {np.max(q_len)} exceeds TPU kernel "
                         f"limit {M_PAD_MAX}")
    # sort pairs by query length (descending) so each 8-pair block is
    # length-homogeneous: a block runs max(m of its 8) DP rows, so mixing
    # one long query with seven short ones wastes 7/8 of the block's work
    order = np.argsort(-q_len, kind="stable")
    q_len_s = np.asarray(q_len)[order].astype(np.int64)
    t_len_s = np.asarray(t_len)[order].astype(np.int64)
    q_off_s = np.asarray(q_off)[order].astype(np.int64)
    t_off_s = np.asarray(t_off)[order].astype(np.int64)
    d0_s = np.asarray(d0)[order].astype(np.int64)

    blocks = max(1, -(-P // _SUB))
    if batch_pad:
        blocks = 1 << max(2, int(blocks - 1).bit_length())
    p_pad = blocks * _SUB

    tw = m_pad + 2 * _W2
    qw = m_pad + _W2
    tpad = np.full((p_pad, tw), 0xFF, dtype=np.uint8)
    qbuf = np.zeros((p_pad, qw), dtype=np.int32)
    pidx = np.arange(P, dtype=np.int64)
    # queries: ragged scatter, one pass over all bases
    tgt = _expand(pidx * qw, q_len_s)
    src = _expand(q_off_s, q_len_s)
    qbuf.reshape(-1)[tgt] = queries_flat[src]
    # targets: tpad[x] = t[x + d0 - (_KOFF+1)], clipped to [0, n)
    lo = d0_s - (_KOFF + 1)
    st = np.maximum(0, -lo)
    en = np.minimum(tw, t_len_s - lo)
    ln = np.maximum(0, en - st)
    tgt = _expand(pidx * tw + st, ln)
    src = _expand(t_off_s + lo + st, ln)
    tpad.reshape(-1)[tgt] = targets_flat[src]

    d0a = np.zeros(p_pad, np.int32)
    qla = np.zeros(p_pad, np.int32)
    tla = np.zeros(p_pad, np.int32)
    mca = np.zeros(p_pad, np.int32)
    d0a[:P] = d0_s
    qla[:P] = q_len_s
    tla[:P] = t_len_s
    mca[:P] = q_len_s * max_cost_per_kb // 1000 + 8

    cost, ops_len, ts, te, trace = _align_padded(
        d0a, qla, tla, mca,
        tpad.reshape(blocks, _SUB, tw), qbuf.reshape(blocks, _SUB, qw),
        m_pad=m_pad, interpret=interpret,
    )
    cost = np.asarray(cost)[:P].astype(np.int32)
    ops_len = np.asarray(ops_len)[:P].astype(np.int64)
    ts = np.asarray(ts)[:P].astype(np.int64)
    te = np.asarray(te)[:P].astype(np.int64)
    trace = np.asarray(trace).reshape(p_pad, m_pad)[:P]

    bad = cost < 0
    ops_len[bad] = 0
    ts[bad] = 0
    te[bad] = 0

    # ops-byte expansion, vectorized across the whole batch: each per-row
    # record (dels | optype<<16 | match<<18) becomes dels 'd' bytes + one
    # '='/'s'/'i' byte, scattered into a contiguous ops buffer
    mm_ok = np.where(cost >= 0, q_len_s[:P], 0)  # trace rows: SORTED order
    rec_idx = _expand(np.arange(P, dtype=np.int64) * trace.shape[1], mm_ok)
    rec = trace.reshape(-1)[rec_idx].astype(np.int64)
    dels = rec & 0xFFFF
    optype = (rec >> 16) & 3
    mbit = (rec >> 18) & 1
    opchar = np.where(
        optype == 1, np.uint8(ord("i")),
        np.where(mbit == 1, np.uint8(ord("=")), np.uint8(ord("s"))),
    ).astype(np.uint8)
    ops_off_s = np.zeros(P, np.int64)
    np.cumsum(ops_len[:-1], out=ops_off_s[1:])
    total = int(ops_len.sum())
    assert int(mm_ok.sum() + dels.sum()) == total, "trace/ops_len mismatch"
    out_flat = np.full(total, ord("d"), dtype=np.uint8)
    # each record emits (1 op byte + dels 'd' bytes); the op byte's offset
    # within its pair = segmented-exclusive-cumsum(1 + dels)
    rec_pair = np.repeat(np.arange(P, dtype=np.int64), mm_ok)
    step = 1 + dels
    excl = np.cumsum(step) - step
    if len(rec):
        first_rec = np.zeros(P + 1, np.int64)
        np.cumsum(mm_ok, out=first_rec[1:])
        seg_base = np.repeat(excl[first_rec[:-1][mm_ok > 0]], mm_ok[mm_ok > 0])
        out_flat[ops_off_s[rec_pair] + excl - seg_base] = opchar

    # un-sort back to caller order
    inv = np.empty(P, np.int64)
    inv[order] = np.arange(P)
    return AlignResult(cost[inv], ts[inv], te[inv], out_flat,
                       ops_off_s[inv], ops_len[inv])


def _expand(offs: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Flat indices [offs[i], offs[i]+sizes[i]) concatenated."""
    sizes = np.asarray(sizes, np.int64)
    total = int(sizes.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    excl = np.zeros(len(sizes), np.int64)
    np.cumsum(sizes[:-1], out=excl[1:])
    within = np.arange(total, dtype=np.int64) - np.repeat(excl, sizes)
    return np.repeat(np.asarray(offs, np.int64), sizes) + within


# ---------------------------------------------------------------------------
# v2 kernel: int16 cost lanes, 128 band slots, 16 pairs per program, byte-
# packed trace output. One (16, 128) int16 op is a single full VREG (vs two
# for the v1 (8, 256) int32 shape), rows run in 16-row groups, and the trace
# comes back at 1 byte per query row (4 rows packed per int32 lane) — the
# d2h volume that dominates on weak links. Band semantics are exactly
# ns_banded_align with W = 63: slots k in [1, 127] <-> diagonal offsets
# j - i - d0 in [-63, +63].
# ---------------------------------------------------------------------------

_W16 = 128          # band slots (one VREG lane dim)
_KOFF16 = 64
_SUB16 = 16         # pairs per program (int16 sublane dim)
_INF16 = np.int16(0x3FFF)
M_PAD16_MAX = 8192  # dirs: 2 planes x (m_pad+16, 128) int32 ~ 8.4 MB VMEM
TRACE_ESC = 255     # escape byte: host re-runs the pair on the exact DP


def _kernel16(d0_ref, m_ref, n_ref, maxc_ref, tpad_ref, q_ref,
              cost_ref, len_ref, ts_ref, te_ref, trace_out,
              dirs, trace):
    """v2 dual-block kernel: TWO independent 16-pair blocks per program.

    A chip microbenchmark this round showed the row recurrence is
    latency-bound: 1, 2 or 4 interleaved row-chains all complete in the
    same ~1.7 us/iteration (the dependent roll/min chain leaves the VPU
    idle), so running two blocks' recurrences interleaved in one program
    raises device throughput at the same band semantics — measured
    16.5 -> 23.6 Mb/s (1.43x) on the 512 x 4.8 kb KERNELS.json batch
    (dirs stores and register pressure eat the rest of the ideal 2x).

    Cost lanes are int32: this Mosaic only rotates 32-bit vectors
    (re-tested under jax 0.9: "Rotate with non-32-bit data"), so the
    int16 half-VREG variant still waits on toolchain support.

    Direction storage: 3-bit codes, 10 DP rows per int32 word, in a
    (2, m_pad/10+2, 16, 128) VMEM scratch — elementwise accumulate with
    STATIC shifts (no cross-sublane packing), 20-row groups so word
    boundaries align with the unroll. The 3-bit/10-row packing (vs
    4-bit/8-row) is what fits TWO blocks' direction arrays in VMEM at
    m_pad 8192.
    """
    pid = pl.program_id(0)
    INF = jnp.int32(_INF16)
    k = jax.lax.broadcasted_iota(jnp.int32, (1, _W16), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB16, 1), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, _W16), 1)
    NB = 2                   # blocks per program
    GR = 20                  # rows per group (= 2 direction words; GR=40 spills past the 16 MB VMEM scoped limit)

    def col(ref, b):
        out = jnp.zeros((_SUB16, 1), jnp.int32)
        for s in range(_SUB16):
            out = jnp.where(sub == s, ref[(NB * pid + b) * _SUB16 + s], out)
        return out

    d0 = [col(d0_ref, b) for b in range(NB)]
    m = [col(m_ref, b) for b in range(NB)]
    n = [col(n_ref, b) for b in range(NB)]
    maxc = [col(maxc_ref, b) for b in range(NB)]
    i_max = jnp.maximum(jnp.max(m[0]), jnp.max(m[1]))

    # slots k in [1, 127] (offset |j-i-d0| <= 63); k == 0 stays invalid so
    # the kernel matches ns_banded_align(W=63) exactly
    kvalid = k >= 1
    prev0 = []
    for b in range(NB):
        j0 = d0[b] + (k - _KOFF16)
        prev0.append(jnp.where(kvalid & (j0 >= 0) & (j0 <= n[b]),
                               jnp.int32(0), INF))

    def row_group(carry):
        i0, prev_a, prev_b = carry
        prev = [prev_a, prev_b]
        ib = pl.multiple_of(((jnp.maximum(i0, 1) - 1) // 128) * 128, 128)
        rot0 = i0 - ib
        # dynamic rotates must be 32-bit on this Mosaic, so the uint8
        # loads widen before rolling
        trot = []
        qrot = []
        for b in range(NB):
            tch = tpad_ref[b, :, pl.ds(ib, 3 * _W16)].astype(jnp.int32)
            trot.append(pltpu.roll(tch, 3 * _W16 - rot0, axis=1))
            qch = q_ref[b, :, pl.ds(ib, 2 * _W16)].astype(jnp.int32)
            qrot.append(pltpu.roll(
                qch, 2 * _W16 - (rot0 - 1) % (2 * _W16), axis=1))
        wrds = [[jnp.zeros((_SUB16, _W16), jnp.int32)
                 for _ in range(GR // 10)] for _ in range(NB)]
        for r in range(GR):
            i = i0 + r
            for b in range(NB):
                tchar = trot[b][:, r: r + _W16]
                qc = qrot[b][:, r: r + 1]
                j = d0[b] + i + (k - _KOFF16)
                jvalid = kvalid & (j >= 0) & (j <= n[b])
                dvalid = (j >= 1) & (j <= n[b])
                match = tchar == qc
                diag = jnp.where(
                    dvalid & (prev[b] < INF),
                    prev[b] + jnp.where(match, jnp.int32(0), jnp.int32(1)),
                    INF,
                )
                up = pltpu.roll(prev[b], _W16 - 1, axis=1)
                up = jnp.where((k < _W16 - 1) & (up < INF),
                               up + jnp.int32(1), INF)
                base = jnp.where(jvalid, jnp.minimum(diag, up), INF)
                x = base - k
                for sh in (1, 2, 4, 8, 16, 32, 64):
                    shifted = jnp.where(k >= sh,
                                        pltpu.roll(x, sh, axis=1), INF)
                    x = jnp.minimum(x, shifted)
                cur = jnp.where(jvalid, jnp.minimum(base, x + k), INF)
                d = jnp.where(
                    cur == diag,
                    jnp.where(match, jnp.int32(4), jnp.int32(0)),
                    jnp.where(cur == up, jnp.int32(1), jnp.int32(2)),
                )
                d = jnp.where(cur >= INF, jnp.int32(3), d)
                live = (i >= 1) & (i <= m[b])
                prev[b] = jnp.where(live, cur, prev[b])
                # 3-bit nibble insert: elementwise, static shift
                wrds[b][r // 10] = wrds[b][r // 10] | (d << (3 * (r % 10)))
        wi = pl.multiple_of(i0 // 10, GR // 10)
        for b in range(NB):
            for w in range(GR // 10):
                dirs[b, wi + w, :, :] = wrds[b][w]
        return i0 + GR, prev[0], prev[1]

    _i, prev_a, prev_b = jax.lax.while_loop(
        lambda c: c[0] <= i_max, row_group,
        (jnp.int32(0), prev0[0], prev0[1]))
    prev = [prev_a, prev_b]

    best = []
    best_k = []
    ok = []
    for b in range(NB):
        jm = d0[b] + m[b] + (k - _KOFF16)
        final = jnp.where(kvalid & (jm >= 0) & (jm <= n[b]),
                          prev[b], jnp.int32(1 << 20))
        best.append(jnp.min(final, axis=1, keepdims=True))
        best_k.append(jnp.min(
            jnp.where(final == best[b], k, jnp.int32(_W16)),
            axis=1, keepdims=True))
        ok.append((best[b] <= maxc[b]) & (m[b] > 0))

    def tb_group(carry):
        g0, kk_a, kk_b, nd_a, nd_b, st_a, st_b = carry
        kk = [kk_a, kk_b]
        ndel = [nd_a, nd_b]
        strip = [st_a, st_b]
        wi = pl.multiple_of(g0 // 10, GR // 10)
        blks = [[dirs[b, wi + w, :, :] for w in range(GR // 10)]
                for b in range(NB)]
        for r in range(GR - 1, -1, -1):
            i = g0 + r
            for b in range(NB):
                active = (i >= 1) & (i <= m[b]) & ok[b]
                src = blks[b][r // 10]
                row_d = (src >> (3 * (r % 10))) & 7
                opb = row_d & 3
                nd_mask = (opb != 2) & (k <= kk[b])
                kp = jnp.max(jnp.where(nd_mask, k, jnp.int32(-1)),
                             axis=1, keepdims=True)
                dval = jnp.max(jnp.where(k == kp, row_d, jnp.int32(-1)),
                               axis=1, keepdims=True)
                optype = dval & 3
                mbit = dval >> 2
                dels = kk[b] - kp
                # byte: op2(2b) << 6 | dels(6b); op2: 0 '=', 1 's',
                # 2 'i'; 255 = escape -> host re-runs the pair
                op2 = jnp.where(
                    optype == 1, jnp.int32(2),
                    jnp.where(mbit == 1, jnp.int32(0), jnp.int32(1)))
                esc = (dels > 62) | (optype >= 3) | (dval < 0)
                rec = jnp.where(esc, jnp.int32(TRACE_ESC), (op2 << 6) | dels)
                pos = i - 1
                lane = (pos % 512) // 4
                sh8 = 8 * (pos % 4)
                strip[b] = jnp.where((lane128 == lane) & active,
                                     strip[b] + (rec << sh8), strip[b])
                flush = (pos % 512 == 0) & (i >= 1)

                @pl.when(flush)
                def _(strip=strip[b], pos=pos, b=b):
                    soff = pl.multiple_of(pos // 4, _W16)
                    trace[b, :, pl.ds(soff, _W16)] = strip

                strip[b] = jnp.where(flush, jnp.int32(0), strip[b])
                kk[b] = jnp.where(
                    active,
                    kp + jnp.where(optype == 1, jnp.int32(1), jnp.int32(0)),
                    kk[b])
                ndel[b] = ndel[b] + jnp.where(active & ~esc, dels,
                                              jnp.int32(0))
        return (g0 - GR, kk[0], kk[1], ndel[0], ndel[1],
                strip[0], strip[1])

    z1 = jnp.zeros((_SUB16, 1), jnp.int32)
    zs = jnp.zeros((_SUB16, _W16), jnp.int32)
    out_tb = jax.lax.while_loop(
        lambda c: c[0] >= 0, tb_group,
        ((i_max // GR) * GR, best_k[0], best_k[1], z1, z1, zs, zs))
    k_fin = [out_tb[1], out_tb[2]]
    ndel = [out_tb[3], out_tb[4]]

    NEG = jnp.int32(-(1 << 30))
    for b in range(NB):
        cost = jnp.where(ok[b], best[b],
                         jnp.where(m[b] > 0, jnp.int32(-1), jnp.int32(0)))
        ops_len = jnp.where(ok[b], m[b] + ndel[b], 0)
        tstart = jnp.where(ok[b], d0[b] + (k_fin[b] - _KOFF16), 0)
        tend = jnp.where(ok[b], d0[b] + m[b] + (best_k[b] - _KOFF16), 0)
        for s in range(_SUB16):
            pick = lambda c: jnp.max(jnp.where(sub == s, c, NEG))
            cost_ref[(NB * pid + b) * _SUB16 + s] = pick(cost)
            len_ref[(NB * pid + b) * _SUB16 + s] = pick(ops_len)
            ts_ref[(NB * pid + b) * _SUB16 + s] = pick(tstart)
            te_ref[(NB * pid + b) * _SUB16 + s] = pick(tend)
    trace_out[...] = trace[...]


@functools.partial(jax.jit, static_argnames=("m_pad", "interpret"))
def _align_padded16(d0, q_len, t_len, max_cost, tpad, queries,
                    m_pad: int, interpret: bool = False):
    PB = tpad.shape[0]
    assert PB % 2 == 0, "dual-block kernel needs an even block count"
    scalar = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    tw = m_pad + 3 * _W16
    qw = m_pad + 2 * _W16
    nwords = m_pad // 10 + 5
    out = pl.pallas_call(
        _kernel16,
        grid=(PB // 2,),
        in_specs=[
            scalar(), scalar(), scalar(), scalar(),
            pl.BlockSpec((2, _SUB16, tw), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _SUB16, qw), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            scalar(), scalar(), scalar(), scalar(),
            pl.BlockSpec((2, _SUB16, m_pad // 4), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB, _SUB16, m_pad // 4), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, nwords, _SUB16, _W16), jnp.int32),
            pltpu.VMEM((2, _SUB16, m_pad // 4), jnp.int32),
        ],
        interpret=interpret,
    )(d0, q_len, t_len, max_cost, tpad, queries)
    return out


# ---------------------------------------------------------------------------
# v3: row-tiled v2 for reference-length reads (hs2 averages 24,492 bases,
# /root/reference/logs/2022/hs2.log:9 — the v2 dirs scratch caps queries at
# 8192 rows). Checkpoint-and-recompute, all in VMEM (HBM scratch does not
# compile through this toolchain): the forward pass stores only the band
# state every _TR rows (one (16, 128) row per tile boundary); the backward
# pass re-runs each tile's forward to rebuild its direction bits in a
# VMEM-sized tile buffer, then traces back through it, carrying the
# traceback cursor across tiles. ~2x forward FLOPs for an O(m_pad / _TR)
# VMEM footprint; same band semantics (W = 63) and identical results to v2.
# ---------------------------------------------------------------------------

_TR = 2048                # backward tile rows (multiple of 512: the trace
                          # strip flush window never straddles tiles)
M_PAD16T_MAX = 131072     # VMEM at this cap: tpad+q ~4.2 MB, trace 2 MB,
                          # dirs tiles 2 MB, ckpt 0.5 MB — inside the
                          # 16 MB/core budget; covers ultra-long protocols
                          # (>100 kb reads). If a chip generation cannot
                          # compile it, the engine hook's callback fails
                          # once and the run falls back to the host DP
                          # (test_engine_tpu_backend_graceful_fallback).


def _kernel16t(d0_ref, m_ref, n_ref, maxc_ref, tpad_ref, q_ref,
               cost_ref, len_ref, ts_ref, te_ref, trace_out,
               dirs_lo, dirs_hi, trace, ckpt):
    pid = pl.program_id(0)
    INF = jnp.int32(_INF16)
    k = jax.lax.broadcasted_iota(jnp.int32, (1, _W16), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB16, 1), 0)
    sub128 = jax.lax.broadcasted_iota(jnp.int32, (_SUB16, _W16), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, _W16), 1)

    def col(ref):
        out = jnp.zeros((_SUB16, 1), jnp.int32)
        for s in range(_SUB16):
            out = jnp.where(sub == s, ref[_SUB16 * pid + s], out)
        return out

    d0 = col(d0_ref)
    m = col(m_ref)
    n = col(n_ref)
    maxc = col(maxc_ref)
    i_max = jnp.max(m)

    kvalid = k >= 1
    j0 = d0 + (k - _KOFF16)
    prev0 = jnp.where(kvalid & (j0 >= 0) & (j0 <= n),
                      jnp.int32(0), INF)
    zero_lo = jnp.full((_SUB16, _W16), 0x33333333, jnp.int32)

    def load_chars(i0):
        ib = pl.multiple_of(((jnp.maximum(i0, 1) - 1) // 128) * 128, 128)
        rot0 = i0 - ib
        tch = tpad_ref[0, :, pl.ds(ib, 3 * _W16)].astype(jnp.int32)
        trot = pltpu.roll(tch, 3 * _W16 - rot0, axis=1)
        qch = q_ref[0, :, pl.ds(ib, 2 * _W16)].astype(jnp.int32)
        qrot = pltpu.roll(qch, 2 * _W16 - (rot0 - 1) % (2 * _W16), axis=1)
        return trot, qrot

    def row_step(i, prev, trot, qrot, r):
        tchar = trot[:, r: r + _W16]
        qc = qrot[:, r: r + 1]
        j = d0 + i + (k - _KOFF16)
        jvalid = kvalid & (j >= 0) & (j <= n)
        dvalid = (j >= 1) & (j <= n)
        match = tchar == qc
        diag = jnp.where(
            dvalid & (prev < INF),
            prev + jnp.where(match, jnp.int32(0), jnp.int32(1)),
            INF,
        )
        up = pltpu.roll(prev, _W16 - 1, axis=1)
        up = jnp.where((k < _W16 - 1) & (up < INF),
                       up + jnp.int32(1), INF)
        base = jnp.where(jvalid, jnp.minimum(diag, up), INF)
        x = base - k
        for sh in (1, 2, 4, 8, 16, 32, 64):
            shifted = jnp.where(k >= sh, pltpu.roll(x, sh, axis=1), INF)
            x = jnp.minimum(x, shifted)
        cur = jnp.where(jvalid, jnp.minimum(base, x + k), INF)
        d = jnp.where(
            cur == diag, jnp.where(match, jnp.int32(4), jnp.int32(0)),
            jnp.where(cur == up, jnp.int32(1), jnp.int32(2)),
        )
        d = jnp.where(cur >= INF, jnp.int32(3), d)
        live = (i >= 1) & (i <= m)
        prev = jnp.where(live, cur, prev)
        return prev, d

    # ---- forward pass 1: band state only, checkpoints every _TR rows ----
    def fwd_group(carry):
        i0, prev = carry

        @pl.when(i0 % _TR == 0)
        def _(prev=prev):
            ckpt[pl.ds(i0 // _TR, 1), :, :] = prev[None, :, :]

        trot, qrot = load_chars(i0)
        for r in range(_SUB16):
            prev, _d = row_step(i0 + r, prev, trot, qrot, r)
        return i0 + _SUB16, prev

    _i, prev = jax.lax.while_loop(
        lambda c: c[0] <= i_max, fwd_group, (jnp.int32(0), prev0))

    jm = d0 + m + (k - _KOFF16)
    final = jnp.where(kvalid & (jm >= 0) & (jm <= n),
                      prev, jnp.int32(1 << 20))
    best = jnp.min(final, axis=1, keepdims=True)
    best_k = jnp.min(jnp.where(final == best, k, jnp.int32(_W16)),
                     axis=1, keepdims=True)
    ok = (best <= maxc) & (m > 0)

    # ---- backward: per tile, re-forward into the dirs tile, then trace --
    def tb_row(i, carry, blk_lo_row, blk_hi_row):
        kk, ndel, strip = carry
        active = (i >= 1) & (i <= m) & ok
        row_lo = jnp.broadcast_to(blk_lo_row, (_SUB16, _W16))
        row_hi = jnp.broadcast_to(blk_hi_row, (_SUB16, _W16))
        row_d = jnp.where(
            sub < 8,
            (row_lo >> (4 * sub)) & 7,
            (row_hi >> (4 * (sub - 8))) & 7,
        )
        opb = row_d & 3
        nd_mask = (opb != 2) & (k <= kk)
        kp = jnp.max(jnp.where(nd_mask, k, jnp.int32(-1)),
                     axis=1, keepdims=True)
        dval = jnp.max(jnp.where(k == kp, row_d, jnp.int32(-1)),
                       axis=1, keepdims=True)
        optype = dval & 3
        mbit = dval >> 2
        dels = kk - kp
        op2 = jnp.where(optype == 1, jnp.int32(2),
                        jnp.where(mbit == 1, jnp.int32(0), jnp.int32(1)))
        esc = (dels > 62) | (optype >= 3) | (dval < 0)
        rec = jnp.where(esc, jnp.int32(TRACE_ESC), (op2 << 6) | dels)
        pos = i - 1
        lane = (pos % 512) // 4
        sh8 = 8 * (pos % 4)
        strip = jnp.where((lane128 == lane) & active,
                          strip + (rec << sh8), strip)
        flush = (pos % 512 == 0) & (i >= 1)

        @pl.when(flush)
        def _(strip=strip, pos=pos):
            soff = pl.multiple_of(pos // 4, _W16)
            trace[:, pl.ds(soff, _W16)] = strip

        strip = jnp.where(flush, jnp.int32(0), strip)
        kk = jnp.where(
            active,
            kp + jnp.where(optype == 1, jnp.int32(1), jnp.int32(0)),
            kk)
        ndel = ndel + jnp.where(active & ~esc, dels, jnp.int32(0))
        return kk, ndel, strip

    def tile_step(carry):
        t, kk, ndel, strip = carry
        tlo = t * _TR

        # (a) re-forward this tile from its checkpoint, storing dirs
        def refwd_group(c):
            i0, prev, _dl, _dh = c
            trot, qrot = load_chars(i0)
            dbuf_lo = zero_lo
            dbuf_hi = zero_lo
            for r in range(_SUB16):
                i = i0 + r
                prev, d = row_step(i, prev, trot, qrot, r)
                packed_lo = jnp.sum(
                    jnp.where(sub < 8, d << (4 * sub), 0),
                    axis=0, keepdims=True)
                packed_hi = jnp.sum(
                    jnp.where(sub >= 8, d << (4 * (sub - 8)), 0),
                    axis=0, keepdims=True)
                rowlive = (i >= 1) & (i <= i_max)
                dbuf_lo = jnp.where(
                    (sub128 == r) & rowlive,
                    jnp.broadcast_to(packed_lo, (_SUB16, _W16)), dbuf_lo)
                dbuf_hi = jnp.where(
                    (sub128 == r) & rowlive,
                    jnp.broadcast_to(packed_hi, (_SUB16, _W16)), dbuf_hi)
            loc = pl.multiple_of(i0 - tlo, _SUB16)
            dirs_lo[pl.ds(loc, _SUB16), :] = dbuf_lo
            dirs_hi[pl.ds(loc, _SUB16), :] = dbuf_hi
            return i0 + _SUB16, prev, dbuf_lo, dbuf_hi

        pv = ckpt[pl.ds(t, 1), :, :][0]
        bound = jnp.minimum(tlo + _TR - _SUB16,
                            (i_max // _SUB16) * _SUB16)
        jax.lax.while_loop(lambda c: c[0] <= bound, refwd_group,
                           (tlo, pv, zero_lo, zero_lo))

        # (b) trace back through the tile, high row group to low
        def tb_group(c):
            g0, kk, ndel, strip = c
            loc = pl.multiple_of(g0 - tlo, _SUB16)
            blk_lo = dirs_lo[pl.ds(loc, _SUB16), :]
            blk_hi = dirs_hi[pl.ds(loc, _SUB16), :]
            for r in range(_SUB16 - 1, -1, -1):
                kk, ndel, strip = tb_row(
                    g0 + r, (kk, ndel, strip),
                    blk_lo[r: r + 1, :], blk_hi[r: r + 1, :])
            return g0 - _SUB16, kk, ndel, strip

        _g, kk, ndel, strip = jax.lax.while_loop(
            lambda c: c[0] >= tlo, tb_group, (bound, kk, ndel, strip))
        return t - 1, kk, ndel, strip

    _t, k_fin, ndel, _s = jax.lax.while_loop(
        lambda c: c[0] >= 0, tile_step,
        (i_max // _TR, best_k,
         jnp.zeros((_SUB16, 1), jnp.int32),
         jnp.zeros((_SUB16, _W16), jnp.int32)))

    cost = jnp.where(ok, best, jnp.where(m > 0, jnp.int32(-1), jnp.int32(0)))
    ops_len = jnp.where(ok, m + ndel, 0)
    tstart = jnp.where(ok, d0 + (k_fin - _KOFF16), 0)
    tend = jnp.where(ok, d0 + m + (best_k - _KOFF16), 0)
    NEG = jnp.int32(-(1 << 30))
    for s in range(_SUB16):
        pick = lambda c: jnp.max(jnp.where(sub == s, c, NEG))
        cost_ref[_SUB16 * pid + s] = pick(cost)
        len_ref[_SUB16 * pid + s] = pick(ops_len)
        ts_ref[_SUB16 * pid + s] = pick(tstart)
        te_ref[_SUB16 * pid + s] = pick(tend)
    trace_out[0, :, :] = trace[:, :]


@functools.partial(jax.jit, static_argnames=("m_pad", "interpret"))
def _align_padded16t(d0, q_len, t_len, max_cost, tpad, queries,
                     m_pad: int, interpret: bool = False):
    PB = tpad.shape[0]
    scalar = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    tw = m_pad + 3 * _W16
    qw = m_pad + 2 * _W16
    out = pl.pallas_call(
        _kernel16t,
        grid=(PB,),
        in_specs=[
            scalar(), scalar(), scalar(), scalar(),
            pl.BlockSpec((1, _SUB16, tw), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUB16, qw), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            scalar(), scalar(), scalar(), scalar(),
            pl.BlockSpec((1, _SUB16, m_pad // 4), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB, _SUB16, m_pad // 4), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_TR, _W16), jnp.int32),
            pltpu.VMEM((_TR, _W16), jnp.int32),
            pltpu.VMEM((_SUB16, m_pad // 4), jnp.int32),
            # +1: a query of exactly m_pad rows checkpoints at tile T
            pltpu.VMEM((m_pad // _TR + 1, _SUB16, _W16), jnp.int32),
        ],
        interpret=interpret,
    )(d0, q_len, t_len, max_cost, tpad, queries)
    return out


def _kernel16q(d0_ref, m_ref, n_ref, maxc_ref, tpad_ref, q_ref,
               cost_ref, len_ref, ts_ref, te_ref, trace_out, dirs_ref,
               stage, tb_stage, sem_w, sem_r):
    """v4 quad-block kernel: FOUR independent 16-pair blocks per program,
    direction words streamed to an HBM-resident output via manual DMA.

    The dual-block kernel (_kernel16) is VMEM-bound: two blocks'
    direction arrays fill the 16 MB scoped limit at m_pad 8192, yet the
    chip microbenchmark shows FOUR interleaved row-chains cost the same
    wall as one (~440 ns/row-chain at 4 vs ~1700 at 1 — the recurrence
    is latency-bound). Moving dirs to HBM (16 KB DMA per 20-row group
    per block, ~us-scale against ~14 us of group compute) frees VMEM to
    ~2 MB and doubles the blocks in flight. Same band semantics, 3-bit/
    10-row words, pad rescue at traceback unchanged.
    """
    pid = pl.program_id(0)
    INF = jnp.int32(_INF16)
    k = jax.lax.broadcasted_iota(jnp.int32, (1, _W16), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB16, 1), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, _W16), 1)
    NB = 4
    GR = 20

    def col(ref, b):
        out = jnp.zeros((_SUB16, 1), jnp.int32)
        for s in range(_SUB16):
            out = jnp.where(sub == s, ref[(NB * pid + b) * _SUB16 + s], out)
        return out

    d0 = [col(d0_ref, b) for b in range(NB)]
    m = [col(m_ref, b) for b in range(NB)]
    n = [col(n_ref, b) for b in range(NB)]
    maxc = [col(maxc_ref, b) for b in range(NB)]
    i_max = jnp.max(jnp.stack([jnp.max(m[b]) for b in range(NB)]))

    kvalid = k >= 1
    prev0 = []
    for b in range(NB):
        j0 = d0[b] + (k - _KOFF16)
        prev0.append(jnp.where(kvalid & (j0 >= 0) & (j0 <= n[b]),
                               jnp.int32(0), INF))

    def row_body(i, prev, trot, qrot, r, b):
        tchar = trot[:, r: r + _W16]
        qc = qrot[:, r: r + 1]
        j = d0[b] + i + (k - _KOFF16)
        jvalid = kvalid & (j >= 0) & (j <= n[b])
        dvalid = (j >= 1) & (j <= n[b])
        match = tchar == qc
        diag = jnp.where(
            dvalid & (prev < INF),
            prev + jnp.where(match, jnp.int32(0), jnp.int32(1)),
            INF,
        )
        up = pltpu.roll(prev, _W16 - 1, axis=1)
        up = jnp.where((k < _W16 - 1) & (up < INF),
                       up + jnp.int32(1), INF)
        base = jnp.where(jvalid, jnp.minimum(diag, up), INF)
        x = base - k
        for sh in (1, 2, 4, 8, 16, 32, 64):
            shifted = jnp.where(k >= sh, pltpu.roll(x, sh, axis=1), INF)
            x = jnp.minimum(x, shifted)
        cur = jnp.where(jvalid, jnp.minimum(base, x + k), INF)
        d = jnp.where(
            cur == diag, jnp.where(match, jnp.int32(4), jnp.int32(0)),
            jnp.where(cur == up, jnp.int32(1), jnp.int32(2)),
        )
        d = jnp.where(cur >= INF, jnp.int32(3), d)
        live = (i >= 1) & (i <= m[b])
        prev = jnp.where(live, cur, prev)
        return prev, d

    def row_group(carry):
        i0 = carry[0]
        prev = list(carry[1:])
        # previous group's staging DMAs must land before reuse (the wait
        # descriptor's SHAPE must match the started copy's — the slice
        # offset is irrelevant to the byte count)
        @pl.when(i0 > 0)
        def _():
            for b in range(NB):
                pltpu.make_async_copy(
                    stage.at[b],
                    dirs_ref.at[NB * pid + b, pl.ds(0, 2)],
                    sem_w.at[b]).wait()
        ib = pl.multiple_of(((jnp.maximum(i0, 1) - 1) // 128) * 128, 128)
        rot0 = i0 - ib
        trot = []
        qrot = []
        for b in range(NB):
            tch = tpad_ref[b, :, pl.ds(ib, 3 * _W16)].astype(jnp.int32)
            trot.append(pltpu.roll(tch, 3 * _W16 - rot0, axis=1))
            qch = q_ref[b, :, pl.ds(ib, 2 * _W16)].astype(jnp.int32)
            qrot.append(pltpu.roll(
                qch, 2 * _W16 - (rot0 - 1) % (2 * _W16), axis=1))
        w0 = [jnp.zeros((_SUB16, _W16), jnp.int32) for _ in range(NB)]
        w1 = [jnp.zeros((_SUB16, _W16), jnp.int32) for _ in range(NB)]
        for r in range(GR):
            i = i0 + r
            for b in range(NB):
                prev[b], d = row_body(i, prev[b], trot[b], qrot[b], r, b)
                if r < 10:
                    w0[b] = w0[b] | (d << (3 * r))
                else:
                    w1[b] = w1[b] | (d << (3 * (r - 10)))
        wi = pl.multiple_of(i0 // 10, 2)
        for b in range(NB):
            stage[b, 0, :, :] = w0[b]
            stage[b, 1, :, :] = w1[b]
            pltpu.make_async_copy(
                stage.at[b],
                dirs_ref.at[NB * pid + b, pl.ds(wi, 2)],
                sem_w.at[b]).start()
        return (i0 + GR,) + tuple(prev)

    fin = jax.lax.while_loop(
        lambda c: c[0] <= i_max, row_group,
        (jnp.int32(0),) + tuple(prev0))
    prev = list(fin[1:])
    # drain the final group's DMAs (same-shape descriptor for the wait)
    for b in range(NB):
        pltpu.make_async_copy(
            stage.at[b],
            dirs_ref.at[NB * pid + b, pl.ds(0, 2)],
            sem_w.at[b]).wait()

    best = []
    best_k = []
    ok = []
    for b in range(NB):
        jm = d0[b] + m[b] + (k - _KOFF16)
        final = jnp.where(kvalid & (jm >= 0) & (jm <= n[b]),
                          prev[b], jnp.int32(1 << 20))
        best.append(jnp.min(final, axis=1, keepdims=True))
        best_k.append(jnp.min(
            jnp.where(final == best[b], k, jnp.int32(_W16)),
            axis=1, keepdims=True))
        ok.append((best[b] <= maxc[b]) & (m[b] > 0))

    def tb_group(carry):
        # ping-pong prefetch: this group's words were started by the
        # previous iteration (or the pre-loop priming); wait them, then
        # immediately start the NEXT group's loads into the other buffer
        # so the DMA latency hides under this group's 20 rows of compute
        g0 = carry[0]
        kk = list(carry[1:1 + NB])
        ndel = list(carry[1 + NB:1 + 2 * NB])
        strip = list(carry[1 + 2 * NB:1 + 3 * NB])
        par = (g0 // GR) % 2
        for b in range(NB):
            pltpu.make_async_copy(
                dirs_ref.at[NB * pid + b, pl.ds(0, 2)],
                tb_stage.at[par, b],
                sem_r.at[par, b]).wait()

        @pl.when(g0 - GR >= 0)
        def _():
            nwi = pl.multiple_of((g0 - GR) // 10, 2)
            for b in range(NB):
                pltpu.make_async_copy(
                    dirs_ref.at[NB * pid + b, pl.ds(nwi, 2)],
                    tb_stage.at[1 - par, b],
                    sem_r.at[1 - par, b]).start()

        blk0 = [tb_stage[par, b, 0] for b in range(NB)]
        blk1 = [tb_stage[par, b, 1] for b in range(NB)]
        for r in range(GR - 1, -1, -1):
            i = g0 + r
            for b in range(NB):
                active = (i >= 1) & (i <= m[b]) & ok[b]
                src = blk1[b] if r >= 10 else blk0[b]
                row_d = (src >> (3 * (r % 10))) & 7
                opb = row_d & 3
                nd_mask = (opb != 2) & (k <= kk[b])
                kp = jnp.max(jnp.where(nd_mask, k, jnp.int32(-1)),
                             axis=1, keepdims=True)
                dval = jnp.max(jnp.where(k == kp, row_d, jnp.int32(-1)),
                               axis=1, keepdims=True)
                optype = dval & 3
                mbit = dval >> 2
                dels = kk[b] - kp
                op2 = jnp.where(
                    optype == 1, jnp.int32(2),
                    jnp.where(mbit == 1, jnp.int32(0), jnp.int32(1)))
                esc = (dels > 62) | (optype >= 3) | (dval < 0)
                rec = jnp.where(esc, jnp.int32(TRACE_ESC),
                                (op2 << 6) | dels)
                pos = i - 1
                lane = (pos % 512) // 4
                sh8 = 8 * (pos % 4)
                strip[b] = jnp.where((lane128 == lane) & active,
                                     strip[b] + (rec << sh8), strip[b])
                flush = (pos % 512 == 0) & (i >= 1)

                @pl.when(flush)
                def _(strip=strip[b], pos=pos, b=b):
                    soff = pl.multiple_of(pos // 4, _W16)
                    trace_out[b, :, pl.ds(soff, _W16)] = strip

                strip[b] = jnp.where(flush, jnp.int32(0), strip[b])
                kk[b] = jnp.where(
                    active,
                    kp + jnp.where(optype == 1, jnp.int32(1),
                                   jnp.int32(0)),
                    kk[b])
                ndel[b] = ndel[b] + jnp.where(active & ~esc, dels,
                                              jnp.int32(0))
        return (g0 - GR,) + tuple(kk) + tuple(ndel) + tuple(strip)

    z1 = jnp.zeros((_SUB16, 1), jnp.int32)
    zs = jnp.zeros((_SUB16, _W16), jnp.int32)
    g_top = (i_max // GR) * GR
    # prime the first traceback group's loads
    par0 = (g_top // GR) % 2
    for b in range(NB):
        pltpu.make_async_copy(
            dirs_ref.at[NB * pid + b,
                        pl.ds(pl.multiple_of(g_top // 10, 2), 2)],
            tb_stage.at[par0, b],
            sem_r.at[par0, b]).start()
    out_tb = jax.lax.while_loop(
        lambda c: c[0] >= 0, tb_group,
        (g_top,) + tuple(best_k)
        + tuple(z1 for _ in range(NB)) + tuple(zs for _ in range(NB)))
    k_fin = list(out_tb[1:1 + NB])
    ndel = list(out_tb[1 + NB:1 + 2 * NB])

    NEG = jnp.int32(-(1 << 30))
    for b in range(NB):
        cost = jnp.where(ok[b], best[b],
                         jnp.where(m[b] > 0, jnp.int32(-1), jnp.int32(0)))
        ops_len = jnp.where(ok[b], m[b] + ndel[b], 0)
        tstart = jnp.where(ok[b], d0[b] + (k_fin[b] - _KOFF16), 0)
        tend = jnp.where(ok[b], d0[b] + m[b] + (best_k[b] - _KOFF16), 0)
        for s in range(_SUB16):
            pick = lambda c: jnp.max(jnp.where(sub == s, c, NEG))
            cost_ref[(NB * pid + b) * _SUB16 + s] = pick(cost)
            len_ref[(NB * pid + b) * _SUB16 + s] = pick(ops_len)
            ts_ref[(NB * pid + b) * _SUB16 + s] = pick(tstart)
            te_ref[(NB * pid + b) * _SUB16 + s] = pick(tend)


@functools.partial(jax.jit, static_argnames=("m_pad", "interpret"))
def _align_padded16q(d0, q_len, t_len, max_cost, tpad, queries,
                     m_pad: int, interpret: bool = False):
    PB = tpad.shape[0]
    assert PB % 4 == 0, "quad-block kernel needs a 4-multiple block count"
    scalar = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    tw = m_pad + 3 * _W16
    qw = m_pad + 2 * _W16
    nwords = m_pad // 10 + 5
    out = pl.pallas_call(
        _kernel16q,
        grid=(PB // 4,),
        in_specs=[
            scalar(), scalar(), scalar(), scalar(),
            pl.BlockSpec((4, _SUB16, tw), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _SUB16, qw), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            scalar(), scalar(), scalar(), scalar(),
            pl.BlockSpec((4, _SUB16, m_pad // 4), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB, _SUB16, m_pad // 4), jnp.int32),
            jax.ShapeDtypeStruct((PB, nwords, _SUB16, _W16), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, 2, _SUB16, _W16), jnp.int32),      # fwd staging
            pltpu.VMEM((2, 4, 2, _SUB16, _W16), jnp.int32),   # tb ping-pong
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        interpret=interpret,
    )(d0, q_len, t_len, max_cost, tpad, queries)
    return out[:5]


M_PAD16T2_MAX = 65536     # dual-block tiled kernel VMEM cap: tpad+q+trace
                          # + ckpt + two dirs tiles ~ 11 MB at 65536; the
                          # 131072 cap stays on the single-block kernel


def _kernel16t2(d0_ref, m_ref, n_ref, maxc_ref, tpad_ref, q_ref,
                cost_ref, len_ref, ts_ref, te_ref, trace_out,
                dirs_lo, dirs_hi, trace, ckpt):
    """Dual-block v3: the checkpoint-recompute row-tiled kernel with TWO
    independent 16-pair blocks per program, their recurrences interleaved
    (same latency-bound-chain rationale and measured ~1.4x as the dual
    v2 kernel; see _kernel16). Structure and 4-bit/8-row direction
    packing match _kernel16t; only the state is dualized."""
    pid = pl.program_id(0)
    INF = jnp.int32(_INF16)
    k = jax.lax.broadcasted_iota(jnp.int32, (1, _W16), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_SUB16, 1), 0)
    sub128 = jax.lax.broadcasted_iota(jnp.int32, (_SUB16, _W16), 0)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, _W16), 1)
    NB = 2

    def col(ref, b):
        out = jnp.zeros((_SUB16, 1), jnp.int32)
        for s in range(_SUB16):
            out = jnp.where(sub == s, ref[(NB * pid + b) * _SUB16 + s], out)
        return out

    d0 = [col(d0_ref, b) for b in range(NB)]
    m = [col(m_ref, b) for b in range(NB)]
    n = [col(n_ref, b) for b in range(NB)]
    maxc = [col(maxc_ref, b) for b in range(NB)]
    i_max = jnp.maximum(jnp.max(m[0]), jnp.max(m[1]))

    kvalid = k >= 1
    prev0 = []
    for b in range(NB):
        j0 = d0[b] + (k - _KOFF16)
        prev0.append(jnp.where(kvalid & (j0 >= 0) & (j0 <= n[b]),
                               jnp.int32(0), INF))
    zero_lo = jnp.full((_SUB16, _W16), 0x33333333, jnp.int32)

    def load_chars(i0, b):
        ib = pl.multiple_of(((jnp.maximum(i0, 1) - 1) // 128) * 128, 128)
        rot0 = i0 - ib
        tch = tpad_ref[b, :, pl.ds(ib, 3 * _W16)].astype(jnp.int32)
        trot = pltpu.roll(tch, 3 * _W16 - rot0, axis=1)
        qch = q_ref[b, :, pl.ds(ib, 2 * _W16)].astype(jnp.int32)
        qrot = pltpu.roll(qch, 2 * _W16 - (rot0 - 1) % (2 * _W16), axis=1)
        return trot, qrot

    def row_step(i, prev, trot, qrot, r, b):
        tchar = trot[:, r: r + _W16]
        qc = qrot[:, r: r + 1]
        j = d0[b] + i + (k - _KOFF16)
        jvalid = kvalid & (j >= 0) & (j <= n[b])
        dvalid = (j >= 1) & (j <= n[b])
        match = tchar == qc
        diag = jnp.where(
            dvalid & (prev < INF),
            prev + jnp.where(match, jnp.int32(0), jnp.int32(1)),
            INF,
        )
        up = pltpu.roll(prev, _W16 - 1, axis=1)
        up = jnp.where((k < _W16 - 1) & (up < INF),
                       up + jnp.int32(1), INF)
        base = jnp.where(jvalid, jnp.minimum(diag, up), INF)
        x = base - k
        for sh in (1, 2, 4, 8, 16, 32, 64):
            shifted = jnp.where(k >= sh, pltpu.roll(x, sh, axis=1), INF)
            x = jnp.minimum(x, shifted)
        cur = jnp.where(jvalid, jnp.minimum(base, x + k), INF)
        d = jnp.where(
            cur == diag, jnp.where(match, jnp.int32(4), jnp.int32(0)),
            jnp.where(cur == up, jnp.int32(1), jnp.int32(2)),
        )
        d = jnp.where(cur >= INF, jnp.int32(3), d)
        live = (i >= 1) & (i <= m[b])
        prev = jnp.where(live, cur, prev)
        return prev, d

    # ---- forward pass 1: band state only, checkpoints every _TR rows ----
    def fwd_group(carry):
        i0, prev_a, prev_b = carry
        prev = [prev_a, prev_b]

        @pl.when(i0 % _TR == 0)
        def _(prev=prev):
            for b in range(NB):
                ckpt[b, pl.ds(i0 // _TR, 1), :, :] = prev[b][None, :, :]

        for b in range(NB):
            trot, qrot = load_chars(i0, b)
            for r in range(_SUB16):
                prev[b], _d = row_step(i0 + r, prev[b], trot, qrot, r, b)
        return i0 + _SUB16, prev[0], prev[1]

    _i, prev_a, prev_b = jax.lax.while_loop(
        lambda c: c[0] <= i_max, fwd_group,
        (jnp.int32(0), prev0[0], prev0[1]))
    prev = [prev_a, prev_b]

    best = []
    best_k = []
    ok = []
    for b in range(NB):
        jm = d0[b] + m[b] + (k - _KOFF16)
        final = jnp.where(kvalid & (jm >= 0) & (jm <= n[b]),
                          prev[b], jnp.int32(1 << 20))
        best.append(jnp.min(final, axis=1, keepdims=True))
        best_k.append(jnp.min(
            jnp.where(final == best[b], k, jnp.int32(_W16)),
            axis=1, keepdims=True))
        ok.append((best[b] <= maxc[b]) & (m[b] > 0))

    # ---- backward: per tile, re-forward into the dirs tile, then trace --
    def tb_row(i, carry, blk_lo_row, blk_hi_row, b):
        kk, ndel, strip = carry
        active = (i >= 1) & (i <= m[b]) & ok[b]
        row_lo = jnp.broadcast_to(blk_lo_row, (_SUB16, _W16))
        row_hi = jnp.broadcast_to(blk_hi_row, (_SUB16, _W16))
        row_d = jnp.where(
            sub < 8,
            (row_lo >> (4 * sub)) & 7,
            (row_hi >> (4 * (sub - 8))) & 7,
        )
        opb = row_d & 3
        nd_mask = (opb != 2) & (k <= kk)
        kp = jnp.max(jnp.where(nd_mask, k, jnp.int32(-1)),
                     axis=1, keepdims=True)
        dval = jnp.max(jnp.where(k == kp, row_d, jnp.int32(-1)),
                       axis=1, keepdims=True)
        optype = dval & 3
        mbit = dval >> 2
        dels = kk - kp
        op2 = jnp.where(optype == 1, jnp.int32(2),
                        jnp.where(mbit == 1, jnp.int32(0), jnp.int32(1)))
        esc = (dels > 62) | (optype >= 3) | (dval < 0)
        rec = jnp.where(esc, jnp.int32(TRACE_ESC), (op2 << 6) | dels)
        pos = i - 1
        lane = (pos % 512) // 4
        sh8 = 8 * (pos % 4)
        strip = jnp.where((lane128 == lane) & active,
                          strip + (rec << sh8), strip)
        flush = (pos % 512 == 0) & (i >= 1)

        @pl.when(flush)
        def _(strip=strip, pos=pos, b=b):
            soff = pl.multiple_of(pos // 4, _W16)
            trace[b, :, pl.ds(soff, _W16)] = strip

        strip = jnp.where(flush, jnp.int32(0), strip)
        kk = jnp.where(
            active,
            kp + jnp.where(optype == 1, jnp.int32(1), jnp.int32(0)),
            kk)
        ndel = ndel + jnp.where(active & ~esc, dels, jnp.int32(0))
        return kk, ndel, strip

    def tile_step(carry):
        t, kk_a, kk_b, nd_a, nd_b, st_a, st_b = carry
        kk = [kk_a, kk_b]
        ndel = [nd_a, nd_b]
        strip = [st_a, st_b]
        tlo = t * _TR

        # (a) re-forward this tile from its checkpoint, storing dirs
        def refwd_group(c):
            i0, prev_a, prev_b = c
            prev = [prev_a, prev_b]
            for b in range(NB):
                trot, qrot = load_chars(i0, b)
                dbuf_lo = zero_lo
                dbuf_hi = zero_lo
                for r in range(_SUB16):
                    i = i0 + r
                    prev[b], d = row_step(i, prev[b], trot, qrot, r, b)
                    packed_lo = jnp.sum(
                        jnp.where(sub < 8, d << (4 * sub), 0),
                        axis=0, keepdims=True)
                    packed_hi = jnp.sum(
                        jnp.where(sub >= 8, d << (4 * (sub - 8)), 0),
                        axis=0, keepdims=True)
                    rowlive = (i >= 1) & (i <= i_max)
                    dbuf_lo = jnp.where(
                        (sub128 == r) & rowlive,
                        jnp.broadcast_to(packed_lo, (_SUB16, _W16)),
                        dbuf_lo)
                    dbuf_hi = jnp.where(
                        (sub128 == r) & rowlive,
                        jnp.broadcast_to(packed_hi, (_SUB16, _W16)),
                        dbuf_hi)
                loc = pl.multiple_of(i0 - tlo, _SUB16)
                dirs_lo[b, pl.ds(loc, _SUB16), :] = dbuf_lo
                dirs_hi[b, pl.ds(loc, _SUB16), :] = dbuf_hi
            return i0 + _SUB16, prev[0], prev[1]

        pva = ckpt[0, pl.ds(t, 1), :, :][0]
        pvb = ckpt[1, pl.ds(t, 1), :, :][0]
        bound = jnp.minimum(tlo + _TR - _SUB16,
                            (i_max // _SUB16) * _SUB16)
        jax.lax.while_loop(lambda c: c[0] <= bound, refwd_group,
                           (tlo, pva, pvb))

        # (b) trace back through the tile, high row group to low
        def tb_group(c):
            g0, kk_a, kk_b, nd_a, nd_b, st_a, st_b = c
            kk = [kk_a, kk_b]
            ndel = [nd_a, nd_b]
            strip = [st_a, st_b]
            loc = pl.multiple_of(g0 - tlo, _SUB16)
            for b in range(NB):
                blk_lo = dirs_lo[b, pl.ds(loc, _SUB16), :]
                blk_hi = dirs_hi[b, pl.ds(loc, _SUB16), :]
                for r in range(_SUB16 - 1, -1, -1):
                    kk[b], ndel[b], strip[b] = tb_row(
                        g0 + r, (kk[b], ndel[b], strip[b]),
                        blk_lo[r: r + 1, :], blk_hi[r: r + 1, :], b)
            return (g0 - _SUB16, kk[0], kk[1], ndel[0], ndel[1],
                    strip[0], strip[1])

        out_tb = jax.lax.while_loop(
            lambda c: c[0] >= tlo, tb_group,
            (bound, kk[0], kk[1], ndel[0], ndel[1], strip[0], strip[1]))
        return (t - 1, out_tb[1], out_tb[2], out_tb[3], out_tb[4],
                out_tb[5], out_tb[6])

    z1 = jnp.zeros((_SUB16, 1), jnp.int32)
    zs = jnp.zeros((_SUB16, _W16), jnp.int32)
    out_t = jax.lax.while_loop(
        lambda c: c[0] >= 0, tile_step,
        (i_max // _TR, best_k[0], best_k[1], z1, z1, zs, zs))
    k_fin = [out_t[1], out_t[2]]
    ndel = [out_t[3], out_t[4]]

    NEG = jnp.int32(-(1 << 30))
    for b in range(NB):
        cost = jnp.where(ok[b], best[b],
                         jnp.where(m[b] > 0, jnp.int32(-1), jnp.int32(0)))
        ops_len = jnp.where(ok[b], m[b] + ndel[b], 0)
        tstart = jnp.where(ok[b], d0[b] + (k_fin[b] - _KOFF16), 0)
        tend = jnp.where(ok[b], d0[b] + m[b] + (best_k[b] - _KOFF16), 0)
        for s in range(_SUB16):
            pick = lambda c: jnp.max(jnp.where(sub == s, c, NEG))
            cost_ref[(NB * pid + b) * _SUB16 + s] = pick(cost)
            len_ref[(NB * pid + b) * _SUB16 + s] = pick(ops_len)
            ts_ref[(NB * pid + b) * _SUB16 + s] = pick(tstart)
            te_ref[(NB * pid + b) * _SUB16 + s] = pick(tend)
    trace_out[...] = trace[...]


@functools.partial(jax.jit, static_argnames=("m_pad", "interpret"))
def _align_padded16t2(d0, q_len, t_len, max_cost, tpad, queries,
                      m_pad: int, interpret: bool = False):
    PB = tpad.shape[0]
    assert PB % 2 == 0, "dual-block tiled kernel needs an even block count"
    scalar = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    tw = m_pad + 3 * _W16
    qw = m_pad + 2 * _W16
    out = pl.pallas_call(
        _kernel16t2,
        grid=(PB // 2,),
        in_specs=[
            scalar(), scalar(), scalar(), scalar(),
            pl.BlockSpec((2, _SUB16, tw), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _SUB16, qw), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            scalar(), scalar(), scalar(), scalar(),
            pl.BlockSpec((2, _SUB16, m_pad // 4), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB * _SUB16,), jnp.int32),
            jax.ShapeDtypeStruct((PB, _SUB16, m_pad // 4), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, _TR, _W16), jnp.int32),
            pltpu.VMEM((2, _TR, _W16), jnp.int32),
            pltpu.VMEM((2, _SUB16, m_pad // 4), jnp.int32),
            # +1: a query of exactly m_pad rows checkpoints at tile T
            pltpu.VMEM((2, m_pad // _TR + 1, _SUB16, _W16), jnp.int32),
        ],
        interpret=interpret,
    )(d0, q_len, t_len, max_cost, tpad, queries)
    return out


def banded_align_batch_tpu16(
    targets_flat: np.ndarray, t_off: np.ndarray, t_len: np.ndarray,
    queries_flat: np.ndarray, q_off: np.ndarray, q_len: np.ndarray,
    d0: np.ndarray, max_cost_per_kb: int = 500,
    interpret: bool = False,
) -> "AlignResult":
    """v2 entry point: band fixed at ns_banded_align(W=63) semantics.

    Queries above M_PAD16_MAX or pairs whose trace rows escape fall back to
    the exact C++ DP per pair (the engine handles that on its side; this
    standalone wrapper does it inline for tests)."""
    P = len(q_len)
    if P == 0:
        z = np.zeros(0, np.int64)
        return AlignResult(np.zeros(0, np.int32), z, z,
                           np.zeros(0, np.uint8), z.copy(), z.copy())
    order = np.argsort(-np.asarray(q_len), kind="stable")
    q_len_s = np.asarray(q_len)[order].astype(np.int64)
    t_len_s = np.asarray(t_len)[order].astype(np.int64)
    q_off_s = np.asarray(q_off)[order].astype(np.int64)
    t_off_s = np.asarray(t_off)[order].astype(np.int64)
    d0_s = np.asarray(d0)[order].astype(np.int64)
    m_pad = 1 << max(9, int(np.max(q_len_s) - 1).bit_length())
    if m_pad > M_PAD16T_MAX:
        raise ValueError("query too long for the v2/v3 kernels")
    tiled = m_pad > M_PAD16_MAX      # v3 checkpoint-recompute kernel
    dual_tiled = tiled and m_pad <= M_PAD16T2_MAX
    quad = (not tiled) and os.environ.get("NSTPU_DP_QUAD") == "1"
    blocks = max(1, -(-P // _SUB16))
    if quad:
        blocks = -(-blocks // 4) * 4    # quad-block v4 groups 4 blocks
    elif (not tiled or dual_tiled) and blocks % 2:
        blocks += 1                     # dual-block kernels pair blocks
    p_pad = blocks * _SUB16
    tw = m_pad + 3 * _W16
    qw = m_pad + 2 * _W16
    tpad = np.full((p_pad, tw), 0xFF, dtype=np.uint8)
    qbuf = np.zeros((p_pad, qw), dtype=np.uint8)
    pidx = np.arange(P, dtype=np.int64)
    tgt = _expand(pidx * qw, q_len_s)
    src = _expand(q_off_s, q_len_s)
    qbuf.reshape(-1)[tgt] = queries_flat[src]
    # tpad[x] = t[x + d0 - (KOFF+1)]
    lo = d0_s - (_KOFF16 + 1)
    st = np.maximum(0, -lo)
    en = np.minimum(tw, t_len_s - lo)
    ln = np.maximum(0, en - st)
    tgt = _expand(pidx * tw + st, ln)
    src = _expand(t_off_s + lo + st, ln)
    tpad.reshape(-1)[tgt] = targets_flat[src]
    d0a = np.zeros(p_pad, np.int32)
    qla = np.zeros(p_pad, np.int32)
    tla = np.zeros(p_pad, np.int32)
    mca = np.zeros(p_pad, np.int32)
    d0a[:P] = d0_s
    qla[:P] = q_len_s
    tla[:P] = t_len_s
    mca[:P] = q_len_s * max_cost_per_kb // 1000 + 8

    kern = (_align_padded16t2 if dual_tiled
            else _align_padded16t if tiled
            else _align_padded16q if quad else _align_padded16)
    cost, ops_len, ts, te, trace = kern(
        d0a, qla, tla, mca,
        tpad.reshape(blocks, _SUB16, tw), qbuf.reshape(blocks, _SUB16, qw),
        m_pad=m_pad, interpret=interpret)
    cost = np.asarray(cost)[:P].astype(np.int32)
    ops_len = np.asarray(ops_len)[:P].astype(np.int64)
    ts = np.asarray(ts)[:P].astype(np.int64)
    te = np.asarray(te)[:P].astype(np.int64)
    tr_bytes = (np.asarray(trace).view(np.uint8)
                .reshape(p_pad, m_pad)[:P])

    # expand trace bytes -> op bytes (numpy; the engine path uses the C++
    # expander). Escaped pairs re-run on the exact scalar DP.
    from .. import native

    lib = None
    try:
        lib = native.get_lib()
    except Exception:
        pass
    bad = cost < 0
    ops_len[bad] = 0
    ts[bad] = 0
    te[bad] = 0
    out_parts = []
    ops_off = np.zeros(P, np.int64)
    acc = 0
    import ctypes
    for p in range(P):
        ops_off[p] = acc
        if cost[p] < 0:
            continue
        rows = tr_bytes[p, : q_len_s[p]]
        if (rows == TRACE_ESC).any():
            # escape: exact DP for this pair
            assert lib is not None, "escape needs the native library"
            m_ = int(q_len_s[p])
            cap = 2 * m_ + 2 * 63 + 2
            buf = np.empty(cap, np.uint8)
            ol = ctypes.c_int64()
            t1 = ctypes.c_int64()
            t2 = ctypes.c_int64()
            u8p = ctypes.POINTER(ctypes.c_uint8)
            tseg = np.ascontiguousarray(
                targets_flat[t_off_s[p]: t_off_s[p] + t_len_s[p]])
            qseg = np.ascontiguousarray(
                queries_flat[q_off_s[p]: q_off_s[p] + m_])
            c = lib.ns_banded_align(
                tseg.ctypes.data_as(u8p), ctypes.c_int64(len(tseg)),
                qseg.ctypes.data_as(u8p), ctypes.c_int64(m_),
                ctypes.c_int64(int(d0_s[p])), ctypes.c_int32(63),
                ctypes.c_int32(int(mca[p])),
                buf.ctypes.data_as(u8p), ctypes.c_int64(cap),
                ctypes.byref(ol), ctypes.byref(t1), ctypes.byref(t2))
            cost[p] = c
            if c < 0:
                ops_len[p] = 0
                ts[p] = 0
                te[p] = 0
                continue
            ops_len[p] = ol.value
            ts[p] = t1.value
            te[p] = t2.value
            out_parts.append(buf[: ol.value].copy())
            acc += ol.value
            continue
        dels = (rows & 63).astype(np.int64)
        op2 = rows >> 6
        opchar = np.where(op2 == 2, np.uint8(ord("i")),
                          np.where(op2 == 0, np.uint8(ord("=")),
                                   np.uint8(ord("s"))))
        total = int(q_len_s[p] + dels.sum())
        seg = np.full(total, ord("d"), np.uint8)
        pos_ = np.cumsum(1 + dels) - 1  # op byte goes AFTER its dels? no:
        # record layout matches v1: op byte first, then dels 'd's
        start = np.concatenate([[0], np.cumsum(1 + dels)[:-1]])
        seg[start] = opchar
        out_parts.append(seg)
        ops_len[p] = total
        acc += total
    ops_flat = (np.concatenate(out_parts) if out_parts
                else np.zeros(0, np.uint8))
    inv = np.empty(P, np.int64)
    inv[order] = np.arange(P)
    return AlignResult(cost[inv], ts[inv], te[inv], ops_flat,
                       ops_off[inv], ops_len[inv])
