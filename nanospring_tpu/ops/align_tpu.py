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
    blocks = max(1, -(-P // _SUB))
    if batch_pad:
        blocks = 1 << max(2, int(blocks - 1).bit_length())
    p_pad = blocks * _SUB

    tpad = np.zeros((blocks, _SUB, m_pad + 2 * _W2), dtype=np.uint8)
    tpad[:] = 0xFF
    qbuf = np.zeros((blocks, _SUB, m_pad + _W2), dtype=np.int32)
    d0a = np.zeros(p_pad, np.int32)
    qla = np.zeros(p_pad, np.int32)
    tla = np.zeros(p_pad, np.int32)
    mca = np.zeros(p_pad, np.int32)
    for p in range(P):
        b, s = divmod(p, _SUB)
        mm = int(q_len[p])
        nn = int(t_len[p])
        qbuf[b, s, :mm] = queries_flat[q_off[p]: q_off[p] + mm]
        # tpad[x] = t[x + d0 - (_KOFF+1)], clipped to [0, n)
        lo = int(d0[p]) - (_KOFF + 1)
        st = max(0, -lo)
        e = min(m_pad + 2 * _W2, nn - lo)
        if e > st:
            tpad[b, s, st:e] = targets_flat[t_off[p] + lo + st: t_off[p] + lo + e]
        d0a[p] = d0[p]
        qla[p] = mm
        tla[p] = nn
        mca[p] = mm * max_cost_per_kb // 1000 + 8

    cost, ops_len, ts, te, trace = _align_padded(
        d0a, qla, tla, mca, tpad, qbuf, m_pad=m_pad, interpret=interpret
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
    cap = m_pad + m_pad // 2 + 128
    out_flat = np.zeros(P * cap, dtype=np.uint8)
    ops_off = np.arange(P, dtype=np.int64) * cap
    for p in range(P):
        if cost[p] < 0 or q_len[p] == 0:
            continue
        mm = int(q_len[p])
        row = trace[p, :mm].astype(np.int64)
        dels = row & 0xFFFF
        optype = (row >> 16) & 3
        mbit = (row >> 18) & 1
        opchar = np.where(
            optype == 1, np.uint8(ord("i")),
            np.where(mbit == 1, np.uint8(ord("=")), np.uint8(ord("s"))),
        )
        L = int(mm + dels.sum())
        assert L == ops_len[p], (L, ops_len[p])
        seg = np.full(L, ord("d"), dtype=np.uint8)
        lens = 1 + dels
        pos = np.cumsum(lens) - lens
        seg[pos] = opchar
        out_flat[ops_off[p]: ops_off[p] + L] = seg
    return AlignResult(cost, ts, te, out_flat, ops_off, ops_len)
