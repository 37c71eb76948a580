"""Alignment wrappers: batched banded glocal alignment + edit-script conversion.

The C++ core (native/align.cpp) does the banded DP with traceback; this
module provides the ctypes batch wrapper, a pure-numpy fallback (same
algorithm, used as a test oracle and when no compiler exists), and the
fully-vectorized conversion of raw op strings ('='/'s'/'i'/'d') into the
archive's (start, head_ins, runs, types, literals, tail_ins) fields
(reference equivalents: CIGAR -> Edit conversion at
src/ConsensusGraph.cpp:301-342 and read2EditScript at :1031-1096).
"""

from __future__ import annotations

import ctypes
import dataclasses

import numpy as np

from ..io import packed as pk


@dataclasses.dataclass
class AlignResult:
    """Batch alignment outputs; ragged ops in a flat buffer."""

    cost: np.ndarray      # int32 (P,), -1 = rejected/aborted
    tstart: np.ndarray    # int64 (P,) first consumed target position
    tend: np.ndarray      # int64 (P,) one past last consumed target position
    ops_flat: np.ndarray  # uint8 flat op bytes
    ops_off: np.ndarray   # int64 (P,)
    ops_len: np.ndarray   # int64 (P,)

    def ops(self, p: int) -> bytes:
        return self.ops_flat[self.ops_off[p] : self.ops_off[p] + self.ops_len[p]].tobytes()


def banded_align_batch(
    targets_flat: np.ndarray, t_off: np.ndarray, t_len: np.ndarray,
    queries_flat: np.ndarray, q_off: np.ndarray, q_len: np.ndarray,
    d0: np.ndarray, band: int, max_cost_per_kb: int = 500,
    use_native: bool = True,
) -> AlignResult:
    """Align query p against target p around diagonal d0[p].

    All sequences are 2-bit code arrays (uint8). max_cost_per_kb bounds
    accepted edit cost per 1000 query bases (early abort above it).
    """
    P = len(q_len)
    ops_cap = int(2 * (q_len.max() if P else 0) + 2 * band + 2)
    ops_off = np.arange(P, dtype=np.int64) * ops_cap
    ops_flat = np.zeros(P * ops_cap, dtype=np.uint8)
    ops_len = np.zeros(P, dtype=np.int64)
    tstart = np.zeros(P, dtype=np.int64)
    tend = np.zeros(P, dtype=np.int64)
    cost = np.zeros(P, dtype=np.int32)
    if P == 0:
        return AlignResult(cost, tstart, tend, ops_flat, ops_off, ops_len)

    if use_native:
        from .. import native

        lib = native.get_lib()
        c = lambda a, t: a.ctypes.data_as(t)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        targets_flat = np.ascontiguousarray(targets_flat, dtype=np.uint8)
        queries_flat = np.ascontiguousarray(queries_flat, dtype=np.uint8)
        t_off = np.ascontiguousarray(t_off, dtype=np.int64)
        t_len = np.ascontiguousarray(t_len, dtype=np.int64)
        q_off = np.ascontiguousarray(q_off, dtype=np.int64)
        q_len = np.ascontiguousarray(q_len, dtype=np.int64)
        d0 = np.ascontiguousarray(d0, dtype=np.int64)
        lib.ns_banded_align_batch(
            c(targets_flat, u8p), c(t_off, i64p), c(t_len, i64p),
            c(queries_flat, u8p), c(q_off, i64p), c(q_len, i64p),
            c(d0, i64p), ctypes.c_int32(band), ctypes.c_int32(max_cost_per_kb),
            ctypes.c_int64(P),
            c(ops_flat, u8p), c(ops_off, i64p), ctypes.c_int64(ops_cap),
            c(ops_len, i64p), c(tstart, i64p), c(tend, i64p), c(cost, i32p),
        )
    else:
        for p in range(P):
            t = targets_flat[t_off[p] : t_off[p] + t_len[p]]
            q = queries_flat[q_off[p] : q_off[p] + q_len[p]]
            mc = int(len(q) * max_cost_per_kb / 1000 + 8)
            r = _banded_align_np(t, q, int(d0[p]), band, mc)
            if r is None:
                cost[p] = -1
            else:
                cost[p], ts, te, ops = r
                tstart[p], tend[p] = ts, te
                ops_len[p] = len(ops)
                ops_flat[ops_off[p] : ops_off[p] + len(ops)] = np.frombuffer(
                    ops, dtype=np.uint8
                )
    return AlignResult(cost, tstart, tend, ops_flat, ops_off, ops_len)


def _banded_align_np(t, q, d0, W, max_cost):
    """Numpy reference of the C++ banded DP (same band geometry & moves)."""
    n, m = len(t), len(q)
    width = 2 * W + 1
    INF = 1 << 30
    ks = np.arange(width)
    j0 = d0 - W + ks
    prev = np.where((j0 >= 0) & (j0 <= n), 0, INF)
    dirs = np.full((m + 1, width), 3, dtype=np.uint8)
    for i in range(1, m + 1):
        j = d0 + i - W + ks
        valid = (j >= 0) & (j <= n)
        jt = np.clip(j - 1, 0, n - 1)
        match = np.where((j >= 1) & (j <= n), (t[jt] == q[i - 1]), False)
        diag = np.where((j >= 1) & (j <= n) & (prev < INF), prev + np.where(match, 0, 1), INF)
        up = np.full(width, INF)
        up[:-1] = np.where(prev[1:] < INF, prev[1:] + 1, INF)
        cur = np.where(valid, np.minimum(diag, up), INF)
        d = np.where(valid & (up < diag), 1, np.where(valid, 0, 3)).astype(np.uint8)
        d[diag >= INF] = np.where(up[diag >= INF] < INF, 1, 3)
        # left moves: sequential scan within the row
        for k in range(1, width):
            if valid[k] and cur[k - 1] + 1 < cur[k]:
                cur[k] = cur[k - 1] + 1
                d[k] = 2
        prev = cur
        dirs[i] = d
        if prev.min() > max_cost:
            return None
    jm = d0 + m - W + ks
    final = np.where((jm >= 0) & (jm <= n), prev, INF)
    best_k = int(np.argmin(final))
    best = int(final[best_k])
    if best > max_cost:
        return None
    ops = []
    i, k = m, best_k
    while i > 0:
        d = dirs[i, k]
        if d == 0:
            j = d0 + i - W + k
            ops.append(b"=" if t[j - 1] == q[i - 1] else b"s")
            i -= 1
        elif d == 1:
            ops.append(b"i")
            i -= 1
            k += 1
        elif d == 2:
            ops.append(b"d")
            k -= 1
        else:
            raise RuntimeError("broken traceback")
    tstart = d0 - W + k
    return best, tstart, d0 + m - W + best_k, b"".join(reversed(ops))


def replay_ops(t: np.ndarray, q_len: int, tstart: int, ops: bytes,
               literals: np.ndarray) -> np.ndarray:
    """Test helper: rebuild the query from target + ops + literal bases."""
    out = []
    j = tstart
    li = 0
    for o in ops:
        if o == ord("="):
            out.append(t[j]); j += 1
        elif o == ord("s"):
            out.append(literals[li]); li += 1; j += 1
        elif o == ord("i"):
            out.append(literals[li]); li += 1
        elif o == ord("d"):
            j += 1
    return np.asarray(out, dtype=np.uint8)


# ---------------------------------------------------------------------------
# Vectorized ops -> archive edit-script fields
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class EditScripts:
    """Per-read archive fields for a batch of accepted alignments."""

    start_pos: np.ndarray   # int64 (P,)
    head_ins: np.ndarray    # int64
    tail_ins: np.ndarray    # int64
    n_edits: np.ndarray     # int64
    runs_flat: np.ndarray   # int64
    types_flat: np.ndarray  # uint8 ascii
    bases_flat: np.ndarray  # uint8 ascii (head | script | tail literals)


def _excl_cumsum(x):
    out = np.zeros(len(x), dtype=np.int64)
    if len(x) > 1:
        np.cumsum(x[:-1], out=out[1:])
    return out


def ops_to_edit_scripts(
    res: AlignResult,
    sel: np.ndarray,            # indices of accepted pairs
    queries_flat: np.ndarray,   # uint8 codes
    q_off: np.ndarray,
    q_len: np.ndarray,
) -> EditScripts:
    """Convert raw op strings into (start, head, runs, types, literals, tail).

    Leading/trailing 'i' runs become head_ins/tail_ins (the aligner never
    emits leading/trailing 'd' — free target ends make them suboptimal).
    """
    P = len(sel)
    if P == 0:
        z = lambda dt: np.zeros(0, dtype=dt)
        return EditScripts(z(np.int64), z(np.int64), z(np.int64), z(np.int64),
                           z(np.int64), z(np.uint8), z(np.uint8))
    lib = None
    try:
        from .. import native

        lib = native.get_lib()
    except Exception:
        pass
    if lib is not None:
        return _ops_to_edit_scripts_native(lib, res, sel, queries_flat, q_off)
    lens = res.ops_len[sel]
    offs = res.ops_off[sel]
    total = int(lens.sum())
    gidx = np.repeat(offs, lens) + (
        np.arange(total, dtype=np.int64) - np.repeat(_excl_cumsum(lens), lens)
    )
    ops = res.ops_flat[gidx]                       # flat ops, selected reads
    read_of = np.repeat(np.arange(P, dtype=np.int64), lens)
    o_off = _excl_cumsum(lens)
    idx_in_read = np.arange(total, dtype=np.int64) - o_off[read_of]

    is_i = ops == ord("i")
    noni = ~is_i
    # head = first non-'i' index; tail = len-1 - last non-'i' index
    BIG = np.int64(1 << 60)
    head = np.minimum.reduceat(
        np.where(noni, idx_in_read, BIG), o_off
    ) if total else np.zeros(0, np.int64)
    head = np.minimum(head, lens)  # all-'i' script: everything is head
    last_noni = np.maximum.reduceat(
        np.where(noni, idx_in_read, np.int64(-1)), o_off
    ) if total else np.zeros(0, np.int64)
    tail = np.where(last_noni < 0, 0, lens - 1 - last_noni)

    in_body = (idx_in_read >= head[read_of]) & (idx_in_read < (lens - tail)[read_of])
    is_edit = in_body & (ops != ord("="))
    is_eq = in_body & (ops == ord("="))

    # unchanged-run lengths: for each edit, '='-count since previous edit;
    # plus the final run after the last edit.
    eq_c = np.cumsum(is_eq.astype(np.int64))
    eq_excl = eq_c - is_eq.astype(np.int64)        # '='s strictly before op
    edit_idx = np.flatnonzero(is_edit)
    n_edits = np.zeros(P, dtype=np.int64)
    np.add.at(n_edits, read_of[edit_idx], 1)
    eq_at_edit = eq_excl[edit_idx]
    # per-read totals of '='
    eq_total = np.zeros(P, dtype=np.int64)
    np.add.at(eq_total, read_of, is_eq.astype(np.int64))
    # base for each read: cumulative '=' before read start
    eq_before_read = eq_c[o_off] - is_eq[o_off]    # '='s before first op of read
    # previous edit's eq count within read
    run_starts = _excl_cumsum(n_edits + 1)
    runs_flat = np.zeros(int((n_edits + 1).sum()), dtype=np.int64)
    e_read = read_of[edit_idx]
    e_rank = np.arange(len(edit_idx)) - _excl_cumsum(n_edits)[e_read]
    prev_eq = np.empty(len(edit_idx), dtype=np.int64)
    prev_eq[:] = eq_before_read[e_read]
    if len(edit_idx):
        same_read = e_read[1:] == e_read[:-1]
        prev_eq[1:] = np.where(same_read, eq_at_edit[:-1], prev_eq[1:])
    runs_flat[run_starts[e_read] + e_rank] = eq_at_edit - prev_eq
    # final run per read
    last_eq = eq_before_read.copy()
    if len(edit_idx):
        last_of_read = np.zeros(P, dtype=np.int64) - 1
        last_of_read[e_read] = np.arange(len(edit_idx))  # last write wins
        has_e = last_of_read >= 0
        last_eq[has_e] = eq_at_edit[last_of_read[has_e]]
    runs_flat[run_starts + n_edits] = eq_before_read + eq_total - last_eq

    types_flat = ops[edit_idx]

    # literals: query bases where ops consume query and emit literal
    consumes_q = (ops == ord("=")) | (ops == ord("s")) | is_i
    qpos = np.cumsum(consumes_q.astype(np.int64)) - consumes_q.astype(np.int64)
    qpos = qpos - (np.cumsum(consumes_q.astype(np.int64))[o_off] - consumes_q[o_off])[read_of]
    emits_lit = is_i | (ops == ord("s"))           # head/tail 'i' included
    lit_idx = np.flatnonzero(emits_lit)
    lit_q = q_off[sel][read_of[lit_idx]] + qpos[lit_idx]
    bases_flat = pk.decode_to_ascii(queries_flat[lit_q])

    return EditScripts(
        start_pos=res.tstart[sel].astype(np.int64),
        head_ins=head,
        tail_ins=tail,
        n_edits=n_edits,
        runs_flat=runs_flat,
        types_flat=types_flat,
        bases_flat=bases_flat,
    )


def _ops_to_edit_scripts_native(lib, res, sel, queries_flat, q_off):
    """Two-pass C++ extraction (native/hot.cpp) — same output as the numpy
    path (tested equal in tests/test_align.py)."""
    sel = np.asarray(sel, dtype=np.int64)
    P = len(sel)
    c_ops_off = np.ascontiguousarray(res.ops_off[sel], dtype=np.int64)
    c_ops_len = np.ascontiguousarray(res.ops_len[sel], dtype=np.int64)
    c_q_off = np.ascontiguousarray(np.asarray(q_off)[sel], dtype=np.int64)
    ops_flat = np.ascontiguousarray(res.ops_flat, dtype=np.uint8)
    queries_flat = np.ascontiguousarray(queries_flat, dtype=np.uint8)

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    cp = lambda a: a.ctypes.data_as(i64p)
    n_edits = np.empty(P, dtype=np.int64)
    n_lits = np.empty(P, dtype=np.int64)
    head = np.empty(P, dtype=np.int64)
    tail = np.empty(P, dtype=np.int64)
    lib.ns_edit_counts(
        ops_flat.ctypes.data_as(u8p), cp(c_ops_off), cp(c_ops_len),
        ctypes.c_int64(P), cp(n_edits), cp(n_lits), cp(head), cp(tail),
    )
    run_off = _excl_cumsum(n_edits + 1)
    lit_off = _excl_cumsum(n_lits)
    runs_flat = np.empty(int((n_edits + 1).sum()), dtype=np.int64)
    types_flat = np.empty(int(n_edits.sum()), dtype=np.uint8)
    bases_flat = np.empty(int(n_lits.sum()), dtype=np.uint8)
    lib.ns_edit_fill(
        ops_flat.ctypes.data_as(u8p), cp(c_ops_off), cp(c_ops_len),
        queries_flat.ctypes.data_as(u8p), cp(c_q_off),
        cp(head), cp(tail), cp(run_off), cp(lit_off), ctypes.c_int64(P),
        cp(runs_flat), types_flat.ctypes.data_as(u8p),
        bases_flat.ctypes.data_as(u8p),
    )
    return EditScripts(
        start_pos=res.tstart[sel].astype(np.int64),
        head_ins=head,
        tail_ins=tail,
        n_edits=n_edits,
        runs_flat=runs_flat,
        types_flat=types_flat,
        bases_flat=bases_flat,
    )
