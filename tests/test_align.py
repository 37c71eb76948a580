import numpy as np
import pytest

from nanospring_tpu.io import packed as pk
from nanospring_tpu.ops import align
from nanospring_tpu.utils import synth


def _codes(rng, n):
    return rng.integers(0, 4, n).astype(np.uint8)


def _mutated_pair(rng, n=2000, offset=300):
    """Target genome region + a query sampled from it with errors."""
    t = _codes(rng, n)
    q_src = t[offset : offset + 1200]
    q_ascii = synth.mutate(pk.decode_to_ascii(q_src), rng)
    q = pk.encode_ascii(q_ascii)
    return t, q, offset


def _batch_of_pairs(rng, count=8):
    ts, qs, d0s = [], [], []
    for _ in range(count):
        t, q, off = _mutated_pair(rng)
        ts.append(t)
        qs.append(q)
        d0s.append(off)
    t_len = np.array([len(t) for t in ts], dtype=np.int64)
    q_len = np.array([len(q) for q in qs], dtype=np.int64)
    t_off = np.zeros(count, dtype=np.int64)
    np.cumsum(t_len[:-1], out=t_off[1:])
    q_off = np.zeros(count, dtype=np.int64)
    np.cumsum(q_len[:-1], out=q_off[1:])
    return (
        np.concatenate(ts), t_off, t_len,
        np.concatenate(qs), q_off, q_len,
        np.array(d0s, dtype=np.int64),
    )


def _replay_check(res, p, targets_flat, t_off, t_len, queries_flat, q_off, q_len):
    t = targets_flat[t_off[p] : t_off[p] + t_len[p]]
    q = queries_flat[q_off[p] : q_off[p] + q_len[p]]
    ops = np.frombuffer(res.ops(p), dtype=np.uint8)
    lit_mask = (ops == ord("i")) | (ops == ord("s"))
    # literals come from the query at consuming positions
    consumes_q = (ops == ord("=")) | (ops == ord("s")) | (ops == ord("i"))
    qpos = np.cumsum(consumes_q) - consumes_q
    literals = q[qpos[lit_mask]]
    rebuilt = align.replay_ops(t, len(q), int(res.tstart[p]), res.ops(p), literals)
    np.testing.assert_array_equal(rebuilt, q)


def test_native_align_replay():
    rng = np.random.default_rng(21)
    args = _batch_of_pairs(rng)
    res = align.banded_align_batch(*args, band=128)
    assert (res.cost >= 0).all(), f"costs {res.cost}"
    for p in range(len(res.cost)):
        _replay_check(res, p, *args[:-1])


def test_native_matches_numpy_cost():
    rng = np.random.default_rng(22)
    args = _batch_of_pairs(rng, count=4)
    res_c = align.banded_align_batch(*args, band=64)
    res_np = align.banded_align_batch(*args, band=64, use_native=False)
    # costs must agree exactly; tstart may differ between equally-optimal
    # alignments (tie-breaking), so verify both replay correctly instead.
    np.testing.assert_array_equal(res_c.cost, res_np.cost)
    for p in range(len(res_np.cost)):
        _replay_check(res_np, p, *args[:-1])


def test_align_reject_unrelated():
    rng = np.random.default_rng(23)
    t = _codes(rng, 2000)
    q = _codes(rng, 1000)
    res = align.banded_align_batch(
        t, np.zeros(1, np.int64), np.array([2000], np.int64),
        q, np.zeros(1, np.int64), np.array([1000], np.int64),
        np.array([500], np.int64), band=64, max_cost_per_kb=300,
    )
    assert res.cost[0] == -1


def test_query_overhang_becomes_insertions():
    """Query extending past the target end must align with tail insertions."""
    rng = np.random.default_rng(24)
    t = _codes(rng, 500)
    q = np.concatenate([t[300:], _codes(rng, 100)])  # 200 matching + 100 overhang
    res = align.banded_align_batch(
        t, np.zeros(1, np.int64), np.array([500], np.int64),
        q, np.zeros(1, np.int64), np.array([300], np.int64),
        np.array([300], np.int64), band=128, max_cost_per_kb=500,
    )
    assert res.cost[0] >= 0
    ops = res.ops(0)
    assert ops.endswith(b"i" * 100)
    assert int(res.tstart[0]) == 300


def test_ops_to_edit_scripts_roundtrip():
    """EditScripts fields must replay to the original query via the
    decompressor's op-tape semantics."""
    rng = np.random.default_rng(25)
    args = _batch_of_pairs(rng, count=6)
    targets_flat, t_off, t_len, queries_flat, q_off, q_len, d0 = args
    res = align.banded_align_batch(*args, band=128)
    sel = np.flatnonzero(res.cost >= 0)
    es = align.ops_to_edit_scripts(res, sel, queries_flat, q_off, q_len)

    # replay using decompressor machinery
    from nanospring_tpu.decompressor import replay_contig_reads

    genome_ascii = pk.decode_to_ascii(targets_flat)
    out, out_len = replay_contig_reads(
        genome_ascii, t_off, np.arange(len(sel)),  # each pair = own "contig"
        es.start_pos, es.head_ins, es.tail_ins, es.n_edits,
        es.runs_flat, es.types_flat, es.bases_flat,
        np.zeros(len(sel), dtype=np.uint8),
    )
    offs = np.zeros(len(sel) + 1, dtype=np.int64)
    np.cumsum(out_len, out=offs[1:])
    for i, p in enumerate(sel):
        got = out[offs[i] : offs[i + 1]]
        want = pk.decode_to_ascii(queries_flat[q_off[p] : q_off[p] + q_len[p]])
        np.testing.assert_array_equal(got, want)
