"""Sharded sketch hash-join: the multi-device overlap-detection step.

Single step over the mesh (shard_map over the ``reads`` axis):

1. each device sketches its local shard of reads (ops/sketch.py),
2. (value, read_id) pairs are routed with ``all_to_all`` so each device owns
   one range of hash space (top bits of the minhash value select the owner
   — uniform because the values are murmur-finalized),
3. each device sorts its received pairs and counts same-value collisions —
   the candidate pairs whose threshold test feeds contig building.

This replaces the reference's shared-memory hash tables + striped-lock claim
protocol (src/BBHashMap.cpp, src/Consensus.cpp:256-277) with collectives
over ICI/DCN. Buckets are padded to a static per-device capacity (XLA needs
static shapes); overflow is counted and surfaced so callers can re-run with
a bigger capacity — never silently dropped without a count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import sketch as sk
from .mesh import READS_AXIS


def _bucket_and_exchange(vals: jnp.ndarray, rids: jnp.ndarray, n_dev: int, cap: int):
    """Route (value, rid) pairs to the device owning the value's hash range.

    vals/rids: (M,) local pairs. Returns (recv_vals, recv_rids, overflow)
    where recv_* are (n_dev * cap,) with EMPTY_SLOT padding.
    """
    # minhash values are per-read minima (small-biased), so remix before
    # taking range bits or every pair lands on device 0
    mixed = vals * jnp.uint32(0x9E3779B1)
    mixed = mixed ^ (mixed >> 16)
    owner = (mixed >> jnp.uint32(32 - max(1, (n_dev - 1).bit_length()))).astype(jnp.int32)
    owner = jnp.minimum(owner, n_dev - 1)
    # EMPTY_SLOT pairs are dropped, not sent: park them past every owner
    owner = jnp.where(vals == sk.EMPTY_SLOT, n_dev, owner)
    # stable sort by owner, then build per-owner padded buckets
    order = jnp.argsort(owner)
    owner_s = owner[order]
    vals_s = vals[order]
    rids_s = rids[order]
    # rank within owner group
    idx = jnp.arange(vals.shape[0])
    group_start = jnp.searchsorted(owner_s, jnp.arange(n_dev + 1))
    rank = idx - group_start[jnp.minimum(owner_s, n_dev)]
    valid = owner_s < n_dev
    overflow = jnp.sum((rank >= cap) & valid)
    slot = jnp.where(valid & (rank < cap),
                     owner_s * cap + rank, n_dev * cap)  # spill slot
    send_vals = jnp.full((n_dev * cap + 1,), sk.EMPTY_SLOT, dtype=jnp.uint32)
    send_rids = jnp.full((n_dev * cap + 1,), jnp.uint32(0xFFFFFFFF), dtype=jnp.uint32)
    send_vals = send_vals.at[slot].set(vals_s)
    send_rids = send_rids.at[slot].set(rids_s)
    send_vals = send_vals[: n_dev * cap].reshape(n_dev, cap)
    send_rids = send_rids[: n_dev * cap].reshape(n_dev, cap)
    recv_vals = jax.lax.all_to_all(send_vals, READS_AXIS, 0, 0, tiled=False)
    recv_rids = jax.lax.all_to_all(send_rids, READS_AXIS, 0, 0, tiled=False)
    return recv_vals.reshape(-1), recv_rids.reshape(-1), overflow


def _local_collision_count(vals: jnp.ndarray) -> jnp.ndarray:
    """Count adjacent equal values after sorting (padding excluded)."""
    s = jnp.sort(vals)
    eq = (s[1:] == s[:-1]) & (s[1:] != sk.EMPTY_SLOT)
    return jnp.sum(eq)


def make_slot_shuffle_step(mesh: Mesh, n_slots: int, cap_per_device: int):
    """Stage 1 of the distributed join: for every sketch slot, route
    (value, read_id) pairs to the device owning the value's hash range.

    Input  (sharded over reads): sketches (N, n_slots) uint32, rids (N,)
    Output (sharded over devices): vals/rids (n_dev, n_slots, n_dev*cap)
    plus a psum'd overflow count. After this step each device holds, for
    each slot, every (value, rid) pair in its hash range — the shuffle that
    runs over ICI on a real slice.
    """
    n_dev = mesh.devices.size

    def step(sketches, rids):
        def one_slot(carry, vals):
            rv, rr, ov = _bucket_and_exchange(vals, rids, n_dev, cap_per_device)
            return carry + ov, (rv, rr)

        ov, (rv, rr) = jax.lax.scan(
            one_slot, jnp.int32(0), sketches.T
        )
        overflow = jax.lax.psum(ov, READS_AXIS)
        return rv[None], rr[None], overflow

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(READS_AXIS), P(READS_AXIS)),
        out_specs=(P(READS_AXIS), P(READS_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_pair_exchange_step(mesh: Mesh, cap_per_device: int):
    """Stage 3: route candidate pair keys to the device owning the pair,
    so per-pair slot-hit counts can be summed in one place (the second
    all_to_all of the classic distributed join)."""
    n_dev = mesh.devices.size

    def step(qs, rs_):
        # qs/rs_: (P_cap,) int32 local pair halves, -1 padding. int32 pairs
        # (not a fused int64 key) so read counts beyond 2^15.5 don't overflow
        # under jax's default 32-bit ints.
        mixed = (qs * jnp.int32(0x45D9F3B)) ^ (rs_ * jnp.int32(0x2545F491))
        owner = jnp.abs(mixed) % n_dev
        valid_in = qs >= 0
        owner = jnp.where(valid_in, owner, n_dev)
        order = jnp.argsort(owner)
        owner_s = owner[order]
        qs_s = qs[order]
        rs_s = rs_[order]
        idx = jnp.arange(qs.shape[0])
        group_start = jnp.searchsorted(owner_s, jnp.arange(n_dev + 1))
        rank = idx - group_start[jnp.minimum(owner_s, n_dev)]
        valid = owner_s < n_dev
        overflow = jnp.sum((rank >= cap_per_device) & valid)
        slot = jnp.where(
            valid & (rank < cap_per_device),
            owner_s * cap_per_device + rank,
            n_dev * cap_per_device,
        )
        out = []
        for arr in (qs_s, rs_s):
            send = jnp.full((n_dev * cap_per_device + 1,), -1, dtype=jnp.int32)
            send = send.at[slot].set(arr)
            send = send[: n_dev * cap_per_device].reshape(n_dev, cap_per_device)
            out.append(
                jax.lax.all_to_all(send, READS_AXIS, 0, 0, tiled=False)
                .reshape(1, -1)
            )
        return out[0], out[1], jax.lax.psum(overflow, READS_AXIS)

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(READS_AXIS), P(READS_AXIS)),
        out_specs=(P(READS_AXIS), P(READS_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def sharded_candidate_pairs(
    mesh: Mesh,
    sketches,                 # (N, n_slots) uint32 numpy
    threshold: int,
    max_bucket: int = 256,
    slot_cap: int | None = None,
    pair_cap: int | None = None,
):
    """Full distributed overlap-candidate join over the mesh.

    Device collectives do both shuffles (value-range, then pair-owner);
    host code touches only its local shards between them — on a multi-host
    pod each host expands only the ranges it owns. Returns (q, r) pairs
    with >= threshold matching slots, identical to SketchIndex.query over
    all reads (tested for equality in tests/test_parallel.py).
    """
    import numpy as np

    N, n_slots = sketches.shape
    n_dev = mesh.devices.size
    if slot_cap is None:
        slot_cap = max(64, 2 * N // n_dev)
    rids = np.arange(N, dtype=np.uint32)
    rs = NamedSharding(mesh, P(READS_AXIS))
    sk_dev = jax.device_put(np.asarray(sketches), rs)
    rid_dev = jax.device_put(rids, rs)
    # cap-doubling retry: skewed hash ranges overflow the static buckets on
    # adversarial inputs; double and re-run instead of dying (each cap is a
    # separate compile, but caps grow geometrically so this is bounded)
    for _ in range(8):
        shuffle = make_slot_shuffle_step(mesh, n_slots, slot_cap)
        rv, rr, overflow = shuffle(sk_dev, rid_dev)
        if int(overflow) == 0:
            break
        slot_cap *= 2
    else:
        raise RuntimeError(f"slot shuffle overflow at cap {slot_cap}")

    # host stage, vectorized over (slot, bucket-slot) at once per local
    # device shard: sort by (slot segment, value), group boundaries by
    # diff, then expand every group's g^2 ordered pairs with one
    # repeat/divmod pass (no per-group Python). On a multi-host pod each
    # host runs this over the device shards it owns.
    rv = np.asarray(rv)   # (n_dev, n_slots, n_dev*slot_cap)
    rr = np.asarray(rr)
    pairs_per_dev = []
    for d in range(n_dev):
        vals = rv[d].reshape(-1).astype(np.uint64)
        ids = rr[d].reshape(-1)
        seg = np.repeat(np.arange(n_slots, dtype=np.uint64), rv.shape[2])
        real = vals != sk.EMPTY_SLOT
        key = (seg[real] << np.uint64(32)) | vals[real]
        ids = ids[real]
        order = np.argsort(key, kind="stable")
        key, ids = key[order], ids[order]
        boundary = np.ones(len(key), dtype=bool)
        boundary[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(boundary)
        sizes = np.diff(np.append(starts, len(key)))
        keepg = (sizes >= 2) & (sizes <= max_bucket)
        gs = starts[keepg].astype(np.int64)
        gz = sizes[keepg].astype(np.int64)
        sq = gz * gz
        total = int(sq.sum())
        if total:
            excl = np.zeros(len(sq), np.int64)
            np.cumsum(sq[:-1], out=excl[1:])
            within = np.arange(total, dtype=np.int64) - np.repeat(excl, sq)
            base = np.repeat(gs, sq)
            gsz = np.repeat(gz, sq)
            a = ids[base + within // gsz].astype(np.int32)
            b = ids[base + within % gsz].astype(np.int32)
            ne = a != b
            pairs_per_dev.append((a[ne], b[ne]))
        else:
            pairs_per_dev.append((np.zeros(0, np.int32), np.zeros(0, np.int32)))

    longest = max((len(q) for q, _ in pairs_per_dev), default=0)
    if pair_cap is None:
        pair_cap = max(64, 2 * longest)
    p_local = 1 << max(6, int(max(1, longest) - 1).bit_length())
    send_q = np.full((n_dev, p_local), -1, dtype=np.int32)
    send_r = np.full((n_dev, p_local), -1, dtype=np.int32)
    for d, (q, r) in enumerate(pairs_per_dev):
        send_q[d, : len(q)] = q
        send_r[d, : len(r)] = r
    for _ in range(8):
        exchange = make_pair_exchange_step(mesh, pair_cap)
        rq, rr2, overflow2 = exchange(
            jax.device_put(send_q.reshape(-1), rs),
            jax.device_put(send_r.reshape(-1), rs),
        )
        if int(overflow2) == 0:
            break
        pair_cap *= 2
    else:
        raise RuntimeError(f"pair exchange overflow at cap {pair_cap}")
    rq = np.asarray(rq).reshape(-1).astype(np.int64)
    rr2 = np.asarray(rr2).reshape(-1).astype(np.int64)
    good = rq >= 0
    key = rq[good] * N + rr2[good]
    key.sort()
    boundary = np.ones(len(key), dtype=bool)
    boundary[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(boundary)
    counts = np.diff(np.append(starts, len(key)))
    keep = counts >= threshold
    uk = key[starts[keep]]
    return uk // N, uk % N, counts[keep]


def make_sharded_join_step(mesh: Mesh, k: int, cap_per_device: int):
    """Build the jitted sharded step:
    (codes (N,L) uint8, lengths (N,) int32, seeds (n,2) uint32, rids (N,) uint32)
      -> (sketches (N,n) uint32 [reads-sharded], collisions (), overflow ())
    """
    n_dev = mesh.devices.size

    def step(codes, lengths, seeds, rids):
        sketches = sk.sketch_batch(codes, lengths, seeds, k)  # local shard
        # exchange slot 0's values by hash range and count collisions — the
        # full join repeats this per slot; one slot exercises the collective
        # path end-to-end per step (the host driver loops slots).
        vals = sketches[:, 0]
        rvals, rrids, overflow = _bucket_and_exchange(vals, rids, n_dev, cap_per_device)
        local = _local_collision_count(rvals)
        collisions = jax.lax.psum(local, READS_AXIS)
        overflow = jax.lax.psum(overflow, READS_AXIS)
        return sketches, collisions, overflow

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(READS_AXIS), P(READS_AXIS), P(), P(READS_AXIS)),
        out_specs=(P(READS_AXIS), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
