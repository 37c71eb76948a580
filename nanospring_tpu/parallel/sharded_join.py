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
from jax.experimental.shard_map import shard_map

from ..ops import sketch as sk
from .mesh import READS_AXIS


def _bucket_and_exchange(vals: jnp.ndarray, rids: jnp.ndarray, n_dev: int, cap: int):
    """Route (value, rid) pairs to the device owning the value's hash range.

    vals/rids: (M,) local pairs. Returns (recv_vals, recv_rids, overflow)
    where recv_* are (n_dev * cap,) with EMPTY_SLOT padding.
    """
    owner = (vals >> jnp.uint32(32 - max(1, (n_dev - 1).bit_length()))).astype(jnp.int32)
    owner = jnp.minimum(owner, n_dev - 1)
    # stable sort by owner, then build per-owner padded buckets
    order = jnp.argsort(owner)
    owner_s = owner[order]
    vals_s = vals[order]
    rids_s = rids[order]
    # rank within owner group
    idx = jnp.arange(vals.shape[0])
    group_start = jnp.searchsorted(owner_s, jnp.arange(n_dev))
    rank = idx - group_start[owner_s]
    overflow = jnp.sum(rank >= cap)
    slot = jnp.where(rank < cap, owner_s * cap + rank, n_dev * cap)  # spill slot
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
        check_rep=False,
    )
    return jax.jit(sharded)
