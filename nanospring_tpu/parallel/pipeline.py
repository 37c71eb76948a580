"""Mesh-driven compression: the full pipeline over a jax.sharding.Mesh.

This is the multi-chip/multi-host layout SURVEY.md §5.8 calls for in place
of the reference's shared-memory OpenMP + striped-lock claim table
(src/Consensus.cpp:256-277,444-468):

1. reads are sharded over the ``reads`` mesh axis; every device sketches
   its shard (ops/sketch.py via shard_map),
2. overlap candidates come from the two-stage all_to_all hash join
   (parallel/sharded_join.py) — the collectives ride ICI on a real slice,
3. overlap components are the owner-computes partition: each device (host)
   grows the contigs of the component bins it owns, with zero locks,
4. funnel stats merge with one psum over the mesh; per-owner contig
   metadata merges with an all_gather,
5. the host-0 role serializes and writes the archive.

On one process with N devices (the driver's dry-run and the CI check) the
"per-host" work of step 3 runs bin-by-bin in this process; on a multi-host
pod each process runs only the bins its devices own (same partition,
``jax.distributed`` supplies the global mesh — see parallel/distributed.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..config import CompressConfig
from ..utils.observe import FunnelStats
from . import sharded_join as sj
from .mesh import READS_AXIS, make_mesh, reads_sharding, replicated


def _sharded_sketches(mesh, store, cfg: CompressConfig) -> np.ndarray:
    """Sketch every read on its owning device (shard_map over reads)."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops import sketch as sk

    n_dev = mesh.devices.size
    N = store.num_reads
    Lpad = 1 << max(6, (store.max_len - 1).bit_length())
    Npad = -(-N // n_dev) * n_dev
    codes = np.zeros((Npad, Lpad), dtype=np.uint8)
    lens = np.zeros(Npad, dtype=np.int32)
    got, lg = store.get_batch_padded(np.arange(N), pad_to=Lpad)
    codes[:N] = got
    lens[:N] = lg
    seeds = np.asarray(sk.make_seeds(cfg.num_hashes, cfg.sketch_seed))

    def step(codes, lens, seeds):
        return sk.sketch_batch(codes, lens, seeds, k=cfg.kmer_size)

    fn = jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P(READS_AXIS), P(READS_AXIS), P()),
        out_specs=P(READS_AXIS), check_vma=False,
    ))
    rs = reads_sharding(mesh)
    rep = replicated(mesh)
    out = fn(jax.device_put(codes, rs), jax.device_put(lens, rs),
             jax.device_put(seeds, rep))
    return np.asarray(out)[:N]


def _psum_stats(mesh, per_dev: np.ndarray) -> np.ndarray:
    """Merge per-device funnel counters with one psum over the mesh
    (the reference reduces CountStats across OpenMP threads,
    src/Consensus.cpp:154-164)."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    fn = jax.jit(shard_map(
        lambda x: jax.lax.psum(x, READS_AXIS), mesh=mesh,
        in_specs=P(READS_AXIS), out_specs=P(), check_vma=False,
    ))
    out = fn(jax.device_put(per_dev.astype(np.int32),
                            reads_sharding(mesh)))
    return np.asarray(out).reshape(-1, per_dev.shape[1])[0]


def _gather_meta(mesh, per_dev: np.ndarray) -> np.ndarray:
    """all_gather of per-owner contig metadata (counts) over the mesh."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    fn = jax.jit(shard_map(
        lambda x: jax.lax.all_gather(x, READS_AXIS, axis=0, tiled=True),
        mesh=mesh, in_specs=P(READS_AXIS), out_specs=P(), check_vma=False,
    ))
    out = fn(jax.device_put(per_dev.astype(np.int32),
                            reads_sharding(mesh)))
    return np.asarray(out)


def compress_mesh(store, out_path: str, cfg: CompressConfig, mesh=None,
                  report: bool = False) -> dict:
    """Compress ``store`` with the pipeline laid out over the mesh."""
    import scipy.sparse as sp
    from scipy.sparse import csgraph

    from ..pipeline import contigs as cg

    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    N = store.num_reads
    cfg = dataclasses.replace(
        cfg,
        seed_window=cfg.effective_seed_window(store.avg_len),
        min_overlap=cfg.effective_min_overlap(store.avg_len),
    )
    stats = FunnelStats()

    # 1-2: sharded sketch + distributed join
    sketches = _sharded_sketches(mesh, store, cfg)
    pq, pr, _cnt = sj.sharded_candidate_pairs(
        mesh, sketches, cfg.overlap_sketch_threshold)
    # the join returns both directions of each unordered pair; keep one
    # (the adjacency build below re-mirrors, as in pipeline/contigs.py)
    keep = pq < pr
    pq = pq[keep].astype(np.int64)
    pr = pr[keep].astype(np.int64)
    stats.minhash_hits += len(pq)

    # adjacency + components (host bookkeeping; the arrays are tiny
    # relative to the reads and this matches pipeline/contigs.py exactly)
    src = np.concatenate([pq, pr])
    dst = np.concatenate([pr, pq])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    deg = np.bincount(src, minlength=N)
    adj_off = np.zeros(N + 1, dtype=np.int64)
    np.cumsum(deg, out=adj_off[1:])
    g = sp.csr_matrix((np.ones(len(src), np.int8), (src, dst)), shape=(N, N))
    n_comp, comp_of = csgraph.connected_components(g, directed=False)
    comp_sizes = np.bincount(comp_of, minlength=n_comp)
    comp_order = np.argsort(comp_of, kind="stable")
    boundaries = np.zeros(n_comp + 1, dtype=np.int64)
    np.cumsum(comp_sizes, out=boundaries[1:])
    rep_mask = cg.repetitive_screen(store, cfg)
    stats.repetitive = int(rep_mask.sum())
    graph = {"adj_off": adj_off, "dst": dst, "comp_of": comp_of,
             "n_comp": n_comp, "comp_order": comp_order,
             "boundaries": boundaries, "rep": rep_mask}

    # 3: owner-computes bins, one per device (greedy LPT) — each bin is a
    # "host" worth of contig growth
    eligible = np.flatnonzero(comp_sizes >= 2)
    bins: list[list[int]] = [[] for _ in range(n_dev)]
    loads = np.zeros(n_dev, dtype=np.int64)
    for c in eligible[np.argsort(-comp_sizes[eligible])]:
        b = int(np.argmin(loads))
        bins[b].append(int(c))
        loads[b] += comp_sizes[c]
    groups = []
    per_dev_stats = np.zeros((n_dev, 4), dtype=np.int64)
    per_dev_meta = np.zeros((n_dev, 3), dtype=np.int64)
    for d, b in enumerate(bins):
        if not b:
            continue
        dstats = FunnelStats()
        grp = cg._grow_components(store, cfg, dstats, graph, b)
        groups.append(grp)
        per_dev_stats[d] = (dstats.not_claimed, dstats.aligned_ok,
                            0, 0)
        per_dev_meta[d] = (len(grp["consensus_list"]), len(grp["ids"]),
                           sum(len(c) for c in grp["consensus_list"]))

    # 4: collective merges (psum'd funnel, gathered metadata)
    merged = _psum_stats(mesh, per_dev_stats)
    stats.not_claimed += int(merged[0])
    stats.aligned_ok += int(merged[1])
    gathered_meta = _gather_meta(mesh, per_dev_meta)
    stats.contigs = int(gathered_meta[:, 0].sum())

    # 5: serialize + archive (host-0 role; shared with the multi-process
    # driver in parallel/distributed.py)
    from .distributed import _merge_and_archive

    res = _merge_and_archive(store, cfg, groups, stats, out_path)
    res["n_devices"] = n_dev
    res["pairs"] = int(len(pq))
    res["gathered_meta"] = gathered_meta.tolist()
    return res
