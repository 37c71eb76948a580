"""Multi-process (multi-host) compression over jax.distributed.

Each process owns a slice of the device mesh and runs the same program:

1. ``jax.distributed.initialize`` wires the processes into one runtime
   (the coordinator is process 0) — collectives ride Gloo on CPU meshes
   and ICI/DCN on TPU pods,
2. every process loads the (shared-filesystem) FASTQ, sketches the read
   rows its devices own (global shard_map), and runs the two all_to_all
   shuffles of the candidate join, expanding only its local shards on the
   host — the distributed replacement for the reference's shared hash
   tables + striped-lock claim table (src/BBHashMap.cpp,
   src/Consensus.cpp:256-277),
3. kept candidate pairs are all-gathered so every process derives the
   same overlap components and the same owner-computes bin assignment;
   process p grows only the bins owned by its local devices (no locks,
   no cross-process coordination during growth),
4. per-process groups are spilled as files (the analog of the reference's
   per-thread ``.tid.<t>`` stream files, src/Consensus.cpp:36-37); after a
   global barrier, process 0 merges them, serializes, and writes the
   archive.

The 2-process CPU test (tests/test_distributed.py) runs this end to end;
on a TPU pod the same entry point runs one process per host.
"""

from __future__ import annotations

import dataclasses
import os
import pickle

import numpy as np

from ..config import CompressConfig
from ..utils.observe import FunnelStats
from .mesh import READS_AXIS


def initialize(coordinator: str, num_processes: int, process_id: int) -> None:
    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def _global_from_local(mesh, local_rows: np.ndarray, global_shape):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(READS_AXIS)), local_rows, global_shape)


def _local_shards(arr) -> list[np.ndarray]:
    return [np.asarray(s.data) for s in arr.addressable_shards]


def compress_distributed(fq_path: str, out_path: str, work_dir: str,
                         cfg: CompressConfig | None = None) -> dict | None:
    """Run the distributed pipeline; returns the result dict on process 0,
    None elsewhere. ``jax.distributed`` must already be initialized."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils as mhu
    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from ..io import read_store
    from ..ops import sketch as sk
    from ..pipeline import contigs as cg
    from . import sharded_join as sj

    cfg = cfg or CompressConfig()
    pid = jax.process_index()
    nproc = jax.process_count()
    devs = jax.devices()
    D = len(devs)
    L = len(jax.local_devices())
    mesh = Mesh(np.asarray(devs), (READS_AXIS,))

    store = read_store.load_fastq(fq_path)
    N = store.num_reads
    cfg = dataclasses.replace(
        cfg,
        seed_window=cfg.effective_seed_window(store.avg_len),
        min_overlap=cfg.effective_min_overlap(store.avg_len),
    )

    # --- sharded sketch over the global mesh -----------------------------
    Lpad = 1 << max(6, (store.max_len - 1).bit_length())
    rows_per_dev = -(-N // D)
    Npad = rows_per_dev * D
    lo = pid * L * rows_per_dev
    hi = min(N, (pid + 1) * L * rows_per_dev)
    my_rids = np.arange(lo, hi, dtype=np.int64)
    codes_l = np.zeros((L * rows_per_dev, Lpad), dtype=np.uint8)
    lens_l = np.zeros(L * rows_per_dev, dtype=np.int32)
    if len(my_rids):
        got, lg = store.get_batch_padded(my_rids, pad_to=Lpad)
        codes_l[: len(my_rids)] = got
        lens_l[: len(my_rids)] = lg
    rids_l = np.full(L * rows_per_dev, 0xFFFFFFFF, dtype=np.uint32)
    rids_l[: len(my_rids)] = my_rids.astype(np.uint32)
    seeds = np.asarray(sk.make_seeds(cfg.num_hashes, cfg.sketch_seed))

    codes_g = _global_from_local(mesh, codes_l, (Npad, Lpad))
    lens_g = _global_from_local(mesh, lens_l, (Npad,))
    rids_g = _global_from_local(mesh, rids_l, (Npad,))
    seeds_g = jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(mesh, P()), seeds, seeds.shape)

    def _sketch(codes, lens, seeds):
        return sk.sketch_batch(codes, lens, seeds, k=cfg.kmer_size)

    sketch_fn = jax.jit(shard_map(
        _sketch, mesh=mesh,
        in_specs=(P(READS_AXIS), P(READS_AXIS), P()),
        out_specs=P(READS_AXIS), check_rep=False,
    ))
    sketches_g = sketch_fn(codes_g, lens_g, seeds_g)

    # --- stage 1: slot shuffle (value-range owners) -----------------------
    slot_cap = max(64, 2 * Npad // D)
    for _ in range(8):
        shuffle = sj.make_slot_shuffle_step(mesh, cfg.num_hashes, slot_cap)
        rv, rr, overflow = shuffle(sketches_g, rids_g)
        if int(overflow) == 0:
            break
        slot_cap *= 2
    else:
        raise RuntimeError("slot shuffle overflow")

    # --- host stage on local shards only ----------------------------------
    local_pairs = []
    for rv_d, rr_d in zip(_local_shards(rv), _local_shards(rr)):
        q, r = _expand_pairs(rv_d.reshape(rv_d.shape[-2], -1)
                             if rv_d.ndim == 3 else rv_d,
                             rr_d.reshape(rr_d.shape[-2], -1)
                             if rr_d.ndim == 3 else rr_d)
        local_pairs.append((q, r))

    # --- stage 2: pair-owner exchange -------------------------------------
    longest = max((len(q) for q, _ in local_pairs), default=0)
    longest_g = int(np.max(mhu.process_allgather(np.array([longest]))))
    p_local = 1 << max(6, int(max(1, longest_g) - 1).bit_length())
    send_q = np.full((L, p_local), -1, dtype=np.int32)
    send_r = np.full((L, p_local), -1, dtype=np.int32)
    for i, (q, r) in enumerate(local_pairs):
        send_q[i, : len(q)] = q
        send_r[i, : len(r)] = r
    sq_g = _global_from_local(mesh, send_q.reshape(-1), (D * p_local,))
    sr_g = _global_from_local(mesh, send_r.reshape(-1), (D * p_local,))
    pair_cap = max(64, 2 * longest_g)
    for _ in range(8):
        exchange = sj.make_pair_exchange_step(mesh, pair_cap)
        rq, rr2, overflow2 = exchange(sq_g, sr_g)
        if int(overflow2) == 0:
            break
        pair_cap *= 2
    else:
        raise RuntimeError("pair exchange overflow")

    # local threshold counting, then a host all-gather of the winners so
    # every process derives identical components/bins
    kq, kr = [], []
    for rq_d, rr_d in zip(_local_shards(rq), _local_shards(rr2)):
        a = rq_d.reshape(-1).astype(np.int64)
        b = rr_d.reshape(-1).astype(np.int64)
        good = a >= 0
        key = a[good] * N + b[good]
        key.sort()
        bnd = np.ones(len(key), dtype=bool)
        bnd[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(bnd)
        counts = np.diff(np.append(starts, len(key)))
        winners = key[starts[counts >= cfg.overlap_sketch_threshold]]
        kq.append(winners // N)
        kr.append(winners % N)
    my_q = np.concatenate(kq) if kq else np.zeros(0, np.int64)
    my_r = np.concatenate(kr) if kr else np.zeros(0, np.int64)
    sizes = mhu.process_allgather(np.array([len(my_q)]))
    cap = int(sizes.max())
    padq = np.full(cap, -1, np.int64)
    padr = np.full(cap, -1, np.int64)
    padq[: len(my_q)] = my_q
    padr[: len(my_r)] = my_r
    allq = mhu.process_allgather(padq).reshape(-1)
    allr = mhu.process_allgather(padr).reshape(-1)
    good = allq >= 0
    pq, pr = allq[good], allr[good]
    keep = pq < pr
    pq, pr = pq[keep], pr[keep]

    # --- components + owner-computes bins (deterministic everywhere) ------
    import scipy.sparse as sp
    from scipy.sparse import csgraph

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
    graph = {"adj_off": adj_off, "dst": dst, "comp_of": comp_of,
             "n_comp": n_comp, "comp_order": comp_order,
             "boundaries": boundaries, "rep": rep_mask}
    eligible = np.flatnonzero(comp_sizes >= 2)
    bins: list[list[int]] = [[] for _ in range(D)]
    loads = np.zeros(D, dtype=np.int64)
    for c in eligible[np.argsort(-comp_sizes[eligible])]:
        b = int(np.argmin(loads))
        bins[b].append(int(c))
        loads[b] += comp_sizes[c]

    # --- grow the bins our devices own -------------------------------------
    stats = FunnelStats()
    my_groups = []
    for d in range(pid * L, (pid + 1) * L):
        if bins[d]:
            my_groups.append(
                cg._grow_components(store, cfg, stats, graph, bins[d]))
    with open(os.path.join(work_dir, f"groups_{pid}.pkl"), "wb") as f:
        pickle.dump((my_groups, stats), f, protocol=pickle.HIGHEST_PROTOCOL)
    mhu.sync_global_devices("nstpu groups spilled")

    if pid != 0:
        return None

    # --- process-0 merge + archive (per-thread file combine analog) --------
    groups = []
    for p in range(nproc):
        with open(os.path.join(work_dir, f"groups_{p}.pkl"), "rb") as f:
            gl, gstats = pickle.load(f)
        groups.extend(gl)
        if p != 0:
            stats.not_claimed += gstats.not_claimed
            stats.aligned_ok += gstats.aligned_ok
    return _merge_and_archive(store, cfg, groups, stats, out_path)


def _expand_pairs(rv: np.ndarray, rr: np.ndarray):
    """Same-value group -> ordered-pair expansion, vectorized (one local
    device shard: rv/rr are (n_slots, bucket))."""
    from ..ops import sketch as sk

    n_slots = rv.shape[0]
    vals = rv.reshape(-1).astype(np.uint64)
    ids = rr.reshape(-1)
    seg = np.repeat(np.arange(n_slots, dtype=np.uint64), rv.shape[-1])
    real = vals != sk.EMPTY_SLOT
    key = (seg[real] << np.uint64(32)) | vals[real]
    ids = ids[real]
    order = np.argsort(key, kind="stable")
    key, ids = key[order], ids[order]
    bnd = np.ones(len(key), dtype=bool)
    bnd[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(bnd)
    sizes = np.diff(np.append(starts, len(key)))
    keepg = (sizes >= 2) & (sizes <= 256)
    gs = starts[keepg].astype(np.int64)
    gz = sizes[keepg].astype(np.int64)
    sq = gz * gz
    total = int(sq.sum())
    if not total:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    excl = np.zeros(len(sq), np.int64)
    np.cumsum(sq[:-1], out=excl[1:])
    within = np.arange(total, dtype=np.int64) - np.repeat(excl, sq)
    base = np.repeat(gs, sq)
    gsz = np.repeat(gz, sq)
    a = ids[base + within // gsz].astype(np.int32)
    b = ids[base + within % gsz].astype(np.int32)
    ne = a != b
    return a[ne], b[ne]


def _merge_and_archive(store, cfg, groups, stats, out_path: str) -> dict:
    from ..io import archive, serialize
    from ..io import streams as st
    from ..io.serialize import ContigBatch

    N = store.num_reads
    member_mask = np.zeros(N, dtype=bool)
    for grp in groups:
        member_mask[grp["ids"]] = True
    lone = np.sort(np.flatnonzero(~member_mask).astype(np.int64))
    groups = [g_ for g_ in groups if len(g_["consensus_list"])]
    batches = []
    if groups:
        batches = [ContigBatch(
            consensus_list=[c for g_ in groups for c in g_["consensus_list"]],
            reads_per_contig=np.concatenate(
                [g_["reads_per_contig"] for g_ in groups]),
            ids=np.concatenate([g_["ids"] for g_ in groups]),
            strand=np.concatenate([g_["strand"] for g_ in groups]),
            start_pos=np.concatenate([g_["es"].start_pos for g_ in groups]),
            head_ins=np.concatenate([g_["es"].head_ins for g_ in groups]),
            tail_ins=np.concatenate([g_["es"].tail_ins for g_ in groups]),
            n_edits=np.concatenate([g_["es"].n_edits for g_ in groups]),
            runs_flat=np.concatenate([g_["es"].runs_flat for g_ in groups]),
            types_flat=np.concatenate([g_["es"].types_flat for g_ in groups]),
            bases_flat=np.concatenate([g_["es"].bases_flat for g_ in groups]),
        )]
    out = st.StreamSet()
    member_ids = []
    reads_per_contig = []
    for cb in batches:
        serialize.serialize_contigs(cb, out)
        member_ids.append(cb.ids)
        reads_per_contig.append(cb.reads_per_contig)
    member_ids = (np.concatenate(member_ids) if member_ids
                  else np.zeros(0, np.int64))
    reads_per_contig = (np.concatenate(reads_per_contig)
                        if reads_per_contig else np.zeros(0, np.int64))
    serialize.serialize_lone(lone, store, out)
    all_ids = np.concatenate([member_ids, lone])
    out.append("id", st.encode_id_stream(all_ids))
    out.append("exc", st.encode_exc_stream(store.exc_read, store.exc_pos,
                                           store.exc_byte))
    meta = {
        "num_reads": store.num_reads,
        "num_lone": int(len(lone)),
        "num_contigs": int(len(reads_per_contig)),
        "reads_per_contig": reads_per_contig.tolist(),
        "total_bases": store.total_bases,
    }
    codec_map = {n: cfg.default_codec for n in st.STREAM_NAMES}
    codec_map["base"] = cfg.base_codec
    codec_map["pos"] = cfg.pos_codec
    sizes = archive.write_archive(out_path, out, meta, codec_map)
    total_out = os.path.getsize(out_path)
    stats.contigs = int(len(reads_per_contig))
    return {
        "num_reads": N,
        "total_bases": store.total_bases,
        "compressed_bytes": total_out,
        "ratio": store.total_bases / max(total_out, 1),
        "stream_sizes": sizes,
        "funnel": stats,
    }


def _main(argv) -> int:
    """Process entry: fq out work_dir nproc pid port (used by the
    multi-process test and as the per-host launch command on a pod)."""
    fq, out, work, nproc, pid, port = argv[:6]
    import jax

    jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))
    initialize(f"127.0.0.1:{port}", int(nproc), int(pid))
    res = compress_distributed(fq, out, work)
    if res is not None:
        print(f"distributed compress ok: ratio {res['ratio']:.2f} "
              f"contigs {res['funnel'].contigs}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(_main(sys.argv[1:]))
