"""Contig building: sketch-join clustering + mosaic consensus growth.

The reference grows one pointer-DAG contig per OpenMP thread, sliding a
window over the consensus and re-indexing it with minimap2 for every
candidate (reference: src/Consensus.cpp:21-340, src/ConsensusGraph.cpp).
This engine is restructured around batch stages and owner-computes claims:

1. **Sketch** every read once (TPU kernel, ops/sketch.py).
2. **Join**: one batched index query finds all overlap-candidate pairs
   (reads sharing >= threshold sketch slots) up front — no per-window
   re-queries.
3. **Cluster + place**: BFS over the pair graph from each unclaimed seed.
   Each accepted member is anchored against its BFS parent's minimizers
   (whose positions are already mapped to consensus coordinates), then
   verified with one banded alignment against the consensus — no index
   is ever rebuilt (the reference rebuilds one per candidate,
   src/ConsensusGraph.cpp:195-217: its #1 structural inefficiency).
4. **Extend**: alignments that run off the consensus ends splice their
   overhang into the consensus (mosaic growth, both directions).

Per-contig work is sequential (as in the reference — that's inherent), and
contigs are independent: the parallel axis for threads/hosts/chips.
"""

from __future__ import annotations

import collections
import dataclasses

import numpy as np

from ..config import CompressConfig
from ..io import packed as pk
from ..io.serialize import ContigBatch
from ..ops import align as al
from ..ops import minimizers as mz
from ..ops import sketch as sk
from ..utils.observe import FunnelStats
from . import candidates


@dataclasses.dataclass
class _Member:
    rid: int
    strand: int            # 0 forward, 1 reverse-complement
    tstart: int            # consensus coords (origin = seed start, may go <0)
    ops: np.ndarray        # uint8 op bytes
    cost: int


def compute_all_sketches(store, cfg: CompressConfig, report: bool = False) -> np.ndarray:
    """Sketch every read on the accelerator, bucketing by length."""
    N = store.num_reads
    seeds = sk.make_seeds(cfg.num_hashes, cfg.sketch_seed)
    out = np.full((N, cfg.num_hashes), sk.EMPTY_SLOT, dtype=np.uint32)
    order = np.argsort(store.lengths, kind="stable")
    # fixed pad buckets limit recompilation: powers of two
    i = 0
    while i < N:
        L0 = int(store.lengths[order[i]])
        if L0 < max(cfg.kmer_size, cfg.min_read_len_for_sketch):
            i += 1
            continue
        pad = 1 << max(8, (L0 - 1).bit_length())
        # take all reads fitting this bucket
        j = i
        while j < N and store.lengths[order[j]] <= pad and j - i < cfg.sketch_batch_reads:
            j += 1
        rids = order[i:j]
        codes, lens = store.get_batch_padded(rids, pad_to=pad)
        s = np.asarray(sk.sketch_batch(codes, lens.astype(np.int32), seeds, k=cfg.kmer_size))
        out[rids] = s
        i = j
    return out


def _orient_codes(codes: np.ndarray, strand: int) -> np.ndarray:
    return pk.revcomp_codes(codes) if strand else codes


class _ContigState:
    """Mutable consensus + placed-member anchor tables for one contig."""

    def __init__(self, seed_rid: int, seed_codes: np.ndarray, cfg: CompressConfig):
        self.cfg = cfg
        self.cons = seed_codes.copy()
        self.lo = 0  # consensus coords of cons[0]
        self.members: list[_Member] = []
        self.total_aligned = 0
        # parent anchor tables: rid -> (hash, tpos, fwdflag)
        self.anchors: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    @property
    def hi(self) -> int:
        return self.lo + len(self.cons)

    def add_seed_member(self, rid: int, codes: np.ndarray) -> None:
        ops = np.full(len(codes), ord("="), dtype=np.uint8)
        self.members.append(_Member(rid, 0, 0, ops, 0))
        h, p, f = mz.minimizers(codes, self.cfg.seed_kmer_size, self.cfg.seed_window)
        self.anchors[rid] = (h, p.astype(np.int64), f)
        self.total_aligned += len(codes)

    def try_add(self, rid: int, parent_rid: int, codes_fwd: np.ndarray,
                stats: FunnelStats) -> bool:
        """Anchor against parent, banded-align against consensus, splice."""
        cfg = self.cfg
        pa_h, pa_t, pa_f = self.anchors[parent_rid]
        r_h, r_p, r_f = mz.minimizers(codes_fwd, cfg.seed_kmer_size, cfg.seed_window)
        if len(r_h) == 0:
            return False
        m = mz.match_anchors(
            pa_h, pa_t, pa_f, r_h, r_p, r_f, len(codes_fwd), cfg.seed_kmer_size,
            max_anchors=cfg.max_chain_iter,
        )
        if m is None:
            return False
        is_rc, d0, votes = m
        codes = _orient_codes(codes_fwd, int(is_rc))
        # d0 is in consensus coords (parent anchor positions are); convert to
        # array coords for the aligner.
        d0_arr = d0 - self.lo
        n, mlen = len(self.cons), len(codes)
        band = cfg.band_width
        # clip the query to the predicted overlap window: overhangs past the
        # consensus ends would walk out of the band as insertion runs, so
        # align only [qlo, qhi) and re-attach the clipped ends as head/tail
        # insertions (which the splice below converts to consensus growth).
        qlo = max(0, -d0_arr - band // 2)
        qhi = min(mlen, n - d0_arr + band // 2)
        if qhi - qlo < cfg.min_overlap:
            return False
        res = al.banded_align_batch(
            self.cons, np.zeros(1, np.int64), np.array([n], np.int64),
            codes[qlo:qhi], np.zeros(1, np.int64), np.array([qhi - qlo], np.int64),
            np.array([d0_arr + qlo], np.int64), band=band,
            max_cost_per_kb=int(cfg.max_edit_frac * 1000),
        )
        if res.cost[0] < 0:
            return False
        stats.aligned_ok += 1
        core_ops = res.ops_flat[: res.ops_len[0]]
        ops = np.concatenate([
            np.full(qlo, ord("i"), dtype=np.uint8),
            core_ops,
            np.full(mlen - qhi, ord("i"), dtype=np.uint8),
        ])
        tstart_arr = int(res.tstart[0])
        tend_arr = int(res.tend[0])

        # splice overhangs into the consensus (mosaic growth)
        head = 0
        while head < len(ops) and ops[head] == ord("i"):
            head += 1
        tail = 0
        while tail < len(ops) and ops[len(ops) - 1 - tail] == ord("i"):
            tail += 1
        if head and tstart_arr == 0:
            self.cons = np.concatenate([codes[:head], self.cons])
            self.lo -= head
            ops[:head] = ord("=")
            tstart_arr = 0
            tend_arr += head
            n = len(self.cons)
        if tail and tend_arr == n and head + tail <= len(ops):
            self.cons = np.concatenate([self.cons, codes[mlen - tail :]])
            ops[len(ops) - tail :] = ord("=")
            tend_arr += tail

        tstart = tstart_arr + self.lo
        self.members.append(_Member(rid, int(is_rc), tstart, ops, int(res.cost[0])))
        self.total_aligned += mlen

        # anchor table for this member: minimizer positions mapped through the
        # alignment into consensus coords (oriented coords -> tpos)
        if is_rc:
            oh, op_, of = mz.minimizers(codes, cfg.seed_kmer_size, cfg.seed_window)
        else:
            oh, op_, of = r_h, r_p, r_f
        q2t = mz.qpos_to_tpos_map(ops, tstart, mlen)
        self.anchors[rid] = (oh, q2t[op_], of)
        return True


def _emit_contig(state: _ContigState, store) -> dict:
    """Pack one finished contig into flat per-member arrays."""
    members = state.members
    M = len(members)
    ops_len = np.array([len(m.ops) for m in members], dtype=np.int64)
    ops_off = np.zeros(M, dtype=np.int64)
    np.cumsum(ops_len[:-1], out=ops_off[1:])
    ops_flat = np.concatenate([m.ops for m in members]) if M else np.zeros(0, np.uint8)
    rids = np.array([m.rid for m in members], dtype=np.int64)
    strands = np.array([m.strand for m in members], dtype=np.uint8)
    tstarts = np.array([m.tstart - state.lo for m in members], dtype=np.int64)

    # oriented query codes for literal extraction
    q_len = store.lengths[rids]
    q_off = np.zeros(M, dtype=np.int64)
    np.cumsum(q_len[:-1], out=q_off[1:])
    qparts = []
    for m in members:
        qparts.append(_orient_codes(store.get_codes(m.rid), m.strand))
    queries_flat = np.concatenate(qparts) if M else np.zeros(0, np.uint8)

    res = al.AlignResult(
        cost=np.zeros(M, np.int32), tstart=tstarts,
        tend=np.zeros(M, np.int64),
        ops_flat=ops_flat, ops_off=ops_off, ops_len=ops_len,
    )
    es = al.ops_to_edit_scripts(res, np.arange(M), queries_flat, q_off, q_len)
    return {
        "consensus": state.cons,
        "ids": rids,
        "strand": strands,
        "es": es,
    }


def build_contigs(
    store, cfg: CompressConfig, stats: FunnelStats, report: bool = True
) -> tuple[list[ContigBatch], np.ndarray]:
    N = store.num_reads
    sketches = compute_all_sketches(store, cfg, report)
    index = candidates.SketchIndex(sketches)

    # one batched query: all overlap-candidate pairs
    pairs_q: list[np.ndarray] = []
    pairs_r: list[np.ndarray] = []
    B = cfg.sketch_batch_reads
    for i in range(0, N, B):
        q, r, _hits = index.query(sketches[i : i + B], cfg.overlap_sketch_threshold)
        keep = (q + i) != r
        pairs_q.append(q[keep] + i)
        pairs_r.append(r[keep])
    pq = np.concatenate(pairs_q) if pairs_q else np.zeros(0, np.int64)
    pr = np.concatenate(pairs_r) if pairs_r else np.zeros(0, np.int64)
    stats.minhash_hits += len(pq)

    # adjacency CSR over both directions
    src = np.concatenate([pq, pr])
    dst = np.concatenate([pr, pq])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    deg = np.bincount(src, minlength=N)
    adj_off = np.zeros(N + 1, dtype=np.int64)
    np.cumsum(deg, out=adj_off[1:])

    claimed = np.zeros(N, dtype=bool)
    contig_dicts: list[dict] = []
    lone: list[int] = []

    min_len = max(cfg.kmer_size, cfg.min_read_len_for_sketch)
    for seed in range(N):
        if claimed[seed] or store.lengths[seed] < min_len:
            continue
        if adj_off[seed + 1] == adj_off[seed]:
            continue  # no candidates: lone unless claimed later
        claimed[seed] = True
        seed_codes = store.get_codes(seed)
        state = _ContigState(seed, seed_codes, cfg)
        state.add_seed_member(seed, seed_codes)
        visited = {seed}
        queue = collections.deque(
            (int(r), seed) for r in dst[adj_off[seed] : adj_off[seed + 1]]
        )
        while queue:
            rid, parent = queue.popleft()
            if claimed[rid] or rid in visited:
                continue
            visited.add(rid)
            stats.not_claimed += 1
            if store.lengths[rid] < min_len:
                continue
            codes_fwd = store.get_codes(rid)
            if state.try_add(rid, parent, codes_fwd, stats):
                claimed[rid] = True
                for r2 in dst[adj_off[rid] : adj_off[rid + 1]]:
                    r2 = int(r2)
                    if not claimed[r2] and r2 not in visited:
                        queue.append((r2, rid))
                if state.total_aligned > cfg.edge_threshold:
                    break
        if len(state.members) > 1:
            contig_dicts.append(_emit_contig(state, store))
        else:
            claimed[seed] = False  # single-read contig -> lone
    lone = np.flatnonzero(~claimed)

    # combine all contigs into one ContigBatch
    if contig_dicts:
        cb = ContigBatch(
            consensus_list=[d["consensus"] for d in contig_dicts],
            reads_per_contig=np.array([len(d["ids"]) for d in contig_dicts], np.int64),
            ids=np.concatenate([d["ids"] for d in contig_dicts]),
            strand=np.concatenate([d["strand"] for d in contig_dicts]),
            start_pos=np.concatenate([d["es"].start_pos for d in contig_dicts]),
            head_ins=np.concatenate([d["es"].head_ins for d in contig_dicts]),
            tail_ins=np.concatenate([d["es"].tail_ins for d in contig_dicts]),
            n_edits=np.concatenate([d["es"].n_edits for d in contig_dicts]),
            runs_flat=np.concatenate([d["es"].runs_flat for d in contig_dicts]),
            types_flat=np.concatenate([d["es"].types_flat for d in contig_dicts]),
            bases_flat=np.concatenate([d["es"].bases_flat for d in contig_dicts]),
        )
        batches = [cb]
    else:
        batches = []
    return batches, lone
