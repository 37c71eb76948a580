"""Vectorized serialization of contig encodings into the archive streams.

The reference writes these streams read-at-a-time inside the consensus loop
(reference: src/ConsensusGraph.cpp:984-1178 writeReads/writeRead). Here the
pipeline hands over flat arrays for a whole batch of contigs and every stream
is produced with numpy scatter/repeat ops — no per-read Python loop.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import packed as pk
from . import streams as st


@dataclasses.dataclass
class ContigBatch:
    """Flat encoding of a batch of contigs and their member reads.

    Member arrays are contig-major: all reads of contig 0, then contig 1, ...
    ``runs_flat`` holds, per member read, its E+1 unchanged-run lengths;
    ``types_flat`` its E edit tokens (ASCII 'i'/'d'/'s'); ``bases_flat`` its
    literal bases in replay order (head inserts, script bases, tail inserts).
    """

    consensus_list: list[np.ndarray]      # 2-bit codes per contig
    reads_per_contig: np.ndarray          # int64 (C,)
    ids: np.ndarray                       # int64 (M,)
    strand: np.ndarray                    # uint8 (M,) 0='n' 1='c'
    start_pos: np.ndarray                 # int64 (M,)
    head_ins: np.ndarray                  # int64 (M,)
    tail_ins: np.ndarray                  # int64 (M,)
    n_edits: np.ndarray                   # int64 (M,)
    runs_flat: np.ndarray                 # int64 (sum E+1,)
    types_flat: np.ndarray                # uint8 (sum E,)
    bases_flat: np.ndarray                # uint8 ASCII (sum lit,)

    @staticmethod
    def empty() -> "ContigBatch":
        z = lambda dt: np.zeros(0, dtype=dt)
        return ContigBatch([], z(np.int64), z(np.int64), z(np.uint8), z(np.int64),
                           z(np.int64), z(np.int64), z(np.int64), z(np.int64),
                           z(np.uint8), z(np.uint8))

    @property
    def num_members(self) -> int:
        return int(self.ids.shape[0])


def _interleave_pos_values(cb: ContigBatch) -> np.ndarray:
    """Per read: [start, head, run_0..run_E, tail] -> one flat value array."""
    M = cb.num_members
    E = cb.n_edits
    per_read = E + 4
    offs = np.zeros(M + 1, dtype=np.int64)
    np.cumsum(per_read, out=offs[1:])
    vals = np.zeros(int(offs[-1]), dtype=np.uint64)
    vals[offs[:-1]] = cb.start_pos.astype(np.uint64)
    vals[offs[:-1] + 1] = cb.head_ins.astype(np.uint64)
    vals[offs[:-1] + per_read - 1] = cb.tail_ins.astype(np.uint64)
    # runs: read r's E_r+1 runs land at offs[r]+2 ...
    nruns = E + 1
    run_starts = np.zeros(M + 1, dtype=np.int64)
    np.cumsum(nruns, out=run_starts[1:])
    within = np.arange(int(run_starts[-1]), dtype=np.int64) - np.repeat(
        run_starts[:-1], nruns
    )
    tgt = np.repeat(offs[:-1] + 2, nruns) + within
    vals[tgt] = cb.runs_flat.astype(np.uint64)
    return vals


def _with_terminators(
    flat: np.ndarray, counts: np.ndarray, term: int
) -> np.ndarray:
    """Insert a terminator byte after each group of `counts` items."""
    n_groups = len(counts)
    total = int(counts.sum()) + n_groups
    out = np.full(total, term, dtype=np.uint8)
    offs = np.zeros(n_groups + 1, dtype=np.int64)
    np.cumsum(counts + 1, out=offs[1:])
    within = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]) if n_groups else np.zeros(0, np.int64),
        counts,
    )
    tgt = np.repeat(offs[:-1], counts) + within
    out[tgt] = flat
    return out


def serialize_contigs(cb: ContigBatch, out: st.StreamSet) -> None:
    """Append a contig batch to the genome/pos/type/base/complement streams."""
    # genome: consensus strings, newline-separated
    for cons in cb.consensus_list:
        out.append("genome", pk.decode_to_ascii(cons))
        out.append("genome", b"\n")
    if cb.num_members == 0:
        return
    # pos
    out.append("pos", st.encode_varints(_interleave_pos_values(cb)))
    # type: per-read tokens + '\n'
    out.append("type", _with_terminators(cb.types_flat, cb.n_edits, ord("\n")))
    # base
    out.append("base", cb.bases_flat)
    # complement: 'n'/'c' per member, '\n' per contig
    strand_chars = np.where(cb.strand == 1, np.uint8(ord("c")), np.uint8(ord("n")))
    out.append(
        "complement", _with_terminators(strand_chars, cb.reads_per_contig, ord("\n"))
    )


def serialize_lone(
    lone_ids: np.ndarray, store, out: st.StreamSet, chunk: int = 65536
) -> None:
    """Write lone reads (sequence per line) in id order."""
    lone_ids = np.ascontiguousarray(lone_ids, dtype=np.int64)
    packed = getattr(store, "packed", None)
    if packed is not None and len(lone_ids):
        # native fast path: 2-bit -> ASCII lines straight off the packed
        # store (the python path below materializes a padded matrix +
        # boolean mask; measured ~65 MB/s vs memory-speed here)
        try:
            import ctypes

            from .. import native

            lib = native.get_lib()
            if not packed.flags["C_CONTIGUOUS"]:
                packed = np.ascontiguousarray(packed)
            total = int(store.lengths[lone_ids].sum()) + len(lone_ids)
            buf = np.empty(total, dtype=np.uint8)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i64p = ctypes.POINTER(ctypes.c_int64)
            n = lib.ns_emit_lone(
                packed.ctypes.data_as(u8p),
                store.offsets.ctypes.data_as(i64p),
                store.lengths.ctypes.data_as(i64p),
                lone_ids.ctypes.data_as(i64p),
                ctypes.c_int64(len(lone_ids)),
                buf.ctypes.data_as(u8p))
            assert n == total
            out.append("lone", buf)
            return
        except Exception:
            pass
    for i in range(0, len(lone_ids), chunk):
        ids = lone_ids[i : i + chunk]
        lens = store.lengths[ids]
        total = int(lens.sum()) + len(ids)
        buf = np.full(total, ord("\n"), dtype=np.uint8)
        offs = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(lens + 1, out=offs[1:])
        codes, _ = store.get_batch_padded(ids)
        Lpad = codes.shape[1]
        mask = np.arange(Lpad)[None, :] < lens[:, None]
        flat_ascii = pk.decode_to_ascii(codes[mask])
        within = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(ids) else np.zeros(0, np.int64),
            lens,
        )
        buf[np.repeat(offs[:-1], lens) + within] = flat_ascii
        out.append("lone", buf)
