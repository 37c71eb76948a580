"""Overlap-candidate index: sort-join over sketch values.

Replaces the reference's 60 BooPHF minimal-perfect-hash tables + CSR read-id
buckets (reference: src/BBHashMap.cpp:10-120, include/BooPHF.h). A sorted
(value -> read ids) array per hash slot gives the same query semantics
(collect reads matching any slot, keep those with >= threshold matching
slots, src/ReadFilter.cpp:65-97) with:

- vectorized batch queries (np.searchsorted over whole window batches),
- a per-bucket size cap standing in for the repetitive-k-mer blowup the
  reference controls via its repetitive-read screen,
- a layout that shards naturally: sort-join is also the multi-host story
  (each host owns a hash-space range; see parallel/sharded_join.py).
"""

from __future__ import annotations

import numpy as np

from ..ops.sketch import EMPTY_SLOT

# last join's bucket-cap drop counters (ns_join_stats): the reference keeps
# every match (src/ReadFilter.cpp:65-83), so our repetitive-k-mer cap must
# be visible — surfaced in FunnelStats and the bench JSON.
JOIN_STATS: dict = {"dropped_buckets": 0, "dropped_entries": 0,
                    "capped_reads": 0}


def reset_join_stats() -> None:
    """Zero the drop counters at the start of a candidate-graph build.
    Counters ACCUMULATE across the joins of one build (the high-error
    adaptive re-join must not overwrite the first join's drops) but must
    not leak between compressions in one process, or from a native join
    into a later fallback-join run."""
    JOIN_STATS.update(dropped_buckets=0, dropped_entries=0, capped_reads=0)


def all_pairs_native(sketches: np.ndarray, threshold: int,
                     max_bucket: int = 256):
    """All overlap-candidate pairs (q != r), sorted by (q, r), via the C++
    owner-computes join (native/join.cpp). Returns (q, r, counts) or None
    when the native lib is unavailable. Matches SketchIndex.query over all
    reads with self-pairs removed (tested in tests/test_sketch.py)."""
    try:
        import ctypes

        from .. import native

        lib = native.get_lib()
    except Exception:
        return None
    N, n = sketches.shape
    sk = np.ascontiguousarray(sketches, dtype=np.uint32)
    total = ctypes.c_int64()
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    h = lib.ns_join_run(
        sk.ctypes.data_as(u32p), ctypes.c_int64(N), ctypes.c_int32(n),
        ctypes.c_int32(threshold), ctypes.c_int32(max_bucket),
        ctypes.byref(total),
    )
    try:
        q = np.empty(total.value, np.int64)
        r = np.empty(total.value, np.int64)
        cnt = np.empty(total.value, np.int64)
        lib.ns_join_fetch(
            ctypes.c_void_p(h), q.ctypes.data_as(i64p),
            r.ctypes.data_as(i64p), cnt.ctypes.data_as(i64p),
        )
        st3 = np.zeros(3, np.int64)
        lib.ns_join_stats(ctypes.c_void_p(h), st3.ctypes.data_as(i64p))
        JOIN_STATS["dropped_buckets"] += int(st3[0])
        JOIN_STATS["dropped_entries"] += int(st3[1])
        JOIN_STATS["capped_reads"] += int(st3[2])
    finally:
        lib.ns_join_free(ctypes.c_void_p(h))
    return q, r, cnt


class SketchIndex:
    def __init__(self, sketches: np.ndarray, max_bucket: int = 256):
        """sketches: (N, n) uint32; EMPTY_SLOT rows (short reads) never match."""
        N, n = sketches.shape
        self.num_reads = N
        self.num_slots = n
        self.max_bucket = max_bucket
        self.sorted_vals = np.empty((n, N), dtype=np.uint32)
        self.sorted_ids = np.empty((n, N), dtype=np.uint32)
        for j in range(n):
            order = np.argsort(sketches[:, j], kind="stable")
            self.sorted_vals[j] = sketches[order, j]
            self.sorted_ids[j] = order

    def query(
        self,
        qsketches: np.ndarray,   # (Q, n) uint32
        threshold: int,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (query_idx, read_id, slot_hits) for pairs with
        slot_hits >= threshold. A query slot equal to EMPTY_SLOT is skipped.
        Buckets larger than max_bucket are skipped (repetitive k-mers).
        """
        Q, n = qsketches.shape
        assert n == self.num_slots
        cand_q: list[np.ndarray] = []
        cand_r: list[np.ndarray] = []
        for j in range(n):
            vals = qsketches[:, j]
            lo = np.searchsorted(self.sorted_vals[j], vals, side="left")
            hi = np.searchsorted(self.sorted_vals[j], vals, side="right")
            sizes = hi - lo
            sizes[vals == EMPTY_SLOT] = 0
            sizes[sizes > self.max_bucket] = 0
            total = int(sizes.sum())
            if total == 0:
                continue
            csum = np.zeros(len(sizes), dtype=np.int64)
            np.cumsum(sizes[:-1], out=csum[1:])
            within = np.arange(total, dtype=np.int64) - np.repeat(csum, sizes)
            idx = np.repeat(lo, sizes) + within
            cand_r.append(self.sorted_ids[j][idx])
            cand_q.append(np.repeat(np.arange(Q, dtype=np.int64), sizes))
        if not cand_q:
            z = np.zeros(0, dtype=np.int64)
            return z, z, z
        q = np.concatenate(cand_q)
        r = np.concatenate(cand_r).astype(np.int64)
        key = q * np.int64(self.num_reads) + r
        key.sort()
        # run-length encode sorted keys
        boundary = np.empty(len(key), dtype=bool)
        boundary[0] = True
        np.not_equal(key[1:], key[:-1], out=boundary[1:])
        starts = np.flatnonzero(boundary)
        counts = np.diff(np.append(starts, len(key)))
        keep = counts >= threshold
        uk = key[starts[keep]]
        return uk // self.num_reads, uk % self.num_reads, counts[keep]
