"""Synthetic nanopore-like data generation — the AlignerTester analog.

The reference's AlignerTester (src/AlignerTester.cpp:8-216) generates
overlapping read pairs with a parameterized ins/del/sub error model (its
defaults 3%/3%/4% are for aligner stress tests, include/AlignerTester.h:21-22).
Our defaults model recent-basecaller nanopore (~2.5% total error), the domain
the reference's own benchmarks target (README.md:5, "recent basecallers");
at 10% error the k=23 sketch join mathematically stops finding overlaps
(0.9^23 ~= 0.09 per side), which is why the reference's old-basecaller hs1
ratio collapses (logs/2022/hs1.log: 5.44x vs 11.97x for hs2).
Here the generator is vectorized numpy and also produces whole FASTQ datasets
(random genome -> error-mutated reads) for round-trip tests and benchmarks.
"""

from __future__ import annotations

import gzip

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_genome(length: int, rng: np.random.Generator) -> np.ndarray:
    """ASCII genome of given length."""
    return _BASES[rng.integers(0, 4, size=length)]


def mutate(
    seq: np.ndarray,
    rng: np.random.Generator,
    p_ins: float = 0.008,
    p_del: float = 0.008,
    p_sub: float = 0.009,
) -> np.ndarray:
    """Apply iid ins/del/sub errors to an ASCII sequence (vectorized)."""
    n = len(seq)
    r = rng.random(n)
    is_del = r < p_del
    is_sub = (r >= p_del) & (r < p_del + p_sub)
    is_ins = (r >= p_del + p_sub) & (r < p_del + p_sub + p_ins)
    # substitutions: shift by 1..3 in code space so the base always changes
    sub_vals = _BASES[
        (np.searchsorted(_BASES, seq) + rng.integers(1, 4, size=n)) % 4
    ]
    out_seq = np.where(is_sub, sub_vals, seq)
    # build output with insertions before kept bases, deletions dropped
    emit = (~is_del).astype(np.int64) + is_ins.astype(np.int64)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(emit, out=offs[1:])
    out = np.empty(int(offs[-1]), dtype=np.uint8)
    ins_bases = _BASES[rng.integers(0, 4, size=n)]
    ins_pos = offs[:-1][is_ins]
    out[ins_pos] = ins_bases[is_ins]
    keep = ~is_del
    out[offs[:-1][keep] + is_ins[keep]] = out_seq[keep]
    return out


def revcomp_ascii(seq: np.ndarray) -> np.ndarray:
    comp = np.arange(256, dtype=np.uint8)
    for a, b in ((ord("A"), ord("T")), (ord("C"), ord("G"))):
        comp[a], comp[b] = b, a
    return comp[seq[::-1]]


def make_reads(
    genome: np.ndarray,
    num_reads: int,
    mean_len: int,
    rng: np.random.Generator,
    p_ins: float = 0.008,
    p_del: float = 0.008,
    p_sub: float = 0.009,
    p_revcomp: float = 0.5,
    p_n_base: float = 0.0,
) -> list[bytes]:
    """Sample error-mutated reads from a genome."""
    G = len(genome)
    lens = np.maximum(50, rng.normal(mean_len, mean_len / 4, num_reads).astype(int))
    lens = np.minimum(lens, G)
    starts = rng.integers(0, np.maximum(1, G - lens + 1))
    reads = []
    for i in range(num_reads):
        r = genome[starts[i] : starts[i] + lens[i]].copy()
        r = mutate(r, rng, p_ins, p_del, p_sub)
        if rng.random() < p_revcomp:
            r = revcomp_ascii(r)
        if p_n_base > 0:
            mask = rng.random(len(r)) < p_n_base
            r = np.where(mask, np.uint8(ord("N")), r)
        reads.append(r.tobytes())
    return reads


def write_fastq(path: str, reads: list[bytes], gz: bool | None = None) -> None:
    gz = path.endswith(".gz") if gz is None else gz
    opener = gzip.open if gz else open
    with opener(path, "wb") as f:
        for i, r in enumerate(reads):
            f.write(b"@read%d\n" % i)
            f.write(r)
            f.write(b"\n+\n")
            f.write(b"F" * len(r))
            f.write(b"\n")


def make_dataset(
    path: str,
    genome_len: int = 100_000,
    num_reads: int = 400,
    mean_len: int = 5_000,
    seed: int = 42,
    **kwargs,
) -> list[bytes]:
    rng = np.random.default_rng(seed)
    genome = random_genome(genome_len, rng)
    reads = make_reads(genome, num_reads, mean_len, rng, **kwargs)
    write_fastq(path, reads)
    return reads
