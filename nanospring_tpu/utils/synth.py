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
    """ASCII genome of given length (uniform iid — the idealized model)."""
    return _BASES[rng.integers(0, 4, size=length)]


def realistic_genome(
    length: int,
    rng: np.random.Generator,
    p_hp: float = 0.12,
    repeat_frac: float = 0.3,
    repeat_len: tuple[int, int] = (2_000, 20_000),
    repeat_ident: tuple[float, float] = (0.85, 0.98),
) -> np.ndarray:
    """Repeat-bearing, homopolymer-enriched genome.

    A uniform iid genome is repeat-free and has geometric run length 4/3 —
    both unrealistically easy for a MinHash/alignment pipeline (the
    reference's parameters were tuned against real genomes; its measured
    ratios span 3.88x-22.8x, logs/2022/). Two corrections:
    - homopolymer extension: each base repeats its predecessor with extra
      probability ``p_hp`` (run lengths grow toward nanopore-relevant ones);
    - segmental repeats: ``repeat_frac`` of the genome is overwritten with
      copies of other segments at 85-98%% identity, the regime where sketch
      collisions recruit wrong-locus candidates.
    """
    codes = rng.integers(0, 4, size=length)
    same = rng.random(length) < p_hp
    same[0] = False
    idx = np.arange(length)
    anchor = np.where(~same, idx, 0)
    np.maximum.accumulate(anchor, out=anchor)
    g = _BASES[codes[anchor]]
    if length >= 4 * repeat_len[0]:
        target = int(length * repeat_frac)
        placed = 0
        while placed < target:
            L = int(rng.integers(repeat_len[0],
                                 min(repeat_len[1], length // 4) + 1))
            src = int(rng.integers(0, length - L))
            dst = int(rng.integers(0, length - L))
            ident = float(rng.uniform(*repeat_ident))
            seg = g[src:src + L].copy()
            mut = rng.random(L) < (1.0 - ident)
            seg[mut] = _BASES[rng.integers(0, 4, size=int(mut.sum()))]
            g[dst:dst + L] = seg
            placed += L
    return g


def mutate(
    seq: np.ndarray,
    rng: np.random.Generator,
    p_ins: float = 0.008,
    p_del: float = 0.008,
    p_sub: float = 0.009,
    hp_bias: float = 0.0,
) -> np.ndarray:
    """Apply ins/del/sub errors to an ASCII sequence (vectorized).

    ``hp_bias`` > 0 concentrates the indels in homopolymer runs (nanopore's
    dominant error mode: run-length miscalls): positions whose base equals
    the previous base take ``1 + hp_bias`` times the indel rate, with the
    off-run rate lowered so the sequence-wide expected rate stays at
    p_ins/p_del."""
    n = len(seq)
    r = rng.random(n)
    if hp_bias > 0.0 and n > 1:
        in_run = np.empty(n, dtype=bool)
        in_run[0] = False
        np.equal(seq[1:], seq[:-1], out=in_run[1:])
        frac = float(in_run.mean())
        scale_on = (1.0 + hp_bias) / (1.0 + hp_bias * frac)
        scale_off = 1.0 / (1.0 + hp_bias * frac)
        ind_scale = np.where(in_run, scale_on, scale_off)
    else:
        ind_scale = np.ones(n)
    p_del_v = p_del * ind_scale
    p_ins_v = p_ins * ind_scale
    is_del = r < p_del_v
    is_sub = (r >= p_del_v) & (r < p_del_v + p_sub)
    is_ins = (r >= p_del_v + p_sub) & (r < p_del_v + p_sub + p_ins_v)
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
    hp_bias: float = 0.0,
    length_dist: str = "normal",
) -> list[bytes]:
    """Sample error-mutated reads from a genome."""
    G = len(genome)
    if length_dist == "lognormal":
        # nanopore length distributions are heavy-tailed; sigma 0.5 gives
        # a realistic spread with the requested mean
        sigma = 0.5
        mu = np.log(mean_len) - sigma * sigma / 2.0
        lens = rng.lognormal(mu, sigma, num_reads).astype(int)
        lens = np.maximum(50, lens)
    else:
        lens = np.maximum(
            50, rng.normal(mean_len, mean_len / 4, num_reads).astype(int))
    lens = np.minimum(lens, G)
    starts = rng.integers(0, np.maximum(1, G - lens + 1))
    reads = []
    for i in range(num_reads):
        r = genome[starts[i] : starts[i] + lens[i]].copy()
        r = mutate(r, rng, p_ins, p_del, p_sub, hp_bias=hp_bias)
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
    realistic: bool = False,
    **kwargs,
) -> list[bytes]:
    """Whole synthetic FASTQ dataset.

    ``realistic=True`` switches to the hardened model the benchmarks use:
    repeat-bearing homopolymer-enriched genome, homopolymer-biased indels
    (hp_bias=4), lognormal read lengths — closer to the data the reference
    was tuned on, so ratio numbers stop flattering the framework."""
    rng = np.random.default_rng(seed)
    if realistic:
        genome = realistic_genome(genome_len, rng)
        kwargs.setdefault("hp_bias", 4.0)
        kwargs.setdefault("length_dist", "lognormal")
    else:
        genome = random_genome(genome_len, rng)
    reads = make_reads(genome, num_reads, mean_len, rng, **kwargs)
    write_fastq(path, reads)
    return reads
