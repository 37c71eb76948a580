import numpy as np
import pytest

from nanospring_tpu.io import packed as pk
from nanospring_tpu.ops import sketch
from nanospring_tpu.utils import synth


def _pad_batch(seqs, Lpad):
    codes = np.zeros((len(seqs), Lpad), dtype=np.uint8)
    lens = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        c = pk.seq_to_codes(s)
        codes[i, : len(c)] = c
        lens[i] = len(c)
    return codes, lens


def test_sketch_matches_numpy_reference():
    rng = np.random.default_rng(3)
    seqs = ["".join(rng.choice(list("ACGT"), size=n)) for n in [40, 64, 100, 23, 22, 5]]
    codes, lens = _pad_batch(seqs, 128)
    seeds = sketch.make_seeds(8, 123)
    jax_out = np.asarray(sketch.sketch_batch(codes, lens, seeds, k=23))
    np_out = sketch.sketch_batch_np(codes, lens, seeds, k=23)
    np.testing.assert_array_equal(jax_out, np_out)


def test_sketch_short_reads_empty():
    codes, lens = _pad_batch(["ACGT" * 5], 64)  # len 20 < k=23
    seeds = sketch.make_seeds(4, 1)
    out = np.asarray(sketch.sketch_batch(codes, lens, seeds, k=23))
    assert (out == sketch.EMPTY_SLOT).all()


def test_sketch_strand_invariant():
    """Canonical k-mers: a read and its reverse complement sketch identically."""
    rng = np.random.default_rng(4)
    seq = "".join(rng.choice(list("ACGT"), size=200))
    rc = pk.codes_to_seq(pk.revcomp_codes(pk.seq_to_codes(seq)))
    codes, lens = _pad_batch([seq, rc], 256)
    seeds = sketch.make_seeds(16, 7)
    out = np.asarray(sketch.sketch_batch(codes, lens, seeds, k=23))
    np.testing.assert_array_equal(out[0], out[1])


def test_sketch_overlap_detection():
    """Overlapping reads share sketch slots; unrelated reads don't."""
    rng = np.random.default_rng(5)
    genome = synth.random_genome(10_000, rng)
    a = genome[1000:4000].tobytes().decode()
    b = genome[2500:5500].tobytes().decode()  # overlaps a by 1500
    other = synth.random_genome(3000, rng).tobytes().decode()
    codes, lens = _pad_batch([a, b, other], 4096)
    seeds = sketch.make_seeds(60, 99)
    out = np.asarray(sketch.sketch_batch(codes, lens, seeds, k=23))
    overlap_hits = int((out[0] == out[1]).sum())
    random_hits = int((out[0] == out[2]).sum())
    assert overlap_hits >= 6, f"expected >=6 shared slots, got {overlap_hits}"
    assert random_hits < 6, f"unrelated reads shared {random_hits} slots"


def test_native_sketch_bit_identical():
    """native/sketch.cpp must match the JAX kernel exactly — the probe's
    backend choice must never change the candidate graph."""
    import ctypes

    from nanospring_tpu import native
    from nanospring_tpu.io.read_store import ReadStore
    from nanospring_tpu.pipeline.contigs import _sketch_native_into

    lib = native.get_lib()
    rng = np.random.default_rng(11)
    seqs = ["".join(rng.choice(list("ACGT"), size=n))
            for n in [40, 64, 513, 23, 22, 5, 1000]]
    packed_parts, offsets, lengths = [], [], []
    off = 0
    for s in seqs:
        c = pk.seq_to_codes(s)
        p = pk.pack_codes(c)
        packed_parts.append(p)
        offsets.append(off)
        off += len(p)
        lengths.append(len(c))
    store = ReadStore(np.concatenate(packed_parts),
                      np.array(offsets, np.int64),
                      np.array(lengths, np.int64),
                      np.zeros(0, np.int64), np.zeros(0, np.int64),
                      np.zeros(0, np.uint8))
    seeds = sketch.make_seeds(60, 123)
    out = np.full((len(seqs), 60), sketch.EMPTY_SLOT, dtype=np.uint32)
    _sketch_native_into(lib, store, np.arange(len(seqs), dtype=np.int64),
                        seeds, 23, 23, out)
    codes, lens = _pad_batch(seqs, 1024)
    jax_out = np.asarray(sketch.sketch_batch(codes, lens, seeds, k=23))
    np.testing.assert_array_equal(out, jax_out)
