"""The top-level oracle: compress -> decompress -> byte-identical sequences.

The reference's equivalent is util/test_script.sh (compress the test FASTQ,
decompress, cmp against `zcat | sed -n '2~4p'`).
"""

import gzip
import os

import numpy as np
import pytest

from nanospring_tpu.compressor import compress_file
from nanospring_tpu.config import CompressConfig, DecompressConfig
from nanospring_tpu.decompressor import decompress_file
from nanospring_tpu.utils import synth


def _roundtrip(tmp_path, reads, cfg=None, dcfg=None):
    fq = str(tmp_path / "in.fastq")
    synth.write_fastq(fq, reads, gz=False)
    arc = str(tmp_path / "out.nstpu")
    out = str(tmp_path / "out.reads")
    res = compress_file(fq, arc, cfg or CompressConfig(), report=False)
    decompress_file(arc, out, dcfg or DecompressConfig(), report=False)
    with open(out, "rb") as f:
        got = f.read().split(b"\n")[:-1]
    assert len(got) == len(reads), f"read count {len(got)} != {len(reads)}"
    for i, (a, b) in enumerate(zip(reads, got)):
        assert a == b, f"read {i} differs: {a[:50]}... vs {b[:50]}..."
    return res


@pytest.fixture
def lone_cfg():
    return CompressConfig(disable_assembly=True)


def test_roundtrip_lone_only(tmp_path, lone_cfg):
    rng = np.random.default_rng(7)
    genome = synth.random_genome(20_000, rng)
    reads = synth.make_reads(genome, 50, 2_000, rng)
    _roundtrip(tmp_path, reads, cfg=lone_cfg)


def test_roundtrip_lone_with_n_bases(tmp_path, lone_cfg):
    rng = np.random.default_rng(8)
    genome = synth.random_genome(10_000, rng)
    reads = synth.make_reads(genome, 30, 1_000, rng, p_n_base=0.01)
    _roundtrip(tmp_path, reads, cfg=lone_cfg)


def test_roundtrip_gzip_input(tmp_path, lone_cfg):
    rng = np.random.default_rng(9)
    genome = synth.random_genome(5_000, rng)
    reads = synth.make_reads(genome, 20, 800, rng)
    fq = str(tmp_path / "in.fastq.gz")
    synth.write_fastq(fq, reads)
    arc = str(tmp_path / "o.nstpu")
    out = str(tmp_path / "o.reads")
    compress_file(fq, arc, lone_cfg, report=False)
    decompress_file(arc, out, report=False)
    with open(out, "rb") as f:
        got = f.read().split(b"\n")[:-1]
    assert got == reads


def test_roundtrip_empty_and_tiny(tmp_path, lone_cfg):
    # tiny reads below every k-mer threshold must still round-trip
    reads = [b"A", b"ACGT", b"G" * 31, b"T" * 33]
    _roundtrip(tmp_path, reads, cfg=lone_cfg)


def test_roundtrip_full_pipeline(tmp_path):
    pytest.importorskip("nanospring_tpu.pipeline.contigs")
    rng = np.random.default_rng(11)
    genome = synth.random_genome(50_000, rng)
    reads = synth.make_reads(genome, 100, 4_000, rng)
    res = _roundtrip(tmp_path, reads, cfg=CompressConfig())
    assert res["ratio"] > 0


def test_low_mem_store(tmp_path):
    rng = np.random.default_rng(12)
    genome = synth.random_genome(10_000, rng)
    reads = synth.make_reads(genome, 30, 1_000, rng)
    cfg = CompressConfig(disable_assembly=True, low_mem=True, work_dir=str(tmp_path))
    _roundtrip(tmp_path, reads, cfg=cfg)
    # the spill file must be cleaned up after compression
    leftovers = [f for f in os.listdir(tmp_path) if f.endswith(".packed")]
    assert leftovers == [], leftovers


def test_low_mem_full_pipeline(tmp_path):
    """Full assembly engine + low_mem store (the big-input configuration)."""
    rng = np.random.default_rng(13)
    genome = synth.random_genome(40_000, rng)
    reads = synth.make_reads(genome, 80, 3_000, rng)
    cfg = CompressConfig(low_mem=True, work_dir=str(tmp_path),
                         pipeline_workers=1)
    res = _roundtrip(tmp_path, reads, cfg=cfg)
    assert res["ratio"] > 1.0
    leftovers = [f for f in os.listdir(tmp_path) if f.endswith(".packed")]
    assert leftovers == [], leftovers


def test_gzip_input_named_fastq(tmp_path, lone_cfg):
    """A gzipped file without the .gz extension must be detected by magic
    (reference handles gzip transparently, src/ReadData.cpp:95-106)."""
    rng = np.random.default_rng(14)
    genome = synth.random_genome(5_000, rng)
    reads = synth.make_reads(genome, 15, 600, rng)
    gz = str(tmp_path / "in.fastq.gz")
    synth.write_fastq(gz, reads)
    fq = str(tmp_path / "misnamed.fastq")
    os.rename(gz, fq)
    arc = str(tmp_path / "o.nstpu")
    out = str(tmp_path / "o.reads")
    compress_file(fq, arc, lone_cfg, report=False)
    decompress_file(arc, out, report=False)
    with open(out, "rb") as f:
        got = f.read().split(b"\n")[:-1]
    assert got == reads


def test_checks_mode_invariants(tmp_path):
    """cfg.checks validates every accepted edit script against the live
    consensus (the reference's -DCHECKS replay equality)."""
    from nanospring_tpu import compressor
    from nanospring_tpu.config import CompressConfig
    from nanospring_tpu.utils import synth

    fq = str(tmp_path / "r.fastq")
    synth.make_dataset(fq, genome_len=50_000, num_reads=200, mean_len=1500,
                       seed=31, p_n_base=0.001)
    cfg = CompressConfig(pipeline_workers=1, checks=True)
    res = compressor.compress_file(fq, str(tmp_path / "o.nstpu"), cfg,
                                   report=False)
    assert res["ratio"] > 1.0


def test_high_error_regime(tmp_path):
    """hs1-like ~9.6% error: the adaptive re-sketch (k=17, halved slot
    threshold) must keep assembly alive (reference ratio 5.44x at this
    regime, logs/2022/hs1.log)."""
    rng = np.random.default_rng(21)
    genome = synth.random_genome(120_000, rng)
    reads = synth.make_reads(genome, 800, 3_000, rng,
                             p_ins=0.03, p_del=0.03, p_sub=0.036)
    res = _roundtrip(tmp_path, reads, cfg=CompressConfig(pipeline_workers=1))
    assert res["funnel"].contigs > 0, "assembly collapsed at high error"
    assert res["ratio"] > 4.0, res["ratio"]


def test_short_read_regime(tmp_path):
    """new_zymo-like 97-base reads route to the lone path, where the BWT
    codec captures coverage redundancy (reference 3.88x)."""
    rng = np.random.default_rng(22)
    genome = synth.random_genome(60_000, rng)
    reads = synth.make_reads(genome, 8_000, 97, rng)
    res = _roundtrip(tmp_path, reads)
    assert res["ratio"] > 3.9, res["ratio"]


def test_corrupt_archive_detected(tmp_path, lone_cfg):
    """Per-stream CRC32 must turn corruption into a named error (the
    reference's libbsc adler32 role)."""
    rng = np.random.default_rng(23)
    genome = synth.random_genome(8_000, rng)
    reads = synth.make_reads(genome, 20, 800, rng)
    fq = str(tmp_path / "in.fastq")
    synth.write_fastq(fq, reads, gz=False)
    arc = str(tmp_path / "o.nstpu")
    compress_file(fq, arc, lone_cfg, report=False)
    blob = bytearray(open(arc, "rb").read())
    blob[-20] ^= 0xFF  # flip a payload byte near the end
    open(arc, "wb").write(bytes(blob))
    with pytest.raises(Exception) as ei:
        decompress_file(arc, str(tmp_path / "o.reads"), report=False)
    assert "CRC32" in str(ei.value) or "corrupt" in str(ei.value).lower()


def test_low_mem_multi_worker(tmp_path):
    """Worker fan-out with a low-mem store ships the spill path, not the
    packed buffer (two disjoint genomes -> two components -> two workers)."""
    rng = np.random.default_rng(24)
    g1 = synth.random_genome(30_000, rng)
    g2 = synth.random_genome(30_000, rng)
    reads = (synth.make_reads(g1, 50, 2_500, rng)
             + synth.make_reads(g2, 50, 2_500, rng))
    cfg = CompressConfig(low_mem=True, work_dir=str(tmp_path),
                         pipeline_workers=2)
    res = _roundtrip(tmp_path, reads, cfg=cfg)
    assert res["funnel"].contigs >= 2
    leftovers = [f for f in os.listdir(tmp_path) if f.endswith(".packed")]
    assert leftovers == [], leftovers


def test_pathological_inputs(tmp_path):
    """Adversarial shapes the regime benches never hit: thousands of
    byte-identical reads (maximal bucket depth + consensus pile-up), a
    megabase read among 5 kb reads (host ultra-long path), and pure
    homopolymer reads (minimizer degeneracy: every k-mer identical)."""
    rng = np.random.default_rng(31)
    g = synth.random_genome(60_000, rng)
    base = synth.make_reads(g, 40, 5_000, rng)

    # 3,000 identical copies of one read + normal coverage
    reads = base + [base[0]] * 3_000
    _roundtrip(tmp_path, reads)

    # one 1 Mb read spanning a 1.02 Mb genome + ordinary reads
    g2 = synth.random_genome(1_020_000, rng)
    mega = synth.make_reads(g2, 1, 1_000_000, rng)
    small = synth.make_reads(g2, 50, 5_000, rng)
    d2 = tmp_path / "mega"
    d2.mkdir()
    _roundtrip(d2, small + mega)

    # pure homopolymers (every canonical k-mer equal -> degenerate
    # sketches and minimizers) mixed with normal reads
    homo = [bytes([c]) * 4_000 for c in b"ACGT" for _ in range(8)]
    d3 = tmp_path / "homo"
    d3.mkdir()
    _roundtrip(d3, base + homo)
