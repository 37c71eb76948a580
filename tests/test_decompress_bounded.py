"""Memory-bounded multi-pass decompression (the --decompression-memory
contract; reference: src/Decompressor.cpp:186-235)."""

import gzip
import os

from nanospring_tpu import compressor, decompressor
from nanospring_tpu.config import CompressConfig, DecompressConfig
from nanospring_tpu.utils import synth


def test_bounded_reorder_matches_inmemory(tmp_path):
    os.chdir(tmp_path)
    synth.make_dataset("r.fastq.gz", genome_len=120_000, num_reads=260,
                       mean_len=2500, seed=3, p_n_base=0.003)
    compressor.compress_file("r.fastq.gz", "o.nstpu", CompressConfig(),
                             report=False)
    exp = b"".join(
        l for i, l in enumerate(gzip.open("r.fastq.gz")) if i % 4 == 1
    )
    decompressor.decompress_file("o.nstpu", "a.reads", DecompressConfig(),
                                 report=False)
    assert open("a.reads", "rb").read() == exp
    # tiny budget forces chunked replay + several reorder passes
    r = decompressor.decompress_file(
        "o.nstpu", "b.reads", DecompressConfig(memory_gb=0.0004), report=False
    )
    assert open("b.reads", "rb").read() == exp
    assert "reorder_passes" in r["stage_s"]
