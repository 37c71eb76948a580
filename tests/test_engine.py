"""Native C++ wavefront engine (native/engine.cpp) vs the Python oracle:
both must round-trip losslessly and land in the same ratio neighborhood
(schedules differ — fresh vs one-batch-stale placement — so outputs are not
bit-identical, but assembly quality must match)."""

import os

import numpy as np
import pytest

from nanospring_tpu import compressor, decompressor
from nanospring_tpu.config import CompressConfig
from nanospring_tpu.utils import synth


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    work = tmp_path_factory.mktemp("engine")
    fq = str(work / "r.fastq")
    synth.make_dataset(fq, genome_len=150_000, num_reads=900, mean_len=2000,
                       seed=41, p_n_base=0.001)
    exp = b"".join(l for i, l in enumerate(open(fq, "rb")) if i % 4 == 1)
    return work, fq, exp


def _roundtrip(work, fq, exp, tag, monkey=None):
    import nanospring_tpu.pipeline.contigs as cg

    saved = cg._grow_components_engine
    if monkey is not None:
        cg._grow_components_engine = monkey
    try:
        out = str(work / f"{tag}.nstpu")
        res = compressor.compress_file(fq, out,
                                       CompressConfig(pipeline_workers=1,
                                                      checks=True),
                                       report=False)
        dec = str(work / f"{tag}.reads")
        decompressor.decompress_file(out, dec, report=False)
        assert open(dec, "rb").read() == exp, "round trip not lossless"
        return res["ratio"]
    finally:
        cg._grow_components_engine = saved


def test_native_engine_matches_python_oracle(dataset):
    work, fq, exp = dataset
    r_nat = _roundtrip(work, fq, exp, "nat")
    r_py = _roundtrip(work, fq, exp, "py", monkey=lambda *a, **k: None)
    assert r_nat > 0.90 * r_py, (r_nat, r_py)


def test_native_engine_used_by_default(dataset):
    import nanospring_tpu.pipeline.contigs as cg
    from nanospring_tpu.io import read_store
    from nanospring_tpu.utils.observe import FunnelStats

    work, fq, exp = dataset
    store = read_store.load_fastq(fq)
    cfg = CompressConfig(pipeline_workers=1)
    stats = FunnelStats()
    graph = cg._build_candidate_graph(store, cfg, stats, False)
    eligible = np.flatnonzero(np.diff(graph["boundaries"]) >= 2)
    g = cg._grow_components_engine(store, cfg, stats, graph, eligible.tolist())
    assert g is not None and len(g["ids"]) > 0
