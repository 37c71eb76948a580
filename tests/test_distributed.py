"""Real multi-process compression over jax.distributed (2 CPU processes x
4 virtual devices = one 8-device global mesh, collectives over Gloo). The
archive written by process 0 must decompress byte-identically."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from nanospring_tpu.decompressor import decompress_file
from nanospring_tpu.utils import synth


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_distributed_compress(tmp_path):
    rng = np.random.default_rng(55)
    reads = []
    for _ in range(3):
        g = synth.random_genome(15_000, rng)
        reads += synth.make_reads(g, 40, 1_500, rng)
    fq = str(tmp_path / "r.fastq")
    synth.write_fastq(fq, reads, gz=False)
    arc = str(tmp_path / "r.nstpu")
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        PYTHONPATH=repo,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "nanospring_tpu.parallel.distributed",
             fq, arc, str(tmp_path), "2", str(pid), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=500)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    assert "distributed compress ok" in outs[0] or \
        "distributed compress ok" in outs[1], outs

    out = str(tmp_path / "r.reads")
    decompress_file(arc, out, report=False)
    with open(out, "rb") as f:
        got = f.read().splitlines()
    assert got == reads, "distributed archive not byte-identical"
