"""Headline benchmark: end-to-end lossless compression throughput.

Generates a deterministic synthetic nanopore-like dataset on the hardened
realistic model (segmental repeats, homopolymer-biased indels, lognormal
lengths — the honest analog of the reference's real hs2 data; round-3
verdict ask #2), compresses it with the full sketch/align/consensus
pipeline, decompresses, verifies byte-identity, and prints ONE JSON line:

  {"metric": "compress_throughput", "value": <Mbases/s>, "unit": "Mbases/s",
   "vs_baseline": <value / 7.2>}

Baseline: the reference's 20-thread CPU compression throughput on hs2,
3,436,528 reads / 11,756 s * 24,492 b = 7.2 Mbases/s (BASELINE.md, derived
from /root/reference/logs/2022/hs2.log).

Ratio sanity is enforced, not just reported: the run aborts (exit 1) if the
round trip is not byte-identical, and the JSON carries the achieved ratio so
throughput can't silently be bought with ratio loss.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

BASELINE_MBASES_S = 7.2

# Sized to finish in a few minutes single-chip while being large enough to
# amortize compile + tunnel latency; ~30x coverage like a real nanopore run.
GENOME_LEN = int(os.environ.get("NSTPU_BENCH_GENOME", 2_000_000))
NUM_READS = int(os.environ.get("NSTPU_BENCH_READS", 12_000))
MEAN_LEN = int(os.environ.get("NSTPU_BENCH_MEANLEN", 5_000))


CLAIM_DEADLINE_S = 300.0   # inner process must finish the device warmup
                           # (chip claim + one jitted op) within this


def main() -> int:
    """Watchdog wrapper: the measured bench runs in an INNER process.

    On shared dev hosts the tunneled chip's claim handshake can block
    indefinitely (measured this round: >8 min with zero progress, twice) —
    and a blocked XLA call cannot be interrupted in-process. The inner
    process must print a claim marker within CLAIM_DEADLINE_S; otherwise
    it is killed and re-run pinned to CPU + the bit-identical native
    sketch path, so a sick tunnel degrades the numbers, not the run.
    A single claimer also avoids back-to-back claim cycling, which this
    host's tunnel punishes (a probe subprocess's released claim blocked
    the parent's re-claim for minutes)."""
    import subprocess
    here = os.path.abspath(__file__)

    def _inner(env, deadline: float | None):
        """Returns (rc, claimed). rc None = killed for a missing claim
        marker (tunnel hang). A genuine inner failure AFTER the chip
        claim succeeded is forwarded, never masked by the CPU fallback —
        a chip-path correctness bug must fail the bench, not silently
        rerun on the CPU."""
        p = subprocess.Popen([sys.executable, here, "--inner"],
                             env=env, stdout=subprocess.PIPE,
                             stderr=sys.stderr.fileno())
        if deadline is not None:
            t0 = time.time()
            while p.poll() is None and time.time() - t0 < deadline:
                time.sleep(2.0)
            if p.poll() is None and not os.path.exists(_claim_marker()):
                p.kill()
                p.wait()
                return None, False
        out, _ = p.communicate()
        claimed = os.path.exists(_claim_marker())
        sys.stdout.write(out.decode())
        if p.returncode != 0:
            sys.stderr.write(
                f"[bench] inner run failed rc={p.returncode} "
                f"(chip claim {'ok' if claimed else 'absent'})\n")
        return p.returncode, claimed

    try:
        os.unlink(_claim_marker())
    except OSError:
        pass
    env = dict(os.environ, NSTPU_BENCH_CLAIM=_claim_marker())
    rc, claimed = _inner(env, CLAIM_DEADLINE_S)
    if rc == 0:
        return 0
    if rc is not None and claimed:
        return 1   # real failure past the claim: propagate, don't mask
    env = dict(os.environ, JAX_PLATFORMS="cpu", NSTPU_TPU_PROBE="0",
               NSTPU_BENCH_FORCE_CPU="1")
    env.setdefault("NSTPU_SKETCH", "native")
    rc, _ = _inner(env, None)
    return 0 if rc == 0 else 1


def _claim_marker() -> str:
    # keyed by THIS watchdog's pid: two bench invocations from one shell
    # must not share (and mutually erase) a marker
    return os.path.join(tempfile.gettempdir(),
                        f"nstpu_bench_claim_{os.getpid()}_{os.getuid()}")


def _bench() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    chip = os.environ.get("NSTPU_BENCH_FORCE_CPU") != "1"
    from nanospring_tpu import compressor, decompressor
    from nanospring_tpu.utils import synth

    work = tempfile.mkdtemp(prefix="nstpu_bench_")
    fq = os.path.join(work, "bench.fastq")
    # Round 4: the headline dataset IS the hardened realistic model
    # (segmental repeats at 85-98% identity, homopolymer-biased indels,
    # lognormal lengths) — the shape whose ratio/throughput is comparable
    # to the reference's real-data hs2 numbers. The old repeat-free iid
    # model survives as the 'iid' regime below for round-over-round
    # continuity (round-3 verdict ask #2).
    reads = synth.make_dataset(
        fq,
        genome_len=GENOME_LEN,
        num_reads=NUM_READS,
        mean_len=MEAN_LEN,
        seed=1234,
        p_n_base=0.0005,
        realistic=True,
    )
    total_bases = sum(len(r) for r in reads)

    # Untimed warmup: the first host materialization in a process can stall
    # for minutes behind the accelerator-claim handshake; absorb it here so
    # the timed section measures the pipeline, not the tunnel setup.
    import jax
    if not chip:
        # the env var alone is not enough on hosts whose sitecustomize
        # registers the tunnel plugin programmatically (see
        # tests/conftest.py) — pin the platform via jax.config too, or the
        # first device op still claims the (unresponsive) chip
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    np.asarray(jax.jit(lambda x: x + 1)(np.ones(8, np.float32)))
    chip = chip and jax.default_backend() != "cpu"
    marker = os.environ.get("NSTPU_BENCH_CLAIM")
    if marker:
        open(marker, "w").close()   # tell the watchdog the claim went through

    # best-of-4: the shared dev hosts show 2-4x co-tenant noise between
    # identical runs (same deterministic outputs), so one sample badly
    # under-reports the pipeline
    arc = os.path.join(work, "bench.nstpu")
    compress_s = float("inf")
    best_stages = {}
    best_split = {}
    for _ in range(4):
        t0 = time.time()
        res = compressor.compress_file(fq, arc, report=False)
        dt = time.time() - t0
        if dt < compress_s:
            compress_s = dt
            best_stages = {k: round(v, 2) for k, v in res["stage_s"].items()}
            best_split = res.get("pipe_split", {})
            best_dp_info = res.get("dp_info", {})

    out = os.path.join(work, "bench.reads")
    decompress_s = float("inf")
    dec_stages = {}
    for _ in range(2):
        t1 = time.time()
        dres = decompressor.decompress_file(arc, out, report=False)
        if time.time() - t1 < decompress_s:
            decompress_s = time.time() - t1
            dec_stages = {k: round(v, 2)
                          for k, v in dres.get("stage_s", {}).items()}

    import resource
    peak_rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    with open(out, "rb") as f:
        got = f.read().splitlines()
    ok = len(got) == len(reads) and all(a == b for a, b in zip(got, reads))
    if not ok:
        print(json.dumps({"metric": "compress_throughput", "value": 0.0,
                          "unit": "Mbases/s", "vs_baseline": 0.0,
                          "error": "round-trip mismatch"}))
        return 1

    mbases_s = total_bases / compress_s / 1e6
    print(json.dumps({
        "metric": "compress_throughput",
        "value": round(mbases_s, 3),
        "unit": "Mbases/s",
        "vs_baseline": round(mbases_s / BASELINE_MBASES_S, 4),
        "ratio": round(res["ratio"], 2),
        "bits_per_base": round(8.0 / res["ratio"], 3),
        "total_bases": total_bases,
        "compress_s": round(compress_s, 1),
        "decompress_s": round(decompress_s, 1),
        "decompress_mbases_s": round(total_bases / decompress_s / 1e6, 2),
        # decode path split: read_archive (codec decode) / decode_streams /
        # replay / reorder+write (round-3 verdict ask #7)
        "decompress_stages": dec_stages,
        "peak_rss_gb": round(peak_rss_gb, 2),
        "lossless": True,
        # False when the subprocess chip probe timed out and the run was
        # pinned to the CPU+native path (tunnel-health observability)
        "chip_attached": chip,
        # per-stage wall of the fastest run (load / pipeline incl.
        # sketch+join+grow+polish / serialize / codec+archive)
        "stages": best_stages,
        # the pipeline stage broken open: sketch_join / components / screen
        # walls plus the engine's own place/dp/apply/polish/emit split and
        # DP counters (ns_engine_timings) — the round-3 verdict asked for
        # the 81%-of-wall bucket to be visible from the scoreboard artifact
        "pipeline_split": best_split,
        # which backend carried the batch DP + the steady-state probe
        # timings when a chip was attached (engine.cpp dp probe)
        **best_dp_info,
        "regimes": _regime_ratios(work),
    }))
    return 0


def _regime_ratios(work: str) -> dict:
    """Ratio robustness at the reference's hard regimes (best-of-2 runs):
    hs1-like old-basecaller ~9.6% error (reference 5.44x, logs/2022/hs1.log),
    new_zymo-like 97-base reads (reference 3.88x, logs/2022/new_zymo.log),
    hs2-like 24 kb reads, and the repeat-free iid model (the old headline,
    kept for round-over-round continuity)."""
    import os as _os

    from nanospring_tpu import compressor, decompressor
    from nanospring_tpu.utils import synth

    out = {}
    regimes = {
        "high_error": dict(genome_len=400_000, num_reads=2_500,
                           mean_len=5_000, p_ins=0.03, p_del=0.03,
                           p_sub=0.036),
        "short_reads": dict(genome_len=200_000, num_reads=25_000,
                            mean_len=97),
        # hs2-like read lengths (the reference's headline dataset averages
        # 24.5 kb, logs/2022/hs2.log)
        "long_reads": dict(genome_len=1_200_000, num_reads=1_500,
                           mean_len=24_000),
        # the old repeat-free headline model, for continuity with the
        # round 1-3 scoreboards
        "iid": dict(genome_len=2_000_000, num_reads=12_000,
                    mean_len=5_000, realistic=False),
    }
    for name, kw in regimes.items():
        try:
            realistic = kw.pop("realistic", True)
            fq = _os.path.join(work, f"{name}.fastq")
            reads = synth.make_dataset(fq, seed=77, p_n_base=0.0005,
                                       realistic=realistic, **kw)
            arc = _os.path.join(work, f"{name}.nstpu")
            dt = float("inf")
            for _ in range(2):  # best-of-2: co-tenant noise (round-3 ask)
                t0 = time.time()
                res = compressor.compress_file(fq, arc, report=False)
                dt = min(dt, time.time() - t0)
            dec = _os.path.join(work, f"{name}.reads")
            decompressor.decompress_file(arc, dec, report=False)
            with open(dec, "rb") as f:
                ok = f.read().splitlines() == reads
            out[name] = {"ratio": round(res["ratio"], 2), "lossless": ok,
                         "mbases_s": round(sum(len(r) for r in reads)
                                           / dt / 1e6, 2)}
        except Exception as e:  # pragma: no cover - bench resilience
            out[name] = {"error": str(e)[:120]}
    return out


if __name__ == "__main__":
    raise SystemExit(_bench() if "--inner" in sys.argv else main())
