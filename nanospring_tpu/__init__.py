"""nanospring-tpu: TPU-native lossless compressor for nanopore DNA read sequences.

A from-scratch, JAX/XLA/Pallas-first re-design of the capabilities of the
reference tool NanoSpring (qm2/NanoSpring): FASTQ in, `.nstpu` archive out,
byte-identical sequences back on decompression.

Architecture (see SURVEY.md for the reference analysis this is built against):

- ``io``        2-bit packed array read stores, FASTQ/gzip ingestion, the
                seven-stream edit-script serialization and the tar container.
- ``ops``       TPU compute kernels: batched MinHash sketching, rolling k-mer
                packing, batched banded alignment (Myers bit-parallel
                filtering + scoring), edit-script utilities.
- ``pipeline``  The compression pipeline: candidate index (sort-join instead
                of the reference's MPHF tables), contig building (batched
                mosaic extension instead of the reference's per-thread
                pointer DAG), consensus polishing (column voting), final
                batched encode.
- ``parallel``  Device mesh, shardings, and the sharded sketch join for
                multi-host scale-out (collectives instead of OpenMP locks).
- ``codec``     Host-CPU entropy coding backends for the final streams
                (the bsc / fast-lzma2 role in the reference).
- ``utils``     Stage timers, funnel counters, logging.
"""

__version__ = "0.1.0"


def enable_jax_compilation_cache() -> None:
    """Persist XLA compilations across runs (kernel shapes recur)."""
    import os

    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # CPU AOT cache entries are machine-feature sensitive (loader warns
        # about possible SIGILL); the cache only pays off for accelerator
        # backends where compiles are slow.
        return
    try:
        import jax

        d = os.environ.get(
            "NSTPU_JAX_CACHE", os.path.expanduser("~/.cache/nstpu_jax")
        )
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass
