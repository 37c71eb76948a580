"""Pipeline driver: sketch -> candidates -> contigs -> encode.

The reference's equivalent is Consensus::generateAndWriteConsensus
(src/Consensus.cpp:21-166): an OpenMP loop where each thread grows one
pointer-DAG contig at a time. Here the engine is batch-first (see
pipeline/contigs.py); this module selects the engine and falls back to the
all-lone trivial pipeline when assembly is disabled (used by tests and as
the stage-2 end-to-end slice).
"""

from __future__ import annotations

import numpy as np

from ..config import CompressConfig
from ..io.serialize import ContigBatch
from ..utils.observe import FunnelStats


def run(
    store, cfg: CompressConfig, stats: FunnelStats, report: bool = True
) -> tuple[list[ContigBatch], np.ndarray]:
    """Returns (contig batches, lone read ids)."""
    if (getattr(cfg, "disable_assembly", False) or store.num_reads == 0
            or store.avg_len < cfg.short_read_lone_threshold):
        return [], np.arange(store.num_reads, dtype=np.int64)
    from . import contigs

    return contigs.build_contigs(store, cfg, stats, report=report)
