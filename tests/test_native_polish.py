"""Parity: native batched polish (native/polish.cpp) vs the numpy oracle
(_polish_contig / _polish_indels) on real pipeline contig states."""

import collections
import copy
import os
import tempfile

import numpy as np
import pytest

from nanospring_tpu.config import CompressConfig
from nanospring_tpu.io import read_store
from nanospring_tpu.pipeline import contigs as cg
from nanospring_tpu.utils import synth
from nanospring_tpu.utils.observe import FunnelStats


@pytest.fixture(scope="module")
def grown_states():
    work = tempfile.mkdtemp()
    fq = os.path.join(work, "t.fastq")
    synth.make_dataset(fq, genome_len=60_000, num_reads=450, mean_len=2000,
                       seed=21, p_n_base=0.0)
    store = read_store.load_fastq(fq)
    cfg = CompressConfig(pipeline_workers=1, polish_rounds=0)
    stats = FunnelStats()
    graph = cg._build_candidate_graph(store, cfg, stats, False)
    bounds = graph["boundaries"]
    eligible = np.flatnonzero(np.diff(bounds) >= 2)
    claimed = graph["rep"].copy()
    wf = cg._Wavefront(store, cfg, stats, graph["adj_off"], graph["dst"],
                       claimed, graph["comp_of"])
    expand = collections.deque()
    for comp in eligible.tolist():
        members = graph["comp_order"][bounds[comp]: bounds[comp + 1]]
        if len(members) < 2:
            continue
        wf.register_component(comp, members)
        expand.append(comp)
    while True:
        while len(wf.queue) < cfg.frontier_target and expand:
            if wf.activate_next_in_comp(expand[0], fresh_only=True):
                expand.rotate(-1)
            else:
                expand.popleft()
        if not wf.queue:
            break
        wf.run_batch()
    for comp in list(wf._comp_members.keys()):
        while wf.activate_next_in_comp(comp):
            while wf.queue:
                wf.run_batch()
    for st in list(wf.states.values()):
        wf._finalize(st)
    assert wf.done, "no contigs grown"
    return store, wf.done


def test_polish_native_matches_numpy(grown_states):
    store, done = grown_states
    states_np = copy.deepcopy(done)
    states_nat = copy.deepcopy(done)
    for st in states_np:
        cg._polish_contig(st, store)
        cg._polish_indels(st, store)
        cg._polish_contig(st, store)
    assert cg._polish_batch_native(states_nat, store)
    for a, b in zip(states_np, states_nat):
        assert np.array_equal(a.cons, b.cons)
        for ma, mb in zip(a.members, b.members):
            assert ma.tstart == mb.tstart
            assert np.array_equal(ma.ops, mb.ops)
