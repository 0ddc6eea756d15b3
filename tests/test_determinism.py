"""Determinism: identical inputs -> bit-identical outputs, run to run.

SURVEY.md §8.3 item 2 (bit-identical contigs requires fixed reduction orders,
stable sorts, integer scoring) and §6 "race detection": JAX is functional on
device, so the risk surface is host orchestration order — assert the whole
stage stack is reproducible.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hga_tpu.config import AssemblerConfig
from hga_tpu.io import encode as E
from hga_tpu.models.assembly import assemble
from hga_tpu.models.overlap import compute_overlaps
from hga_tpu.models.seeding import find_candidates
from hga_tpu.models.spectrum import count_reads
from hga_tpu.utils import sim

CFG = AssemblerConfig(k=15, w=5, band=24, max_seed_freq=64,
                      min_shared_minimizers=2, batch_reads=128,
                      min_overlap_len=30, min_overlap_score=40)


def test_stage_stack_is_deterministic():
    ds = sim.make_dataset(genome_len=2500, short_cov=12, long_cov=0, seed=77,
                          short_err=0.004)
    pr = E.pack_reads(ds.short_seqs, names=ds.short_names, pad_len=128)

    def run_once():
        spec = count_reads(pr, CFG)
        cands = find_candidates(pr, CFG)
        ov = compute_overlaps(pr, cands, CFG)
        res = assemble(pr, ov, CFG)
        return spec, cands, ov, res

    s1, c1, o1, r1 = run_once()
    s2, c2, o2, r2 = run_once()
    np.testing.assert_array_equal(s1.hist, s2.hist)
    np.testing.assert_array_equal(s1.count, s2.count)
    np.testing.assert_array_equal(c1.a, c2.a)
    np.testing.assert_array_equal(c1.diag, c2.diag)
    np.testing.assert_array_equal(o1.score, o2.score)
    np.testing.assert_array_equal(o1.a_start, o2.a_start)
    assert r1.contigs == r2.contigs
    assert r1.paths == r2.paths
