"""Config 3: cross-set overlaps (short reads vs long-read targets)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hga_tpu.config import AssemblerConfig
from hga_tpu.io import encode as E
from hga_tpu.models.overlap import compute_overlaps_cross
from hga_tpu.utils import sim

CFG = AssemblerConfig(k=15, w=5, band=24, max_seed_freq=64,
                      min_shared_minimizers=2, batch_reads=128,
                      min_overlap_len=40, min_overlap_score=60)


def test_cross_overlaps_recover_true_placement():
    genome = sim.random_genome(3000, seed=61)
    # error-free short reads at known positions, mixed strands
    starts = list(range(0, 2900, 60))
    shorts = []
    for i, s in enumerate(starts):
        seq = genome[s : s + 100]
        shorts.append(E.revcomp_str(seq) if i % 3 == 0 else seq)
    # one error-free "long read" covering [500, 2500)
    longs = [genome[500:2500]]
    pr_s = E.pack_reads(shorts, pad_len=112)
    pr_l = E.pack_reads(longs, category=[1], pad_len=2048)

    ov = compute_overlaps_cross(pr_s, pr_l, CFG)
    assert ov.n > 0
    found = set()
    for i in range(ov.n):
        a = int(ov.a[i])
        s = starts[a]
        exp_rel = 1 if a % 3 == 0 else 0
        assert int(ov.rel[i]) == exp_rel, (a, s)
        # fully-contained short reads must map at b = s - 500
        if 500 <= s and s + 100 <= 2500:
            assert abs(int(ov.b_start[i]) - (s - 500)) <= 2, (a, s)
            assert abs(int(ov.b_end[i]) - (s - 400)) <= 2
            assert int(ov.a_start[i]) <= 2
            assert int(ov.a_end[i]) >= 98
            assert int(ov.score[i]) >= 190
            found.add(a)
    contained = {i for i, s in enumerate(starts) if 500 <= s and s + 100 <= 2500}
    assert len(found) >= len(contained) - 2  # minimizer sampling slack


def test_cross_overlaps_with_errors():
    genome = sim.random_genome(4000, seed=62)
    shorts, _ = sim.simulate_short_reads(genome, coverage=8, read_len=100,
                                         error_rate=0.004, seed=63)
    longs, _ = sim.simulate_long_reads(genome, coverage=1.2, mean_len=1500,
                                       min_len=1200, error_rate=0.05, seed=64)
    pr_s = E.pack_reads(shorts, pad_len=112)
    pr_l = E.pack_reads(longs, category=[1] * len(longs))
    ov = compute_overlaps_cross(pr_s, pr_l, CFG.replace(min_overlap_score=40))
    # most of each long read should be covered by short-read alignments
    cov = np.zeros(int(pr_l.length.max()), np.int32)
    b0 = int(ov.b[0]) if ov.n else 0
    for i in range(ov.n):
        if int(ov.b[i]) == b0:
            cov[int(ov.b_start[i]) : int(ov.b_end[i])] += 1
    L0 = int(pr_l.length[b0])
    assert (cov[:L0] > 0).mean() > 0.7
