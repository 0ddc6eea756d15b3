"""L2: candidate pair generation vs oracle; overlap truth recovery."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from hga_tpu.config import AssemblerConfig
from hga_tpu.io import encode as E
from hga_tpu.models.seeding import find_candidates
from hga_tpu.utils import oracle
from hga_tpu.utils import sim


def _oracle_pairs(seqs, cfg, categories=None, mode="all"):
    ents = []
    for s in seqs:
        codes, bad = E.encode_bases(s)
        ents.append(oracle.minimizers(codes, bad, len(s), cfg.k, cfg.w))
    lens = np.array([len(s) for s in seqs])
    cats = categories if categories is not None else np.zeros(len(seqs), int)
    return oracle.candidate_pairs_oracle(
        ents, lens, cats, cfg.k, cfg.max_seed_freq,
        cfg.min_shared_minimizers, mode)


def _result_tuples(res):
    return sorted(
        (int(a), int(b), int(r), int(d), int(s))
        for a, b, r, d, s in zip(res.a, res.b, res.rel, res.diag, res.shared)
    )


def test_candidate_pairs_match_oracle():
    genome = sim.random_genome(800, seed=5)
    seqs, _ = sim.simulate_short_reads(genome, coverage=6, read_len=100,
                                       error_rate=0.0, seed=6)
    cfg = AssemblerConfig(k=15, w=5, max_seed_freq=8, min_shared_minimizers=2,
                          batch_reads=16)
    pr = E.pack_reads(seqs, pad_len=112)
    res = find_candidates(pr, cfg)
    assert res.overflow == 0
    assert _result_tuples(res) == _oracle_pairs(seqs, cfg)


def test_candidate_pairs_cross_mode():
    genome = sim.random_genome(600, seed=15)
    s_short, _ = sim.simulate_short_reads(genome, coverage=3, read_len=80,
                                          error_rate=0.0, seed=16)
    s_long, _ = sim.simulate_long_reads(genome, coverage=1.2, mean_len=300,
                                        min_len=200, error_rate=0.02, seed=17)
    seqs = s_short + s_long
    cats = np.array([0] * len(s_short) + [1] * len(s_long), np.int32)
    cfg = AssemblerConfig(k=15, w=5, max_seed_freq=8, min_shared_minimizers=2,
                          batch_reads=16)
    pr = E.pack_reads(seqs, category=cats, pad_len=512)
    res = find_candidates(pr, cfg, mode="cross")
    exp = _oracle_pairs(seqs, cfg, categories=cats, mode="cross")
    assert _result_tuples(res) == exp
    # every returned pair crosses categories
    for a, b in zip(res.a, res.b):
        assert cats[a] != cats[b]


def test_candidates_recover_true_overlaps():
    """Error-free overlapping reads must produce candidates with the true
    diagonal (difference of genome start positions)."""
    genome = sim.random_genome(2000, seed=25)
    # tile reads every 40bp, length 120 -> each consecutive pair overlaps 80bp
    starts = list(range(0, 2000 - 120, 40))
    seqs = [genome[s : s + 120] for s in starts]
    cfg = AssemblerConfig(k=15, w=5, max_seed_freq=16,
                          min_shared_minimizers=2, batch_reads=16)
    pr = E.pack_reads(seqs, pad_len=128)
    res = find_candidates(pr, cfg)
    got = {(int(a), int(b)): int(d)
           for a, b, d in zip(res.a, res.b, res.diag)}
    missing = 0
    for i in range(len(starts) - 1):
        if (i, i + 1) not in got:
            missing += 1
        else:
            # diag = pos_a - pos_b; a genome position G sits at pos_a = G-s_a,
            # pos_b = G-s_b, so diag = s_b - s_a
            true_diag = starts[i + 1] - starts[i]
            assert abs(got[(i, i + 1)] - true_diag) <= 2
    assert missing <= 1  # minimizer sampling may rarely miss one
