"""Circular-chromosome assembly (SURVEY.md Appendix A: E. coli is
circular): origin-spanning reads close the string graph into a cycle; the
assembler emits ONE circular contig covering the genome exactly once."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hga_tpu.config import AssemblerConfig
from hga_tpu.io import encode as E
from hga_tpu.models.assembly import assemble
from hga_tpu.models.overlap import compute_overlaps
from hga_tpu.models.seeding import find_candidates
from hga_tpu.utils import sim
from hga_tpu.utils.evalx import evaluate_contigs

CFG = AssemblerConfig(k=15, w=5, band=32, min_shared_minimizers=2,
                      min_overlap_len=40)


def _rotation_of(contig: str, genome: str) -> bool:
    from hga_tpu.io.encode import revcomp_str

    return contig in genome + genome or revcomp_str(contig) in genome + genome


def test_tiled_circle_assembles_to_one_circular_contig():
    """Error-free reads tiling a circle -> exactly one circular contig that
    is a rotation of the genome, with no duplicated origin."""
    genome = sim.random_genome(2000, seed=11)
    G = len(genome)
    reads = []
    for s in range(0, G, 40):
        reads.append("".join(genome[(s + i) % G] for i in range(120)))
    pr = E.pack_reads(reads, pad_len=128)
    cands = find_candidates(pr, CFG)
    ov = compute_overlaps(pr, cands, CFG, batch_pairs=1024)
    res = assemble(pr, ov, CFG)
    assert len(res.contigs) == 1
    name, seq = res.contigs[0]
    assert name.endswith("_circular")
    assert res.circular == [True]
    assert len(seq) == G, (len(seq), G)       # exactly once around
    assert _rotation_of(seq, genome)


def test_tiled_circle_deterministic_rotation():
    """The emitted rotation is deterministic (canonical start node)."""
    genome = sim.random_genome(1500, seed=13)
    G = len(genome)
    reads = ["".join(genome[(s + i) % G] for i in range(120))
             for s in range(0, G, 50)]
    pr = E.pack_reads(reads, pad_len=128)
    cands = find_candidates(pr, CFG)
    ov = compute_overlaps(pr, cands, CFG, batch_pairs=1024)
    seqs = {assemble(pr, ov, CFG).contigs[0][1] for _ in range(2)}
    assert len(seqs) == 1


def test_linear_genome_not_marked_circular():
    genome = sim.random_genome(2000, seed=17)
    reads = [genome[s : s + 120] for s in range(0, len(genome) - 120, 40)]
    reads.append(genome[-120:])
    pr = E.pack_reads(reads, pad_len=128)
    cands = find_candidates(pr, CFG)
    ov = compute_overlaps(pr, cands, CFG, batch_pairs=1024)
    res = assemble(pr, ov, CFG)
    assert res.contigs
    assert not any(c for c in res.circular)
    assert not any(n.endswith("_circular") for n, _ in res.contigs)


def test_circular_pipeline_end_to_end():
    """Full hybrid pipeline on a circular genome: origin-spanning short AND
    long reads -> one circular contig, genome_fraction ~ 1.0 (the linear-
    ends deficit is gone)."""
    import tempfile

    from hga_tpu.models.pipeline import run_pipeline

    genome = sim.random_genome(20000, seed=21)
    ss, sn = sim.simulate_short_reads(genome, coverage=25, read_len=100,
                                      error_rate=0.005, seed=22,
                                      circular=True)
    ls, ln = sim.simulate_long_reads(genome, coverage=15, mean_len=4000,
                                     min_len=1500, error_rate=0.08, seed=23,
                                     circular=True)
    pr_s = E.pack_reads(ss, names=sn, pad_len=112)
    pad = ((max(len(s) for s in ls) + 15) // 16) * 16
    pr_l = E.pack_reads(ls, names=ln, category=[1] * len(ls), pad_len=pad)
    cfg = AssemblerConfig(k=15, w=5, band=64, batch_reads=1024,
                          min_shared_minimizers=2, min_overlap_len=300,
                          min_identity=0.75, min_contig_len=1000)
    with tempfile.TemporaryDirectory() as td:
        res = run_pipeline(pr_s, pr_l, cfg, td, mesh=None)
    assert len(res.polished) == 1, [n for n, _ in res.polished]
    name, seq = res.polished[0]
    assert name.endswith("_circular")
    assert abs(len(seq) - len(genome)) < 500
    ev = evaluate_contigs(res.polished, genome, k=21, circular=True)
    assert ev["identity"] >= 0.995, ev
    assert ev["genome_fraction"] >= 0.995, ev
