"""FASTQ quality plane + quality-weighted consensus (cfg.use_quality).

SURVEY.md L0 per-read metadata: the quality plane is optional (default
parse-and-drop, io/fastq.py policy); when kept, pileup votes weigh each
base's phred tier (models/correction.py, ops/pileup plane traceback).
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hga_tpu.config import AssemblerConfig
from hga_tpu.io import encode as E
from hga_tpu.models.correction import polish_contigs
from hga_tpu.models.pipeline import load_reads
from hga_tpu.utils import sim

CFG = AssemblerConfig(k=15, w=5, band=24, max_seed_freq=64,
                      min_shared_minimizers=2, batch_reads=128,
                      min_overlap_score=30, min_pileup_depth=2)


def _qstr(phred: int, L: int) -> str:
    return chr(33 + phred) * L


def test_pack_reads_quality_plane_roundtrip(tmp_path):
    seqs = ["ACGTACGTACGT", "TTTTGGGG"]
    quals = [_qstr(38, 12), "".join(chr(33 + q) for q in range(8))]
    pr = E.pack_reads(seqs, quals=quals, pad_len=16)
    assert pr.qual is not None and pr.qual.shape == (2, 16)
    assert (pr.qual[0, :12] == 38).all() and (pr.qual[0, 12:] == 0).all()
    np.testing.assert_array_equal(pr.qual[1, :8], np.arange(8))
    # save/load keeps the plane; subset/with_pad carry it
    p = str(tmp_path / "pr.npz")
    pr.save(p)
    pr2 = E.PackedReads.load(p)
    np.testing.assert_array_equal(pr2.qual, pr.qual)
    np.testing.assert_array_equal(pr.subset([1]).qual, pr.qual[1:2])
    assert pr.with_pad(32).qual.shape == (2, 32)
    # default stays quality-free
    assert E.pack_reads(seqs).qual is None
    pr.save(p)  # overwrite ok


def test_load_reads_keep_quality(tmp_path):
    fq = tmp_path / "reads.fastq"
    fq.write_text("@r0\nACGTACGT\n+\n" + _qstr(30, 8) + "\n"
                  "@r1\nGGGGCCCC\n+\n" + _qstr(5, 8) + "\n")
    pr, _ = load_reads([str(fq)], keep_quality=True)
    assert pr.qual is not None
    assert (pr.qual[0, :8] == 30).all() and (pr.qual[1, :8] == 5).all()
    pr_d, _ = load_reads([str(fq)])
    assert pr_d.qual is None


def test_quality_weighted_votes_flip_consensus():
    """2 high-q disagreeing reads outweigh 3 low-q reads only when
    use_quality is on: weighted 2*3=6 > 3*1=3; unweighted 2 < 3."""
    genome = sim.random_genome(400, seed=7)
    p = 200
    alt = "ACGT"[("ACGT".index(genome[p]) + 1) % 4]
    variant = genome[:p] + alt + genome[p + 1 :]
    # 5 reads, all spanning p: 2 carry `alt` at q38, 3 carry reference at q5
    span = (p - 50, p + 50)
    r_alt = variant[span[0] : span[1]]
    r_ref = genome[span[0] : span[1]]
    seqs = [r_alt, r_alt, r_ref, r_ref, r_ref]
    quals = [_qstr(38, 100)] * 2 + [_qstr(5, 100)] * 3
    pr_q = E.pack_reads(seqs, quals=quals, pad_len=112)
    pr_nq = E.pack_reads(seqs, pad_len=112)

    cfg_q = CFG.replace(use_quality=True, min_pileup_depth=2)
    cfg_nq = CFG.replace(min_pileup_depth=2)
    out_q = polish_contigs([("c", genome)], pr_q, cfg_q)[0][1]
    out_nq = polish_contigs([("c", genome)], pr_nq, cfg_nq)[0][1]
    assert out_q[p] == alt, "high-quality minority should win weighted"
    assert out_nq[p] == genome[p], "majority should win unweighted"
    # away from p both agree with the genome
    assert out_q[:p] == genome[:p] and out_q[p + 1 :] == genome[p + 1 :]


def test_use_quality_without_plane_falls_back_unweighted(caplog):
    genome = sim.random_genome(400, seed=9)
    reads, names = sim.simulate_short_reads(genome, coverage=20, read_len=100,
                                            error_rate=0.0, seed=10)
    pr = E.pack_reads(reads, names=names, pad_len=112)   # no qual plane
    cfg = CFG.replace(use_quality=True)
    out = polish_contigs([("c", genome)], pr, cfg)[0][1]
    assert out == genome


def test_use_quality_rejects_sw_engine():
    # the invalid combination fails at CONFIG CONSTRUCTION (fail-fast:
    # nothing downstream — candidate generation, DP batching — ever runs)
    with pytest.raises(ValueError, match="use_quality"):
        CFG.replace(use_quality=True, corr_engine="sw")


def test_load_reads_keeps_long_quality(tmp_path):
    """keep_quality retains the LONG reads' plane too (SURVEY.md L0
    per-read metadata; round-3 verdict missing item 6)."""
    fq = tmp_path / "long.fastq"
    fq.write_text("@l0\nACGTACGTACGTACGT\n+\n" + "I" * 16 + "\n")
    _, pr_l = load_reads([], [str(fq)], keep_quality=True)
    assert pr_l.qual is not None
    assert (pr_l.qual[0, :16] == ord("I") - 33).all()
    _, pr_l0 = load_reads([], [str(fq)])
    assert pr_l0.qual is None
