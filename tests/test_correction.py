"""Config 5: pileup consensus, long-read correction, contig polishing."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from hga_tpu.config import AssemblerConfig
from hga_tpu.io import encode as E
from hga_tpu.models.correction import (
    consensus_backbones, correct_long_reads, polish_contigs)
from hga_tpu.ops import pileup as PU
from hga_tpu.utils import oracle, sim

CFG = AssemblerConfig(k=15, w=5, band=24, max_seed_freq=64,
                      min_shared_minimizers=2, batch_reads=128,
                      min_overlap_score=30, min_pileup_depth=2)


def test_consensus_votes_and_call_match_oracle(rng):
    L = 50
    backbone = rng.integers(0, 4, L).astype(np.int64)
    # random alignments: (start, cols)
    alns = []
    for _ in range(20):
        s = int(rng.integers(0, L - 10))
        cols = rng.integers(0, 5, int(rng.integers(3, 10)))
        alns.append((s, cols))
    exp_seq, exp_cols = oracle.pileup_consensus(backbone, alns, min_depth=2)

    flat_cols = np.concatenate([np.arange(len(c)) + s for s, c in alns])
    flat_syms = np.concatenate([c for _, c in alns])
    valid = (flat_cols >= 0) & (flat_cols < L)
    votes = PU.consensus_votes(jnp.asarray(flat_cols.astype(np.int32)),
                               jnp.asarray(flat_syms.astype(np.int32)),
                               jnp.asarray(valid), L)
    sym, depth = PU.consensus_call(votes, jnp.asarray(backbone.astype(np.int32)),
                                   min_depth=2)
    np.testing.assert_array_equal(np.asarray(sym), exp_cols.astype(np.int32))


def test_polish_fixes_substitutions():
    genome = sim.random_genome(3000, seed=41)
    reads, names = sim.simulate_short_reads(genome, coverage=25, read_len=100,
                                            error_rate=0.0, seed=42)
    pr = E.pack_reads(reads, names=names, pad_len=112)
    # a draft contig with substitution errors every ~150bp
    draft = list(genome)
    bad_pos = list(range(75, 2900, 150))
    for p in bad_pos:
        draft[p] = "ACGT"[("ACGT".index(draft[p]) + 1) % 4]
    draft = "".join(draft)
    assert draft != genome
    polished = polish_contigs([("c0", draft)], pr, CFG)
    assert polished[0][1] == genome


def test_polish_fixes_insertions_in_backbone():
    genome = sim.random_genome(2000, seed=43)
    reads, names = sim.simulate_short_reads(genome, coverage=25, read_len=100,
                                            error_rate=0.0, seed=44)
    pr = E.pack_reads(reads, names=names, pad_len=112)
    # draft with spurious inserted bases (deletion votes must remove them)
    draft = genome[:500] + "A" + genome[500:1200] + "GT" + genome[1200:]
    polished = polish_contigs([("c0", draft)], pr, CFG)
    assert polished[0][1] == genome


def test_polish_restores_deleted_bases():
    genome = sim.random_genome(2000, seed=48)
    reads, names = sim.simulate_short_reads(genome, coverage=25, read_len=100,
                                            error_rate=0.0, seed=49)
    pr = E.pack_reads(reads, names=names, pad_len=112)
    # draft missing bases (the dominant nanopore error class)
    draft = genome[:400] + genome[401:1100] + genome[1102:]
    polished = polish_contigs([("c0", draft)], pr, CFG)
    assert polished[0][1] == genome


def test_correct_long_reads_improves_identity():
    genome = sim.random_genome(4000, seed=45)
    shorts, snames = sim.simulate_short_reads(genome, coverage=30,
                                              read_len=100, error_rate=0.002,
                                              seed=46)
    longs, lnames = sim.simulate_long_reads(genome, coverage=2,
                                            mean_len=1500, min_len=1000,
                                            error_rate=0.06, seed=47)
    pr_s = E.pack_reads(shorts, names=snames, pad_len=112)
    pr_l = E.pack_reads(longs, names=lnames, category=[1] * len(longs),
                        pad_len=2048)

    def identity(seq):
        # 15-mer hit rate vs genome as an alignment-free identity proxy
        sub = set()
        for i in range(len(genome) - 15):
            sub.add(genome[i : i + 15])
        hits = sum(1 for i in range(len(seq) - 15)
                   if seq[i : i + 15] in sub
                   or E.revcomp_str(seq[i : i + 15]) in sub)
        return hits / max(1, len(seq) - 15)

    before = np.mean([identity(s) for s in longs])
    corr = correct_long_reads(pr_s, pr_l, CFG)
    after = np.mean([identity(E.unpack_read(corr, i))
                     for i in range(corr.n_reads)])
    assert after > before + 0.1, (before, after)


def test_engines_agree_on_polish():
    """cfg.corr_engine="myers" (planes DP + plane traceback) and "sw"
    (scored dirs DP) must both reconstruct the genome from an error-laden
    draft — the engine swap changes gap placement tie-breaks, not the
    majority consensus."""
    genome = sim.random_genome(2500, seed=47)
    reads, names = sim.simulate_short_reads(genome, coverage=25, read_len=100,
                                            error_rate=0.02, seed=48)
    pr = E.pack_reads(reads, names=names, pad_len=112)
    draft = list(genome)
    for p in range(60, 2400, 180):
        draft[p] = "ACGT"[("ACGT".index(draft[p]) + 1) % 4]
    del draft[1200]          # deletion: consensus must re-insert
    draft = "".join(draft[:900] + ["A"] + draft[900:])  # spurious insertion
    outs = {}
    for eng in ("myers", "sw"):
        cfg = CFG.replace(corr_engine=eng)
        outs[eng] = polish_contigs([("c0", draft)], pr, cfg)[0][1]
    assert outs["myers"] == genome
    assert outs["sw"] == genome


def test_device_prep_matches_host_prep():
    """The on-device batch prep (resident packed planes, ~64 KB/batch wire)
    must reproduce the host prep path's corrected output bit-for-bit."""
    from hga_tpu.models import correction as C

    ds = sim.make_dataset(genome_len=8_000, short_cov=25, long_cov=4, seed=31)
    pr_s = E.pack_reads(ds.short_seqs, names=ds.short_names, pad_len=112)
    pad = ((max(len(s) for s in ds.long_seqs) + 31) // 32) * 32
    pr_l = E.pack_reads(ds.long_seqs, names=ds.long_names,
                        category=[1] * len(ds.long_seqs), pad_len=pad)
    cfg = CFG.replace(k=15, w=5, min_shared_minimizers=2)
    out_dev = C.correct_long_reads(pr_s, pr_l, cfg)
    assert C.LAST_TIMINGS["dev_prep"] is True
    C._FORCE_HOST_PREP = True
    try:
        out_host = C.correct_long_reads(pr_s, pr_l, cfg)
        assert C.LAST_TIMINGS["dev_prep"] is False
    finally:
        C._FORCE_HOST_PREP = False
    for i in range(out_dev.n_reads):
        Ld, Lh = int(out_dev.length[i]), int(out_host.length[i])
        assert Ld == Lh
        assert (out_dev.packed[i] == out_host.packed[i]).all()


def test_two_pass_correction_restores_5_base_deletion():
    """A 5-base deletion exceeds the 3 insertion slots of one pass; with
    corr_passes=2 the first pass restores 3 bases and the second the
    remaining 2 (config.corr_passes; SURVEY.md L5 consensus row)."""
    from hga_tpu.models.correction import correct_long_reads

    genome = sim.random_genome(3000, seed=61)
    reads, names = sim.simulate_short_reads(genome, coverage=25, read_len=100,
                                            error_rate=0.0, seed=62)
    pr_s = E.pack_reads(reads, names=names, pad_len=112)
    draft = genome[:1500] + genome[1505:]          # 5-base deletion
    pr_l = E.pack_reads([draft], names=["lr_0"], category=[1], pad_len=3008)

    one = correct_long_reads(pr_s, pr_l, CFG.replace(corr_passes=1))
    two = correct_long_reads(pr_s, pr_l, CFG.replace(corr_passes=2))

    def seq(pr):
        from hga_tpu.io.encode import decode_bases, unpack_codes
        return decode_bases(unpack_codes(pr.packed[0])[: int(pr.length[0])])

    assert seq(one) != genome                       # 1 pass cannot reach 5
    assert len(seq(one)) >= len(draft) + 3
    assert seq(two) == genome
    assert two.names[0] == "lr_0_corr"              # suffix applied once
