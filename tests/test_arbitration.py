"""Copy arbitration (models/arbitration.py): raw long reads, placed by
unique flanking anchors, must snap a family-averaged repeat locus back to
the true copy — the round-4 repeat-resolution mechanism.

The planted scenario reproduces the judged-scale failure exactly: a
contig that is the genome EXCEPT inside one repeat copy, where every
divergent site carries the family master base (the blend short-read
pileups converge to when cross-copy votes outnumber same-copy ones).
Short-read polish cannot fix such an island (no rare seeds survive on the
averaged backbone); long reads span the repeat plus its unique flanks and
carry the copy's own variants at ~90% per site.
"""

import numpy as np
import pytest

from hga_tpu.config import AssemblerConfig
from hga_tpu.io.encode import pack_reads
from hga_tpu.models.arbitration import arbitrate_contigs
from hga_tpu.utils import sim


def _mutate(seq: str, pos: np.ndarray, rng) -> str:
    codes = np.frombuffer(seq.encode(), dtype=np.uint8).copy()
    lut = {65: "CGT", 67: "AGT", 71: "ACT", 84: "ACG"}
    for p in pos:
        codes[p] = ord(lut[codes[p]][rng.integers(0, 3)])
    return codes.tobytes().decode()


def _cfg():
    return AssemblerConfig(k=15, w=5, band=64, min_shared_minimizers=2,
                           min_overlap_len=200, min_identity=0.70,
                           corr_batch_pairs=512)


def _genome_with_island(rng, n_copies=5, L_rep=3000, div=0.01, G=40_000):
    """Genome with an n_copies repeat family; returns (genome, contig with
    copy 0 family-averaged, island sites)."""
    backbone = "".join(rng.choice(list("ACGT"), size=G))
    master = "".join(rng.choice(list("ACGT"), size=L_rep))
    gap = (G - n_copies * L_rep) // (n_copies + 1)
    genome = []
    cur = 0
    copies = []
    parts = []
    for c in range(n_copies):
        parts.append(backbone[cur : cur + gap])
        cur += gap
        nmut = rng.binomial(L_rep, div)
        pos = np.sort(rng.choice(L_rep, size=nmut, replace=False))
        copies.append((len("".join(parts)), pos))
        parts.append(_mutate(master, pos, rng))
        cur += L_rep
    parts.append(backbone[cur:])
    genome = "".join(parts)

    # contig: genome with copy 0's divergent sites reverted to master —
    # the family-averaged wrong island
    start0, pos0 = copies[0]
    carr = np.frombuffer(genome.encode(), np.uint8).copy()
    marr = np.frombuffer(master.encode(), np.uint8)
    carr[start0 + pos0] = marr[pos0]
    contig = carr.tobytes().decode()
    island = start0 + pos0
    assert sum(genome[i] != contig[i] for i in island) == len(island)
    return genome, contig, island


def test_arbitration_restores_wrong_island(rng):
    genome, contig, island = _genome_with_island(rng)
    ls, ln = sim.simulate_long_reads(genome, coverage=22.0, mean_len=7000,
                                     min_len=2000, error_rate=0.10, seed=9)
    pad = ((max(len(s) for s in ls) + 31) // 32) * 32
    pr_l = pack_reads(ls, names=ln, category=[1] * len(ls), pad_len=pad)
    out = arbitrate_contigs([("c0", contig)], pr_l, _cfg())
    assert len(out) == 1 and out[0][0] == "c0"
    arb = out[0][1]
    # arbitration may insert/delete a handful of bases (raw-read indel
    # noise at depth dips), so sites are checked alignment-free: a site is
    # RESTORED iff the copy's own variant k-mer (genome window centered on
    # the site — which the averaged contig provably lacks) now appears in
    # the arbitrated sequence.
    assert abs(len(arb) - len(contig)) < 50
    restored = 0
    for i in island:
        probe = genome[i - 10 : i + 11]
        assert probe not in contig
        if probe in arb:
            restored += 1
    # a site at the island EDGE may stay master (coverage/depth dip) —
    # that is the isolated-wrong-site case short-read polish heals, since
    # its healed neighbors re-anchor same-copy reads
    assert restored >= 0.85 * len(island), (restored, len(island))
    # no collateral damage: mismatches vs the genome's k-mer plane stay
    # within ~2 unrestored sites' worth of windows
    k = 21
    gk = {genome[i : i + k] for i in range(len(genome) - k + 1)}
    bad_after = sum(arb[i : i + k] not in gk
                    for i in range(len(arb) - k + 1))
    assert bad_after <= 2 * k, bad_after


def test_arbitration_noop_on_clean_contig(rng):
    """On a repeat-free genome with the contig == genome, arbitration must
    not damage the sequence (votes agree with the backbone everywhere)."""
    genome = "".join(rng.choice(list("ACGT"), size=20_000))
    ls, ln = sim.simulate_long_reads(genome, coverage=20.0, mean_len=6000,
                                     min_len=1500, error_rate=0.10, seed=11)
    pad = ((max(len(s) for s in ls) + 31) // 32) * 32
    pr_l = pack_reads(ls, names=ln, category=[1] * len(ls), pad_len=pad)
    out = arbitrate_contigs([("c0", genome)], pr_l, _cfg())
    arb = out[0][1]
    k = 21
    gk = {genome[i : i + k] for i in range(len(genome) - k + 1)}
    bad = sum(arb[i : i + k] not in gk for i in range(len(arb) - k + 1))
    # raw 10%-error votes at depth >= 5 must essentially never beat a
    # correct backbone column
    assert bad <= 60, bad


def test_arbitration_empty_inputs():
    cfg = _cfg()
    pr = pack_reads(["ACGT" * 40], pad_len=160)
    assert arbitrate_contigs([], pr, cfg) == []
    empty = pack_reads([], pad_len=64)
    cs = [("c", "ACGT" * 100)]
    assert arbitrate_contigs(cs, empty, cfg) == cs


def test_pipeline_publishes_arbitrate_stage(tmp_path, rng):
    """run_pipeline runs arbitration between assembly and polish and
    publishes its stage seconds + split (place/mat/vote) in the stats —
    the same observability contract the overlap/correction splits keep."""
    from hga_tpu.models.pipeline import run_pipeline
    from hga_tpu.utils import sim

    ds = sim.make_dataset(genome_len=15_000, short_cov=20, long_cov=10,
                          seed=21, short_err=0.005, long_err=0.08)
    pr_s = pack_reads(ds.short_seqs, names=ds.short_names, pad_len=112)
    pad = ((max(len(s) for s in ds.long_seqs) + 15) // 16) * 16
    pr_l = pack_reads(ds.long_seqs, names=ds.long_names,
                      category=[1] * len(ds.long_seqs), pad_len=pad)
    cfg = AssemblerConfig(k=15, w=5, band=48, batch_reads=512,
                          min_shared_minimizers=2, min_overlap_len=300)
    res = run_pipeline(pr_s, pr_l, cfg, str(tmp_path))
    assert "arbitrate" in res.stats["stages"]
    det = res.stats["arbitrate_detail"]
    assert {"place_s", "mat_s", "vote_s", "n_chunks"} <= set(det)
    # and the off switch removes the stage
    res2 = run_pipeline(pr_s, pr_l, cfg.replace(arbitrate=False),
                        str(tmp_path / "off"))
    assert "arbitrate" not in res2.stats["stages"]
