"""Leak analysis for the copy-aware candidate filter: of the MISPLACED
candidates that survive, how many are (a) 'anchored' via a rare-seed
frequency-noise leak vs (b) kept-ambiguous because their bucket had no
anchored depth?  Drives the filter's parameter choices with data.

Usage: python -m exp.diag_leak [genome_kb=600]
"""

import logging
import sys

import numpy as np


def main():
    logging.basicConfig(level=logging.WARNING)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    gkb = float(args[0]) if args else 600.0
    G = int(gkb * 1000)

    from exp.diag_repeat_corr import classify, derive, truth_of_names
    from hga_tpu.config import AssemblerConfig
    from hga_tpu.io.encode import pack_reads
    from hga_tpu.models import overlap_long as OL
    from hga_tpu.models.spectrum import count_reads
    from hga_tpu.utils import sim
    from hga_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    genome, annot = sim.repeat_genome(G, seed=42, return_annotation=True)
    ss, sn = sim.simulate_short_reads(genome, coverage=30.0, read_len=100,
                                      error_rate=0.01, seed=43)
    ls, ln = sim.simulate_long_reads(genome, coverage=20.0, mean_len=8000,
                                     min_len=1000, error_rate=0.10, seed=44)
    pr_s = pack_reads(ss, names=sn, pad_len=112)
    pad_l = ((max(len(s) for s in ls) + 31) // 32) * 32
    pr_l = pack_reads(ls, names=ln, category=[1] * len(ls), pad_len=pad_l)
    s_truth = truth_of_names(sn)
    l_truth = truth_of_names(ln)

    cfg0 = AssemblerConfig(k=15, w=5, band=64, batch_reads=4096,
                           min_shared_minimizers=2, min_overlap_len=500,
                           min_identity=0.75, corr_batch_pairs=4096)
    spec = count_reads(pr_s, cfg0)
    cfg, peak = derive(cfg0, spec, float(pr_s.length.mean()))
    solid = spec.solid_set()
    idx = OL.build_seed_index(pr_s, cfg, solid=solid)

    OL._CAND_DEBUG = {}
    cands = OL.find_candidates_cross_indexed(
        pr_s, pr_l, cfg, solid=solid, index=idx,
        depth_cap=cfg.corr_depth_cap, rare_cap=cfg.corr_rare_seed_freq,
        anchor_min=cfg.corr_anchor_min)
    dbg = {k: np.concatenate(v) for k, v in OL._CAND_DEBUG.items()}
    OL._CAND_DEBUG = None
    mis, in_rep, fam = classify(cands, pr_s, pr_l, s_truth, l_truth, annot)
    anch = dbg["rare_cnt"] > 0
    print(f"peak {peak} rare_cap {cfg.corr_rare_seed_freq} "
          f"depth_cap {cfg.corr_depth_cap}")
    for f in ("rrna", "is", "tandem", "unique"):
        m = fam == f if f != "unique" else ~in_rep
        if not m.any():
            continue
        mm = m & mis
        print(f"{f}: kept {int(m.sum())}, misplaced {int(mm.sum())} "
              f"({100 * mis[m].mean():.2f}%)")
        if mm.any():
            print(f"   misplaced survivors: anchored {int(anch[mm].sum())} "
                  f"(rare-leak), ambiguous-kept {int((~anch[mm]).sum())} "
                  f"(bucket A<min)")
            print(f"   misplaced rare_cnt histogram: "
                  f"{np.bincount(dbg['rare_cnt'][mm].clip(0, 6))}")
            print(f"   misplaced min_comb deciles: "
                  f"{np.percentile(dbg['min_comb'][mm], [10, 50, 90]).round(0)}")
            print(f"   misplaced bucket-A deciles: "
                  f"{np.percentile(dbg['A'][mm], [10, 50, 90]).round(0)}")
        ok = m & ~mis
        if ok.any():
            print(f"   well-placed: anchored {100 * anch[ok].mean():.1f}%, "
                  f"rare_cnt median {np.median(dbg['rare_cnt'][ok]):.0f}, "
                  f"min_comb median {np.median(dbg['min_comb'][ok]):.0f}")


if __name__ == "__main__":
    main()
