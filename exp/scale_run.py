"""Judged-scale run: E. coli-sized hybrid assembly on the chip (BASELINE
configs 1-5 at 4.6 Mb / cov 30 short + cov 20 long).

The reference's testset is real E. coli; with zero egress the genome is the
SURVEY.md Appendix A stand-in: seeded random 4.6 Mb, or — with --repeats —
the repeat-bearing model (7x ~5 kb rRNA-operon family @99%, IS-element
families, tandem repeats; sim.repeat_genome), the structure that makes real
assembly hard.  Records per-stage wall times + reads/s + identity + the
correction/overlap wall-clock splits into a JSON file for the round
metrics.

Usage:  python -m exp.scale_run [genome_mb] [outdir] [--repeats]
"""

import json
import logging
import os
import sys
import time


def main():
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeats = "--repeats" in sys.argv
    gmb = float(args[0]) if len(args) > 0 else 4.6
    outdir = args[1] if len(args) > 1 else (
        f"/tmp/scale_{gmb}mb" + ("_rep" if repeats else ""))
    G = int(gmb * 1_000_000)

    from hga_tpu.config import AssemblerConfig
    from hga_tpu.io.encode import pack_reads
    from hga_tpu.models import correction as MC
    from hga_tpu.models import overlap as MO
    from hga_tpu.models.pipeline import run_pipeline
    from hga_tpu.utils import sim
    from hga_tpu.utils.compile_cache import enable_compile_cache
    from hga_tpu.utils.evalx import evaluate_contigs

    enable_compile_cache()

    t0 = time.perf_counter()
    genome = (sim.repeat_genome(G, seed=42) if repeats
              else sim.random_genome(G, seed=42))
    ss, sn = sim.simulate_short_reads(genome, coverage=30.0, read_len=100,
                                      error_rate=0.01, seed=43)
    ls, ln = sim.simulate_long_reads(genome, coverage=20.0, mean_len=8000,
                                     min_len=1000, error_rate=0.10, seed=44)
    t_sim = time.perf_counter() - t0
    print(f"sim: {len(ss)} short + {len(ls)} long reads in {t_sim:.0f}s "
          f"(repeats={repeats})", flush=True)

    t0 = time.perf_counter()
    pr_s = pack_reads(ss, names=sn, pad_len=112)
    pad_l = ((max(len(s) for s in ls) + 31) // 32) * 32
    pr_l = pack_reads(ls, names=ln, category=[1] * len(ls), pad_len=pad_l)
    t_pack = time.perf_counter() - t0
    print(f"pack: {t_pack:.0f}s (long pad {pad_l})", flush=True)
    del ss, ls

    # k=15/w=5 seeding: a 10%-error long read keeps ~0.9^15 = 21%% of its
    # k-mers exact — k=21 (11%%) starves the correction anchors at judged
    # error rates.  The judged k=21 spectrum remains `hga count`'s default.
    # corr_depth_cap stays 0: the driver derives ~0.7x base coverage from
    # the spectrum peak (round-3 verdict item 6).
    cfg = AssemblerConfig(k=15, w=5, band=64, batch_reads=4096,
                          min_shared_minimizers=2, min_overlap_len=500,
                          min_identity=0.75, polish_passes=2,
                          corr_batch_pairs=4096, min_contig_len=2000)
    t0 = time.perf_counter()
    res = run_pipeline(pr_s, pr_l, cfg, outdir, resume=True)
    t_pipe = time.perf_counter() - t0

    total_reads = pr_s.n_reads + pr_l.n_reads
    ev = evaluate_contigs(res.polished, genome, k=21)
    out = dict(genome_mb=gmb, repeats=repeats,
               n_short=pr_s.n_reads, n_long=pr_l.n_reads,
               pipeline_seconds=round(t_pipe, 1),
               reads_per_s=round(total_reads / t_pipe, 1),
               stages=res.stats["stages"], eval=ev,
               correction_split=dict(MC.LAST_TIMINGS),
               overlap_split=dict(MO.LAST_TIMINGS))
    print(json.dumps(out, indent=2), flush=True)
    with open(os.path.join(outdir, "scale_metrics.json"), "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
