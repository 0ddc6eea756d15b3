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
    circular = "--circular" in sys.argv
    gmb = float(args[0]) if len(args) > 0 else 4.6
    outdir = args[1] if len(args) > 1 else (
        f"/tmp/scale_{gmb}mb" + ("_rep" if repeats else "")
        + ("_circ" if circular else ""))
    G = int(gmb * 1_000_000)

    from hga_tpu.config import AssemblerConfig
    from hga_tpu.io.encode import pack_reads
    from hga_tpu.models.pipeline import run_pipeline
    from hga_tpu.utils import sim
    from hga_tpu.utils.compile_cache import enable_compile_cache
    from hga_tpu.utils.evalx import evaluate_contigs

    enable_compile_cache()

    t0 = time.perf_counter()
    genome = (sim.repeat_genome(G, seed=42) if repeats
              else sim.random_genome(G, seed=42))
    # --circular: E. coli's chromosome is a circle (SURVEY.md Appendix A);
    # origin-spanning reads close the string graph into a cycle and the
    # assembler emits one *_circular contig (models/assembly.py)
    ss, sn = sim.simulate_short_reads(genome, coverage=30.0, read_len=100,
                                      error_rate=0.01, seed=43,
                                      circular=circular)
    ls, ln = sim.simulate_long_reads(genome, coverage=20.0, mean_len=8000,
                                     min_len=1000, error_rate=0.10, seed=44,
                                     circular=circular)
    t_sim = time.perf_counter() - t0
    print(f"sim: {len(ss)} short + {len(ls)} long reads in {t_sim:.0f}s "
          f"(repeats={repeats}, circular={circular})", flush=True)

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
    corr_passes = 1
    for a in sys.argv[1:]:
        if a.startswith("--corr-passes="):
            corr_passes = int(a.split("=")[1])
    cfg = AssemblerConfig(k=15, w=5, band=64, batch_reads=4096,
                          min_shared_minimizers=2, min_overlap_len=500,
                          min_identity=0.75, polish_passes=2,
                          corr_passes=corr_passes,
                          corr_batch_pairs=4096, min_contig_len=2000)
    t0 = time.perf_counter()
    res = run_pipeline(pr_s, pr_l, cfg, outdir, resume=True)
    t_pipe = time.perf_counter() - t0

    total_reads = pr_s.n_reads + pr_l.n_reads
    ev = evaluate_contigs(res.polished, genome, k=21, circular=circular)
    ev["circular_contigs"] = sum(
        1 for n, _ in res.polished if n.endswith("_circular"))
    # Per-stage splits come from the pipeline stats captured AT each stage
    # (round-4 verdict weak items 1-2: a post-hoc read of the module-level
    # LAST_TIMINGS reports whatever stage ran LAST — the published
    # "correction_split" was actually the final polish pass's numbers).
    stages = res.stats["stages"]
    corr_split = res.stats.get("correction_detail", {})
    pol_split = res.stats.get("polish_detail", {})
    arb_split = res.stats.get("arbitrate_detail", {})
    ov_split = {k: v for k, v in res.stats.get("overlaps", {}).items()
                if k != "n"}
    # the shared short-read seed index is built lazily inside whichever
    # stage first needs it (usually correction) — account it there
    corr_split = dict(corr_split,
                      shared_index_s=res.stats.get("seed_index_s", 0))
    # reconciliation: each stage's split components must sum to ~the stage
    # seconds (>=70% accounted; the remainder is untimed glue)
    recon = {}
    for name, split, keys in (
            ("corrected", corr_split,
             ("index_s", "gcand_s", "cand_s", "loop_s", "shared_index_s")),
            ("polish", pol_split, ("cand_s", "loop_s")),
            ("arbitrate", arb_split, ("place_s", "mat_s", "vote_s")),
            ("overlaps", ov_split,
             ("index_s", "anchor_s", "chain_s", "segprep_s", "dp_s"))):
        if name in stages and split:
            acc = sum(split.get(k, 0) for k in keys)
            recon[name] = dict(stage_s=stages[name]["seconds"],
                               split_sum_s=round(acc, 1))
            if acc > 0 and not (0.5 * acc <= stages[name]["seconds"] * 1.05):
                print(f"WARNING: {name} split {acc:.0f}s does not reconcile "
                      f"with stage {stages[name]['seconds']:.0f}s", flush=True)
    out = dict(genome_mb=gmb, repeats=repeats, circular=circular,
               n_short=pr_s.n_reads, n_long=pr_l.n_reads,
               pipeline_seconds=round(t_pipe, 1),
               reads_per_s=round(total_reads / t_pipe, 1),
               stages=stages, eval=ev,
               correction_split=corr_split,
               polish_split=pol_split,
               arbitrate_split=arb_split,
               overlap_split=ov_split,
               split_reconciliation=recon,
               assembly=res.stats.get("assembly", {}),
               derived=res.stats.get("derived", {}))
    print(json.dumps(out, indent=2), flush=True)
    with open(os.path.join(outdir, "scale_metrics.json"), "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
