"""Config 5 full pipeline + CLI subcommands (in-process)."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hga_tpu.cli import main as cli_main
from hga_tpu.config import AssemblerConfig
from hga_tpu.io.encode import pack_reads
from hga_tpu.io.fastq import iter_records, write_fasta
from hga_tpu.models.pipeline import load_reads, run_pipeline
from hga_tpu.utils import sim
from hga_tpu.utils.evalx import evaluate_contigs, n50

CFG = AssemblerConfig(k=15, w=5, band=24, max_seed_freq=64,
                      min_shared_minimizers=2, batch_reads=256,
                      min_overlap_len=30, min_overlap_score=40,
                      min_contig_len=300)


def test_n50():
    assert n50([100, 200, 300, 400]) == 300
    assert n50([]) == 0
    assert n50([5]) == 5


@pytest.fixture(scope="module")
def hybrid_ds():
    return sim.make_dataset(genome_len=6000, short_cov=25, long_cov=6,
                            seed=50, short_err=0.002, long_err=0.05)


def test_full_hybrid_pipeline(tmp_path, hybrid_ds):
    ds = hybrid_ds
    pr_s = pack_reads(ds.short_seqs, names=ds.short_names, pad_len=112)
    pr_l = pack_reads(ds.long_seqs, names=ds.long_names,
                      category=[1] * len(ds.long_seqs))
    out = str(tmp_path / "run")
    res = run_pipeline(pr_s, pr_l, CFG, out)
    assert res.polished, "pipeline produced no contigs"
    ev = evaluate_contigs(res.polished, ds.genome, k=21)
    assert ev["genome_fraction"] > 0.90, ev
    assert ev["identity"] > 0.90, ev
    # artifacts written
    for f in ["spectrum.npz", "corrected.npz", "overlaps.npz",
              "contigs.fasta", "polished.fasta", "assembly.gfa",
              "run_metrics.json"]:
        assert os.path.exists(os.path.join(out, f)), f

    # resume: rerun skips heavy stages (stage meta digests match)
    res2 = run_pipeline(pr_s, pr_l, CFG, out, resume=True)
    assert [s for _, s in res2.polished] == [s for _, s in res.polished]
    assert "corrected" not in res2.stats["stages"]  # skipped on resume
    assert "overlaps" not in res2.stats["stages"]


def test_short_read_only_pipeline(tmp_path):
    ds = sim.make_dataset(genome_len=3000, short_cov=20, long_cov=0,
                          seed=51, short_err=0.002)
    pr_s = pack_reads(ds.short_seqs, names=ds.short_names, pad_len=112)
    out = str(tmp_path / "run")
    res = run_pipeline(pr_s, None, CFG, out)
    ev = evaluate_contigs(res.polished, ds.genome, k=21)
    assert ev["genome_fraction"] > 0.9
    assert ev["identity"] > 0.97


def test_cli_simulate_count_eval(tmp_path):
    simdir = str(tmp_path / "sim")
    rc = cli_main(["simulate", "-o", simdir, "--genome-len", "2000",
                   "--short-cov", "8", "--long-cov", "0", "--seed", "3"])
    assert rc == 0
    assert os.path.exists(os.path.join(simdir, "short.fasta"))

    outdir = str(tmp_path / "count")
    rc = cli_main(["count", "--short", os.path.join(simdir, "short.fasta"),
                   "-o", outdir, "-k", "15"])
    assert rc == 0
    assert os.path.exists(os.path.join(outdir, "spectrum.npz"))
    assert os.path.exists(os.path.join(outdir, "spectrum_hist.tsv"))


def test_cli_pipeline_and_eval(tmp_path, capsys):
    ds = sim.make_dataset(genome_len=2500, short_cov=20, long_cov=0,
                          seed=52, short_err=0.0)
    simdir = tmp_path / "sim"
    simdir.mkdir()
    write_fasta(str(simdir / "short.fasta"),
                list(zip(ds.short_names, ds.short_seqs)))
    write_fasta(str(simdir / "genome.fasta"), [("g", ds.genome)])
    outdir = str(tmp_path / "asm")
    rc = cli_main(["pipeline", "--short", str(simdir / "short.fasta"),
                   "-o", outdir, "-k", "15", "-w", "5", "--band", "24"])
    assert rc == 0
    assert os.path.exists(os.path.join(outdir, "polished.fasta"))
    rc = cli_main(["eval", "--contigs", os.path.join(outdir, "polished.fasta"),
                   "--reference", str(simdir / "genome.fasta")])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    ev = json.loads(out)
    assert ev["identity"] > 0.97


def test_load_reads_roundtrip(tmp_path, hybrid_ds):
    ds = hybrid_ds
    write_fasta(str(tmp_path / "s.fasta"),
                list(zip(ds.short_names, ds.short_seqs)))
    write_fasta(str(tmp_path / "l.fasta"),
                list(zip(ds.long_names, ds.long_seqs)))
    pr_s, pr_l = load_reads([str(tmp_path / "s.fasta")],
                            [str(tmp_path / "l.fasta")])
    assert pr_s.n_reads == len(ds.short_seqs)
    assert pr_l.n_reads == len(ds.long_seqs)
    assert (pr_l.category == 1).all()


def test_cli_simulate_fastq_quality_pipeline(tmp_path):
    """simulate --fastq -> pipeline --use-quality end to end: the quality
    plane loads, weighted consensus runs, contigs still reconstruct."""
    simdir = str(tmp_path / "sim")
    rc = cli_main(["simulate", "-o", simdir, "--genome-len", "6000",
                   "--short-cov", "25", "--long-cov", "6",
                   "--short-err", "0.005", "--long-err", "0.05",
                   "--seed", "50", "--fastq"])
    assert rc == 0 and os.path.exists(os.path.join(simdir, "short.fastq"))
    pr_s, _ = load_reads([os.path.join(simdir, "short.fastq")],
                         keep_quality=True)
    assert pr_s.qual is not None and int(pr_s.qual.max()) >= 30
    out = str(tmp_path / "runq")
    rc = cli_main(["pipeline", "-o", out, "-k", "15", "-w", "5",
                   "--band", "24", "--min-shared", "2",
                   "--min-overlap-len", "30", "--use-quality",
                   "--short", os.path.join(simdir, "short.fastq"),
                   "--long", os.path.join(simdir, "long.fasta")])
    assert rc == 0
    genome = "".join(r.seq for r in iter_records(
        os.path.join(simdir, "genome.fasta")))
    contigs = [(r.name, r.seq) for r in iter_records(
        os.path.join(out, "polished.fasta"))]
    ev = evaluate_contigs(contigs, genome, k=21)
    assert ev["genome_fraction"] > 0.90, ev
    assert ev["identity"] > 0.90, ev
