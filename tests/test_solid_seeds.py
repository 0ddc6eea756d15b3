"""Solid-k-mer seed masking (SURVEY.md C5/C12): the spectrum is load-bearing."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from hga_tpu.config import AssemblerConfig
from hga_tpu.io.encode import pack_reads
from hga_tpu.models.correction import correct_long_reads, find_candidates_cross
from hga_tpu.models.spectrum import count_reads
from hga_tpu.utils import sim
from hga_tpu.utils.evalx import evaluate_contigs


@pytest.fixture(scope="module")
def ds():
    d = sim.make_dataset(genome_len=2500, short_cov=30, long_cov=8, seed=9,
                         short_err=0.01, long_err=0.10)
    pr_s = pack_reads(d.short_seqs, names=d.short_names, pad_len=128)
    pad = ((max(len(s) for s in d.long_seqs) + 15) // 16) * 16
    pr_l = pack_reads(d.long_seqs, names=d.long_names,
                      category=[1] * len(d.long_seqs), pad_len=pad)
    return d, pr_s, pr_l


def test_solid_filter_reduces_candidates_and_keeps_quality(ds):
    d, pr_s, pr_l = ds
    cfg = AssemblerConfig(k=15, w=5, band=48, batch_reads=512,
                          min_shared_minimizers=2, min_overlap_len=30)
    spec = count_reads(pr_s, cfg)
    solid = spec.solid_set()
    assert solid[0].size > 0

    a0, *_ = find_candidates_cross(pr_s, pr_l, cfg, solid=None)
    a1, *_ = find_candidates_cross(pr_s, pr_l, cfg, solid=solid)
    assert 0 < len(a1) <= len(a0)

    corr = correct_long_reads(pr_s, pr_l, cfg, solid=solid)
    from hga_tpu.io.encode import unpack_read

    contigs = [(corr.names[i], unpack_read(corr, i))
               for i in range(corr.n_reads)]
    ev = evaluate_contigs(contigs, d.genome, k=15)
    # corrected reads must be far above the ~10% raw long-read error
    assert ev["identity"] > 0.93, ev


def test_solid_mask_disabled_by_config(ds):
    d, pr_s, pr_l = ds
    cfg = AssemblerConfig(k=15, w=5, min_shared_minimizers=2,
                          use_solid_seeds=False)
    spec = count_reads(pr_s, cfg)
    a0, *_ = find_candidates_cross(pr_s, pr_l, cfg, solid=None)
    a1, *_ = find_candidates_cross(pr_s, pr_l, cfg, solid=spec.solid_set())
    assert len(a0) == len(a1)
