"""Judged-scale machinery on small inputs: indexed candidate route and
length-bucketed correction must agree with the direct paths."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from hga_tpu.config import AssemblerConfig
from hga_tpu.io.encode import pack_reads
from hga_tpu.models.correction import correct_long_reads, find_candidates_cross
from hga_tpu.models.overlap_long import (build_seed_index,
                                         find_candidates_cross_indexed)
from hga_tpu.utils import sim
from hga_tpu.utils.evalx import evaluate_contigs


@pytest.fixture(scope="module")
def ds():
    d = sim.make_dataset(genome_len=2500, short_cov=25, long_cov=10, seed=13,
                         short_err=0.005, long_err=0.09)
    pr_s = pack_reads(d.short_seqs, names=d.short_names, pad_len=128)
    pad = ((max(len(s) for s in d.long_seqs) + 31) // 32) * 32
    pr_l = pack_reads(d.long_seqs, names=d.long_names,
                      category=[1] * len(d.long_seqs), pad_len=pad)
    return d, pr_s, pr_l


def test_indexed_route_matches_device_join(ds):
    d, pr_s, pr_l = ds
    cfg = AssemblerConfig(k=15, w=5, min_shared_minimizers=3)
    a0, b0, r0, d0 = find_candidates_cross(pr_s, pr_l, cfg)
    a1, b1, r1, d1 = find_candidates_cross_indexed(pr_s, pr_l, cfg)
    s0 = {(int(x), int(y), int(z), int(g))
          for x, y, z, g in zip(a0, b0, r0, d0)}
    s1 = {(int(x), int(y), int(z), int(g))
          for x, y, z, g in zip(a1, b1, r1, d1)}
    # identical semantics, different engines: the indexed route masks
    # repeats on the COMBINED (short + backbone) k-mer frequency exactly
    # like the device join, so the pair sets (incl. median diagonals) are
    # EQUAL — the judged-scale production route has the same contract as
    # the exhaustively-tested small-input path
    assert s0 == s1


def test_all_indexed_route_matches_device_join(ds):
    """Config-2 at judged scale: the chunked sorted-index all-vs-all route
    must reproduce the bounded device self-join's pair set (a, b, rel,
    diag, shared) on small inputs."""
    from hga_tpu.models.overlap_long import find_candidates_all_indexed
    from hga_tpu.models.seeding import find_candidates

    d, pr_s, pr_l = ds
    cfg = AssemblerConfig(k=15, w=5, min_shared_minimizers=3)
    dev = find_candidates(pr_s, cfg)
    ind = find_candidates_all_indexed(pr_s, cfg, chunk_reads=37)
    s0 = {(int(a), int(b), int(r), int(g), int(c)) for a, b, r, g, c in
          zip(dev.a, dev.b, dev.rel, dev.diag, dev.shared)}
    s1 = {(int(a), int(b), int(r), int(g), int(c)) for a, b, r, g, c in
          zip(ind.a, ind.b, ind.rel, ind.diag, ind.shared)}
    assert s0 == s1
    # solid masking: both routes must drop non-solid seeds identically
    from hga_tpu.models.spectrum import count_reads

    spec = count_reads(pr_s, cfg)
    solid = spec.solid_set()
    dev_s = find_candidates(pr_s, cfg, solid=solid)
    ind_s = find_candidates_all_indexed(pr_s, cfg, solid=solid)
    t0 = {(int(a), int(b), int(r)) for a, b, r in
          zip(dev_s.a, dev_s.b, dev_s.rel)}
    t1 = {(int(a), int(b), int(r)) for a, b, r in
          zip(ind_s.a, ind_s.b, ind_s.rel)}
    assert t0 == t1


def test_depth_cap_bounds_candidates(ds):
    d, pr_s, pr_l = ds
    cfg = AssemblerConfig(k=15, w=5, min_shared_minimizers=2)
    a0, b0, _, _ = find_candidates_cross_indexed(pr_s, pr_l, cfg, depth_cap=0)
    a1, b1, _, _ = find_candidates_cross_indexed(pr_s, pr_l, cfg, depth_cap=5)
    assert len(a1) < len(a0)
    # positional bound: <= 5 per (backbone, ~read-length bucket)
    cnt = np.bincount(b1, minlength=pr_l.n_reads)
    mean_la = int(pr_s.length.mean())
    n_buckets = pr_l.length.astype(np.int64) // mean_la + 1
    assert (cnt <= 5 * n_buckets).all()


def test_bucketed_correction_matches_single_group(ds):
    d, pr_s, pr_l = ds
    cfg = AssemblerConfig(k=15, w=5, band=48, min_shared_minimizers=2)
    one = correct_long_reads(pr_s, pr_l, cfg)                 # single group
    many = correct_long_reads(pr_s, pr_l, cfg,
                              max_cols=2 * pr_l.pad_len)      # ~2 reads/group
    from hga_tpu.io.encode import unpack_read

    seq_one = [unpack_read(one, i) for i in range(one.n_reads)]
    seq_many = [unpack_read(many, i) for i in range(many.n_reads)]
    assert seq_one == seq_many
    ev = evaluate_contigs(list(zip(one.names, seq_one)), d.genome, k=15)
    assert ev["identity"] > 0.93, ev
