"""Stage 1 (config 1): spectrum counting end-to-end on simulated reads."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hga_tpu.config import AssemblerConfig
from hga_tpu.io import pack_reads
from hga_tpu.io.encode import encode_bases
from hga_tpu.models.spectrum import SpectrumResult, count_reads
from hga_tpu.utils import oracle
from hga_tpu.utils.sim import make_dataset


def test_count_reads_matches_oracle_and_batches():
    ds = make_dataset(genome_len=2500, short_cov=10, long_cov=0, seed=9)
    pr = pack_reads(ds.short_seqs, names=ds.short_names, pad_len=112)
    # solid_threshold=1 keeps every distinct k-mer in the result so the
    # full multiset compares bit-exactly (the fast path only reads back
    # count >= threshold); forces many batches
    cfg = AssemblerConfig(k=21, batch_reads=64, max_count=32,
                          solid_threshold=1)
    res = count_reads(pr, cfg)
    reads = [(encode_bases(s)[0], encode_bases(s)[1], len(s)) for s in ds.short_seqs]
    exp = oracle.count_kmers(reads, 21)
    got = {
        int(oracle.join_hi_lo(h, l)): int(c)
        for h, l, c in zip(res.hi, res.lo, res.count)
    }
    assert got == exp
    assert res.n_distinct == len(exp)
    np.testing.assert_array_equal(res.hist, oracle.spectrum_histogram(exp, 32))


def test_count_reads_solid_only_default_threshold():
    ds = make_dataset(genome_len=2500, short_cov=10, long_cov=0, seed=9)
    pr = pack_reads(ds.short_seqs, names=ds.short_names, pad_len=112)
    cfg = AssemblerConfig(k=21, batch_reads=64, max_count=32)
    res = count_reads(pr, cfg)
    reads = [(encode_bases(s)[0], encode_bases(s)[1], len(s)) for s in ds.short_seqs]
    exp = oracle.count_kmers(reads, 21)
    got = {
        int(oracle.join_hi_lo(h, l)): int(c)
        for h, l, c in zip(res.hi, res.lo, res.count)
    }
    # hist covers the FULL distribution; the stored set is the solid subset
    np.testing.assert_array_equal(res.hist, oracle.spectrum_histogram(exp, 32))
    assert res.n_distinct == len(exp)
    assert got == {km: c for km, c in exp.items() if c >= res.threshold}


def test_count_reads_hierarchical_merge_bit_exact(monkeypatch):
    """Two-level super-chunk merge (judged-scale memory bound) must match
    the oracle bit-for-bit (SURVEY.md §8.3-4)."""
    from hga_tpu.models import spectrum as SP

    monkeypatch.setattr(SP, "MAX_GLOBAL_SORT", 1 << 14)
    monkeypatch.setattr(SP, "SUPER_SLOTS", 1 << 14)
    monkeypatch.setattr(SP, "SLICE_QUANTUM", 1 << 10)
    ds = make_dataset(genome_len=2500, short_cov=10, long_cov=0, seed=9)
    pr = pack_reads(ds.short_seqs, names=ds.short_names, pad_len=112)
    cfg = AssemblerConfig(k=21, batch_reads=64, max_count=32,
                          solid_threshold=1)
    res = count_reads(pr, cfg)
    reads = [(encode_bases(s)[0], encode_bases(s)[1], len(s))
             for s in ds.short_seqs]
    exp = oracle.count_kmers(reads, 21)
    got = {
        int(oracle.join_hi_lo(h, l)): int(c)
        for h, l, c in zip(res.hi, res.lo, res.count)
    }
    assert got == exp
    assert res.n_distinct == len(exp)
    np.testing.assert_array_equal(res.hist, oracle.spectrum_histogram(exp, 32))


def test_threshold_and_solid_recovery():
    ds = make_dataset(genome_len=4000, short_cov=25, long_cov=0, seed=11)
    pr = pack_reads(ds.short_seqs, pad_len=112)
    cfg = AssemblerConfig(k=21, batch_reads=512)
    res = count_reads(pr, cfg)
    assert res.threshold >= 2
    shi, _slo = res.solid_set()
    true_distinct = len(ds.genome) - 21 + 1
    # solid set should approximate the true genomic k-mer count within 5%
    assert abs(shi.size - true_distinct) / true_distinct < 0.05


def test_spectrum_save_load(tmp_path):
    ds = make_dataset(genome_len=1000, short_cov=5, long_cov=0, seed=2)
    pr = pack_reads(ds.short_seqs, pad_len=112)
    res = count_reads(pr, AssemblerConfig(batch_reads=128))
    p = str(tmp_path / "spec.npz")
    res.save(p)
    res2 = SpectrumResult.load(p)
    np.testing.assert_array_equal(res.hi, res2.hi)
    np.testing.assert_array_equal(res.count, res2.count)
    assert res.threshold == res2.threshold


def test_count_reads_category_filter():
    ds = make_dataset(genome_len=1000, short_cov=4, long_cov=0, seed=3)
    n = len(ds.short_seqs)
    cat = np.zeros(n, np.int32)
    cat[: n // 2] = 1
    pr = pack_reads(ds.short_seqs, category=cat, pad_len=112)
    cfg = AssemblerConfig(batch_reads=128, solid_threshold=1)
    res0 = count_reads(pr, cfg, category=0)
    reads0 = [(encode_bases(s)[0], encode_bases(s)[1], len(s))
              for s, c in zip(ds.short_seqs, cat) if c == 0]
    exp0 = oracle.count_kmers(reads0, cfg.k)
    got0 = {
        int(oracle.join_hi_lo(h, l)): int(c)
        for h, l, c in zip(res0.hi, res0.lo, res0.count)
    }
    assert got0 == exp0
