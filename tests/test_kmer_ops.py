"""M1: device k-mer extraction + counting vs NumPy oracle (bit-exact)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from hga_tpu.io import encode as E
from hga_tpu.ops import count as C
from hga_tpu.ops import kmer as K
from hga_tpu.utils import oracle


def _random_reads(rng, n, lmin, lmax, with_n=False):
    seqs = []
    alphabet = list("ACGTN") if with_n else list("ACGT")
    p = [0.24, 0.24, 0.24, 0.24, 0.04] if with_n else None
    for _ in range(n):
        L = int(rng.integers(lmin, lmax + 1))
        seqs.append("".join(rng.choice(alphabet, size=L, p=p)))
    return seqs


@pytest.mark.parametrize("k", [5, 16, 21, 31])
def test_extract_kmers_matches_oracle(rng, k):
    seqs = _random_reads(rng, 20, k, 120, with_n=True)
    seqs += ["A" * k, "ACGT" * k, "N" * (k + 3), "T" * (k - 1)]  # adversarial
    pr = E.pack_reads(seqs, pad_len=140)
    kb = K.extract_kmers(jnp.asarray(pr.packed), jnp.asarray(pr.bad),
                         jnp.asarray(pr.length), k)
    hi, lo = np.asarray(kb.hi), np.asarray(kb.lo)
    strand, valid = np.asarray(kb.strand), np.asarray(kb.valid)
    for i, s in enumerate(seqs):
        codes, bad = E.encode_bases(s)
        oc, ostr, oval = oracle.kmer_values(codes, bad, len(s), k)
        m = len(oc)
        # positions beyond oracle range must be invalid
        assert not valid[i, m:].any()
        np.testing.assert_array_equal(valid[i, :m], oval)
        ohi, olo = oracle.split_hi_lo(oc)
        np.testing.assert_array_equal(hi[i, :m][oval], ohi[oval])
        np.testing.assert_array_equal(lo[i, :m][oval], olo[oval])
        np.testing.assert_array_equal(strand[i, :m][oval], ostr[oval])


def test_palindrome_canonical(rng):
    # revcomp palindromes: fwd == rc, strand must be 0 (fwd wins ties)
    s = "ACGCGT"  # revcomp == itself for k=6
    assert E.revcomp_str(s) == s
    pr = E.pack_reads([s])
    kb = K.extract_kmers(jnp.asarray(pr.packed), jnp.asarray(pr.bad),
                         jnp.asarray(pr.length), 6)
    assert np.asarray(kb.valid)[0, 0]
    assert np.asarray(kb.strand)[0, 0] == 0


def test_sort_and_count_matches_oracle(rng):
    k = 21
    seqs = _random_reads(rng, 30, 50, 200, with_n=True)
    pr = E.pack_reads(seqs, pad_len=208)
    kb = K.extract_kmers(jnp.asarray(pr.packed), jnp.asarray(pr.bad),
                         jnp.asarray(pr.length), k)
    ck = C.count_kmer_batch(kb)
    n = int(ck.n)
    got = {
        int(oracle.join_hi_lo(h, l)): int(c)
        for h, l, c in zip(np.asarray(ck.hi)[:n], np.asarray(ck.lo)[:n],
                           np.asarray(ck.count)[:n])
    }
    reads = [(E.encode_bases(s)[0], E.encode_bases(s)[1], len(s)) for s in seqs]
    exp = oracle.count_kmers(reads, k)
    assert got == exp
    # sorted ascending
    hi = np.asarray(ck.hi)[:n].astype(np.uint64)
    lo = np.asarray(ck.lo)[:n].astype(np.uint64)
    v = (hi << np.uint64(32)) | lo
    assert (np.diff(v.astype(np.int64)) > 0).all()


def test_merge_counted(rng):
    k = 15
    s1 = _random_reads(rng, 10, 30, 80)
    s2 = _random_reads(rng, 10, 30, 80)
    def count(seqs):
        pr = E.pack_reads(seqs, pad_len=80)
        kb = K.extract_kmers(jnp.asarray(pr.packed), jnp.asarray(pr.bad),
                             jnp.asarray(pr.length), k)
        return C.count_kmer_batch(kb)
    ck = C.merge_counted(count(s1), count(s2))
    n = int(ck.n)
    got = {
        int(oracle.join_hi_lo(h, l)): int(c)
        for h, l, c in zip(np.asarray(ck.hi)[:n], np.asarray(ck.lo)[:n],
                           np.asarray(ck.count)[:n])
    }
    reads = [(E.encode_bases(s)[0], E.encode_bases(s)[1], len(s)) for s in s1 + s2]
    assert got == oracle.count_kmers(reads, k)


def test_spectrum_histogram_and_threshold(rng):
    k = 11
    seqs = _random_reads(rng, 40, 40, 120)
    pr = E.pack_reads(seqs, pad_len=128)
    kb = K.extract_kmers(jnp.asarray(pr.packed), jnp.asarray(pr.bad),
                         jnp.asarray(pr.length), k)
    ck = C.count_kmer_batch(kb)
    hist = np.asarray(C.spectrum_histogram(ck, max_count=16))
    reads = [(E.encode_bases(s)[0], E.encode_bases(s)[1], len(s)) for s in seqs]
    exp_hist = oracle.spectrum_histogram(oracle.count_kmers(reads, k), 16)
    np.testing.assert_array_equal(hist, exp_hist)


def test_filter_solid_and_membership(rng):
    k = 13
    seqs = _random_reads(rng, 30, 40, 100)
    pr = E.pack_reads(seqs, pad_len=112)
    kb = K.extract_kmers(jnp.asarray(pr.packed), jnp.asarray(pr.bad),
                         jnp.asarray(pr.length), k)
    ck = C.count_kmer_batch(kb)
    thr = 2
    solid = C.filter_solid(ck, jnp.int32(thr))
    n = int(solid.n)
    reads = [(E.encode_bases(s)[0], E.encode_bases(s)[1], len(s)) for s in seqs]
    exp = {v for v, c in oracle.count_kmers(reads, k).items() if c >= thr}
    got = {
        int(oracle.join_hi_lo(h, l))
        for h, l in zip(np.asarray(solid.hi)[:n], np.asarray(solid.lo)[:n])
    }
    assert got == exp

    # membership of every extracted kmer against the solid set
    member = C.member_sorted(solid.hi, solid.lo,
                             jnp.where(kb.valid, kb.hi, C.SENTINEL),
                             jnp.where(kb.valid, kb.lo, C.SENTINEL))
    member = np.asarray(member)
    hi, lo, valid = np.asarray(kb.hi), np.asarray(kb.lo), np.asarray(kb.valid)
    for i in range(len(seqs)):
        for p in range(hi.shape[1]):
            v = int(oracle.join_hi_lo(hi[i, p], lo[i, p]))
            expect = valid[i, p] and v in exp
            assert member[i, p] == expect, (i, p)


def test_member_sorted_empty_set():
    import jax.numpy as jnp
    empty_hi = jnp.full((8,), C.SENTINEL)
    empty_lo = jnp.full((8,), C.SENTINEL)
    q = jnp.array([0, 1, 0xFFFFFFFF], dtype=jnp.uint32)
    out = np.asarray(C.member_sorted(empty_hi, empty_lo, q, q))
    assert not out.any()
