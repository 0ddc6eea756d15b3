"""L2: device minimizer selection vs NumPy oracle."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from hga_tpu.io import encode as E
from hga_tpu.ops import kmer as K
from hga_tpu.ops import minimizer as M
from hga_tpu.utils import oracle


def _reads(rng, n, lmin, lmax, with_n=False):
    seqs = []
    alphabet = list("ACGTN") if with_n else list("ACGT")
    p = [0.235, 0.235, 0.235, 0.235, 0.06] if with_n else None
    for _ in range(n):
        L = int(rng.integers(lmin, lmax + 1))
        seqs.append("".join(rng.choice(alphabet, size=L, p=p)))
    return seqs


@pytest.mark.parametrize("k,w", [(15, 5), (21, 11), (11, 1)])
def test_minimizers_match_oracle(rng, k, w):
    seqs = _reads(rng, 15, k + w, 150, with_n=True)
    seqs += ["A" * 60, ("ACGT" * 40)[:97]]  # homopolymer + periodic adversaries
    pr = E.pack_reads(seqs, pad_len=160)
    kb = K.extract_kmers(jnp.asarray(pr.packed), jnp.asarray(pr.bad),
                         jnp.asarray(pr.length), k)
    mb = M.select_minimizers(kb, w, jnp.asarray(pr.length), k)
    pos = np.asarray(mb.pos)
    hi = np.asarray(mb.hi)
    lo = np.asarray(mb.lo)
    strand = np.asarray(mb.strand)
    take = np.asarray(mb.take)
    for i, s in enumerate(seqs):
        codes, bad = E.encode_bases(s)
        exp = oracle.minimizers(codes, bad, len(s), k, w)
        m = max(0, len(s) - k + 1)
        n_win_real = m - w + 1
        got = []
        for j in range(take.shape[1]):
            # windows past the true read length must produce nothing real:
            # their winning position is invalid or out of range
            if take[i, j]:
                v = int(oracle.join_hi_lo(hi[i, j], lo[i, j]))
                got.append((int(pos[i, j]), v, int(strand[i, j])))
        # device computes windows over the padded plane; windows fully past
        # the read can never be taken because their kmers are invalid
        assert got == exp, (i, s[:40])


@pytest.mark.parametrize("w", [1, 2, 3, 11])
def test_seed_entries_lossless_at_small_w(rng, w):
    """Device compaction must keep EVERY taken minimizer entry even when
    the take density exceeds the sized cap (w <= 3 reaches density ~1/2..1;
    the round-3 cap of slots/2+64 silently dropped the excess — advisor
    item 1).  Count is checked against the per-read oracle."""
    from hga_tpu.config import AssemblerConfig
    from hga_tpu.models.seeding import extract_seed_entries

    k = 11
    seqs = _reads(rng, 24, 60, 200)
    pr = E.pack_reads(seqs, pad_len=208)
    cfg = AssemblerConfig(k=k, w=w, batch_reads=8)
    ent = extract_seed_entries(pr, cfg)
    expect = sum(
        len(oracle.minimizers(*E.encode_bases(s), len(s), k, w))
        for s in seqs)
    assert ent.read.size == expect


def test_seed_entries_lossless_homopolymer(rng):
    """Adversarial density-1 input: leftmost-tie-break makes every window
    take a new position on a long homopolymer; the full-capacity re-run
    path must keep them all."""
    from hga_tpu.config import AssemblerConfig
    from hga_tpu.models.seeding import extract_seed_entries

    seqs = ["A" * 180] * 8 + _reads(rng, 8, 100, 180)
    pr = E.pack_reads(seqs, pad_len=192)
    cfg = AssemblerConfig(k=11, w=9, batch_reads=16)
    ent = extract_seed_entries(pr, cfg)
    expect = sum(
        len(oracle.minimizers(*E.encode_bases(s), len(s), 11, 9))
        for s in seqs)
    assert ent.read.size == expect
