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
