"""Read/genome simulator (C16) — repeat structure + determinism."""

import numpy as np

from hga_tpu.io import encode as E
from hga_tpu.utils import sim
from hga_tpu.utils.oracle import kmer_values


def _distinct_kmers(g: str, k: int = 21) -> int:
    codes, bad = E.encode_bases(g)
    canon, _, valid = kmer_values(codes, bad, len(g), k)
    return np.unique(canon[valid]).size


def test_repeat_genome_has_repeats_and_exact_length():
    G = 200_000
    g = sim.repeat_genome(G, seed=3)
    assert len(g) == G
    # the uniform random genome is ~all-distinct in 21-mer space; the repeat
    # families (7x5kb @99% + 3 IS families + tandems) must collapse tens of
    # kilobases of k-mers into shared values
    d_rand = _distinct_kmers(sim.random_genome(G, seed=3))
    d_rep = _distinct_kmers(g)
    assert d_rand >= G - 21 - 50            # sanity: random ~ unique
    assert d_rep <= d_rand - 25_000, (d_rep, d_rand)


def test_repeat_genome_deterministic():
    a = sim.repeat_genome(50_000, seed=11)
    b = sim.repeat_genome(50_000, seed=11)
    c = sim.repeat_genome(50_000, seed=12)
    assert a == b
    assert a != c


def test_make_dataset_quals_in_sync():
    ds = sim.make_dataset(genome_len=5_000, short_cov=5, long_cov=0,
                          seed=4, return_quals=True)
    assert ds.short_quals is not None
    assert len(ds.short_quals) == len(ds.short_seqs)
    # name-encoded loci must match the sequences (quals from the SAME call)
    ds0 = sim.make_dataset(genome_len=5_000, short_cov=5, long_cov=0, seed=4)
    assert ds0.short_seqs == ds.short_seqs
    assert ds0.short_names == ds.short_names
    assert all(len(q) == len(s)
               for q, s in zip(ds.short_quals, ds.short_seqs))
