"""L4: lookup join, CSR, transitive reduction vs oracle; unitig walk."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from hga_tpu.ops import graph as G
from hga_tpu.utils import oracle


def test_lookup_sorted_basic():
    set_a = jnp.asarray(np.array([1, 1, 2, 5], np.int32))
    set_b = jnp.asarray(np.array([2, 7, 3, 5], np.int32))
    set_v = jnp.asarray(np.array([10, 11, 12, 13], np.int32))
    q_a = jnp.asarray(np.array([1, 1, 2, 5, 9, 1], np.int32))
    q_b = jnp.asarray(np.array([7, 2, 3, 6, 9, 1], np.int32))
    found, val = G.lookup_sorted(set_a, set_b, set_v, q_a, q_b)
    np.testing.assert_array_equal(np.asarray(found),
                                  [True, True, True, False, False, False])
    np.testing.assert_array_equal(np.asarray(val)[:3], [11, 10, 12])


def test_lookup_sorted_random(rng):
    S, Q = 200, 500
    keys = set()
    while len(keys) < S:
        keys.add((int(rng.integers(0, 50)), int(rng.integers(0, 50))))
    keys = sorted(keys)
    vals = {k: int(rng.integers(0, 1000)) for k in keys}
    qa = rng.integers(0, 50, Q).astype(np.int32)
    qb = rng.integers(0, 50, Q).astype(np.int32)
    found, val = G.lookup_sorted(
        jnp.asarray(np.array([k[0] for k in keys], np.int32)),
        jnp.asarray(np.array([k[1] for k in keys], np.int32)),
        jnp.asarray(np.array([vals[k] for k in keys], np.int32)),
        jnp.asarray(qa), jnp.asarray(qb))
    for i in range(Q):
        k = (int(qa[i]), int(qb[i]))
        assert bool(found[i]) == (k in vals)
        if k in vals:
            assert int(val[i]) == vals[k]


def _random_dag_edges(rng, n_nodes, n_edges):
    """Random forward edges u < v with length ~ v - u (overlap-graph-like)."""
    edges = set()
    while len(edges) < n_edges:
        u = int(rng.integers(0, n_nodes - 1))
        v = int(rng.integers(u + 1, min(n_nodes, u + 6)))
        edges.add((u, v))
    return [(u, v, (v - u) * 10 + int(rng.integers(0, 3))) for u, v in sorted(edges)]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_transitive_reduction_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n_nodes = 30
    edges = _random_dag_edges(rng, n_nodes, 60)
    exp_keep = oracle.transitive_reduction(edges, fuzz=10)

    E = len(edges)
    u = np.array([e[0] for e in edges], np.int32)
    v = np.array([e[1] for e in edges], np.int32)
    ln = np.array([e[2] for e in edges], np.int32)
    sc = np.zeros(E, np.int32)
    valid = np.ones(E, bool)
    csr = G.build_csr(jnp.asarray(u), jnp.asarray(v), jnp.asarray(ln),
                      jnp.asarray(sc), jnp.asarray(valid), n_nodes)
    keep = np.asarray(G.transitive_reduction(csr, n_nodes, max_out=16, fuzz=10))
    got = {(int(a), int(b)) for a, b, k in
           zip(np.asarray(csr.u), np.asarray(csr.v), keep) if k}
    exp = {(e[0], e[1]) for e, k in zip(edges, exp_keep) if k}
    assert got == exp


def test_build_csr_row_ptr():
    u = np.array([2, 0, 2, 1], np.int32)
    v = np.array([3, 1, 4, 2], np.int32)
    ln = np.array([5, 1, 2, 9], np.int32)
    csr = G.build_csr(jnp.asarray(u), jnp.asarray(v), jnp.asarray(ln),
                      jnp.asarray(np.zeros(4, np.int32)),
                      jnp.asarray(np.ones(4, bool)), 5)
    np.testing.assert_array_equal(np.asarray(csr.row_ptr), [0, 1, 2, 4, 4, 4])
    # node 2's edges sorted by length: (2,4,len2) then (2,3,len5)
    np.testing.assert_array_equal(np.asarray(csr.v)[2:4], [4, 3])


def test_unitigs_oracle_simple_chain():
    paths = oracle.unitigs_from_edges(5, [(0, 1), (1, 2), (2, 3), (3, 4)])
    assert [0, 1, 2, 3, 4] in paths


def test_unitigs_oracle_branch():
    # 0->1->2, 2->3 and 2->4: chain breaks at the branch
    paths = oracle.unitigs_from_edges(5, [(0, 1), (1, 2), (2, 3), (2, 4)])
    assert [0, 1, 2] in paths
    flat = {tuple(p) for p in paths}
    assert (3,) in flat and (4,) in flat
