"""Bit-parallel Myers overlap DP vs the numpy oracle (SURVEY.md §5 item 1)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from hga_tpu.ops.myers import myers_batch, n_words
from hga_tpu.utils import oracle


def _batch_oracle(q, t, ql, tl):
    d, e = [], []
    for n in range(q.shape[0]):
        dn, en = oracle.edit_distance_hw(q[n, :ql[n]], t[n, :tl[n]])
        d.append(dn)
        e.append(en)
    return np.array(d), np.array(e)


def _check(q, t, ql, tl):
    ref_d, ref_e = _batch_oracle(q, t, ql, tl)
    got = myers_batch(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                      jnp.asarray(tl))
    np.testing.assert_array_equal(np.asarray(got.dist), ref_d)
    np.testing.assert_array_equal(np.asarray(got.tend), ref_e)


def test_random_small():
    rng = np.random.default_rng(0)
    N, Lq, Lt = 32, 23, 40
    q = rng.integers(0, 4, (N, Lq)).astype(np.int32)
    t = rng.integers(0, 4, (N, Lt)).astype(np.int32)
    ql = rng.integers(1, Lq + 1, N).astype(np.int32)
    tl = rng.integers(1, Lt + 1, N).astype(np.int32)
    _check(q, t, ql, tl)


def test_planted_overlaps_multiword():
    rng = np.random.default_rng(1)
    N, Lq, Lt = 16, 100, 180        # W = 4 words
    assert n_words(Lq) == 4
    q = rng.integers(0, 4, (N, Lq)).astype(np.int32)
    t = rng.integers(0, 4, (N, Lt)).astype(np.int32)
    for n in range(N):
        off = int(rng.integers(0, Lt - Lq))
        t[n, off:off + Lq] = q[n]
        # sprinkle a few errors
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(off, off + Lq))
            t[n, p] = (t[n, p] + 1) % 4
    ql = np.full(N, Lq, np.int32)
    tl = np.full(N, Lt, np.int32)
    _check(q, t, ql, tl)
    got = myers_batch(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                      jnp.asarray(tl))
    assert int(np.asarray(got.dist).max()) <= 6


def test_word_boundaries():
    # query lengths straddling the 31-bit payload boundaries
    rng = np.random.default_rng(2)
    for Lq in (30, 31, 32, 61, 62, 63, 93, 124):
        N, Lt = 8, 2 * Lq
        q = rng.integers(0, 4, (N, Lq)).astype(np.int32)
        t = rng.integers(0, 4, (N, Lt)).astype(np.int32)
        ql = np.full(N, Lq, np.int32)
        ql[0] = max(1, Lq - 1)
        tl = np.full(N, Lt, np.int32)
        _check(q, t, ql, tl)


def test_sentinels_and_pads():
    # codes >= 4 (window sentinels) never match; zero-length rows are inert
    rng = np.random.default_rng(3)
    N, Lq, Lt = 8, 40, 64
    q = rng.integers(0, 4, (N, Lq)).astype(np.int32)
    t = rng.integers(0, 4, (N, Lt)).astype(np.int32)
    t[:, :5] = 4                      # leading sentinel block
    q[2, 10:] = 4                     # query pad tail (past qlen anyway)
    ql = np.full(N, Lq, np.int32)
    ql[2] = 10
    ql[3] = 0
    tl = np.full(N, Lt, np.int32)
    tl[4] = 9
    ref_d, ref_e = [], []
    for n in range(N):
        dn, en = oracle.edit_distance_hw(
            np.where(q[n, :ql[n]] >= 4, -1 - np.arange(ql[n]), q[n, :ql[n]]),
            np.where(t[n, :tl[n]] >= 4, -9, t[n, :tl[n]]))
        ref_d.append(dn)
        ref_e.append(en)
    got = myers_batch(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                      jnp.asarray(tl))
    np.testing.assert_array_equal(np.asarray(got.dist), np.array(ref_d))
    np.testing.assert_array_equal(np.asarray(got.tend), np.array(ref_e))


def test_exact_containment():
    # identical query inside target: distance 0, earliest end reported
    q = np.array([[0, 1, 2, 3, 0, 1, 2, 3]], np.int32)
    t = np.zeros((1, 32), np.int32)
    t[0, 7:15] = q[0]
    t[0, 20:28] = q[0]
    got = myers_batch(jnp.asarray(q), jnp.asarray(t),
                      jnp.asarray([8]), jnp.asarray([32]))
    assert int(got.dist[0]) == 0
    assert int(got.tend[0]) == 15
