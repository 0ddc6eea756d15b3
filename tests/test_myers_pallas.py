"""Pallas Myers kernel vs the XLA engine and the numpy oracle.

Interpret mode is the kernel sanitizer (SURVEY.md §6): same code path as the
TPU build, executed by the interpreter on CPU.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from hga_tpu.ops.myers import myers_batch
from hga_tpu.ops.myers_pallas import myers_batch_pallas
from hga_tpu.utils import oracle


def _run(q, t, ql, tl, pair_sub=1):
    got = myers_batch_pallas(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                             jnp.asarray(tl), pair_sub=pair_sub,
                             interpret=True)
    ref = myers_batch(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                      jnp.asarray(tl))
    np.testing.assert_array_equal(np.asarray(got.dist), np.asarray(ref.dist))
    np.testing.assert_array_equal(np.asarray(got.tend), np.asarray(ref.tend))
    return got


def test_matches_xla_engine_multiword():
    rng = np.random.default_rng(0)
    N, Lq, Lt = 128, 100, 160          # W = 4 words
    q = rng.integers(0, 4, (N, Lq)).astype(np.int32)
    t = rng.integers(0, 4, (N, Lt)).astype(np.int32)
    for n in range(0, N, 2):           # plant real overlaps in half the rows
        off = int(rng.integers(0, Lt - Lq))
        t[n, off:off + Lq] = q[n]
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, Lq))
            t[n, off + p] = (t[n, off + p] + 1) % 4
    ql = rng.integers(1, Lq + 1, N).astype(np.int32)
    ql[:4] = [Lq, Lq - 1, 31, 62]      # word-boundary lengths
    ql[5] = 0
    tl = rng.integers(1, Lt + 1, N).astype(np.int32)
    got = _run(q, t, ql, tl)
    # oracle spot-check on a handful of rows
    for n in (0, 1, 2, 3, 5, 17):
        d, e = oracle.edit_distance_hw(q[n, :ql[n]], t[n, :tl[n]])
        assert int(got.dist[n]) == d, n
        assert int(got.tend[n]) == e, n


def test_sentinels_never_match():
    rng = np.random.default_rng(1)
    N, Lq, Lt = 128, 40, 64
    q = rng.integers(0, 4, (N, Lq)).astype(np.int32)
    t = rng.integers(0, 4, (N, Lt)).astype(np.int32)
    t[:, :6] = 4                        # window sentinels
    t[3, 10:20] = 9                     # codes >= 8 must also never match
    t[4, 12:18] = -1                    # negative pads never match
    ql = np.full(N, Lq, np.int32)
    tl = np.full(N, Lt, np.int32)
    _run(q, t, ql, tl)


def test_two_sublane_tiles():
    rng = np.random.default_rng(2)
    N, Lq, Lt = 512, 62, 96            # pair_sub=2 -> two (2,128) tiles
    q = rng.integers(0, 4, (N, Lq)).astype(np.int32)
    t = rng.integers(0, 4, (N, Lt)).astype(np.int32)
    ql = rng.integers(1, Lq + 1, N).astype(np.int32)
    tl = np.full(N, Lt, np.int32)
    _run(q, t, ql, tl, pair_sub=2)


def test_planes_kernel_matches_xla_planes():
    from hga_tpu.ops.myers import myers_batch_planes
    from hga_tpu.ops.myers_pallas import (myers_batch_planes_pallas,
                                          planes_fit_vmem)

    rng = np.random.default_rng(7)
    N, Lq, Lt = 128, 90, 150           # W = 3 words
    assert planes_fit_vmem(Lq, Lt, pair_sub=1)
    q = rng.integers(0, 4, (N, Lq)).astype(np.int32)
    t = rng.integers(0, 4, (N, Lt)).astype(np.int32)
    for n in range(0, N, 2):
        off = int(rng.integers(0, Lt - Lq))
        t[n, off:off + Lq] = q[n]
    t[1, 40:] = 4
    ql = rng.integers(1, Lq + 1, N).astype(np.int32)
    ql[0] = 0
    tl = np.full(N, Lt, np.int32)
    got, gpv, gmv = myers_batch_planes_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql), jnp.asarray(tl),
        pair_sub=1, interpret=True)
    ref, rpv, rmv = myers_batch_planes(jnp.asarray(q), jnp.asarray(t),
                                       jnp.asarray(ql), jnp.asarray(tl))
    np.testing.assert_array_equal(np.asarray(got.dist), np.asarray(ref.dist))
    np.testing.assert_array_equal(np.asarray(got.tend), np.asarray(ref.tend))
    np.testing.assert_array_equal(np.asarray(gpv), np.asarray(rpv))
    np.testing.assert_array_equal(np.asarray(gmv), np.asarray(rmv))
