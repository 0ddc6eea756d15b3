"""Plane-based Myers traceback (ops/pileup.accumulate_backbone_votes_myers)
vs the scalar oracle (utils/oracle.hw_traceback_votes) — bit-exact votes.

This is the correction-path engine swap (ROADMAP 'Myers-with-traceback'):
the DP runs on the bit-parallel engine and the traceback re-derives moves
from the stored Pv/Mv vertical-delta planes instead of a dirs tensor.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from hga_tpu.ops.myers import myers_batch_planes, n_words
from hga_tpu.ops import pileup as PU
from hga_tpu.utils import oracle


def _rand_batch(rng, P, Lq, Lt, err=0.15, sent_frac=0.2):
    """Targets embed a mutated copy of each query plus sentinel tails."""
    q = rng.integers(0, 4, (P, Lq)).astype(np.int32)
    t = rng.integers(0, 4, (P, Lt)).astype(np.int32)
    qlen = rng.integers(1, Lq + 1, P).astype(np.int32)
    tlen = np.full(P, Lt, np.int32)
    for p in range(P):
        L = int(qlen[p])
        q[p, L:] = 4
        s = rng.integers(0, max(1, Lt - L))
        m = q[p, :L].copy()
        flips = rng.random(L) < err
        m[flips] = rng.integers(0, 4, flips.sum())
        t[p, s:s + L] = m[: max(0, Lt - s)]
        if rng.random() < sent_frac:
            cut = rng.integers(0, Lt)
            t[p, cut:] = 4
    return q, t, qlen, tlen


@pytest.mark.parametrize("Lq,Lt", [(14, 24), (40, 70), (70, 130)])
def test_planes_prefix_reconstructs_dp(rng, Lq, Lt):
    P = 8
    q, t, qlen, tlen = _rand_batch(rng, P, Lq, Lt)
    res, pvp, mvp = myers_batch_planes(jnp.asarray(q), jnp.asarray(t),
                                       jnp.asarray(qlen), jnp.asarray(tlen))
    pvp, mvp = np.asarray(pvp), np.asarray(mvp)
    W = n_words(Lq)
    for p in range(P):
        m = int(qlen[p])
        d, j = oracle.edit_distance_hw(q[p, :m], t[p])
        assert int(res.dist[p]) == d and int(res.tend[p]) == j
        # D(i, col) == prefix sum of plane bits 0..i-1 for a few columns
        D = np.zeros((m + 1, Lt + 1), np.int64)
        D[:, 0] = np.arange(m + 1)
        qq, tt = q[p, :m].astype(np.int64), t[p].astype(np.int64)
        for c in range(1, Lt + 1):
            sub = ((qq != tt[c - 1]) | (qq >= 4)
                   | (tt[c - 1] >= 4)).astype(np.int64)
            for i in range(1, m + 1):
                D[i, c] = min(D[i - 1, c - 1] + sub[i - 1], D[i - 1, c] + 1,
                              D[i, c - 1] + 1)
        for c in [1, Lt // 2, Lt]:
            bits_p = [(int(pvp[c - 1, p, w]) >> b) & 1
                      for w in range(W) for b in range(31)]
            bits_m = [(int(mvp[c - 1, p, w]) >> b) & 1
                      for w in range(W) for b in range(31)]
            pref = np.cumsum(np.array(bits_p[:m]) - np.array(bits_m[:m]))
            assert np.array_equal(pref, D[1:, c])


def test_insertion_votes_clipped_at_window_start(rng):
    """A read prefix hanging BEFORE the window (traceback reaches j == 0
    with i > 0) must not vote insertions at backbone column off-1 when the
    window starts mid-backbone (off > 0) — round-2 advisor fix: the SW dirs
    engine clips these, the plane walk must too."""
    P, Lq, K = 8, 24, 8
    Lt = Lq - K + 4                     # window holds exactly q's suffix
    q = rng.integers(0, 4, (P, Lq)).astype(np.int32)
    t = np.full((P, Lt), 4, np.int32)
    t[:, :Lq - K] = q[:, K:]            # suffix of q == start of window
    qlen = np.full(P, Lq, np.int32)
    tlen = np.full(P, Lt, np.int32)
    res, pvp, mvp = myers_batch_planes(jnp.asarray(q), jnp.asarray(t),
                                       jnp.asarray(qlen), jnp.asarray(tlen))
    dist = np.asarray(res.dist)
    tend = np.asarray(res.tend)
    assert np.all(dist == K) and np.all(tend == Lq - K)

    INS, lpad, off0 = 3, 64, 5
    size_v = P * lpad * PU.N_SYM
    merged = jnp.zeros((size_v + P * lpad * INS * 4,), jnp.int32)
    merged = PU.accumulate_backbone_votes_myers(
        merged, pvp, mvp, jnp.asarray(dist), jnp.asarray(qlen),
        jnp.asarray(tend), jnp.asarray(q), jnp.asarray(t),
        jnp.arange(P, dtype=jnp.int32),
        jnp.full(P, off0, jnp.int32), jnp.full(P, lpad, jnp.int32),
        size_v=size_v, lpad=lpad, ins_slots=INS)
    got_v = np.asarray(merged[:size_v]).reshape(P, lpad, PU.N_SYM)
    got_i = np.asarray(merged[size_v:]).reshape(P, lpad, INS, 4)
    # the K overhanging prefix bases are NOT insertions after column off0-1
    assert got_i.sum() == 0
    # the matched suffix votes land at backbone columns off0..off0+Lq-K-1
    for p in range(P):
        for c in range(Lq - K):
            assert got_v[p, off0 + c, q[p, K + c]] == 1


@pytest.mark.parametrize("Lq,Lt,seed", [(20, 40, 0), (62, 100, 1),
                                        (93, 150, 2)])
def test_myers_traceback_votes_match_oracle(rng, Lq, Lt, seed):
    P = 16
    r = np.random.default_rng(seed)
    q, t, qlen, tlen = _rand_batch(r, P, Lq, Lt)
    res, pvp, mvp = myers_batch_planes(jnp.asarray(q), jnp.asarray(t),
                                       jnp.asarray(qlen), jnp.asarray(tlen))
    dist = np.asarray(res.dist)
    tend = np.asarray(res.tend)
    # production gate: edit rate; here a loose one that keeps most pairs
    keep = dist <= np.maximum(2, (0.35 * qlen).astype(np.int32))
    qend = np.where(keep & (tend > 0), qlen, 0).astype(np.int32)

    INS = 3
    lpad = Lt
    size_v = P * lpad * PU.N_SYM
    merged = jnp.zeros((size_v + P * lpad * INS * 4,), jnp.int32)
    merged = PU.accumulate_backbone_votes_myers(
        merged, pvp, mvp, jnp.asarray(dist), jnp.asarray(qend),
        jnp.asarray(tend), jnp.asarray(q), jnp.asarray(t),
        jnp.arange(P, dtype=jnp.int32),
        jnp.zeros(P, jnp.int32), jnp.full(P, Lt, jnp.int32),
        size_v=size_v, lpad=lpad, ins_slots=INS)
    got_v = np.asarray(merged[:size_v]).reshape(P, lpad, PU.N_SYM)
    got_i = np.asarray(merged[size_v:]).reshape(P, lpad, INS, 4)

    exp_v = np.zeros_like(got_v)
    exp_i = np.zeros_like(got_i)
    for p in range(P):
        if qend[p] == 0:
            continue
        m = int(qlen[p])
        d, j, subs, inss = oracle.hw_traceback_votes(q[p, :m], t[p])
        assert d == int(dist[p]) and j == int(tend[p])
        for col, sym in subs:
            if 0 <= col < Lt:
                exp_v[p, col, sym] += 1
        for col, base, slot in inss:
            if 0 <= col < Lt and slot < INS and base < 4:
                exp_i[p, col, slot, base] += 1
    assert np.array_equal(got_v, exp_v)
    assert np.array_equal(got_i, exp_i)
