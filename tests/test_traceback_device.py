"""Device traceback + vote scatter vs the host oracle walk (SURVEY.md §5.1)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from hga_tpu.models.correction import _traceback_votes
from hga_tpu.ops import pileup as PU
from hga_tpu.ops.align import banded_sw_batch_dirs


def test_device_votes_match_host_walk():
    rng = np.random.default_rng(7)
    P, Lq, band = 16, 48, 16
    Wt = Lq + band + 8
    NB, Lpad = 4, 96
    q = rng.integers(0, 4, (P, Lq)).astype(np.int32)
    t = rng.integers(0, 4, (P, Wt)).astype(np.int32)
    # plant noisy copies so real alignments (with indels) exist
    for n in range(P):
        o = int(rng.integers(0, band))
        seg = list(q[n])
        for _ in range(int(rng.integers(0, 5))):
            p = int(rng.integers(0, len(seg)))
            r = int(rng.integers(0, 3))
            if r == 0:
                seg[p] = (seg[p] + 1) % 4
            elif r == 1 and len(seg) > 4:
                del seg[p]
            else:
                seg.insert(p, int(rng.integers(0, 4)))
        t[n, o:o + len(seg)] = np.array(seg[:Wt - o])
    ql = np.full(P, Lq, np.int32)
    tl = np.full(P, Wt, np.int32)
    res, dirs = banded_sw_batch_dirs(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql), jnp.asarray(tl),
        band=band)
    score = np.asarray(res.score)
    qend = np.where(score >= 20, np.asarray(res.qend), 0)
    tend = np.asarray(res.tend)
    bb = rng.integers(0, NB, P).astype(np.int32)
    off = rng.integers(-4, 4, P).astype(np.int32)
    lb = np.full(P, Lpad - 8, np.int32)

    # host oracle walk
    votes_h = np.zeros((NB, Lpad, PU.N_SYM), np.int32)
    ins_h = np.zeros((NB, Lpad, 3, 4), np.int32)
    pid, col, sym, ipid, icol, ibase, islot = _traceback_votes(
        np.asarray(dirs), qend, tend, band, Wt, q)
    colf = col + off[pid]
    ok = (colf >= 0) & (colf < lb[pid])
    np.add.at(votes_h, (bb[pid[ok]], colf[ok], sym[ok]), 1)
    icolf = icol + off[ipid]
    oki = (icolf >= 0) & (icolf < lb[ipid]) & (islot < 3)
    np.add.at(ins_h, (bb[ipid[oki]], icolf[oki], islot[oki], ibase[oki]), 1)

    # device path
    votes_d, ins_d = PU.accumulate_backbone_votes(
        jnp.zeros((NB * Lpad * PU.N_SYM,), jnp.int32),
        jnp.zeros((NB * Lpad * 3 * 4,), jnp.int32),
        dirs, jnp.asarray(qend.astype(np.int32)), jnp.asarray(tend),
        jnp.asarray(q), jnp.asarray(bb), jnp.asarray(off), jnp.asarray(lb),
        lpad=Lpad, band=band, Lt=Wt)
    votes_d = np.asarray(votes_d).reshape(NB, Lpad, PU.N_SYM)
    ins_d = np.asarray(ins_d).reshape(NB, Lpad, 3, 4)
    assert int(votes_d.sum()) > 0
    np.testing.assert_array_equal(votes_d, votes_h)
    np.testing.assert_array_equal(ins_d, ins_h)
