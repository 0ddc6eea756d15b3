"""L3: wavefront banded SW vs NumPy oracle (bit-exact score + end cell)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from hga_tpu.io import encode as E
from hga_tpu.ops.align import banded_sw_batch, sw_cells
from hga_tpu.utils import oracle
from hga_tpu.utils import sim


def _run_batch(pairs, band, Lq=None, Lt=None, **scores):
    P = len(pairs)
    Lq = Lq or max(len(a) for a, _ in pairs)
    Lt = Lt or max(len(b) for _, b in pairs)
    q = np.zeros((P, Lq), np.int32)
    t = np.zeros((P, Lt), np.int32)
    qlen = np.zeros(P, np.int32)
    tlen = np.zeros(P, np.int32)
    for idx, (a, b) in enumerate(pairs):
        q[idx, : len(a)] = a
        t[idx, : len(b)] = b
        qlen[idx] = len(a)
        tlen[idx] = len(b)
    r = banded_sw_batch(jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
                        jnp.asarray(tlen), band=band, **scores)
    return (np.asarray(r.score), np.asarray(r.qend), np.asarray(r.tend))


def _codes(s):
    return E.encode_bases(s)[0].astype(np.int64)


def test_identical_sequences():
    s = _codes("ACGTACGTGGCATT")
    score, qend, tend = _run_batch([(s, s)], band=4)
    assert score[0] == 2 * len(s)
    assert qend[0] == len(s) and tend[0] == len(s)


def test_no_similarity():
    a = _codes("AAAAAAAA")
    b = _codes("CCCCCCCC")
    score, qend, tend = _run_batch([(a, b)], band=4)
    assert score[0] == 0 and qend[0] == 0 and tend[0] == 0


@pytest.mark.parametrize("band", [3, 8, 17])
def test_random_pairs_match_oracle(rng, band):
    pairs = []
    for _ in range(24):
        La = int(rng.integers(5, 60))
        Lb = int(rng.integers(5, 60))
        pairs.append((rng.integers(0, 4, La), rng.integers(0, 4, Lb)))
    # adversarial: homopolymers, short, equal, off-by-one lengths
    pairs += [
        (np.zeros(30, np.int64), np.zeros(29, np.int64)),
        (np.array([1]), np.array([1])),
        (np.array([1]), np.array([2])),
        (np.tile([0, 1], 20), np.tile([1, 0], 20)),
    ]
    score, qend, tend = _run_batch(pairs, band=band)
    for idx, (a, b) in enumerate(pairs):
        exp = oracle.banded_sw(a, b, band=band)
        assert score[idx] == exp["score"], (idx, band)
        assert qend[idx] == exp["qend"], (idx, band)
        assert tend[idx] == exp["tend"], (idx, band)


def test_mutated_overlap_recovers():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 4, 400)
    a = g[:260].copy()
    b = g[160:].copy()  # 100bp true overlap at a[160:260] == b[0:100]
    # a few substitutions in the overlap
    b[10] = (b[10] + 1) % 4
    b[50] = (b[50] + 2) % 4
    score, qend, tend = _run_batch([(a[160:260], b[:100])], band=8)
    exp = oracle.banded_sw(a[160:260], b[:100], band=8)
    assert score[0] == exp["score"] > 150
    assert qend[0] == exp["qend"]


def test_custom_scoring(rng):
    a = rng.integers(0, 4, 40)
    b = rng.integers(0, 4, 40)
    score, qend, tend = _run_batch([(a, b)], band=6, match=3, mismatch=-2,
                                   gap=-1)
    exp = oracle.banded_sw(a, b, band=6, match=3, mismatch=-2, gap=-1)
    assert score[0] == exp["score"]


def test_sw_cells_counts():
    # full matrix when band >= max len
    assert sw_cells([10], [10], band=20) == 100
    # band 0 = main diagonal only
    assert sw_cells([10], [10], band=0) == 10
