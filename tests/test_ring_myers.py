"""Ring sequence-parallel Myers vs the single-device engine (SURVEY.md §3.1
SP/CP + ring rows; §5.4 virtual-mesh testing)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from hga_tpu.ops.myers import myers_batch
from hga_tpu.parallel.mesh import make_mesh
from hga_tpu.parallel.ring_myers import myers_ring


@pytest.mark.parametrize("ndev,bpd", [(2, 2), (8, 2), (4, 1), (4, 4)])
def test_ring_matches_single_device(ndev, bpd):
    mesh = make_mesh(devices=jax.devices()[:ndev])
    rng = np.random.default_rng(11)
    N, Lq, Lt = 4 * ndev * bpd, 45, 48 * ndev
    q = rng.integers(0, 4, (N, Lq)).astype(np.int32)
    t = rng.integers(0, 4, (N, Lt)).astype(np.int32)
    for n in range(0, N, 2):  # plant overlaps, some crossing chunk borders
        off = int(rng.integers(0, Lt - Lq))
        t[n, off:off + Lq] = q[n]
        t[n, off + 7] = (t[n, off + 7] + 1) % 4
    ql = rng.integers(1, Lq + 1, N).astype(np.int32)
    ql[1] = 0
    tl = rng.integers(Lt // 2, Lt + 1, N).astype(np.int32)
    got = myers_ring(mesh, jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                     jnp.asarray(tl), blocks_per_dev=bpd)
    ref = myers_batch(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                      jnp.asarray(tl))
    np.testing.assert_array_equal(np.asarray(got.dist), np.asarray(ref.dist))
    np.testing.assert_array_equal(np.asarray(got.tend), np.asarray(ref.tend))
