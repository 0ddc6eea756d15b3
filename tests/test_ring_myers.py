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


@pytest.mark.parametrize("ndev,bpd", [(4, 2), (8, 1)])
def test_ring_shared_target(ndev, bpd):
    """One (1, Lt) target row shared by every query — the long-context
    sweep shape (segment_identity): columns chip-sharded, queries
    pipelined through the ring."""
    mesh = make_mesh(devices=jax.devices()[:ndev])
    rng = np.random.default_rng(3)
    N, Lq, Lt = 4 * ndev * bpd, 37, 64 * ndev
    t = rng.integers(0, 4, (1, Lt)).astype(np.int32)
    q = rng.integers(0, 4, (N, Lq)).astype(np.int32)
    for n in range(0, N, 2):   # plant segments of the target as queries
        off = int(rng.integers(0, Lt - Lq))
        q[n] = t[0, off:off + Lq]
        q[n, 5] = (q[n, 5] + 1) % 4
    ql = rng.integers(1, Lq + 1, N).astype(np.int32)
    ql[0] = 0
    tl = np.full(N, Lt - 3, np.int32)
    got = myers_ring(mesh, jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                     jnp.asarray(tl), blocks_per_dev=bpd)
    ref = myers_batch(jnp.asarray(q),
                      jnp.asarray(np.broadcast_to(t, (N, Lt))),
                      jnp.asarray(ql), jnp.asarray(tl))
    np.testing.assert_array_equal(np.asarray(got.dist), np.asarray(ref.dist))
    np.testing.assert_array_equal(np.asarray(got.tend), np.asarray(ref.tend))


def test_segment_identity_ring_matches_single():
    """The production long-context call site: utils/evalx.segment_identity
    through models/overlap.default_edit picks the ring on a mesh and must
    equal the single-device sweep; perfect contigs score identity 1."""
    from hga_tpu.utils import sim
    from hga_tpu.utils.evalx import segment_identity

    genome = sim.random_genome(3000, seed=21)
    c1 = list(genome[1300:2900])
    for p in range(10, len(c1), 97):        # sprinkle substitutions
        c1[p] = "ACGT"[("ACGT".index(c1[p]) + 1) % 4]
    contigs = [("c0", genome[:1400]), ("c1", "".join(c1))]
    single = segment_identity(contigs, genome, mesh=None, seg=96)
    mesh = make_mesh(devices=jax.devices()[:8])
    ringed = segment_identity(contigs, genome, mesh=mesh, seg=96)
    assert single == ringed
    perfect = segment_identity([("g", genome)], genome, mesh=mesh, seg=96)
    assert perfect["segment_identity"] == 1.0
