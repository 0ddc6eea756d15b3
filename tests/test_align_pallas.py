"""L3: Pallas wavefront kernel == XLA wavefront (interpret mode on CPU).

Compiled-mode equivalence runs on real TPU hardware in bench/verify drives;
here the kernel logic is checked bit-exact via the interpreter
(SURVEY.md §6: Pallas interpret mode is the kernel 'sanitizer').
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from hga_tpu.ops.align import banded_sw_batch
from hga_tpu.ops.align_pallas import banded_sw_batch_pallas


@pytest.mark.parametrize("band,Lq,Lt", [(9, 24, 32), (16, 40, 40)])
def test_pallas_matches_xla(rng, band, Lq, Lt):
    N = 8
    q = jnp.asarray(rng.integers(0, 4, (N, Lq)).astype(np.int32))
    t = jnp.asarray(rng.integers(0, 4, (N, Lt)).astype(np.int32))
    ql = jnp.asarray(rng.integers(1, Lq + 1, N).astype(np.int32))
    tl = jnp.asarray(rng.integers(1, Lt + 1, N).astype(np.int32))
    r1 = banded_sw_batch(q, t, ql, tl, band=band)
    # small blk keeps interpret-mode runtime down (must be 128 on hardware)
    r2 = banded_sw_batch_pallas(q, t, ql, tl, band=band, pair_tile=8,
                                interpret=True, blk=8)
    np.testing.assert_array_equal(np.asarray(r1.score), np.asarray(r2.score))
    np.testing.assert_array_equal(np.asarray(r1.qend), np.asarray(r2.qend))
    np.testing.assert_array_equal(np.asarray(r1.tend), np.asarray(r2.tend))


def test_pallas_rejects_bad_tile():
    q = jnp.zeros((6, 32), jnp.int32)
    t = jnp.zeros((6, 32), jnp.int32)
    l = jnp.full((6,), 32, jnp.int32)
    with pytest.raises(ValueError, match="pair_tile"):
        banded_sw_batch_pallas(q, t, l, l, band=8, pair_tile=8)


@pytest.mark.parametrize("band,Lq,Lt", [(9, 24, 32), (16, 40, 40)])
def test_pallas_narrow_int16_matches_xla(rng, band, Lq, Lt):
    """int16-state variant (2x register packing) stays bit-exact."""
    N = 8
    q = jnp.asarray(rng.integers(0, 4, (N, Lq)).astype(np.int32))
    t = jnp.asarray(rng.integers(0, 4, (N, Lt)).astype(np.int32))
    ql = jnp.asarray(rng.integers(1, Lq + 1, N).astype(np.int32))
    tl = jnp.asarray(rng.integers(1, Lt + 1, N).astype(np.int32))
    r1 = banded_sw_batch(q, t, ql, tl, band=band)
    r2 = banded_sw_batch_pallas(q, t, ql, tl, band=band, pair_tile=8,
                                interpret=True, blk=8, narrow=True)
    np.testing.assert_array_equal(np.asarray(r1.score), np.asarray(r2.score))
    np.testing.assert_array_equal(np.asarray(r1.qend), np.asarray(r2.qend))
    np.testing.assert_array_equal(np.asarray(r1.tend), np.asarray(r2.tend))
