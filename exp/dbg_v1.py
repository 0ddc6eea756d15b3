"""Find a minimal failing case for variant v1 in interpret mode (CPU)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax.numpy as jnp

import exp.sw_variants as V
from hga_tpu.ops.align import banded_sw_batch
from hga_tpu.utils import oracle

# monkeypatch pallas_call to interpret mode
import jax.experimental.pallas as pl
_orig = pl.pallas_call
def patched(*a, **k):
    k["interpret"] = True
    return _orig(*a, **k)
pl.pallas_call = patched
V.pl.pallas_call = patched

rng = np.random.default_rng(1)
N, Lq, Lt, band = 128, 16, 24, 4
q = rng.integers(0, 4, (N, Lq)).astype(np.int32)
t = rng.integers(0, 4, (N, Lt)).astype(np.int32)
ql = rng.integers(Lq // 2, Lq + 1, N).astype(np.int32)
tl = rng.integers(Lt // 2, Lt + 1, N).astype(np.int32)

ref = banded_sw_batch(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                      jnp.asarray(tl), band=band)
got = V.sw_pallas_exp(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                      jnp.asarray(tl), band=band, variant="v1",
                      pair_tile=128, blk=8)
rs, gs = np.asarray(ref.score), np.asarray(got.score)
bad = np.nonzero(rs != gs)[0]
print("bad:", bad[:10], "of", N)
if bad.size:
    n = int(bad[0])
    print("pair", n, "ql", ql[n], "tl", tl[n], "ref", rs[n], "got", gs[n])
    print("q:", q[n, :ql[n]])
    print("t:", t[n, :tl[n]])
    # oracle full DP for ground truth
    o = oracle.banded_sw(q[n, :ql[n]], t[n, :tl[n]], band=band)
    print("oracle:", o)
