import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax.numpy as jnp
import jax.experimental.pallas as pl
_orig = pl.pallas_call
def patched(*a, **k):
    k["interpret"] = True
    return _orig(*a, **k)
pl.pallas_call = patched

import exp.sw_variants as V
V.pl.pallas_call = patched

q1 = np.array([2, 1, 3, 3, 0, 2, 3, 2, 2, 2, 2, 1, 0, 1, 3, 2], np.int32)
t1 = np.array([2, 3, 2, 1, 0, 0, 1, 3, 3, 1, 2, 0, 1, 1, 3, 1, 1, 0,
               1, 2, 3, 0, 1, 2], np.int32)
N = 128
q = np.tile(q1, (N, 1))
t = np.tile(t1, (N, 1))
ql = np.full(N, 13, np.int32)
tl = np.full(N, 18, np.int32)

for blk in (8, 16):
    r = V.sw_pallas_exp(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                        jnp.asarray(tl), band=4, variant="v1", blk=blk)
    s = np.asarray(r.score)
    print("blk", blk, "scores uniq:", np.unique(s), "qend", np.unique(np.asarray(r.qend)),
          "tend", np.unique(np.asarray(r.tend)))

r = V.sw_pallas_exp(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                    jnp.asarray(tl), band=4, variant="v1", blk=8)
s = np.asarray(r.score)
print("rows with 6:", np.nonzero(s == 6)[0][:20])
print("rows with 4:", np.nonzero(s == 4)[0][:20])
