import os
os.environ["JAX_PLATFORMS"] = "cpu"
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, Lq = 128, 16

def copy_kernel(dlo_ref, out_ref):
    out_ref[:, :] = dlo_ref[:, :]

import exp.sw_variants as V
dlo, dhi = V._dlohi(jnp.full((P,), 13, jnp.int32), jnp.full((P,), 18, jnp.int32), Lq, 4)
print("host dlo row0 :", np.asarray(dlo)[0])
print("host dlo row5 :", np.asarray(dlo)[5])
print("host dhi row0 :", np.asarray(dhi)[0])

spec = pl.BlockSpec((P, Lq), lambda i: (i, 0), memory_space=pltpu.VMEM)
out = pl.pallas_call(
    copy_kernel, grid=(1,), in_specs=[spec], out_specs=spec,
    out_shape=jax.ShapeDtypeStruct((P, Lq), jnp.int32), interpret=True,
)(dlo)
print("kernel sees row0:", np.asarray(out)[0])
print("kernel sees row5:", np.asarray(out)[5])
