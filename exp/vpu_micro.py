"""Microbenchmark: v5e VPU elementwise throughput under Mosaic.

Measures int32 add/max throughput on (R, 128) tiles in a long unrolled
chain, with C independent chains (ILP), over the whole grid.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make(R=128, C=1, STEPS=2048, dtype=jnp.int32):
    def kernel(x_ref, o_ref):
        xs = [x_ref[:, :] + i for i in range(C)]
        for s in range(STEPS):
            g = s % C
            xs[g] = jnp.maximum(xs[g] + 1, xs[g])
        acc = xs[0]
        for g in range(1, C):
            acc = acc + xs[g]
        o_ref[:, :] = acc

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(8,),
            in_specs=[pl.BlockSpec((R, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), dtype),
        )(x)
    return run, STEPS


def bench(R=128, C=1, STEPS=2048, dtype=jnp.int32, label=""):
    run, steps = make(R, C, STEPS, dtype)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 100, (R, 128)).astype(np.int32)).astype(dtype)

    @jax.jit
    def many(x):
        def body(i, a):
            return a + run(x + i.astype(dtype))[0, 0].astype(jnp.int32)
        return jax.lax.fori_loop(0, 8, body, jnp.int32(0))

    _ = int(many(x))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        _ = int(many(x))
        dt = (time.perf_counter() - t0) / 8
        best = dt if best is None else min(best, dt)
    # ops: 2 vector ops per step (add, max) on R*128 lanes, x8 grid, per call
    lane_ops = 2 * steps * R * 128 * 8
    vreg_ops = 2 * steps * (R * 128 * (4 if dtype == jnp.int32 else 2) // 4096) * 8
    print(f"{label or dtype.__name__} R={R} C={C}: {lane_ops/best/1e9:8.1f} "
          f"G lane-ops/s  {vreg_ops/best/1e9:7.2f} G vreg-ops/s "
          f"({vreg_ops/best/0.94e9:5.2f} vreg-ops/cycle)")


if __name__ == "__main__":
    for C in (1, 2, 4, 8):
        bench(R=128, C=C)
    bench(R=8, C=4)
    bench(R=8, C=8)


def bench_mxu(M=512, K=512, N=512):
    import functools
    a = jnp.asarray(np.random.default_rng(0).normal(size=(M, K)),
                    dtype=jnp.bfloat16)
    b = jnp.asarray(np.random.default_rng(1).normal(size=(K, N)),
                    dtype=jnp.bfloat16)

    @jax.jit
    def many(a, b):
        def body(i, acc):
            c = jnp.dot(a + acc.astype(jnp.bfloat16), b,
                        preferred_element_type=jnp.float32)
            return acc + c[0, 0]
        return jax.lax.fori_loop(0, 32, body, jnp.float32(0))

    _ = float(many(a, b))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(many(a, b))
        dt = (time.perf_counter() - t0) / 32
        best = dt if best is None else min(best, dt)
    fl = 2 * M * K * N
    print(f"mxu bf16 {M}x{K}x{N}: {fl/best/1e12:6.2f} TFLOP/s")
