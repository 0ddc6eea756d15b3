"""Microbenchmark: correction's device path = planes DP + plane traceback
+ vote scatter (the judged-scale binding constraint, ~34k aln/s round 4).

Times the DP alone vs the fused step at correction shapes, with and
without the max_steps path bound, to attribute the drain seconds.

Usage: python -m exp.bench_corr_tb [P=4096] [iters=8]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    Lq, band = 112, 64
    Wt = Lq + band + 8
    rng = np.random.default_rng(0)

    from hga_tpu.models.correction import _planes_inner
    from hga_tpu.ops import pileup as PU

    planes = _planes_inner()
    q = jnp.asarray(rng.integers(0, 4, (P, Lq)).astype(np.int32))
    t = jnp.asarray(rng.integers(0, 4, (P, Wt)).astype(np.int32))
    ql = jnp.asarray(np.full(P, Lq, np.int32))
    tl = jnp.asarray(np.full(P, Wt, np.int32))
    nb, Lpad = 64, 8192
    bb = jnp.asarray(rng.integers(0, nb, P).astype(np.int32))
    off = jnp.asarray(rng.integers(0, Lpad - Wt, P).astype(np.int32))
    lb = jnp.asarray(np.full(P, Lpad, np.int32))
    size_v = nb * Lpad * PU.N_SYM
    size_i = nb * Lpad * 3 * 4

    def dp_only():
        r, pv, mv = planes(q, t, ql, tl)
        return r.dist.block_until_ready()

    def fused(max_steps):
        merged = jnp.zeros((size_v + size_i,), jnp.int32)
        r, pv, mv = planes(q, t, ql, tl)
        ok = (r.dist <= 28) & (r.tend > 0)
        qend = jnp.where(ok, ql, 0)
        m = PU.accumulate_backbone_votes_myers(
            merged, pv, mv, r.dist, qend, r.tend, q, t, bb, off, lb,
            size_v=size_v, lpad=Lpad, ins_slots=3, max_steps=max_steps)
        return m.block_until_ready()

    for name, fn in (("dp_only", dp_only),
                     ("fused_full_S", lambda: fused(None)),
                     ("fused_bounded", lambda: fused(Lq + 28 + 2))):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.1f} ms/batch = {P/dt:,.0f} aln/s",
              flush=True)


if __name__ == "__main__":
    main()
