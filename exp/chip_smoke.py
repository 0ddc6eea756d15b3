"""Chip smoke: assert Pallas kernels == XLA on REAL TPU hardware shapes.

CI runs the Pallas kernels in interpret mode only (the test env is CPU),
so a Mosaic/compile regression on real silicon would otherwise surface as
a silent probe-compile fallback to XLA (ops/dispatch.py logs a warning
but production keeps running, slower).  This script is the one-command
hardware gate (round-2 verdict item 7): run it on the chip after any
kernel change.

    python -m exp.chip_smoke            # hardware shapes, N=1024, tiles 128/8

Checks, all bit-exact:
  1. myers_batch_pallas        == myers_batch          (dist, tend)
  2. banded_sw_batch_pallas    == banded_sw_batch      (score, qend, tend)
  3. myers_batch_planes_pallas == myers_batch_planes   (dist, tend, Pv, Mv)
     and the plane-traceback votes fed by each are identical.

Exit code 0 = all green; raises on the first mismatch.
"""

import sys

import numpy as np


def _eq(name, a, b):
    a, b = np.asarray(a), np.asarray(b)
    if not np.array_equal(a, b):
        bad = int(np.sum(a != b))
        raise AssertionError(f"{name}: {bad}/{a.size} cells differ "
                             f"(first at {np.argwhere(a != b)[0]})")
    print(f"  ok: {name} ({a.size} values)")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from hga_tpu.ops.align import banded_sw_batch
    from hga_tpu.ops.align_pallas import banded_sw_batch_pallas
    from hga_tpu.ops.myers import myers_batch, myers_batch_planes
    from hga_tpu.ops.myers_pallas import (myers_batch_pallas,
                                          myers_batch_planes_pallas)
    from hga_tpu.ops import pileup as PU

    plat = jax.devices()[0].platform
    print(f"platform: {plat} ({jax.devices()[0]})")
    if plat not in ("tpu", "axon"):
        print("NOT a TPU — this smoke validates real-silicon Mosaic "
              "lowering; run it on the chip.", file=sys.stderr)
        return 2

    rng = np.random.default_rng(7)
    N, Lq, Lt, band = 1024, 128, 192, 64
    # realistic pairs: target = mutated query slice + random flanks, so
    # traceback paths exercise diag/up/left, not just the random-identity row
    q = rng.integers(0, 4, (N, Lq)).astype(np.int32)
    t = rng.integers(0, 4, (N, Lt)).astype(np.int32)
    ins = rng.random((N, Lq)) < 0.05
    sub = rng.random((N, Lq)) < 0.05
    mut = np.where(sub, (q + 1 + rng.integers(0, 3, q.shape)) % 4, q)
    for i in range(N):
        seg = mut[i][~ins[i]]
        t[i, 16 : 16 + seg.size] = seg[: Lt - 16]
    ql = np.full(N, Lq, np.int32)
    ql[: N // 8] = rng.integers(32, Lq, N // 8)       # ragged lengths
    tl = np.full(N, Lt, np.int32)
    jq, jt = jnp.asarray(q), jnp.asarray(t)
    jql, jtl = jnp.asarray(ql), jnp.asarray(tl)

    print("1) Myers gate: pallas vs XLA")
    rp = jax.block_until_ready(myers_batch_pallas(jq, jt, jql, jtl))
    rx = jax.block_until_ready(myers_batch(jq, jt, jql, jtl))
    _eq("myers.dist", rp.dist, rx.dist)
    _eq("myers.tend", rp.tend, rx.tend)

    print("2) scored banded SW: pallas (int32 + int16) vs XLA")
    sx = jax.block_until_ready(banded_sw_batch(jq, jt, jql, jtl, band=band))
    for narrow in (False, True):
        tag = "sw_i16" if narrow else "sw"
        try:
            sp = jax.block_until_ready(banded_sw_batch_pallas(
                jq, jt, jql, jtl, band=band, pair_tile=128, narrow=narrow))
        except Exception as e:
            if not narrow:
                raise
            # the int16 variant needs vector i16 comparisons, which some
            # Mosaic targets lack (v5e: "Target does not support this
            # comparison"); production probe-compiles and falls back to
            # int32 (models/overlap._sw_inner), so this is informational
            print(f"  skip: {tag} does not compile on this target "
                  f"({str(e).splitlines()[0][:90]})")
            continue
        _eq(f"{tag}.score", sp.score, sx.score)
        _eq(f"{tag}.qend", sp.qend, sx.qend)
        _eq(f"{tag}.tend", sp.tend, sx.tend)

    print("3) Myers planes + traceback votes: pallas vs XLA")
    (pp, pvp, mvp) = jax.block_until_ready(
        myers_batch_planes_pallas(jq, jt, jql, jtl))
    (px, pvx, mvx) = jax.block_until_ready(
        myers_batch_planes(jq, jt, jql, jtl))
    _eq("planes.dist", pp.dist, px.dist)
    _eq("planes.tend", pp.tend, px.tend)
    _eq("planes.Pv", pvp, pvx)
    _eq("planes.Mv", mvp, mvx)

    nb, lpad, ins_slots = 8, 512, 3
    size_v = nb * lpad * PU.N_SYM
    size_all = size_v + nb * lpad * ins_slots * 4
    bb = jnp.asarray(rng.integers(0, nb, N).astype(np.int32))
    off = jnp.asarray(rng.integers(0, lpad - Lt, N).astype(np.int32))
    lb = jnp.asarray(np.full(N, lpad, np.int32))
    args = (pp.dist, jql, pp.tend, jq, jt, bb, off, lb)
    vp = PU.accumulate_backbone_votes_myers(
        jnp.zeros((size_all,), jnp.int32), pvp, mvp, *args,
        size_v=size_v, lpad=lpad, ins_slots=ins_slots)
    vx = PU.accumulate_backbone_votes_myers(
        jnp.zeros((size_all,), jnp.int32), pvx, mvx, *args,
        size_v=size_v, lpad=lpad, ins_slots=ins_slots)
    _eq("traceback.votes", vp, vx)

    print("ALL GREEN: pallas == XLA on hardware shapes "
          f"(N={N}, Lq={Lq}, Lt={Lt}, band={band})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
