"""Kernel experiment harness: banded-SW Pallas variants vs the XLA oracle.

Run on the real chip:  python exp/sw_variants.py [--time] [--variants v1,v2]

Not part of the package; the winning variant gets folded into
hga_tpu/ops/align_pallas.py.
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hga_tpu.ops.align import SWResult, banded_sw_batch, sw_cells

I32 = jnp.int32
I16 = jnp.int16


# ---------------------------------------------------------------- variant v1
# int32, restructured: zero-fill out-of-band state (boundary selects become
# free), per-slot d_lo/d_hi mask constants, carried shifted state (one lane
# shift per step), fused max(up,left)+gap.

def _kernel_v1(q_ref, t_ref, dlo_ref, dhi_ref,
               score_ref, qend_ref, tend_ref, win_ref,
               *, Lq: int, Lt: int, match: int, mismatch: int, gap: int,
               blk: int, no_ts: bool = False, no_s1: bool = False,
               no_mask: bool = False, no_best: bool = False):
    P = q_ref.shape[0]
    q = q_ref[:, :]
    dlo = dlo_ref[:, :]          # (P, Lq) int32 per-slot first in-band diag
    dhi = dhi_ref[:, :]          # (P, Lq) last in-band diag (-1: never)
    zero = jnp.minimum(q * 0, 0)             # (P, Lq) concrete-layout zeros
    zcol = zero[:, :1]

    S0 = Lq + Lt - 1 + blk
    n_blocks = pl.cdiv(Lq + Lt - 1, blk)
    A0 = ((S0 + 1) // blk) * blk
    C = S0 - (A0 - blk)
    WIN = ((C + Lq + 1 + 127) // 128) * 128

    def block(k, carry):
        ad1, s2, best_v, best_d = carry
        a_k = pl.multiple_of(A0 - (k + 1) * blk, blk)
        win_ref[:, :WIN] = t_ref[:, pl.ds(a_k, WIN)]
        for r in range(blk):
            d = 2 + k * blk + r
            ts = win_ref[:, 0:Lq] if no_ts else win_ref[:, C - r: C - r + Lq]
            sub = jnp.where(q == ts, jnp.int32(match), jnp.int32(mismatch))
            s1 = ad1 if no_s1 else jnp.concatenate(
                [zcol, ad1[:, :Lq - 1]], axis=1)
            td = jnp.maximum(s2 + sub, 0)
            mg = jnp.maximum(ad1, s1) + jnp.int32(gap)
            v = jnp.maximum(td, mg)
            if not no_mask:
                v = jnp.where((d >= dlo) & (d <= dhi), v, 0)
            if not no_best:
                gt = v > best_v
                best_d = jnp.where(gt, jnp.int32(d), best_d)
                best_v = jnp.maximum(best_v, v)
            s2 = s1
            ad1 = v
        return (ad1, s2, best_v, best_d)

    carry = (zero, zero, zero, zero)
    ad1, s2, best_v, best_d = jax.lax.fori_loop(0, n_blocks, block, carry)

    p_idx = jax.lax.broadcasted_iota(I32, (P, Lq), dimension=1)
    D = Lq + Lt
    vmax = jnp.max(best_v, axis=1, keepdims=True)
    is_max = best_v == vmax
    dmin = jnp.min(jnp.where(is_max, best_d, jnp.int32(2 * D)), axis=1,
                   keepdims=True)
    is_min = is_max & (best_d == dmin)
    pmin = jnp.min(jnp.where(is_min, p_idx, jnp.int32(Lq)), axis=1,
                   keepdims=True)
    has = vmax > 0
    qend = jnp.where(has, pmin + 1, 0)
    score_ref[:, :] = vmax
    qend_ref[:, :] = qend
    tend_ref[:, :] = jnp.where(has, dmin - qend, 0)


# ---------------------------------------------------------------- variant v2
# v1 in int16: 2x lane packing.  Scores fit: v <= 2*Lq <= 2048; d <= Lq+Lt.

def _kernel_v2(q_ref, t_ref, dlo_ref, dhi_ref,
               score_ref, qend_ref, tend_ref, win_ref,
               *, Lq: int, Lt: int, match: int, mismatch: int, gap: int,
               blk: int):
    P = q_ref.shape[0]
    q = q_ref[:, :]              # int16
    dlo = dlo_ref[:, :]          # int16
    dhi = dhi_ref[:, :]
    zero = jnp.minimum(q * jnp.int16(0), jnp.int16(0))
    zcol = zero[:, :1]
    m16 = jnp.int16(match)
    mm16 = jnp.int16(mismatch)
    g16 = jnp.int16(gap)

    S0 = Lq + Lt - 1 + blk
    n_blocks = pl.cdiv(Lq + Lt - 1, blk)
    A0 = ((S0 + 1) // blk) * blk
    C = S0 - (A0 - blk)
    WIN = ((C + Lq + 1 + 127) // 128) * 128

    def block(k, carry):
        ad1, s2, best_v, best_d = carry
        a_k = pl.multiple_of(A0 - (k + 1) * blk, blk)
        win_ref[:, :WIN] = t_ref[:, pl.ds(a_k, WIN)]
        for r in range(blk):
            d = 2 + k * blk + r
            d16 = jnp.int16(d)
            ts = win_ref[:, C - r: C - r + Lq]
            sub = jnp.where(q == ts, m16, mm16)
            s1 = jnp.concatenate([zcol, ad1[:, :Lq - 1]], axis=1)
            td = jnp.maximum(s2 + sub, jnp.int16(0))
            mg = jnp.maximum(ad1, s1) + g16
            v = jnp.maximum(td, mg)
            v = jnp.where((d16 >= dlo) & (d16 <= dhi), v, jnp.int16(0))
            gt = v > best_v
            best_d = jnp.where(gt, d16, best_d)
            best_v = jnp.maximum(best_v, v)
            s2 = s1
            ad1 = v
        return (ad1, s2, best_v, best_d)

    carry = (zero, zero, zero, zero)
    ad1, s2, best_v, best_d = jax.lax.fori_loop(0, n_blocks, block, carry)

    bv = best_v.astype(I32)
    bd = best_d.astype(I32)
    p_idx = jax.lax.broadcasted_iota(I32, (P, Lq), dimension=1)
    D = Lq + Lt
    vmax = jnp.max(bv, axis=1, keepdims=True)
    is_max = bv == vmax
    dmin = jnp.min(jnp.where(is_max, bd, jnp.int32(2 * D)), axis=1,
                   keepdims=True)
    is_min = is_max & (bd == dmin)
    pmin = jnp.min(jnp.where(is_min, p_idx, jnp.int32(Lq)), axis=1,
                   keepdims=True)
    has = vmax > 0
    qend = jnp.where(has, pmin + 1, 0)
    score_ref[:, :] = vmax
    qend_ref[:, :] = qend
    tend_ref[:, :] = jnp.where(has, dmin - qend, 0)


def _dlohi(qlen, tlen, Lq: int, band: int):
    """Per-slot in-band anti-diagonal bounds (slot p -> i = p+1)."""
    P = qlen.shape[0]
    i = jnp.arange(1, Lq + 1, dtype=I32)[None, :]
    ql = qlen.astype(I32)[:, None]
    tl = tlen.astype(I32)[:, None]
    dlo = jnp.broadcast_to(i + jnp.maximum(1, i - band), (P, Lq))
    dhi = jnp.where(i <= ql, i + jnp.minimum(tl, i + band), -1)
    return dlo, dhi


@functools.partial(jax.jit, static_argnames=(
    "band", "match", "mismatch", "gap", "pair_tile", "blk", "variant"))
def sw_pallas_exp(q, t, qlen, tlen, band=64, match=2, mismatch=-4, gap=-3,
                  pair_tile=128, blk=128, variant="v2"):
    N, Lq = q.shape
    Lt = t.shape[1]
    S0 = Lq + Lt - 1 + blk
    A0 = ((S0 + 1) // blk) * blk
    C = S0 - (A0 - blk)
    WIN = ((C + Lq + 1 + 127) // 128) * 128

    t_rev = jnp.flip(t.astype(I32), axis=1)
    right_pad = max(0, (A0 - blk + WIN) - (Lq + blk + Lt))
    t_ext = jnp.pad(t_rev, ((0, 0), (Lq + blk, right_pad)),
                    constant_values=-1)
    dlo, dhi = _dlohi(qlen, tlen, Lq, band)

    if variant.startswith("v3"):
        g = int(variant[3:].lstrip("g") or 4) if len(variant) > 2 else 4
        kern = functools.partial(_kernel_v3, groups=g)
        dt = I32
    elif variant.startswith("v1"):
        flags = {f"no_{f}": (f"no{f}" in variant)
                 for f in ("ts", "s1", "mask", "best")}
        kern = functools.partial(_kernel_v1, **flags)
        dt = I32
    else:
        kern, dt = _kernel_v2, I16
    qk = q.astype(dt)
    tk = t_ext.astype(dt)
    dlo = dlo.astype(dt)
    dhi = dhi.astype(dt)

    grid = (N // pair_tile,)
    kernel = functools.partial(kern, Lq=Lq, Lt=Lt, match=match,
                               mismatch=mismatch, gap=gap, blk=blk)
    out_shape = [jax.ShapeDtypeStruct((N, 1), jnp.int32)] * 3
    row_spec = lambda cols: pl.BlockSpec(
        (pair_tile, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cells = N * (Lq + Lt) * min(band + 1, Lq)
    score, qend, tend = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec(Lq), row_spec(t_ext.shape[1]), row_spec(Lq),
                  row_spec(Lq)],
        out_specs=[row_spec(1)] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((pair_tile, WIN), dt)],
        cost_estimate=pl.CostEstimate(
            flops=cells * 12, bytes_accessed=N * (3 * Lq + Lt) * 4,
            transcendentals=0),
    )(qk, tk, dlo, dhi)
    return SWResult(score=score[:, 0], qend=qend[:, 0], tend=tend[:, 0])


def check(variant: str, band: int = 64, N: int = 256, Lq: int = 128,
          Lt: int = 256, seed: int = 0):
    rng = np.random.default_rng(seed)
    q = rng.integers(0, 4, (N, Lq)).astype(np.int32)
    t = rng.integers(0, 4, (N, Lt)).astype(np.int32)
    # plant real overlaps in half the pairs
    for n in range(0, N, 2):
        L = int(rng.integers(40, Lq))
        off = int(rng.integers(0, Lt - L))
        t[n, off:off + L] = q[n, :L]
    ql = rng.integers(Lq // 2, Lq + 1, N).astype(np.int32)
    tl = rng.integers(Lt // 2, Lt + 1, N).astype(np.int32)
    ref = banded_sw_batch(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                          jnp.asarray(tl), band=band)
    got = sw_pallas_exp(jnp.asarray(q), jnp.asarray(t), jnp.asarray(ql),
                        jnp.asarray(tl), band=band, variant=variant)
    for f in ("score", "qend", "tend"):
        a, b = np.asarray(getattr(ref, f)), np.asarray(getattr(got, f))
        bad = np.nonzero(a != b)[0]
        assert bad.size == 0, (variant, f, bad[:5], a[bad[:5]], b[bad[:5]])
    print(f"{variant}: exact on {N} pairs (band={band})")


def timeit(variant: str, n_pairs=4096, Lq=128, Lt=256, band=64, inner=8):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, (n_pairs, Lq)).astype(np.int32))
    t = jnp.asarray(rng.integers(0, 4, (n_pairs, Lt)).astype(np.int32))
    ql = jnp.asarray(np.full(n_pairs, Lq, np.int32))
    tl = jnp.asarray(np.full(n_pairs, Lt, np.int32))
    cells = sw_cells([Lq], [Lt], band) * n_pairs

    if variant == "v0":
        from hga_tpu.ops.align_pallas import banded_sw_batch_pallas
        fn = functools.partial(banded_sw_batch_pallas, band=band)
    else:
        fn = functools.partial(sw_pallas_exp, band=band, variant=variant)

    @jax.jit
    def many(q, t, ql, tl):
        def body(it, acc):
            q2 = (q + it) % 4
            r = fn(q2, t, ql, tl)
            return acc + jnp.sum(r.score)
        return jax.lax.fori_loop(0, inner, body, jnp.int32(0))

    _ = int(many(q, t, ql, tl))
    best = None
    for _p in range(3):
        t0 = time.perf_counter()
        _ = int(many(q, t, ql, tl))
        dt = (time.perf_counter() - t0) / inner
        best = dt if best is None else min(best, dt)
    print(f"{variant}: {cells / best / 1e9:8.2f} GCUPS   "
          f"({best * 1e3:.3f} ms/call, {n_pairs} pairs)")
    return cells / best / 1e9


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--variants", default="v1,v2")
    ap.add_argument("--band", type=int, default=64)
    args = ap.parse_args()
    for v in args.variants.split(","):
        if v.startswith(("v1", "v2", "v3")) and "no" not in v:
            check(v, band=args.band)
        if args.time:
            timeit(v, band=args.band)


def timeit_pt(variant, pair_tile, n_pairs=4096, Lq=128, Lt=256, band=64,
              inner=8):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(0, 4, (n_pairs, Lq)).astype(np.int32))
    t = jnp.asarray(rng.integers(0, 4, (n_pairs, Lt)).astype(np.int32))
    ql = jnp.asarray(np.full(n_pairs, Lq, np.int32))
    tl = jnp.asarray(np.full(n_pairs, Lt, np.int32))
    cells = sw_cells([Lq], [Lt], band) * n_pairs
    fn = functools.partial(sw_pallas_exp, band=band, variant=variant,
                           pair_tile=pair_tile)

    @jax.jit
    def many(q, t, ql, tl):
        def body(it, acc):
            q2 = (q + it) % 4
            r = fn(q2, t, ql, tl)
            return acc + jnp.sum(r.score)
        return jax.lax.fori_loop(0, inner, body, jnp.int32(0))

    _ = int(many(q, t, ql, tl))
    best = None
    for _p in range(3):
        t0 = time.perf_counter()
        _ = int(many(q, t, ql, tl))
        dt = (time.perf_counter() - t0) / inner
        best = dt if best is None else min(best, dt)
    print(f"{variant} pt={pair_tile}: {cells / best / 1e9:8.2f} GCUPS")


# ------------------------------------------------------------- variant v3
# v1 with G independent pair-groups interleaved per step: the DP dependency
# chain (VMEM round-trip latency) is the bottleneck, so G chains overlap.

def _kernel_v3(q_ref, t_ref, dlo_ref, dhi_ref,
               score_ref, qend_ref, tend_ref, win_ref,
               *, Lq: int, Lt: int, match: int, mismatch: int, gap: int,
               blk: int, groups: int = 4):
    P = q_ref.shape[0]
    G = groups
    h = P // G
    S0 = Lq + Lt - 1 + blk
    n_blocks = pl.cdiv(Lq + Lt - 1, blk)
    A0 = ((S0 + 1) // blk) * blk
    C = S0 - (A0 - blk)
    WIN = ((C + Lq + 1 + 127) // 128) * 128

    qg = [q_ref[g * h:(g + 1) * h, :] for g in range(G)]
    dlog = [dlo_ref[g * h:(g + 1) * h, :] for g in range(G)]
    dhig = [dhi_ref[g * h:(g + 1) * h, :] for g in range(G)]
    zg = [jnp.minimum(qg[g] * 0, 0) for g in range(G)]
    zc = [zg[g][:, :1] for g in range(G)]

    def block(k, carry):
        ad1, s2, best_v, best_d = [list(c) for c in carry]
        a_k = pl.multiple_of(A0 - (k + 1) * blk, blk)
        win_ref[:, :WIN] = t_ref[:, pl.ds(a_k, WIN)]
        for r in range(blk):
            d = 2 + k * blk + r
            tsf = win_ref[:, C - r: C - r + Lq]
            for g in range(G):
                ts = tsf[g * h:(g + 1) * h, :]
                sub = jnp.where(qg[g] == ts, jnp.int32(match),
                                jnp.int32(mismatch))
                s1 = jnp.concatenate([zc[g], ad1[g][:, :Lq - 1]], axis=1)
                td = jnp.maximum(s2[g] + sub, 0)
                mg = jnp.maximum(ad1[g], s1) + jnp.int32(gap)
                v = jnp.maximum(td, mg)
                v = jnp.where((d >= dlog[g]) & (d <= dhig[g]), v, 0)
                gt = v > best_v[g]
                best_d[g] = jnp.where(gt, jnp.int32(d), best_d[g])
                best_v[g] = jnp.maximum(best_v[g], v)
                s2[g] = s1
                ad1[g] = v
        return (tuple(ad1), tuple(s2), tuple(best_v), tuple(best_d))

    carry = (tuple(zg), tuple(zg), tuple(zg), tuple(zg))
    ad1, s2, best_v, best_d = jax.lax.fori_loop(0, n_blocks, block, carry)

    bv = jnp.concatenate(list(best_v), axis=0)
    bd = jnp.concatenate(list(best_d), axis=0)
    p_idx = jax.lax.broadcasted_iota(I32, (P, Lq), dimension=1)
    D = Lq + Lt
    vmax = jnp.max(bv, axis=1, keepdims=True)
    is_max = bv == vmax
    dmin = jnp.min(jnp.where(is_max, bd, jnp.int32(2 * D)), axis=1,
                   keepdims=True)
    is_min = is_max & (bd == dmin)
    pmin = jnp.min(jnp.where(is_min, p_idx, jnp.int32(Lq)), axis=1,
                   keepdims=True)
    has = vmax > 0
    qend = jnp.where(has, pmin + 1, 0)
    score_ref[:, :] = vmax
    qend_ref[:, :] = qend
    tend_ref[:, :] = jnp.where(has, dmin - qend, 0)
