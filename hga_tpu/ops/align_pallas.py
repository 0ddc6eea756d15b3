"""L3 — the banded-SW wavefront as a Pallas TPU kernel (the GCUPS hot spot).

Same cell geometry and scoring semantics as ops/align.banded_sw_batch (the
XLA reference implementation, itself oracle-bit-exact); see that module's
docstring for the (P, W) anti-diagonal layout.  The Pallas version exists to
hit the judged per-chip roofline target (BASELINE.md): one kernel owns the
whole sweep, so the band state and both sequences stay VMEM-resident for all
Lq+Lt steps, with none of the per-step HLO loop materialization the XLA
version pays.

Grid: one program per tile of PAIR_TILE pairs; each program runs the full
anti-diagonal sweep for its pairs.  All shifts are lane rotations of
(PAIR_TILE, W) int32 vectors; traced-offset slices use pl.ds.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hga_tpu.ops.align import SWResult

NEG = -(2**30)  # python int: pallas kernels must not capture traced constants

I32 = jnp.int32


def _o_of(d, band: int, Lt: int):
    return jnp.maximum(jnp.maximum(1, d - Lt), (d - band + 1) // 2)


def _shift_sel(x: jax.Array, s: jax.Array) -> jax.Array:
    """y[p] = x[p + s] for traced s in {-1, 0, 1}; out-of-range -> NEG.

    Mosaic has no dynamic_slice on values, so build the three static shifts
    and select — three (P, W) vector ops, no relayout.
    """
    P = x.shape[0]
    neg = jnp.full((P, 1), NEG, I32)
    left = jnp.concatenate([x[:, 1:], neg], axis=1)    # x[p+1]
    right = jnp.concatenate([neg, x[:, :-1]], axis=1)  # x[p-1]
    return jnp.where(s == 0, x, jnp.where(s == 1, left, right))


def _sw_kernel(q_ref, t_ref, qlen_ref, tlen_ref,
               score_ref, qend_ref, tend_ref,
               *, band: int, W: int, Lq: int, Lt: int,
               match: int, mismatch: int, gap: int):
    P = q_ref.shape[0]
    qlen_c = qlen_ref[:, :]            # (P, 1)
    tlen_c = tlen_ref[:, :]
    p_idx = jax.lax.broadcasted_iota(I32, (P, W), dimension=1)
    q_full = q_ref[:, :]               # (P, Lq + W), VMEM-resident all sweep
    t_full = t_ref[:, :]               # (P, Lt + W), reversed target
    LQW = Lq + W
    LTW = Lt + W

    def step(d, carry):
        ad1, ad2, best, best_d, best_p = carry
        o_d = _o_of(d, band, Lt)
        d1 = o_d - _o_of(d - 1, band, Lt)
        d2 = o_d - _o_of(d - 2, band, Lt)

        i = o_d + p_idx
        j = d - i

        # Mosaic only allows 128-aligned dynamic lane slices, but dynamic
        # circular rolls are fine: rotate the window start to lane 0 and
        # take a static W-slice.  Valid cells never read wrapped lanes
        # (start in [0, L), start + W <= L + W).
        qs = pltpu.roll(q_full, (1 - o_d) % LQW, 1)[:, :W]
        ts = pltpu.roll(t_full, (d - o_d - Lt) % LTW, 1)[:, :W]
        sub = jnp.where(qs == ts, jnp.int32(match), jnp.int32(mismatch))

        diag_v = _shift_sel(ad2, d2 - 1)   # offsets always in {-1, 0, 1}
        up_v = _shift_sel(ad1, d1 - 1)
        left_v = _shift_sel(ad1, d1)
        diag_v = jnp.where((i == 1) | (j == 1), 0, diag_v)
        up_v = jnp.where(i == 1, 0, up_v)
        left_v = jnp.where(j == 1, 0, left_v)

        v = jnp.maximum(
            jnp.maximum(diag_v + sub, jnp.int32(0)),
            jnp.maximum(up_v + jnp.int32(gap), left_v + jnp.int32(gap)),
        )
        i_hi = jnp.minimum(jnp.minimum(Lq, d - 1), (d + band) // 2)
        valid = (p_idx <= i_hi - o_d) & (i <= qlen_c) & (j >= 1) & (j <= tlen_c)
        v = jnp.where(valid, v, NEG)

        m = jnp.max(v, axis=1, keepdims=True)            # (P, 1)
        # int argmax is not lowered by Mosaic; min-reduce the matching index
        # instead (first max -> smallest i, matching the XLA version)
        pm = jnp.min(jnp.where(v == m, p_idx, jnp.int32(W)), axis=1,
                     keepdims=True)
        better = m > best
        best = jnp.where(better, m, best)
        best_d = jnp.where(better, d, best_d)
        best_p = jnp.where(better, pm, best_p)
        return (v, ad1, best, best_d, best_p)

    ad_init = jnp.full((P, W), NEG, I32)
    z = jnp.zeros((P, 1), I32)
    carry = (ad_init, ad_init, z, z, z)
    _, _, best, best_d, best_p = jax.lax.fori_loop(
        2, Lq + Lt + 1, step, carry)

    has = best > 0
    qend = jnp.where(has, _o_of(best_d, band, Lt) + best_p, 0)
    score_ref[:, :] = jnp.maximum(best, 0)
    qend_ref[:, :] = qend
    tend_ref[:, :] = jnp.where(has, best_d - qend, 0)


@functools.partial(
    jax.jit,
    static_argnames=("band", "match", "mismatch", "gap", "pair_tile",
                     "interpret"))
def banded_sw_batch_pallas(
    q: jax.Array,     # int32 (N, Lq)
    t: jax.Array,     # int32 (N, Lt)
    qlen: jax.Array,  # int32 (N,)
    tlen: jax.Array,  # int32 (N,)
    band: int = 64,
    match: int = 2,
    mismatch: int = -4,
    gap: int = -3,
    pair_tile: int = 8,
    interpret: bool = False,
) -> SWResult:
    """Pallas wavefront SW; N must be a multiple of pair_tile (callers pad)."""
    N, Lq = q.shape
    Lt = t.shape[1]
    if N % pair_tile:
        raise ValueError(f"N={N} not a multiple of pair_tile={pair_tile}")
    W = ((band + 1 + 127) // 128) * 128

    # slice-safety padding (see ops/align.py): q right-padded W; t reversed
    # then right-padded W so every pl.ds start stays in range
    q_ext = jnp.pad(q.astype(I32), ((0, 0), (0, W)))
    t_ext = jnp.pad(jnp.flip(t.astype(I32), axis=1), ((0, 0), (0, W)))
    qlen2 = qlen.astype(I32).reshape(N, 1)
    tlen2 = tlen.astype(I32).reshape(N, 1)

    grid = (N // pair_tile,)
    kernel = functools.partial(
        _sw_kernel, band=band, W=W, Lq=Lq, Lt=Lt,
        match=match, mismatch=mismatch, gap=gap)
    out_shape = [jax.ShapeDtypeStruct((N, 1), jnp.int32)] * 3
    row_spec = lambda cols: pl.BlockSpec(
        (pair_tile, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    score, qend, tend = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec(Lq + W), row_spec(Lt + W), row_spec(1), row_spec(1)],
        out_specs=[row_spec(1)] * 3,
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=N * (Lq + Lt) * W * 10, bytes_accessed=N * (Lq + Lt) * 8,
            transcendentals=0),
    )(q_ext, t_ext, qlen2, tlen2)
    return SWResult(score=score[:, 0], qend=qend[:, 0], tend=tend[:, 0])
