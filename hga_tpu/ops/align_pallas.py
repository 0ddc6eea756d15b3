"""L3 — the banded-SW wavefront as a Pallas TPU kernel (the GCUPS hot spot).

Same scoring semantics as ops/align.banded_sw_batch (the XLA reference,
itself oracle-bit-exact).  This kernel exists to hit the judged per-chip
roofline target (BASELINE.md); its design choices, in order of impact:

* FULL-WIDTH wavefront: the DP state vector indexes the whole query axis
  (slot p = query position i-1) instead of a moving band window.  The band
  |j-i| <= band is enforced by an arithmetic mask.  For the judged config-3
  shapes (short 100-150bp reads vs long-read windows) the padded band width
  equals the query length anyway, and the fixed layout makes EVERY memory
  access a static slice — the anti-diagonal dependencies sit at constant
  offsets 0/1, and the target fetch for step d is a static window of the
  reversed target.  No dynamic slices (Mosaic requires 128-aligned ones),
  no rolls, no relayouts.
* The d-loop is fully unrolled at trace time (D = Lq+Lt-1 steps, static
  offsets), letting Mosaic software-pipeline the sweep.
* Per-cell best tracking (3 vector ops/step); the (score, end-cell)
  reduction with the oracle tie-break (smallest d, then smallest i) runs
  once at the end.
* One grid program per PAIR_TILE pairs; q, t and all state stay
  VMEM-resident for the whole sweep.

The general moving-band variant for very long sequences lives in
ops/align.py (XLA); models/overlap.py picks per shape.
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

# full-width state scales with the query length; long-vs-long alignments
# (corrected-read overlaps) go through seed-chained segment DPs or the XLA
# moving-band implementation instead
MAX_QUERY_LEN = 1024


BLK = 128  # anti-diagonals per block: aligned window loads, static inner slices


def _sw_kernel(q_ref, t_ref, qlen_ref, tlen_ref,
               score_ref, qend_ref, tend_ref, win_ref,
               *, band: int, Lq: int, Lt: int,
               match: int, mismatch: int, gap: int, blk: int = BLK):
    """Blocked sweep: the d-loop runs in BLK-step blocks.  Per block, one
    128-aligned dynamic slice of the (reversed, padded) target lands in the
    `win_ref` scratch; the BLK inner steps then use only STATIC slices.
    This keeps Mosaic's constraints (dynamic lane slices must be 128-aligned)
    and bounds compile time (only BLK steps are traced inline)."""
    P = q_ref.shape[0]
    q = q_ref[:, :]                     # (P, Lq) — static, resident
    qlen_c = qlen_ref[:, :]             # (P, 1)
    tlen_c = tlen_ref[:, :]
    p_idx = jax.lax.broadcasted_iota(I32, (P, Lq), dimension=1)

    # t_ext layout (built by the wrapper): t_ext[x] = t_rev[x - PADL] with
    # PADL = Lq + BLK; step d reads ts(d)[p] = t_ext[S(d) + p],
    # S(d) = PADL + Lq? no: S(d) = (Lq + Lt + 1 - d) + BLK + ... see wrapper.
    S0 = Lq + Lt - 1 + blk              # S(d=2), includes the extra blk pad
    n_blocks = pl.cdiv(Lq + Lt - 1, blk)
    # aligned window start for block k: a(k) = (S0+1)//blk*blk - (k+1)*blk
    A0 = ((S0 + 1) // blk) * blk
    C = S0 - (A0 - blk)                 # static in-window offset of step r=0
    WIN = C + Lq + 1                    # static window width needed
    WIN = ((WIN + 127) // 128) * 128

    # concrete-layout initializers (a constant splat init makes the carry
    # relayout {0,0}->{*,*} abort the Mosaic compiler)
    neg0 = jnp.minimum(q * 0 + qlen_c, NEG)       # == NEG everywhere
    D = Lq + Lt

    # loop-invariant cell-validity bounds: cell (i, j) is valid iff
    # j in [max(1, i-band), min(tlen, i+band)] and i <= qlen — j_lo/j_hi are
    # per-slot constants, so the inner mask is two compares + an and
    i = p_idx + 1
    j_lo = jnp.maximum(1, i - band)
    j_hi = jnp.where(i <= qlen_c, jnp.minimum(tlen_c, i + band), -1)
    zcol = qlen_c * 0                              # (P,1) zero, concrete
    ncol = zcol + NEG                              # (P,1) NEG column
    # boundary handling: the implicit zero row/col H[0,*] = H[*,0] = 0.
    # i==1 slots read the zero row through a pre-built first-lane mask;
    # j==1 left/diag reads are covered because ad arrays hold 0 at j-edge
    # cells' predecessors only when in-band — handled via the j==1 selects.
    first_lane = p_idx == 0

    def block(k, carry):
        ad1, ad2, best_v, best_d = carry
        a_k = pl.multiple_of(A0 - (k + 1) * blk, blk)
        win_ref[:, :WIN] = t_ref[:, pl.ds(a_k, WIN)]
        for r in range(blk):
            d = 2 + k * blk + r
            ts = win_ref[:, C - r : C - r + Lq]
            sub = jnp.where(q == ts, jnp.int32(match), jnp.int32(mismatch))
            diag_v = jnp.concatenate([ncol, ad2[:, : Lq - 1]], axis=1)
            up_v = jnp.concatenate([ncol, ad1[:, : Lq - 1]], axis=1)
            left_v = ad1
            j = d - i
            diag_v = jnp.where(first_lane | (j == 1), 0, diag_v)
            up_v = jnp.where(first_lane, 0, up_v)
            left_v = jnp.where(j == 1, 0, left_v)
            v = jnp.maximum(
                jnp.maximum(diag_v + sub, jnp.int32(0)),
                jnp.maximum(up_v + jnp.int32(gap), left_v + jnp.int32(gap)),
            )
            v = jnp.where((j >= j_lo) & (j <= j_hi), v, NEG)
            better = v > best_v            # strict: smallest d per cell wins
            best_d = jnp.where(better, d, best_d)
            best_v = jnp.maximum(best_v, v)
            ad2 = ad1
            ad1 = v
        return (ad1, ad2, best_v, best_d)

    carry = (neg0, neg0, neg0, neg0)
    ad1, ad2, best_v, best_d = jax.lax.fori_loop(0, n_blocks, block, carry)

    # final reduction with oracle tie-break: max v, then min d, then min i
    vmax = jnp.max(best_v, axis=1, keepdims=True)
    is_max = best_v == vmax
    dmin = jnp.min(jnp.where(is_max, best_d, jnp.int32(2 * D)), axis=1,
                   keepdims=True)
    is_min = is_max & (best_d == dmin)
    pmin = jnp.min(jnp.where(is_min, p_idx, jnp.int32(Lq)), axis=1,
                   keepdims=True)
    has = vmax > 0
    qend = jnp.where(has, pmin + 1, 0)
    score_ref[:, :] = jnp.maximum(vmax, 0)
    qend_ref[:, :] = qend
    tend_ref[:, :] = jnp.where(has, dmin - qend, 0)


@functools.partial(
    jax.jit,
    static_argnames=("band", "match", "mismatch", "gap", "pair_tile",
                     "interpret", "blk"))
def banded_sw_batch_pallas(
    q: jax.Array,     # int32 (N, Lq)
    t: jax.Array,     # int32 (N, Lt)
    qlen: jax.Array,  # int32 (N,)
    tlen: jax.Array,  # int32 (N,)
    band: int = 64,
    match: int = 2,
    mismatch: int = -4,
    gap: int = -3,
    pair_tile: int = 128,
    interpret: bool = False,
    blk: int = BLK,  # MUST stay 128 on hardware (lane-aligned window loads);
                     # interpret-mode tests may shrink it for speed
) -> SWResult:
    """Pallas wavefront SW; N must be a multiple of pair_tile (callers pad).

    Raises ValueError when Lq+Lt exceeds the unroll budget — dispatch such
    shapes to ops.align.banded_sw_batch instead.
    """
    N, Lq = q.shape
    Lt = t.shape[1]
    if N % pair_tile:
        raise ValueError(f"N={N} not a multiple of pair_tile={pair_tile}")
    if Lq > MAX_QUERY_LEN:
        raise ValueError(
            f"Lq={Lq} over full-width budget {MAX_QUERY_LEN}; "
            "use banded_sw_batch")

    # static window geometry (must mirror _sw_kernel)
    S0 = Lq + Lt - 1 + blk
    A0 = ((S0 + 1) // blk) * blk
    C = S0 - (A0 - blk)
    WIN = ((C + Lq + 1 + 127) // 128) * 128

    # reversed target, sentinel-padded so every window slice is in range:
    # t_ext[:, (Lq + blk) + x] = t_rev[x]; step d reads base index
    # S(d) = (Lq + Lt + 1 - d) + blk; the right pad must cover a full WIN
    # slice from the largest window start A0 - blk
    t_rev = jnp.flip(t.astype(I32), axis=1)
    right_pad = max(0, (A0 - blk + WIN) - (Lq + blk + Lt))
    t_ext = jnp.pad(t_rev, ((0, 0), (Lq + blk, right_pad)),
                    constant_values=-1)
    qlen2 = qlen.astype(I32).reshape(N, 1)
    tlen2 = tlen.astype(I32).reshape(N, 1)

    grid = (N // pair_tile,)
    kernel = functools.partial(
        _sw_kernel, band=band, Lq=Lq, Lt=Lt,
        match=match, mismatch=mismatch, gap=gap, blk=blk)
    out_shape = [jax.ShapeDtypeStruct((N, 1), jnp.int32)] * 3
    row_spec = lambda cols: pl.BlockSpec(
        (pair_tile, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cells = N * (Lq + Lt) * min(band + 1, Lq)
    score, qend, tend = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec(Lq), row_spec(t_ext.shape[1]), row_spec(1),
                  row_spec(1)],
        out_specs=[row_spec(1)] * 3,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((pair_tile, WIN), jnp.int32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=cells * 12, bytes_accessed=N * (3 * Lq + Lt) * 4,
            transcendentals=0),
    )(q.astype(I32), t_ext, qlen2, tlen2)
    return SWResult(score=score[:, 0], qend=qend[:, 0], tend=tend[:, 0])
