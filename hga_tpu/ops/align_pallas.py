"""L3 — the banded-SW wavefront as a Pallas TPU kernel (the GCUPS hot spot).

Same scoring semantics as ops/align.banded_sw_batch (the XLA reference,
itself oracle-bit-exact).  This kernel exists to hit the judged per-chip
throughput target (BASELINE.md); its design choices, in order of impact:

* FULL-WIDTH wavefront: the DP state vector indexes the whole query axis
  (slot p = query position i-1) instead of a moving band window.  The band
  |j-i| <= band is enforced by an arithmetic mask.  For the judged config-3
  shapes (short 100-150bp reads vs long-read windows) the padded band width
  equals the query length anyway, and the fixed layout makes EVERY memory
  access a static slice — the anti-diagonal dependencies sit at constant
  offsets 0/1, and the target fetch for step d is a static window of the
  reversed target.  No dynamic slices (Mosaic requires 128-aligned ones),
  no rolls, no relayouts.
* ZERO-FILL state: out-of-band/boundary slots store 0 instead of -inf.
  This is exact for local SW with gap < 0 because every stored cell value
  is >= 0 (clamped) and a leaked 0 can only enter a neighbour through
  max(·)+gap < value paths that never beat the true candidates; boundary
  rows/columns (H[0,*] = H[*,0] = 0) then come FREE from the shifted-in
  zeros and the band mask — no per-step boundary selects at all.
* Per-slot anti-diagonal bounds: cell (i, j=d-i) is in band iff
  d ∈ [dlo[p], dhi[p]], two constants per slot precomputed on host; the
  in-band mask is two scalar compares + select per step.
* One lane shift per step: up(d) = shift(v_{d-1}) is carried to the next
  step where it serves as diag(d+1) = shift(v_{(d+1)-2}).
* The d-loop is unrolled in BLK-step blocks (static offsets inside), the
  target window is one 128-aligned dynamic slice per block.
* One grid program per PAIR_TILE pairs; q, t and all state stay
  VMEM-resident for the whole sweep.

Measured on the round's v5e chip: ~15 GCUPS/chip at (Lq,Lt,band) =
(128,256,64) — the VPU executes ~1 vector-register op per cycle and the
recurrence needs ~16 tile ops per anti-diagonal, which bounds any
select/max-based SW formulation to a few tens of GCUPS.  The bit-parallel
Myers kernel in ops/myers_pallas.py is the throughput path for overlap
extension; this kernel remains the exact scored-SW reference on device.

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

I32 = jnp.int32

# full-width state scales with the query length; long-vs-long alignments
# (corrected-read overlaps) go through seed-chained segment DPs or the XLA
# moving-band implementation instead
MAX_QUERY_LEN = 1024


BLK = 128  # anti-diagonals per block: aligned window loads, static inner slices


def _sw_kernel(q_ref, t_ref, dlo_ref, dhi_ref,
               score_ref, qend_ref, tend_ref, win_ref,
               *, Lq: int, Lt: int,
               match: int, mismatch: int, gap: int, blk: int = BLK,
               narrow: bool = False):
    """Blocked sweep: the d-loop runs in BLK-step blocks.  Per block, one
    128-aligned dynamic slice of the (reversed, padded) target lands in the
    `win_ref` scratch; the BLK inner steps then use only STATIC slices.
    This keeps Mosaic's constraints (dynamic lane slices must be 128-aligned)
    and bounds compile time (only BLK steps are traced inline).

    narrow=True runs the whole recurrence in int16 (the wrapper feeds int16
    inputs): scores are bounded by match * Lq <= match * MAX_QUERY_LEN and
    anti-diagonal ids by Lq + Lt + 1, both far inside int16, and 16-bit
    elements pack 2x per vector register — the ROADMAP's "int16 (2x)" item.
    Outputs widen to int32 at the end."""
    P = q_ref.shape[0]
    dt = jnp.int16 if narrow else I32
    q = q_ref[:, :]                     # (P, Lq) — static, resident
    dlo = dlo_ref[:, :]                 # (P, Lq) first in-band anti-diagonal
    dhi = dhi_ref[:, :]                 # (P, Lq) last in-band (-1 = never)
    # concrete-layout zero initializer (a constant splat init makes the
    # carry relayout {0,0}->{*,*} abort the Mosaic compiler)
    zero = jnp.minimum(q * 0, 0).astype(dt)
    zcol = zero[:, :1]

    # t_ext layout (built by the wrapper): step d reads
    # ts(d)[p] = t[d-2-p] through a per-block aligned window (see wrapper).
    S0 = Lq + Lt - 1 + blk
    n_blocks = pl.cdiv(Lq + Lt - 1, blk)
    A0 = ((S0 + 1) // blk) * blk
    C = S0 - (A0 - blk)
    WIN = ((C + Lq + 1 + 127) // 128) * 128

    def block(k, carry):
        # carry: v_{d-1}, shift(v_{d-2}), best value / best anti-diag per slot
        ad1, s2, best_v, best_d = carry
        a_k = pl.multiple_of(A0 - (k + 1) * blk, blk)
        win_ref[:, :WIN] = t_ref[:, pl.ds(a_k, WIN)]
        for r in range(blk):
            d = 2 + k * blk + r
            ts = win_ref[:, C - r: C - r + Lq]
            sub = jnp.where(q == ts, dt(match), dt(mismatch))
            s1 = jnp.concatenate([zcol, ad1[:, :Lq - 1]], axis=1)
            td = jnp.maximum(s2 + sub, dt(0))
            mg = jnp.maximum(ad1, s1) + dt(gap)
            v = jnp.maximum(td, mg)
            v = jnp.where((dt(d) >= dlo) & (dt(d) <= dhi), v, dt(0))
            gt = v > best_v                # strict: smallest d per slot wins
            best_d = jnp.where(gt, dt(d), best_d)
            best_v = jnp.maximum(best_v, v)
            s2 = s1
            ad1 = v
        return (ad1, s2, best_v, best_d)

    carry = (zero, zero, zero, zero)
    ad1, s2, best_v, best_d = jax.lax.fori_loop(0, n_blocks, block, carry)

    # final reduction with oracle tie-break: max v, then min d, then min i
    best_v, best_d = best_v.astype(I32), best_d.astype(I32)
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
    score_ref[:, :] = jnp.maximum(vmax, 0)
    qend_ref[:, :] = qend
    tend_ref[:, :] = jnp.where(has, dmin - qend, 0)


@functools.partial(
    jax.jit,
    static_argnames=("band", "match", "mismatch", "gap", "pair_tile",
                     "interpret", "blk", "narrow"))
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
    narrow: bool = False,  # int16 state: 2x register packing, bit-exact for
                           # judged shapes (score < 2^15, d-ids < 2^15)
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
    if narrow and (match * Lq >= 32767 or 2 * (Lq + Lt) + blk >= 32767):
        raise ValueError("narrow=True needs scores and anti-diagonal ids "
                         "inside int16")

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

    # per-slot in-band anti-diagonal bounds: slot p holds i = p+1; cell
    # (i, j=d-i) is valid iff j in [max(1, i-band), min(tlen, i+band)] and
    # i <= qlen, i.e. d in [dlo, dhi]
    i = jnp.arange(1, Lq + 1, dtype=I32)[None, :]
    ql = qlen.astype(I32)[:, None]
    tl = tlen.astype(I32)[:, None]
    dlo = jnp.broadcast_to(i + jnp.maximum(1, i - band), (N, Lq))
    dhi = jnp.where(i <= ql, i + jnp.minimum(tl, i + band), -1)

    grid = (N // pair_tile,)
    dt = jnp.int16 if narrow else I32
    kernel = functools.partial(
        _sw_kernel, Lq=Lq, Lt=Lt,
        match=match, mismatch=mismatch, gap=gap, blk=blk, narrow=narrow)
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
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=cells * 12, bytes_accessed=N * (3 * Lq + Lt) * 4,
            transcendentals=0),
    )(q.astype(dt), t_ext.astype(dt), dlo.astype(dt), dhi.astype(dt))
    return SWResult(score=score[:, 0], qend=qend[:, 0], tend=tend[:, 0])
