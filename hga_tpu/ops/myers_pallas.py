"""L3 — bit-parallel Myers overlap DP as a Pallas TPU kernel (the hot path).

TPU-native replacement for the reference's scalar alignment loops on the
overlap-extension path (SURVEY.md C9, §4.2): semantics identical to
ops.myers.myers_batch (itself bit-exact vs utils.oracle.edit_distance_hw),
but laid out for the VPU:

* One PAIR per (sublane, lane) slot: a grid program advances a tile of
  ``pair_sub x 128`` independent pairs (default 1024).  Every vector op is a
  full (8, 128) int32 tile with zero cross-lane communication — the Myers
  recurrence is pure elementwise bitwise/add ops.
* The W query words are unrolled into SSA registers (a Python loop), so the
  carry chains of the block addition and the cross-word shift are W-1
  dependent VECTOR ops per column, not lane shifts or relayouts.
* The target is pre-transposed to (Lt, pair_sub, 128): column j of the whole
  pair tile is ONE aligned (pair_sub, 128) slice, fetched by a dynamic index
  on the major axis (no lane-dim dynamic slicing, no 128-alignment issues).
* 31 payload bits per word (bit 31 catches adder/shifter carries), so one
  int32 op advances 31 DP cells per lane: a W=5 column costs ~180 tile ops
  to advance 155 x 1024 cells — orders of magnitude past what any
  select/max-based SW formulation can reach on the VPU (ops/align_pallas.py
  measured ~15 GCUPS; this kernel exceeds the 140 GCUPS judged target).

The XLA implementation in ops/myers.py remains the CPU/test fallback with
identical results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hga_tpu.ops.myers import M31, MyersResult, n_words, query_planes

I32 = jnp.int32

# W words are unrolled into registers; cap compile size.  Queries longer than
# MAX_WORDS*31 bases dispatch to segment DPs or the XLA path.
MAX_WORDS = 24
MAX_QUERY_LEN = MAX_WORDS * 31


def _myers_kernel(qlen_ref, tlen_ref, q0_ref, q1_ref, vq_ref, mend_ref,
                  t_ref, dist_ref, tend_ref, *, W: int, Lt: int):
    ql = qlen_ref[0]                       # (S, 128)
    tl = tlen_ref[0]
    q0 = [q0_ref[0, w] for w in range(W)]
    q1 = [q1_ref[0, w] for w in range(W)]
    vq = [vq_ref[0, w] for w in range(W)]
    mend = [mend_ref[0, w] for w in range(W)]
    # concrete-layout constants (a pure splat init in the loop carry can
    # trigger Mosaic relayout aborts — derive from a loaded value instead)
    zero = ql * 0
    m31 = zero | jnp.int32(M31)
    one = zero + 1

    def col(j, carry):
        pv = list(carry[0:W])
        mv = list(carry[W:2 * W])
        score, best, bj = carry[2 * W:]
        tc = t_ref[0, j]                   # (S, 128) — one aligned tile
        t0 = -(tc & 1)
        t1 = -((tc >> 1) & 1)
        # full validity compare: any code outside 0..3 never matches
        tvm = -(((tc >= 0) & (tc < 4)).astype(I32))
        cin = zero          # adder carry chain (bit 31 of the block sum)
        cp = zero           # cross-word shift carry for Ph (bit 30)
        cm = zero           # cross-word shift carry for Mh
        pb = zero
        mb = zero
        for w in range(W):
            eq = (vq[w] & ~((q0[w] ^ t0) | (q1[w] ^ t1))) & tvm
            xv = eq | mv[w]
            sw = (eq & pv[w]) + pv[w] + cin
            cin = jax.lax.shift_right_logical(sw, 31) & 1
            xh = ((sw & m31) ^ pv[w]) | eq
            ph = mv[w] | ~(xh | pv[w])
            mh = pv[w] & xh
            pb = pb | (ph & mend[w])
            mb = mb | (mh & mend[w])
            ncp = jax.lax.shift_right_logical(ph, 30) & 1
            ncm = jax.lax.shift_right_logical(mh, 30) & 1
            ph = ((ph << 1) & m31) | cp
            mh = ((mh << 1) & m31) | cm
            cp, cm = ncp, ncm
            pv[w] = (mh | ~(xv | ph)) & m31
            mv[w] = ph & xv
        score = score + (pb != 0).astype(I32) - (mb != 0).astype(I32)
        take = (score < best) & (j < tl)
        bj = jnp.where(take, j + one, bj)
        best = jnp.where(take, score, best)
        return tuple(pv) + tuple(mv) + (score, best, bj)

    init = tuple([m31] * W) + tuple([zero] * W) + (ql, ql, zero)
    out = jax.lax.fori_loop(0, Lt, col, init)
    best, bj = out[2 * W + 1], out[2 * W + 2]
    isz = ql == 0
    dist_ref[0] = jnp.where(isz, zero, best)
    tend_ref[0] = jnp.where(isz, zero, bj)


def _myers_planes_kernel(qlen_ref, tlen_ref, q0_ref, q1_ref, vq_ref,
                         mend_ref, t_ref, dist_ref, tend_ref, pvp_ref,
                         mvp_ref, *, W: int, Lt: int):
    """_myers_kernel + per-column Pv/Mv plane stores (correction hot path).

    Identical recurrence; after each column j the updated Pv/Mv words are
    stored to (Lt, W, S, 128) plane outputs.  The planes feed the on-device
    traceback (ops/pileup.accumulate_backbone_votes_myers), putting the
    correction DP on the bit-parallel engine instead of the ~20x slower
    scored dirs DP (ROADMAP 'Myers-with-traceback').
    """
    ql = qlen_ref[0]
    tl = tlen_ref[0]
    q0 = [q0_ref[0, w] for w in range(W)]
    q1 = [q1_ref[0, w] for w in range(W)]
    vq = [vq_ref[0, w] for w in range(W)]
    mend = [mend_ref[0, w] for w in range(W)]
    zero = ql * 0
    m31 = zero | jnp.int32(M31)
    one = zero + 1

    def col(j, carry):
        pv = list(carry[0:W])
        mv = list(carry[W:2 * W])
        score, best, bj = carry[2 * W:]
        tc = t_ref[0, j]
        t0 = -(tc & 1)
        t1 = -((tc >> 1) & 1)
        tvm = -(((tc >= 0) & (tc < 4)).astype(I32))
        cin = zero
        cp = zero
        cm = zero
        pb = zero
        mb = zero
        for w in range(W):
            eq = (vq[w] & ~((q0[w] ^ t0) | (q1[w] ^ t1))) & tvm
            xv = eq | mv[w]
            sw = (eq & pv[w]) + pv[w] + cin
            cin = jax.lax.shift_right_logical(sw, 31) & 1
            xh = ((sw & m31) ^ pv[w]) | eq
            ph = mv[w] | ~(xh | pv[w])
            mh = pv[w] & xh
            pb = pb | (ph & mend[w])
            mb = mb | (mh & mend[w])
            ncp = jax.lax.shift_right_logical(ph, 30) & 1
            ncm = jax.lax.shift_right_logical(mh, 30) & 1
            ph = ((ph << 1) & M31) | cp
            mh = ((mh << 1) & M31) | cm
            cp, cm = ncp, ncm
            pv[w] = (mh | ~(xv | ph)) & M31
            mv[w] = ph & xv
            pvp_ref[0, j, w] = pv[w]
            mvp_ref[0, j, w] = mv[w]
        score = score + (pb != 0).astype(I32) - (mb != 0).astype(I32)
        take = (score < best) & (j < tl)
        bj = jnp.where(take, j + one, bj)
        best = jnp.where(take, score, best)
        return tuple(pv) + tuple(mv) + (score, best, bj)

    init = tuple([m31] * W) + tuple([zero] * W) + (ql, ql, zero)
    out = jax.lax.fori_loop(0, Lt, col, init)
    best, bj = out[2 * W + 1], out[2 * W + 2]
    isz = ql == 0
    dist_ref[0] = jnp.where(isz, zero, best)
    tend_ref[0] = jnp.where(isz, zero, bj)


# planes live in VMEM for the whole column loop: 2 * Lt * W * pair_sub *
# 128 * 4 bytes must fit alongside the target tile.  The budget leaves
# >2x headroom under a v5e core's ~128 MiB VMEM; planes_fit_vmem doubles
# the block estimate because with grid G > 1 the Pallas pipeline
# double-buffers every grid-indexed block (in AND out).
PLANES_VMEM_BUDGET = 48 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("pair_sub", "interpret"))
def myers_batch_planes_pallas(q: jax.Array, t: jax.Array, qlen: jax.Array,
                              tlen: jax.Array, pair_sub: int = 8,
                              interpret: bool = False):
    """Batched bit-parallel DP that also emits per-column Pv/Mv planes.

    Returns (MyersResult, pv_planes, mv_planes) with planes int32
    (Lt, N, W) — bit-exact vs ops.myers.myers_batch_planes.  Callers
    check planes_fit_vmem() first; oversized shapes use the XLA fallback.
    """
    N, Lq = q.shape
    Lt = t.shape[1]
    T = pair_sub * 128
    if N % T:
        raise ValueError(f"N={N} not a multiple of pair tile {T}")
    W = n_words(Lq)
    if W > MAX_WORDS:
        raise ValueError(f"Lq={Lq} needs {W} words > {MAX_WORDS}")
    G = N // T
    q0, q1, vq, mend = query_planes(q, qlen, W)

    def to4(x):
        X = x.shape[1]
        return x.reshape(G, pair_sub, 128, X).transpose(0, 3, 1, 2)

    def to3(x):
        return x.reshape(G, pair_sub, 128)

    tT = to4(t.astype(I32))
    b4 = lambda X: pl.BlockSpec((1, X, pair_sub, 128),
                                lambda g: (g, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    b3 = pl.BlockSpec((1, pair_sub, 128), lambda g: (g, 0, 0),
                      memory_space=pltpu.VMEM)
    b5 = pl.BlockSpec((1, Lt, W, pair_sub, 128),
                      lambda g: (g, 0, 0, 0, 0), memory_space=pltpu.VMEM)
    cells = N * Lq * Lt
    dist, tend, pvp, mvp = pl.pallas_call(
        functools.partial(_myers_planes_kernel, W=W, Lt=Lt),
        grid=(G,),
        in_specs=[b3, b3, b4(W), b4(W), b4(W), b4(W), b4(Lt)],
        out_specs=[b3, b3, b5, b5],
        out_shape=[jax.ShapeDtypeStruct((G, pair_sub, 128), jnp.int32)] * 2
        + [jax.ShapeDtypeStruct((G, Lt, W, pair_sub, 128), jnp.int32)] * 2,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * cells // 31 + cells // 8,
            bytes_accessed=N * (Lt + 4 * W + 16 + 8 * W * Lt) * 4,
            transcendentals=0),
    )(to3(qlen.astype(I32)), to3(tlen.astype(I32)),
      to4(q0), to4(q1), to4(vq), to4(mend), tT)
    res = MyersResult(dist=dist.reshape(N), tend=tend.reshape(N))
    planes = lambda x: x.transpose(1, 0, 3, 4, 2).reshape(Lt, N, W)
    return res, planes(pvp), planes(mvp)


def planes_fit_vmem(Lq: int, Lt: int, pair_sub: int = 8) -> bool:
    W = n_words(Lq)
    # x2: the grid pipeline double-buffers each block (round-2 advisor fix)
    need = 2 * (2 * Lt * W + Lt + 5 * W) * pair_sub * 128 * 4
    return W <= MAX_WORDS and need <= PLANES_VMEM_BUDGET


@functools.partial(jax.jit,
                   static_argnames=("pair_sub", "interpret"))
def myers_batch_pallas(q: jax.Array, t: jax.Array, qlen: jax.Array,
                       tlen: jax.Array, pair_sub: int = 8,
                       interpret: bool = False) -> MyersResult:
    """Batched bit-parallel semi-global edit distance on TPU.

    q, t: int32 base codes (N, Lq), (N, Lt); codes outside 0..3 never match.
    N must be a multiple of pair_sub*128 (callers pad).  Bit-exact vs
    ops.myers.myers_batch / oracle.edit_distance_hw.
    """
    N, Lq = q.shape
    Lt = t.shape[1]
    T = pair_sub * 128
    if N % T:
        raise ValueError(f"N={N} not a multiple of pair tile {T}")
    W = n_words(Lq)
    if W > MAX_WORDS:
        raise ValueError(f"Lq={Lq} needs {W} words > {MAX_WORDS}; "
                         "use myers_batch or segment the query")
    G = N // T
    q0, q1, vq, mend = query_planes(q, qlen, W)     # (N, W)

    def to4(x):      # (N, X) -> (G, X, S, 128): column-major per pair tile
        X = x.shape[1]
        return x.reshape(G, pair_sub, 128, X).transpose(0, 3, 1, 2)

    def to3(x):      # (N,) -> (G, S, 128)
        return x.reshape(G, pair_sub, 128)

    tT = to4(t.astype(I32))
    b4 = lambda X: pl.BlockSpec((1, X, pair_sub, 128),
                                lambda g: (g, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    b3 = pl.BlockSpec((1, pair_sub, 128), lambda g: (g, 0, 0),
                      memory_space=pltpu.VMEM)
    cells = N * Lq * Lt
    dist, tend = pl.pallas_call(
        functools.partial(_myers_kernel, W=W, Lt=Lt),
        grid=(G,),
        in_specs=[b3, b3, b4(W), b4(W), b4(W), b4(W), b4(Lt)],
        out_specs=[b3, b3],
        out_shape=[jax.ShapeDtypeStruct((G, pair_sub, 128), jnp.int32)] * 2,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * cells // 31 + cells // 8,
            bytes_accessed=N * (Lt + 4 * W + 16) * 4,
            transcendentals=0),
    )(to3(qlen.astype(I32)), to3(tlen.astype(I32)),
      to4(q0), to4(q1), to4(vq), to4(mend), tT)
    return MyersResult(dist=dist.reshape(N), tend=tend.reshape(N))
