"""L5 device ops — pileup consensus as scatter-add vote tensors.

TPU-native replacement for the reference's per-column consensus loops
(SURVEY.md C12/C13, BASELINE.json: "batched POA/pileup DP on-device").  The
pileup is a (position x symbol) vote tensor built with one scatter-add over
all alignment columns, and the consensus base is an argmax per column with a
backbone prior — mirroring utils/oracle.pileup_consensus bit-for-bit.

Symbols: 0..3 = A,C,G,T (substitution vote), 4 = deletion, 5 = unused slot
(reserved for insertion counts).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

I32 = jnp.int32
N_SYM = 6


@functools.partial(jax.jit, static_argnames=("length",))
def consensus_votes(
    cols: jax.Array,      # int32 (N,) backbone columns (0-based)
    syms: jax.Array,      # int32 (N,) symbol per vote (0..4)
    valid: jax.Array,     # bool  (N,)
    length: int,          # backbone capacity (static)
) -> jax.Array:
    """Scatter votes into a (length, N_SYM) tensor."""
    cols = jnp.where(valid, cols, length)      # out-of-range rows are dropped
    flat = cols * N_SYM + jnp.clip(syms, 0, N_SYM - 1)
    votes = jnp.zeros((length * N_SYM,), I32).at[flat].add(
        valid.astype(I32), mode="drop")
    return votes.reshape(length, N_SYM)


@functools.partial(jax.jit, static_argnames=("min_depth",))
def consensus_call(
    votes: jax.Array,      # int32 (L, N_SYM)
    backbone: jax.Array,   # int32 (L,) backbone base codes
    min_depth: int = 2,
) -> Tuple[jax.Array, jax.Array]:
    """Per-column consensus symbol (argmax with +1 backbone prior).

    Returns (symbols int32 (L,), depth int32 (L,)); columns with depth <
    min_depth keep the backbone base.  Oracle: pileup_consensus.
    """
    L = votes.shape[0]
    depth = jnp.sum(votes[:, :5], axis=1)
    prior = jax.nn.one_hot(backbone, N_SYM, dtype=I32)
    total = votes + prior
    best = jnp.argmax(total[:, :5], axis=1).astype(I32)  # ties -> lower sym
    out = jnp.where(depth >= min_depth, best, backbone.astype(I32))
    return out, depth
