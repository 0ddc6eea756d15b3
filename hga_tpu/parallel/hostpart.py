"""L6 — host-level work partitioning across JAX processes (multi-host).

The reference is a single-node, single-process C++ program (SURVEY.md §3.2);
our DEVICE work already shards over the global mesh (parallel/mesh.py), but
the stages with a large HOST component — candidate index joins, per-batch
window gathers, vote packing — would be replicated per process in a naive
multi-host run: every host redoing identical joins burns the ≥80%-at-2-hosts
scaling budget (BASELINE.md) on duplicated work.

This module partitions those host loops by ownership:

* each process takes a CONTIGUOUS block of the work items (`block_range`),
  so concatenating per-process results in rank order reproduces the
  single-process output ordering bit-for-bit (SURVEY.md §8.3-2 determinism);
* DP inside a partitioned region runs on the process's LOCAL devices only
  (`local_mesh`) — processes hold different data there, so collectives must
  not span hosts;
* results are re-replicated with a padded `process_allgather`
  (`allgather_concat` for host ndarrays, `allgather_indexed_strings` for
  sequence lists).

Single-process runs short-circuit to identity everywhere, so the virtual
8-device mesh tests exercise the same call sites.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import numpy as np


# Per-process work counters (stage -> items this process handled) —
# observability for multi-host scaling and the assertion hook for the
# 2-process partitioning tests.
WORK: Dict[str, int] = {}


def note(name: str, n: int) -> None:
    WORK[name] = WORK.get(name, 0) + int(n)


def pid() -> int:
    return jax.process_index()


def nproc() -> int:
    return jax.process_count()


def is_main() -> bool:
    return jax.process_index() == 0


def block_range(n_items: int) -> Tuple[int, int]:
    """This process's contiguous [lo, hi) block of n_items work items.

    Blocks are maximally even (sizes differ by at most 1) and ordered by
    rank, so rank-ordered concatenation preserves single-process order.
    """
    p, P = jax.process_index(), jax.process_count()
    base, rem = divmod(n_items, P)
    lo = p * base + min(p, rem)
    return lo, lo + base + (1 if p < rem else 0)


def local_mesh(mesh):
    """Mesh for device work INSIDE a host-partitioned region.

    Multi-process: each process sweeps different pairs, so the global mesh
    (whose shard_map/psum would require lock-step identical programs across
    hosts) is replaced by a mesh over the local devices — or None when the
    process owns a single chip.  Single-process: the given mesh unchanged.
    """
    if jax.process_count() <= 1:
        return mesh
    devs = jax.local_devices()
    if len(devs) <= 1:
        return None
    from hga_tpu.parallel.mesh import make_mesh

    return make_mesh(devices=devs)


def fetch(x) -> np.ndarray:
    """np.asarray for possibly-global jax Arrays.

    Multi-process outputs sharded over a global mesh span non-addressable
    devices; fetching them requires a process_allgather.  Fully-addressable
    (single-process or replicated) arrays fetch directly.
    """
    if isinstance(x, jax.Array) and not (
            x.is_fully_addressable or x.is_fully_replicated):
        from jax.experimental import multihost_utils as MH

        return np.asarray(MH.process_allgather(x, tiled=True))
    return np.asarray(x)


def _padded_allgather(x: np.ndarray, n_max: int) -> np.ndarray:
    """process_allgather of a leading-axis-padded array -> (P, n_max, ...)."""
    from jax.experimental import multihost_utils as MH

    pad = [(0, n_max - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    xp = np.pad(x, pad)
    return np.asarray(MH.process_allgather(xp))


def allgather_concat(arrays: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rank-ordered concatenation of per-process host arrays (axis 0).

    Every entry must share the leading dimension.  Per-process counts may
    differ; arrays are padded to the max count, gathered, and re-trimmed.
    """
    if jax.process_count() <= 1:
        return arrays
    from jax.experimental import multihost_utils as MH

    keys = sorted(arrays)
    n_local = int(arrays[keys[0]].shape[0]) if keys else 0
    counts = np.asarray(
        MH.process_allgather(np.asarray([n_local], np.int64))).reshape(-1)
    n_max = int(counts.max()) if counts.size else 0
    out: Dict[str, np.ndarray] = {}
    for k in keys:
        a = np.ascontiguousarray(arrays[k])
        assert a.shape[0] == n_local, (k, a.shape, n_local)
        if n_max == 0:
            out[k] = a
            continue
        g = _padded_allgather(a, n_max)
        out[k] = np.concatenate([g[r, : counts[r]] for r in range(g.shape[0])])
    return out


def allgather_indexed_strings(
    idx: Sequence[int], seqs: Sequence[str]
) -> Tuple[np.ndarray, List[str]]:
    """Gather (index, sequence) pairs from every process, rank-ordered.

    Sequences ride as one flat uint8 buffer + a length array; both gathers
    are rank-ordered so lengths and buffer slices stay aligned.
    """
    idx = np.asarray(idx, np.int64)
    seqs = list(seqs)
    if jax.process_count() <= 1:
        return idx, seqs
    lens = np.asarray([len(s) for s in seqs], np.int64)
    buf = np.frombuffer("".join(seqs).encode("ascii"), np.uint8)
    meta = allgather_concat({"idx": idx, "lens": lens})
    flat = allgather_concat({"buf": buf})["buf"]
    out: List[str] = []
    o = 0
    for L in meta["lens"]:
        out.append(flat[o : o + int(L)].tobytes().decode("ascii"))
        o += int(L)
    return meta["idx"], out
