"""Pallas-vs-XLA engine dispatch with eager probe compilation.

The hot kernels (ops/myers_pallas, ops/align_pallas) can fail to compile at
Mosaic level for shapes near the VMEM budget.  On the single-device path a
``try/except`` around the first eager call catches that and falls back to the
XLA implementation — but on the mesh path the kernel call is traced INSIDE
``jax.jit(shard_map(...))``, so the Mosaic failure surfaces at the OUTER
jit's compile, far from any except (round-2 advisor finding,
models/correction.py).

``probe_compiles`` makes the decision a compile-time fact instead: it
AOT-compiles the jitted kernel once at the exact shard shapes (a pure
host-side ``.lower().compile()`` on abstract values — safe to call even
while an outer trace is in progress) and caches the verdict per shape.
Dispatchers then branch on a concrete bool, never on an exception inside a
traced function.  The extra standalone compile is amortized by the
persistent XLA compile cache (utils/compile_cache.py).
"""

from __future__ import annotations

import logging
from typing import Dict, Tuple

import jax

log = logging.getLogger(__name__)

_PROBE_CACHE: Dict[Tuple, bool] = {}


def probe_compiles(jitted_fn, *args, static=None, label: str = "") -> bool:
    """True iff ``jitted_fn`` compiles at the given argument shapes.

    args: concrete arrays or jax.ShapeDtypeStruct (only shape/dtype are
    used).  static: dict of static keyword arguments.  The (label, shapes,
    statics) tuple keys a process-lifetime cache, so each shape is probed at
    most once.
    """
    sds = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args)
    static = static or {}
    key = (label or getattr(jitted_fn, "__name__", repr(jitted_fn)),
           tuple((s.shape, str(s.dtype)) for s in sds),
           tuple(sorted(static.items())))
    hit = _PROBE_CACHE.get(key)
    if hit is not None:
        return hit
    try:
        jitted_fn.lower(*sds, **static).compile()
        ok = True
    except Exception as e:  # pragma: no cover - backend/compiler specific
        log.warning("pallas probe failed for %s %s: %s",
                    key[0], key[1], str(e)[:200])
        ok = False
    _PROBE_CACHE[key] = ok
    return ok
