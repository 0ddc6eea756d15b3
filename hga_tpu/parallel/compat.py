"""JAX API compatibility shims.

`shard_map` moved from `jax.experimental.shard_map` (deprecated in jax 0.8,
import warns) to `jax.shard_map`, which also renamed the `check_rep` kwarg
to `check_vma`.  Every in-repo site imports `shard_map` from here and keeps
the historical `check_rep=` spelling; the shim translates for whichever API
the installed jax exposes.
"""

from __future__ import annotations

import functools
import inspect

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

_PARAMS = set(inspect.signature(_shard_map).parameters)


@functools.wraps(_shard_map)
def shard_map(*args, **kw):
    if "check_rep" in kw and "check_rep" not in _PARAMS:
        kw["check_vma"] = kw.pop("check_rep")
    return _shard_map(*args, **kw)
