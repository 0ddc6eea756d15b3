"""L6 — host/device stream pipelining (the PP analog of SURVEY.md §3.1).

The reference is a single-threaded loop: read, compute, repeat.  Here the
host side (file I/O, packing, window gathers) and the device side (jitted
stage kernels) overlap through JAX's asynchronous dispatch: a bounded queue
of in-flight device computations is kept ahead of the consumer, so while
the host blocks materializing batch i's results, batches i+1..i+depth are
already executing on the chip and the host is free to prepare the next
inputs.  No threads needed — async dispatch IS the second pipeline stage.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Iterable, Iterator, Tuple, TypeVar

A = TypeVar("A")
R = TypeVar("R")


def pipelined_map(fn: Callable[..., R], batches: Iterable[Tuple],
                  depth: int = 2) -> Iterator[R]:
    """Map a device function over host-produced batches, keeping up to
    `depth` dispatches in flight.

    `fn(*batch)` must only DISPATCH device work (return jax arrays without
    forcing them) — the consumer forces results, by which time later
    batches are already on the device queue.  depth=1 degenerates to the
    sequential loop.
    """
    q: deque = deque()
    for b in batches:
        q.append(fn(*b))
        while len(q) >= max(depth, 1) + 1:
            yield q.popleft()
    while q:
        yield q.popleft()
