"""Trace-time stop-gradient probes for backward-cost attribution.

`tag(x, name)` is spliced at interesting cut points in the model code; it
is an identity unless `name` was activated with `ablate(...)` at trace
time, in which case it becomes `lax.stop_gradient(x)` — removing that
subgraph's backward from the compiled program. Used by tools/backprof.py
to difference step timings per cut point. Pure trace-time switching: the
production programs (no active tags) are bit-identical to untagged code.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, Set

from jax import lax

_ACTIVE: Set[str] = set()


def tag(x, name: str):
    """Identity, or stop_gradient when `name` is ablated (trace time)."""
    if name in _ACTIVE:
        return lax.stop_gradient(x)
    return x


@contextmanager
def ablate(*names: str) -> Iterator[None]:
    """Activate stop-gradient for the given tag names while tracing.

    `ablate("none")` (or no names) is a no-op so callers can loop over
    variants uniformly.
    """
    added = {n for n in names if n and n != "none"}
    _ACTIVE.update(added)
    try:
        yield
    finally:
        _ACTIVE.difference_update(added)
