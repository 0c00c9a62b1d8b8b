"""Small shared utilities."""

from __future__ import annotations

import jax
import numpy as np


def count_parameters(params) -> int:
    """Number of scalars in a parameter pytree (src/utils.py:8-9)."""
    return sum(int(p.size) for p in jax.tree.leaves(params))


_TRACER_TYPES: tuple = ()
try:                                   # jax.core has been churning; keep the
    _TRACER_TYPES = (jax.core.Tracer,)  # fast path but survive its removal
except AttributeError:
    pass


def is_traced(x) -> bool:
    """True iff `x` is an abstract tracer (i.e. we are under a jit/vmap/scan
    trace). Used to dispatch host-driven control flow (e.g. chunked sampler
    segments) only when values are concrete."""
    if _TRACER_TYPES:
        return isinstance(x, _TRACER_TYPES)
    if isinstance(x, np.ndarray) or not isinstance(x, jax.Array):
        return False
    try:
        # concrete jax Arrays expose shard data; tracers raise
        # ConcretizationTypeError on any data-dependent attribute
        _ = x.addressable_shards
        return False
    except Exception:
        return True
