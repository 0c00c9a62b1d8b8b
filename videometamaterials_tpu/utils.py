"""Small shared utilities."""

from __future__ import annotations

import jax


def count_parameters(params) -> int:
    """Number of scalars in a parameter pytree (src/utils.py:8-9)."""
    return sum(int(p.size) for p in jax.tree.leaves(params))
