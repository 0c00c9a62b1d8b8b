"""Rotary position embedding, interleaved-pair convention.

The reference uses lucidrains' rotary-embedding-torch with
`RotaryEmbedding(min(32, attn_dim_head))` (vddp.py:612) and calls
`rotate_queries_or_keys` on q/k (and on conditioning keys in temporal
attention with per-frame cond, vddp.py:470-471). That implementation:

  inv_freq_i = theta^(-2i/dim),  i in [0, dim/2),  theta = 10000
  freqs[n, 2i] = freqs[n, 2i+1] = n * inv_freq_i          (interleaved repeat)
  out = t * cos(freqs) + rotate_half(t) * sin(freqs)
  rotate_half pairs (x0, x1), (x2, x3), ... -> (-x1, x0), (-x3, x2), ...

Only the first `dim` features are rotated; trailing features pass through
(here dim == head_dim == 32 in the paper config, so all features rotate).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def rotary_frequencies(seq_len: int, dim: int, theta: float = 10000.0) -> np.ndarray:
    """(seq_len, dim) angle table with interleaved duplication, float32."""
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    freqs = np.outer(np.arange(seq_len, dtype=np.float64), inv_freq)  # (n, dim/2)
    return np.repeat(freqs, 2, axis=-1).astype(np.float32)            # (n, dim)


def _rotate_half_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rotary_heads(x: jnp.ndarray, freqs: jnp.ndarray,
                       heads: int) -> jnp.ndarray:
    """Rotary on a merged-heads tensor x: (..., seq, heads*d) — rotates the
    leading rot_dim features of every head's d-block without materializing a
    head transpose (reshape only)."""
    *lead, n, hd = x.shape
    d = hd // heads
    xr = x.reshape(*lead, n, heads, d)
    rot = freqs.shape[-1]
    x1, x2 = xr[..., :rot], xr[..., rot:]
    f = freqs.astype(x.dtype)[:, None, :]          # (seq, 1, rot)
    x1 = x1 * jnp.cos(f) + _rotate_half_interleaved(x1) * jnp.sin(f)
    out = x1 if x2.shape[-1] == 0 else jnp.concatenate([x1, x2], axis=-1)
    return out.reshape(*lead, n, hd)


def rotary_head_matrices(freqs: np.ndarray, dim_head: int) -> np.ndarray:
    """Per-position rotary as a (seq, d, d) matrix acting on row vectors:
    q_rotated[f] == q[f] @ A[f] for every head's d-block.

    Folding these into the QKV projection weights (W_q @ A[f] per frame)
    removes the separate rotary passes over Q and K from the HBM traffic —
    the same trick the fused Pallas kernel uses, here for the XLA path.
    Features beyond freqs' rot_dim pass through (identity block)."""
    seq, rot = freqs.shape
    cos = np.cos(freqs).astype(np.float32)     # (seq, rot)
    sin = np.sin(freqs).astype(np.float32)
    a = np.zeros((seq, dim_head, dim_head), np.float32)
    idx = np.arange(rot)
    a[:, idx, idx] = cos
    even = np.arange(0, rot, 2)
    odd = even + 1
    # rot_half: out_j gets -q_{j+1} (j even) and +q_{j-1} (j odd)
    a[:, odd, even] = -sin[:, even]
    a[:, even, odd] = sin[:, odd]
    if rot < dim_head:
        tail = np.arange(rot, dim_head)
        a[:, tail, tail] = 1.0
    return a


def apply_rotary(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Rotate the leading freqs.shape[-1] features of x over its second-to-last
    (sequence) axis. x: (..., seq, features); freqs: (seq, rot_dim)."""
    rot_dim = freqs.shape[-1]
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    f = freqs.astype(x.dtype)
    x_rot = x_rot * jnp.cos(f) + _rotate_half_interleaved(x_rot) * jnp.sin(f)
    if x_pass.shape[-1] == 0:
        return x_rot
    return jnp.concatenate([x_rot, x_pass], axis=-1)
