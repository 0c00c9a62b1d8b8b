"""Normalization primitives matching the reference's exact conventions.

- channel_layer_norm: scale-only LayerNorm over the channel axis with BIASED
  variance and eps inside the sqrt (vddp.py:245-254). Channels-last layout.
- group_norm: torch.nn.GroupNorm semantics on video tensors — statistics per
  (sample, group) over all frame/spatial positions and the group's channels
  (used by Block, vddp.py:274).

Both compute statistics in float32 regardless of input dtype (TPU bf16
activations; norm math stays fp32 for stability) and cast back.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

# One-pass statistics (biased var = E[x^2] - mean^2): both reductions sweep
# the input once, so XLA can fuse them into a single HBM pass instead of the
# sequential mean -> centered-var chain. fp32 accumulation keeps the
# cancellation error ~1e-7 at post-conv activation scales (pinned by
# tests/test_norms.py). Default ON since the round-4 in-graph bench win:
# 9.12 vs 8.92 videos/min interleaved best-of-3 (BENCH_NOTES.md round 4).
ONE_PASS_STATS = os.environ.get("VMT_ONEPASS_NORMS", "1") not in ("", "0")


def _stats(x32: jnp.ndarray, axes) -> tuple[jnp.ndarray, jnp.ndarray]:
    """fp32 (mean, biased var) over `axes`, one-pass when ONE_PASS_STATS."""
    mean = jnp.mean(x32, axis=axes, keepdims=True)
    if ONE_PASS_STATS:
        meansq = jnp.mean(jnp.square(x32), axis=axes, keepdims=True)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    else:
        var = jnp.mean(jnp.square(x32 - mean), axis=axes, keepdims=True)
    return mean, var


def channel_layer_norm(x: jnp.ndarray, gamma: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """x: (..., C) channels-last; gamma: (C,). Scale-only, biased variance."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean, var = _stats(x32, -1)
    out = (x32 - mean) / jnp.sqrt(var + eps) * gamma.astype(jnp.float32)
    return out.astype(dtype)


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """x: (B, ..., C) channels-last video tensor (e.g. (B, F, H, W, C)).

    Statistics are computed per sample and per channel-group over ALL other
    axes, matching torch GroupNorm on (B, C, F, H, W)."""
    dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0, f"channels {c} not divisible by groups {num_groups}"
    x32 = x.astype(jnp.float32)
    # (B, rest, groups, C/groups)
    grouped = x32.reshape(b, -1, num_groups, c // num_groups)
    mean, var = _stats(grouped, (1, 3))
    normed = (grouped - mean) / jnp.sqrt(var + eps)
    normed = normed.reshape(x.shape)
    out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)
