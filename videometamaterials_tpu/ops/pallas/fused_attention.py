"""Pallas TPU kernel: fused attention over many tiny sequences.

The temporal attention of the video U-Net attends over N=11 frames (M=22 keys
with stacked conditioning tokens) independently for every one of up to 9216
pixels x batch x heads. As plain XLA this either runs thousands of tiny
(11x32)@(32x22) MXU matmuls at <1% utilization, or (broadcast form) writes the
(B,S,H,N,M) score tensor to HBM twice. On this memory-starved path the fusion
is worth ~2x whole-model time.

This kernel keeps everything for a block of S pixels resident in VMEM:
per head it computes scores + bias, a numerically-stable softmax, and the
value contraction, writing only the (B,S,N,H*D) output back to HBM. Inputs
stay in the natural projection layout (B, S, tokens, H*D) — no head-split
transposes ever materialize.

Used by models.unet3d.Attention for the temporal axis; falls back to the XLA
path when focus-present masking is active (training-only option) or shapes
are unsuited.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, heads: int,
                 scale: float):
    hd = q_ref.shape[-1]
    d = hd // heads
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q_ref[0, :, :, sl]                        # (S, N, D) bf16
        kh = k_ref[0, :, :, sl]                        # (S, M, D)
        vh = v_ref[0, :, :, sl]                        # (S, M, D)
        sim = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale      # (S, N, M) f32
        sim = sim + bias_ref[h][None]
        sim = sim - jnp.max(sim, axis=-1, keepdims=True)
        p = jnp.exp(sim)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outh = jax.lax.dot_general(
            p.astype(vh.dtype), vh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (S, N, D)
        out_ref[0, :, :, sl] = outh.astype(out_ref.dtype)


def _block_size(s: int, target: int = 128) -> int:
    for cand in range(min(target, s), 0, -1):
        if s % cand == 0:
            return cand
    return s


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def fused_small_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          bias: jnp.ndarray, *, heads: int, scale: float,
                          interpret: bool = False) -> jnp.ndarray:
    """q: (B, S, N, H*D); k, v: (B, S, M, H*D); bias: (H, N, M) float32
    (already holds relative-position bias in the right key-token columns).
    Returns (B, S, N, H*D) in q.dtype."""
    b, s, n, hd = q.shape
    m = k.shape[2]
    s_blk = _block_size(s)

    grid = (b, s // s_blk)
    return pl.pallas_call(
        functools.partial(_attn_kernel, heads=heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, s, n, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s_blk, n, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, m, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_blk, m, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, n, m), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_blk, n, hd), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, bias.astype(jnp.float32))
