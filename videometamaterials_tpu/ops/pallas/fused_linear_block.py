"""Pallas TPU kernel: whole spatial linear-attention block, fused.

One kernel computes, per folded-frame grid cell (all heads in-kernel), the
residual linear (efficiency) attention block (reference vddp.py:313-378
wrapped in Residual(PreNorm(...)) at vddp.py:673-682):

    out = x + W_out @ linear_attention( split_qkv( LN(x) @ W_qkv ), cond )

where linear attention softmaxes q over its feature axis and k over the token
axis (video tokens plus stacked conditioning tokens), scales v by 1/(H*W),
and contracts through a per-head (d, d) context matrix — O(N) in the token
count (vddp.py:367-375).

HBM traffic per call drops from ~8 activation passes in the unfused graph
(LN read/write, QKV write/read at 3*hidden = 12x the input channels at level
0, context/out einsum round trips, out-proj read/write) to one read of x and
one write of out: QKV, both softmaxes, the context matrix and head outputs
live in VMEM only.

Mosaic-specific design notes:
  - ONE grid cell per folded frame with all heads unrolled in-kernel: x is
    DMA'd and layer-normed exactly once and the head accumulator never
    leaves registers (a heads-innermost grid variant measured no faster
    than XLA — the per-grid-step x re-fetch/LN-recompute ate the win);
  - every contraction is a tall (N, .) MXU matmul — the (d, d) context
    matrix makes linear attention inherently MXU-friendly, unlike the
    temporal kernel's per-position score matrices;
  - the k softmax is a per-feature softmax over the token (sublane) axis,
    reduced jointly over the video block and the conditioning block without
    concatenating them;
  - head-level math stays f32 until the final wide store (no f32->bf16
    casts on narrow <128-lane arrays).

Backward: jax.custom_vjp with the backward taken from the numerically
identical XLA reference (`reference_linear_block`), so the block remains
trainable while inference uses the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videometamaterials_tpu.ops.norms import channel_layer_norm


def _kernel(x_ref, gamma_ref, wqkv_ref, wout_ref, obias_ref, *refs, heads: int,
            scale: float, inv_hw: float, has_cond: bool):
    """One grid cell per folded frame; all heads unrolled in-kernel so x is
    DMA'd and layer-normed exactly once and the accumulator never leaves
    registers (a heads-innermost grid measured no faster than XLA — the
    per-step x re-fetch/LN-recompute ate the fusion win).

    refs = (ek_ref, ev_ref, out_ref) when has_cond else (out_ref,): the
    conditioning operands exist only in the conditioned specialization — the
    uncond variant neither declares nor DMAs them."""
    if has_cond:
        ek_ref, ev_ref, out_ref = refs
    else:
        (out_ref,) = refs
    d = wout_ref.shape[1]

    x = x_ref[0]                                      # (N, C)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)
         * gamma_ref[0]).astype(x.dtype)              # (N, C)

    acc = xf + obias_ref[0]
    for h in range(heads):
        qkv = jax.lax.dot_general(
            y, wqkv_ref[h], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (N, 3d) f32
        q = qkv[:, 0:d]
        k = qkv[:, d:2 * d]
        v = qkv[:, 2 * d:3 * d]

        # q: softmax over the feature axis, then the 1/sqrt(d) scale
        # (vddp.py:367,371: softmax first, scale after)
        q = q - jnp.max(q, axis=-1, keepdims=True)
        q = jnp.exp(q)
        q = q * (scale / jnp.sum(q, axis=-1, keepdims=True))

        # k: per-feature softmax over tokens = [cond block | video block]
        # (cond tokens stack in FRONT, vddp.py:352-353 — order is irrelevant
        # to the reductions below, which is why no concat is needed)
        if has_cond:
            kc = ek_ref[0, h].astype(jnp.float32)     # (Mc, d)
            vc = ev_ref[0, h].astype(jnp.float32)
            mx = jnp.maximum(jnp.max(k, axis=0, keepdims=True),
                             jnp.max(kc, axis=0, keepdims=True))
            pk = jnp.exp(k - mx)
            pkc = jnp.exp(kc - mx)
            z = (jnp.sum(pk, axis=0, keepdims=True)
                 + jnp.sum(pkc, axis=0, keepdims=True))
            pk = pk / z
            pkc = pkc / z
            # context[d_k, d_v] = sum_tokens k'[t, d_k] * (v[t, d_v]/(H*W))
            ctx = jax.lax.dot_general(
                pk, v * inv_hw, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (d, d)
            ctx = ctx + jax.lax.dot_general(
                pkc, vc * inv_hw,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            mx = jnp.max(k, axis=0, keepdims=True)
            pk = jnp.exp(k - mx)
            pk = pk / jnp.sum(pk, axis=0, keepdims=True)
            ctx = jax.lax.dot_general(
                pk, v * inv_hw, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (d, d)

        oh = jax.lax.dot_general(
            q, ctx, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (N, d)
        acc = acc + jax.lax.dot_general(
            oh, wout_ref[h], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (N, C)

    out_ref[0] = acc.astype(out_ref.dtype)


def reference_linear_block(x, gamma, w_qkv, w_out, out_bias, ek, ev, *,
                           heads: int, scale: float, spatial_size: int):
    """Pure-XLA implementation of the exact kernel math. Used as the
    custom-VJP backward and as the parity oracle in tests.
    x: (B, N, C) with frames folded into B; ek/ev: (B, Mc, hidden) or None."""
    from videometamaterials_tpu.ops.attention import (
        linear_attention_tokens_first,
    )

    b, n, c = x.shape
    hd = w_out.shape[0]
    d = hd // heads

    y = channel_layer_norm(x, gamma)
    qkv = jnp.einsum("bnc,ce->bne", y, w_qkv.astype(y.dtype))
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def to_heads(t):
        return t.reshape(b, t.shape[1], heads, d)

    q, k, v = to_heads(q), to_heads(k), to_heads(v)
    if ek is not None:
        k = jnp.concatenate([to_heads(ek.astype(k.dtype)), k], axis=1)
        v = jnp.concatenate([to_heads(ev.astype(v.dtype)), v], axis=1)
    out = linear_attention_tokens_first(q, k, v, scale=scale,
                                        spatial_size=spatial_size)
    out = out.reshape(b, n, hd)
    out = jnp.einsum("bnh,hc->bnc", out, w_out.astype(out.dtype))
    out = out + out_bias.astype(out.dtype)
    return x + out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_linear_block_core(x, gamma, w_qkv, w_out, out_bias, ek, ev, heads,
                            scale, spatial_size, interpret):
    return _run_kernel(x, gamma, w_qkv, w_out, out_bias, ek, ev, heads=heads,
                       scale=scale, spatial_size=spatial_size,
                       interpret=interpret)


def _core_fwd(x, gamma, w_qkv, w_out, out_bias, ek, ev, heads, scale,
              spatial_size, interpret):
    out = _run_kernel(x, gamma, w_qkv, w_out, out_bias, ek, ev, heads=heads,
                      scale=scale, spatial_size=spatial_size,
                      interpret=interpret)
    return out, (x, gamma, w_qkv, w_out, out_bias, ek, ev)


def _core_bwd(heads, scale, spatial_size, interpret, residuals, g):
    x, gamma, w_qkv, w_out, out_bias, ek, ev = residuals
    _, vjp = jax.vjp(
        lambda *args: reference_linear_block(
            *args, heads=heads, scale=scale, spatial_size=spatial_size),
        x, gamma, w_qkv, w_out, out_bias, ek, ev)
    return vjp(g)


fused_linear_block_core.defvjp(_core_fwd, _core_bwd)


def _run_kernel(x, gamma, w_qkv, w_out, out_bias, ek, ev, *, heads, scale,
                spatial_size, interpret):
    b, n, c = x.shape
    hd = w_out.shape[0]
    d = hd // heads
    has_cond = ek is not None

    gamma2 = gamma.reshape(1, -1).astype(jnp.float32)
    obias2 = out_bias.reshape(1, -1).astype(jnp.float32)

    # head-LEADING weight layouts (the blocked dim must not sit in the
    # last-two tiled positions unless full-size)
    wqkv_hm = w_qkv.reshape(c, 3, heads, d).transpose(2, 0, 1, 3) \
        .reshape(heads, c, 3 * d)
    wout_hm = w_out.astype(jnp.float32).reshape(heads, d, c)

    grid = (b,)
    kernel = functools.partial(_kernel, heads=heads, scale=scale,
                               inv_hw=1.0 / spatial_size, has_cond=has_cond)
    in_specs = [
        pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, c, 3 * d), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, d, c), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, gamma2, wqkv_hm.astype(x.dtype), wout_hm, obias2]
    if has_cond:
        m_c = ek.shape[1]
        ek_h = ek.reshape(b, m_c, heads, d).transpose(0, 2, 1, 3)
        ev_h = ev.reshape(b, m_c, heads, d).transpose(0, 2, 1, 3)
        cond_spec = pl.BlockSpec((1, heads, m_c, d), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs += [cond_spec, cond_spec]
        operands += [ek_h, ev_h]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


def fused_linear_block(x, gamma, w_qkv, w_out, out_bias, ek, ev, *,
                       heads: int, scale: float, spatial_size: int,
                       interpret: bool | None = None):
    """x: (B, N, C) with frames folded into B; w_qkv (C, 3*hidden);
    w_out (hidden, C); out_bias (C,); ek/ev: (B, Mc, hidden) conditioning
    keys/values (already projected), or None; spatial_size = H*W (the v
    scaling denominator, vddp.py:371).
    Returns x + block(x), differentiable (XLA-reference backward)."""
    if interpret is None:
        import os
        interpret = os.environ.get("VMT_PALLAS_INTERPRET", "") == "1"
    return fused_linear_block_core(x, gamma, w_qkv, w_out, out_bias, ek, ev,
                                   heads, scale, spatial_size, interpret)
