"""Pallas TPU kernel: whole temporal-attention block, fused.

One kernel computes, per (batch, pixel-tile, head) grid cell, the residual
temporal attention block of the video U-Net:

    out = x + W_out @ attention( rotary(split_qkv( LN(x) @ W_qkv )) + cond )

HBM traffic per call drops from ~12 activation passes in the unfused graph
(LN read/write, QKV write/read, two (b,s,h,n,m) score-tensor round trips,
out-proj write/read, plus two (b,hw,f,c) layout transposes in the wrapper)
to one read of x and one write of out; scores, QKV and head outputs live in
VMEM only.

Mosaic-specific design notes (each worked around a hard lowering limit):
  - heads ride the innermost GRID dimension with weights blocked head-major;
    an f32 VMEM scratch accumulates head contributions across grid steps
    (a monolithic 8-head unrolled kernel OOM-killed the compiler);
  - score/value contractions are VPU broadcast-multiply-reduces with the
    folded spatial axis vectorized, NOT dot_generals batched over space
    (those lower to S_blk tiny (F, d) MXU matmuls per cell — measured
    ~2800x slower than the XLA path); projections/rotary/cond contractions
    are tall (F*S_blk, ·) MXU matmuls;
  - rotate_half is a matmul with a constant (d, d) signed pair-swap matrix:
    rotary(t) = t*cos + (t@R)*sin — interleaved-basis exact, no strided
    lane ops, no sub-128-lane concats/rolls (all rejected by Mosaic);
  - conditioning tokens use a two-block joint softmax instead of K/V concat,
    with cond keys pre-transposed so every dot contracts rhs dim 0;
  - no f32->bf16 casts on narrow (<128 lane) arrays (unsupported retile):
    head-level math stays f32 until the final wide store.

Backward: jax.custom_vjp with the backward taken from the numerically
identical XLA reference (`reference_temporal_block`), so the block remains
trainable while inference uses the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videometamaterials_tpu.ops.norms import channel_layer_norm
from videometamaterials_tpu.ops.rotary import rotary_frequencies


def rotate_half_matrix(d: int, rot_dim: int) -> np.ndarray:
    """(d, d) constant with t @ R == rotate_half_interleaved(t) on the first
    rot_dim features and 0 beyond (tail handled by cos=1/sin=0)."""
    r = np.zeros((d, d), np.float32)
    for i in range(rot_dim // 2):
        r[2 * i + 1, 2 * i] = -1.0
        r[2 * i, 2 * i + 1] = 1.0
    return r


def rotary_tables(num_frames: int, d: int, rot_dim: int):
    """cos/sin (F, d) in the interleaved-duplicated layout, padded with
    cos=1 / sin=0 beyond rot_dim."""
    ang = rotary_frequencies(num_frames, rot_dim)          # (F, rot)
    cos = np.ones((num_frames, d), np.float32)
    sin = np.zeros((num_frames, d), np.float32)
    cos[:, :rot_dim] = np.cos(ang)
    sin[:, :rot_dim] = np.sin(ang)
    return cos, sin


def _block_kernel(x_ref, gamma_ref, wqkv_ref, wout_ref, bias_ref, cos_ref,
                  sin_ref, rmat_ref, ek_ref, ev_ref, out_ref, acc_ref, *,
                  heads: int, scale: float, has_cond: bool):
    """All contractions are either LARGE-M MXU matmuls over the flattened
    (F*S_blk) row axis or VPU broadcast-multiply-reduces with the folded
    spatial axis vectorized. The score/value contractions must NOT be
    expressed as dot_generals batched over the spatial axis: that lowers to
    S_blk tiny (F, d) matmuls per cell at <1% MXU utilization (measured
    ~2800x slower than the XLA path at the flagship shape)."""
    f, s_blk, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    d = rmat_ref.shape[0]
    h = pl.program_id(2)

    x = x_ref[0]                                     # (F, S, C)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)
         * gamma_ref[0]).astype(x.dtype)             # (F, S, C)

    # this head's q|k|v columns (head-major weight layout); one tall matmul
    qkv = jax.lax.dot_general(
        y.reshape(f * s_blk, c), wqkv_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (F*S, 3d) f32

    cos = cos_ref[...]                               # (F, d)
    sin = sin_ref[...]
    rmat = rmat_ref[...]                             # (d, d)

    def rot(t2):  # (F*S, d) frame-major: t*cos + (t@R)*sin (interleaved)
        swapped = jax.lax.dot_general(
            t2, rmat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (t2.reshape(f, s_blk, d) * cos[:, None, :]
                + swapped.reshape(f, s_blk, d) * sin[:, None, :])

    qh = rot(qkv[:, 0:d])                            # (F, S, d)
    kh = rot(qkv[:, d:2 * d])
    vh = qkv[:, 2 * d:3 * d].reshape(f, s_blk, d)

    # scores (i, j, s): spatial axis stays vectorized, reduce over d.
    # Looping the query frame keeps the broadcast product at (F, S, d)
    # (~4.5 MB lane-padded) instead of (F, F, S, d) (~50 MB, VMEM OOM).
    sim_v = jnp.stack(
        [jnp.sum(qh[i][None] * kh, axis=-1) for i in range(f)],
        axis=0) * scale                              # (F, F, S)

    if has_cond:
        # joint softmax over [cond block | video block] without K/V concat
        ekh = ek_ref[0, 0].astype(jnp.float32)        # (d, Mc)
        evh = ev_ref[0, 0].astype(jnp.float32)        # (Mc, d)
        m_c = ekh.shape[1]
        sim_c = jax.lax.dot_general(
            qh.reshape(f * s_blk, d), ekh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        sim_c = sim_c.reshape(f, s_blk, m_c)         # (F, S, Mc)
        bh = bias_ref[0]                             # (F, M)
        bias_c = jax.lax.slice(bh, (0, 0), (f, m_c))
        bias_v = jax.lax.slice(bh, (0, m_c), (f, bh.shape[1]))
        sim_c = sim_c + bias_c[:, None, :]
        sim_v = sim_v + bias_v[:, :, None]
        mx = jnp.maximum(jnp.max(sim_v, axis=1),
                         jnp.max(sim_c, axis=-1))    # (F, S)
        p_v = jnp.exp(sim_v - mx[:, None, :])
        p_c = jnp.exp(sim_c - mx[:, :, None])
        z = jnp.sum(p_v, axis=1) + jnp.sum(p_c, axis=-1)   # (F, S)
        p_v = p_v / z[:, None, :]
        p_c = p_c / z[:, :, None]
        oh = jnp.stack(
            [jnp.sum(p_v[i][..., None] * vh, axis=0) for i in range(f)],
            axis=0)                                        # (F, S, d)
        oh = oh + jax.lax.dot_general(
            p_c.reshape(f * s_blk, m_c), evh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(f, s_blk, d)
    else:
        sim_v = sim_v + bias_ref[0][:, :, None]
        mx = jnp.max(sim_v, axis=1)                  # (F, S)
        p_v = jnp.exp(sim_v - mx[:, None, :])
        p_v = p_v / jnp.sum(p_v, axis=1)[:, None, :]
        oh = jnp.stack(
            [jnp.sum(p_v[i][..., None] * vh, axis=0) for i in range(f)],
            axis=0)                                        # (F, S, d)

    contrib = jax.lax.dot_general(
        oh.reshape(f * s_blk, d), wout_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    contrib = contrib.reshape(f, s_blk, c)           # (F, S, C)

    @pl.when(h == 0)
    def _():
        acc_ref[...] = xf + contrib

    @pl.when(h > 0)
    def _():
        acc_ref[...] = acc_ref[...] + contrib

    @pl.when(h == heads - 1)
    def _():
        out_ref[0] = acc_ref[...].astype(out_ref.dtype)


def _block_size(s: int, target: int = 256) -> int:
    # 256 bounds the per-query-frame (F, S_blk, d) broadcast products to
    # ~4.5 MB of (lane-padded) VMEM at the flagship shape.
    for cand in range(min(target, s), 0, -1):
        if s % cand == 0:
            return cand
    return s


def reference_temporal_block(x, gamma, w_qkv, w_out, ek, ev, bias, freqs,
                             *, heads: int, scale: float):
    """Pure-XLA implementation of the exact kernel math (interleaved rotary
    basis — same basis as the rest of the model). Used as the custom-VJP
    backward and as the parity oracle in tests. x: (B, F, S, C)."""
    from videometamaterials_tpu.ops.rotary import apply_rotary_heads

    b, f, s, c = x.shape
    hd = w_out.shape[0]
    d = hd // heads

    y = channel_layer_norm(x, gamma)
    qkv = jnp.einsum("bfsc,ce->bfse", y, w_qkv.astype(y.dtype))
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def rot(t):
        tt = t.transpose(0, 2, 1, 3)                   # (b, s, f, hd)
        tt = apply_rotary_heads(tt, freqs, heads)
        return tt.transpose(0, 2, 1, 3)

    q, k = rot(q), rot(k)

    qh = q.reshape(b, f, s, heads, d)
    kh = k.reshape(b, f, s, heads, d)
    vh = v.reshape(b, f, s, heads, d)
    if ek is not None:
        ekh = jnp.broadcast_to(
            ek.reshape(b, -1, 1, heads, d), (b, ek.shape[1], s, heads, d))
        evh = jnp.broadcast_to(
            ev.reshape(b, -1, 1, heads, d), (b, ev.shape[1], s, heads, d))
        kh = jnp.concatenate([ekh, kh], axis=1)
        vh = jnp.concatenate([evh, vh], axis=1)

    sim = jnp.einsum("bfshd,bmshd->bshfm", qh.astype(jnp.float32),
                     kh.astype(jnp.float32)) * scale
    sim = sim + bias.astype(jnp.float32)[None, None]
    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    p = jnp.exp(sim)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bshfm,bmshd->bfshd", p, vh.astype(jnp.float32))
    o = o.reshape(b, f, s, hd).astype(x.dtype)
    out = jnp.einsum("bfsh,hc->bfsc", o, w_out.astype(o.dtype))
    return x + out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_temporal_block_core(x, gamma, w_qkv, w_out, ek, ev, bias, freqs,
                              heads, scale, interpret):
    return _run_kernel(x, gamma, w_qkv, w_out, ek, ev, bias, freqs,
                       heads=heads, scale=scale, interpret=interpret)


def _core_fwd(x, gamma, w_qkv, w_out, ek, ev, bias, freqs, heads, scale,
              interpret):
    out = _run_kernel(x, gamma, w_qkv, w_out, ek, ev, bias, freqs,
                      heads=heads, scale=scale, interpret=interpret)
    return out, (x, gamma, w_qkv, w_out, ek, ev, bias, freqs)


def _core_bwd(heads, scale, interpret, residuals, g):
    x, gamma, w_qkv, w_out, ek, ev, bias, freqs = residuals
    _, vjp = jax.vjp(
        lambda *args: reference_temporal_block(*args, heads=heads,
                                               scale=scale),
        x, gamma, w_qkv, w_out, ek, ev, bias, freqs)
    return vjp(g)


fused_temporal_block_core.defvjp(_core_fwd, _core_bwd)


def _run_kernel(x, gamma, w_qkv, w_out, ek, ev, bias, freqs, *, heads,
                scale, interpret):
    b, f, s, c = x.shape
    hd = w_out.shape[0]
    d = hd // heads
    rot_dim = freqs.shape[-1]
    has_cond = ek is not None
    s_blk = _block_size(s)

    cos_np, sin_np = rotary_tables(f, d, rot_dim)
    cos = jnp.asarray(cos_np)
    sin = jnp.asarray(sin_np)
    rmat = jnp.asarray(rotate_half_matrix(d, rot_dim))
    gamma2 = gamma.reshape(1, -1).astype(jnp.float32)

    # head-LEADING weight layouts: the blocked (head) dim must not sit in
    # the last-two (tiled) positions unless full-size
    wqkv_hm = w_qkv.reshape(c, 3, heads, d).transpose(2, 0, 1, 3) \
        .reshape(heads, c, 3 * d)
    wout_hm = w_out.astype(jnp.float32).reshape(heads, d, c)

    if not has_cond:
        m_c = 1  # placeholder blocks (never read)
        ek_t = jnp.zeros((b, heads, d, 1), x.dtype)
        ev_h = jnp.zeros((b, heads, 1, d), x.dtype)
    else:
        m_c = ek.shape[1]
        # (B, Mc, hd) -> keys (B, heads, d, Mc) / values (B, heads, Mc, d)
        ek_t = ek.reshape(b, m_c, heads, d).transpose(0, 2, 3, 1)
        ev_h = ev.reshape(b, m_c, heads, d).transpose(0, 2, 1, 3)

    grid = (b, s // s_blk, heads)
    kernel = functools.partial(_block_kernel, heads=heads, scale=scale,
                               has_cond=has_cond)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, f, s, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, f, s_blk, c), lambda i, j, h: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 3 * d), lambda i, j, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, c), lambda i, j, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, bias.shape[-1]), lambda i, j, h: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cos.shape, lambda i, j, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sin.shape, lambda i, j, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(rmat.shape, lambda i, j, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d, m_c), lambda i, j, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_c, d), lambda i, j, h: (i, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f, s_blk, c), lambda i, j, h: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((f, s_blk, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, gamma2, wqkv_hm.astype(x.dtype), wout_hm,
      bias.astype(jnp.float32), cos, sin, rmat, ek_t, ev_h)


def fused_temporal_block(x, gamma, w_qkv, w_out, ek, ev, bias, freqs, *,
                         heads: int, scale: float,
                         interpret: bool | None = None):
    """x: (B, F, S, C); w_qkv (C, 3H) in the model's native (interleaved
    rotary) basis; ek/ev: (B, M_c, H) cond keys (already rotary'd) / values,
    or None; bias: (heads, F, M); freqs: (F, rot_dim) interleaved rotary
    angle table (rotary_frequencies output).
    Returns x + block(x), differentiable (XLA-reference backward)."""
    if interpret is None:
        import os
        interpret = os.environ.get("VMT_PALLAS_INTERPRET", "") == "1"
    return fused_temporal_block_core(x, gamma, w_qkv, w_out, ek, ev, bias,
                                     freqs, heads, scale, interpret)
