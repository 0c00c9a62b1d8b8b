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

Backward: jax.custom_vjp. Default backward is the vjp of the numerically
identical XLA reference (`reference_linear_block`) — under grad the block
then costs kernel_fwd + xla_fwd + xla_bwd (the plan-split tax). Opt-in
VMT_LINEAR_BWD_KERNEL=1 switches to a whole-block BACKWARD kernel
(`_bwd_kernel`) that recomputes the forward VMEM-resident and emits all
seven cotangents in one pass — one read of (x, g), one write of dx, plus
the small parameter grads. Interpret-mode parity with the XLA vjp is
pinned in tests/test_fused_linear_block.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videometamaterials_tpu.ops.norms import channel_layer_norm


# Merged-heads layout (round-3 v2): all heads share full-lane (N, hidden)
# arrays instead of the v1 per-head loop over (N, d=32) slices.
#
# Why (padded-MXU arithmetic, BENCH_NOTES round-3 ledger): v1's per-head
# contractions pad d=32 -> 128 on both MXU operand edges (1/16 busy tiles
# on the (N,d)@(d,d) value matmul, 37% on the QKV projection) and its
# exp/softmax VPU work runs at 1/4 lane width. Merged layout runs every
# matmul at full lane width:
#   - QKV projection: (N, C)@(C, hidden) matmuls (hidden=256 lanes);
#   - q feature-softmax: per-ROW max over ALL lanes (constant within each
#     head's 32-lane segment, so subtracting it is exact per segment),
#     exp once, per-head segment sums by 32-lane slice reduces;
#   - context: ONE (hidden, hidden) matmul contracting the token axis,
#     then a block-diagonal mask zeroes the cross-head blocks (8x the
#     useful FLOPs of 8 (d,d) matmuls, but dense and full-lane — cheaper
#     than 16x-padded per-head tiles);
#   - values: (N, hidden)@(hidden, hidden) against the masked context.
# Weights come in PRIMAL layout ((C, 3*hidden) / (hidden, C)) — merged
# needs none of v1's head-leading reshapes. Matmul inputs are cast to
# x.dtype (bf16 in production, f32 in the parity tests) with f32
# accumulation.
#
# The block is SPATIALLY TILED as two kernels (an untiled one-cell-per-frame
# variant held ~60 MB of (9216, 256) f32 arrays live and crashed the Mosaic
# compile): the per-feature token softmax factorizes as
#     ctx[a, b] = (1/z[a]) * sum_n exp(k[n, a]) * v[n, b],
# so a STATS kernel accumulates the unnormalized ctx_raw and z across
# spatial tiles (plus the conditioning block once), and an APPLY kernel
# computes per-tile q-softmax and output with 1/z[a] folded into q's lanes
# (no transposes). exp(k) runs without a max shift (the tiled stats pass
# cannot see all tokens before exponentiating); k is clamped SYMMETRICALLY
# at +/-60 instead: the high clamp keeps exp finite (f32 overflows at
# ~88.7), the low clamp keeps every z[a] >= count*e^-60 > 0 so 1/z never
# becomes inf even if a feature's logits all underflow. Exact identity
# whenever |k| <= 60 — beyond that only tokens with true softmax weight
# ~e^-60 of the max are affected.

_K_CLAMP = 60.0


def _merged_mask(hidden: int, d: int, dtype):
    row = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 1)
    return (row // d == col // d).astype(dtype)


def _merged_stats_kernel(x_ref, gamma_ref, wqkv_ref, *refs, heads: int,
                         inv_hw: float, has_cond: bool):
    """Accumulate z[a] = sum_tok exp(k[., a]) and
    ctx_raw[a, b] = sum_tok exp(k[., a]) v[., b] over spatial tiles (grid =
    (B, n_tiles); outputs revisited per batch cell: zeroed at tile 0)."""
    if has_cond:
        ek_ref, ev_ref, ctx_ref, z_ref = refs
    else:
        ctx_ref, z_ref = refs
    hidden = wqkv_ref.shape[1] // 3
    cdt = x_ref.dtype

    def mm(a, b, dims=((1,), (0,))):
        return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=jnp.float32)

    x = x_ref[0]                                      # (T, C)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)
         * gamma_ref[0]).astype(cdt)

    wqkv = wqkv_ref[...]
    k = mm(y, wqkv[:, hidden:2 * hidden])             # (T, hidden) f32
    v = (mm(y, wqkv[:, 2 * hidden:]) * inv_hw).astype(cdt)
    pk = jnp.exp(jnp.clip(k, -_K_CLAMP, _K_CLAMP))

    @pl.when(pl.program_id(1) == 0)
    def _init():
        if has_cond:
            kc = ek_ref[0].astype(jnp.float32)        # (Mc, hidden)
            vc = (ev_ref[0].astype(jnp.float32) * inv_hw).astype(cdt)
            pkc = jnp.exp(jnp.clip(kc, -_K_CLAMP, _K_CLAMP))
            z_ref[0] = jnp.sum(pkc, axis=0, keepdims=True)
            ctx_ref[0] = mm(pkc.astype(cdt), vc, dims=((0,), (0,)))
        else:
            z_ref[0] = jnp.zeros(z_ref.shape[1:], z_ref.dtype)
            ctx_ref[0] = jnp.zeros(ctx_ref.shape[1:], ctx_ref.dtype)

    z_ref[0] += jnp.sum(pk, axis=0, keepdims=True)
    ctx_ref[0] += mm(pk.astype(cdt), v, dims=((0,), (0,)))


def _merged_apply_kernel(x_ref, gamma_ref, wqkv_ref, wout_ref, obias_ref,
                         ctx_ref, z_ref, out_ref, *, heads: int,
                         scale: float):
    """Per spatial tile: q feature-softmax (full-lane), context application
    with the per-feature 1/z folded into q's lanes, out-projection and
    residual."""
    hidden = wout_ref.shape[0]
    d = hidden // heads
    t = x_ref.shape[1]
    cdt = x_ref.dtype

    def mm(a, b, dims=((1,), (0,))):
        return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=jnp.float32)

    x = x_ref[0]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)
         * gamma_ref[0]).astype(cdt)

    wqkv = wqkv_ref[...]
    q = mm(y, wqkv[:, :hidden])                       # (T, hidden) f32

    # per-head softmax over features with a PER-HEAD max shift: shifting
    # by the all-lane row max is algebraically exact but underflows a
    # whole head segment to zero (s_h=0 -> inf/NaN) when its logits sit
    # ~88+ below another head's max; the per-head shift guarantees
    # s_h >= 1, matching the head-layout kernel and the XLA reference
    eqs, brd = [], []
    for h in range(heads):
        q_h = q[:, h * d:(h + 1) * d]
        e_h = jnp.exp(q_h - jnp.max(q_h, axis=-1, keepdims=True))
        s_h = jnp.sum(e_h, axis=-1, keepdims=True)
        eqs.append(e_h)
        brd.append(jnp.broadcast_to(scale / s_h, (t, d)))
    eq = jnp.concatenate(eqs, axis=-1)                # (T, hidden) f32
    brd = jnp.concatenate(brd, axis=-1)               # (T, hidden) f32

    # fold the per-feature 1/z[a] into q's lane a (row a of ctx_raw), mask
    # the cross-head blocks so head h's outputs see head h's inputs only
    qn = (eq * brd * (1.0 / z_ref[0])).astype(cdt)
    ctx_m = (ctx_ref[0]
             * _merged_mask(hidden, d, jnp.float32)).astype(cdt)
    oh = mm(qn, ctx_m)                                # (T, hidden) f32
    out_f = mm(oh.astype(cdt), wout_ref[...])         # (T, C) f32
    out_ref[0] = (xf + obias_ref[0] + out_f).astype(out_ref.dtype)


def _bwd_kernel_merged(x_ref, gamma_ref, wqkv_ref, wout_ref, g_ref, *refs,
                       heads: int, scale: float, inv_hw: float,
                       has_cond: bool):
    """Merged-heads whole-block backward: recompute the forward VMEM-resident
    in the `_kernel_merged` layout, then emit every cotangent — all matmuls
    full-lane, the only per-head work is 32-lane slice reduces (q-softmax
    segment sums, twice). Far less unrolled code than the v1 per-head
    backward. Accumulated outputs follow the revisited-block pattern."""
    if has_cond:
        (ek_ref, ev_ref, dx_ref, dgamma_ref, dwqkv_ref, dwout_ref,
         dobias_ref, dek_ref, dev_ref) = refs
    else:
        (dx_ref, dgamma_ref, dwqkv_ref, dwout_ref, dobias_ref) = refs
    hidden = wout_ref.shape[0]
    d = hidden // heads
    n = x_ref.shape[1]
    cdt = x_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dgamma_ref[...] = jnp.zeros_like(dgamma_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dobias_ref[...] = jnp.zeros_like(dobias_ref)

    def mm(a, b, dims=((1,), (0,))):
        return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=jnp.float32)

    def seg_bcast(t):
        """(N, hidden) -> per-head 32-lane segment sums broadcast back."""
        outs = []
        for h in range(heads):
            s_h = jnp.sum(t[:, h * d:(h + 1) * d], axis=-1, keepdims=True)
            outs.append(jnp.broadcast_to(s_h, (n, d)))
        return jnp.concatenate(outs, axis=-1)

    # ---- forward recompute (the `_kernel_merged` math)
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    inv_sig = jax.lax.rsqrt(var + 1e-5)
    xhat = (xf - mu) * inv_sig
    gamma = gamma_ref[0]
    y = (xhat * gamma).astype(cdt)

    wqkv = wqkv_ref[...]
    q = mm(y, wqkv[:, :hidden])
    k = mm(y, wqkv[:, hidden:2 * hidden])
    v = (mm(y, wqkv[:, 2 * hidden:]) * inv_hw).astype(cdt)

    # per-head max shift (mirrors _merged_apply_kernel: the all-lane row
    # max can underflow a whole head segment to zero -> inf/NaN)
    eqs = []
    for h in range(heads):
        q_h = q[:, h * d:(h + 1) * d]
        eqs.append(jnp.exp(q_h - jnp.max(q_h, axis=-1, keepdims=True)))
    eq = jnp.concatenate(eqs, axis=-1)
    qn = eq * (scale / seg_bcast(eq))                 # scale*softmax_seg(q)
    qn_c = qn.astype(cdt)

    if has_cond:
        kc = ek_ref[0].astype(jnp.float32)
        vc = (ev_ref[0].astype(jnp.float32) * inv_hw).astype(cdt)
        # clamp form mirrors the forward stats kernel (the bwd
        # differentiates the function the forward actually computes);
        # the clip's true derivative is applied to d_k below
        pk = jnp.exp(jnp.clip(k, -_K_CLAMP, _K_CLAMP))
        pkc = jnp.exp(jnp.clip(kc, -_K_CLAMP, _K_CLAMP))
        inv_z = 1.0 / (jnp.sum(pk, axis=0, keepdims=True)
                       + jnp.sum(pkc, axis=0, keepdims=True))
        pk_n = pk * inv_z
        pkc_n = pkc * inv_z
        pk_c = pk_n.astype(cdt)
        pkc_c = pkc_n.astype(cdt)
        ctx = mm(pk_c, v, dims=((0,), (0,)))
        ctx = ctx + mm(pkc_c, vc, dims=((0,), (0,)))
    else:
        pk = jnp.exp(jnp.clip(k, -_K_CLAMP, _K_CLAMP))
        pk_n = pk / jnp.sum(pk, axis=0, keepdims=True)
        pk_c = pk_n.astype(cdt)
        ctx = mm(pk_c, v, dims=((0,), (0,)))

    row = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hidden, hidden), 1)
    blockdiag = row // d == col // d
    ctx_m = jnp.where(blockdiag, ctx, 0.0).astype(cdt)
    oh = mm(qn_c, ctx_m)                              # (N, hidden) f32

    # ---- backward
    g_c = g_ref[0]
    g32 = g_c.astype(jnp.float32)
    dobias_ref[...] += jnp.sum(g32, axis=0, keepdims=True)
    dwout_ref[...] += mm(oh.astype(cdt), g_c, dims=((0,), (0,)))
    g_oh = mm(g_c, wout_ref[...], dims=((1,), (1,)))  # (N, hidden) f32
    g_oh_c = g_oh.astype(cdt)

    d_qn = mm(g_oh_c, ctx_m, dims=((1,), (1,)))       # (N, hidden) f32
    d_ctx = mm(qn_c, g_oh_c, dims=((0,), (0,)))       # (hidden, hidden)
    d_ctx_c = jnp.where(blockdiag, d_ctx, 0.0).astype(cdt)

    # qn = scale * softmax_seg(q):
    # dq = qn*d_qn - (qn/scale) * seg_sum(qn*d_qn)
    t = qn * d_qn
    dq = t - (qn * (1.0 / scale)) * seg_bcast(t)

    # ctx backward (per-feature token softmax shared with the cond block)
    d_v = mm(pk_c, d_ctx_c)                           # (N, hidden) f32
    d_pk_n = mm(v, d_ctx_c, dims=((1,), (1,)))        # (N, hidden) f32
    col_s = jnp.sum(pk_n * d_pk_n, axis=0, keepdims=True)
    if has_cond:
        d_vc = mm(pkc_c, d_ctx_c) * inv_hw            # (Mc, hidden)
        d_pkc_n = mm(vc, d_ctx_c, dims=((1,), (1,)))
        col_s = col_s + jnp.sum(pkc_n * d_pkc_n, axis=0, keepdims=True)
        d_kc = jnp.where(jnp.abs(kc) < _K_CLAMP,
                         pkc_n * (d_pkc_n - col_s), 0.0)
        dek_ref[0] = d_kc.astype(dek_ref.dtype)
        dev_ref[0] = d_vc.astype(dev_ref.dtype)
    d_k = jnp.where(jnp.abs(k) < _K_CLAMP, pk_n * (d_pk_n - col_s), 0.0)

    dq_c = dq.astype(cdt)
    dk_c = d_k.astype(cdt)
    dv_c = (d_v * inv_hw).astype(cdt)
    dwqkv_ref[...] += jnp.concatenate(
        [mm(y, dq_c, dims=((0,), (0,))),
         mm(y, dk_c, dims=((0,), (0,))),
         mm(y, dv_c, dims=((0,), (0,)))], axis=1)     # (C, 3*hidden)
    d_y = (mm(dq_c, wqkv[:, :hidden], dims=((1,), (1,)))
           + mm(dk_c, wqkv[:, hidden:2 * hidden], dims=((1,), (1,)))
           + mm(dv_c, wqkv[:, 2 * hidden:], dims=((1,), (1,))))

    dgamma_ref[...] += jnp.sum(xhat * d_y, axis=0, keepdims=True)
    dxh = d_y * gamma
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dx = inv_sig * (dxh - m1 - xhat * m2) + g32
    dx_ref[0] = dx.astype(dx_ref.dtype)


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


def _bwd_kernel(x_ref, gamma_ref, wqkv_ref, wout_ref, g_ref, *refs,
                heads: int, scale: float, inv_hw: float, has_cond: bool):
    """Whole-block backward: forward recompute kept VMEM-resident, then all
    cotangents in one pass. Per-head math mirrors `_kernel`; sublane (token
    axis) reductions lower fine at rank 2 (the forward already uses them).
    Grid-accumulated outputs (dgamma/dwqkv/dwout/dobias) are zeroed on the
    first grid cell and += after (revisited-block pattern)."""
    if has_cond:
        (ek_ref, ev_ref, dx_ref, dgamma_ref, dwqkv_ref, dwout_ref,
         dobias_ref, dek_ref, dev_ref) = refs
    else:
        (dx_ref, dgamma_ref, dwqkv_ref, dwout_ref, dobias_ref) = refs
    d = wout_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dgamma_ref[...] = jnp.zeros_like(dgamma_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dobias_ref[...] = jnp.zeros_like(dobias_ref)

    def dot(a, b, dims):
        return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                                   preferred_element_type=jnp.float32)

    x = x_ref[0]                                      # (N, C)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    inv_sig = jax.lax.rsqrt(var + 1e-5)
    xhat = (xf - mu) * inv_sig
    gamma = gamma_ref[0]
    y = (xhat * gamma).astype(x.dtype)                # (N, C)

    g32 = g_ref[0].astype(jnp.float32)                # (N, C) cotangent
    dobias_ref[...] += jnp.sum(g32, axis=0, keepdims=True)

    dy = jnp.zeros_like(xf)                           # (N, C) f32
    for h in range(heads):
        # ---- forward recompute (as _kernel)
        qkv = dot(y, wqkv_ref[h], ((1,), (0,)))       # (N, 3d) f32
        q_raw = qkv[:, 0:d]
        k = qkv[:, d:2 * d]
        v = qkv[:, 2 * d:3 * d]
        sm = jnp.exp(q_raw - jnp.max(q_raw, axis=-1, keepdims=True))
        sm = sm / jnp.sum(sm, axis=-1, keepdims=True)  # softmax_d(q)
        q_t = sm * scale
        if has_cond:
            kc = ek_ref[0, h].astype(jnp.float32)      # (Mc, d)
            vc = ev_ref[0, h].astype(jnp.float32)
            mx = jnp.maximum(jnp.max(k, axis=0, keepdims=True),
                             jnp.max(kc, axis=0, keepdims=True))
            pk = jnp.exp(k - mx)
            pkc = jnp.exp(kc - mx)
            z = (jnp.sum(pk, axis=0, keepdims=True)
                 + jnp.sum(pkc, axis=0, keepdims=True))
            pk = pk / z
            pkc = pkc / z
            ctx = dot(pk, v * inv_hw, ((0,), (0,)))    # (d, d)
            ctx = ctx + dot(pkc, vc * inv_hw, ((0,), (0,)))
        else:
            mx = jnp.max(k, axis=0, keepdims=True)
            pk = jnp.exp(k - mx)
            pk = pk / jnp.sum(pk, axis=0, keepdims=True)
            ctx = dot(pk, v * inv_hw, ((0,), (0,)))
        oh = dot(q_t, ctx, ((1,), (0,)))               # (N, d)

        # ---- backward
        dwout_ref[h] += dot(oh, g32, ((0,), (0,)))     # (d, C)
        g_oh = dot(g32, wout_ref[h], ((1,), (1,)))     # (N, d)
        dq_t = dot(g_oh, ctx, ((1,), (1,)))            # (N, d)
        dctx = dot(q_t, g_oh, ((0,), (0,)))            # (d, d)
        # q~ = scale * softmax_d(q_raw)
        dsm = dq_t * scale
        dq = sm * (dsm - jnp.sum(sm * dsm, axis=-1, keepdims=True))
        # ctx = pk^T (v ihw) [+ pkc^T (vc ihw)]
        dv = dot(pk, dctx, ((1,), (0,))) * inv_hw      # (N, d)
        dpk = dot(v * inv_hw, dctx, ((1,), (1,)))      # (N, d)
        if has_cond:
            dvc = dot(pkc, dctx, ((1,), (0,))) * inv_hw
            dpkc = dot(vc * inv_hw, dctx, ((1,), (1,)))
            s_feat = (jnp.sum(pk * dpk, axis=0, keepdims=True)
                      + jnp.sum(pkc * dpkc, axis=0, keepdims=True))
            dk = pk * (dpk - s_feat)
            dkc = pkc * (dpkc - s_feat)
            dek_ref[0, h] = dkc.astype(dek_ref.dtype)
            dev_ref[0, h] = dvc.astype(dev_ref.dtype)
        else:
            s_feat = jnp.sum(pk * dpk, axis=0, keepdims=True)
            dk = pk * (dpk - s_feat)
        dqkv = jnp.concatenate([dq, dk, dv],
                               axis=1).astype(x.dtype)   # (N, 3d)
        dwqkv_ref[h] += dot(y, dqkv, ((0,), (0,)))     # (C, 3d)
        dy = dy + dot(dqkv, wqkv_ref[h], ((1,), (1,)))  # (N, C)

    # ---- LN backward + residual
    dgamma_ref[...] += jnp.sum(xhat * dy, axis=0, keepdims=True)
    dxh = dy * gamma
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=-1, keepdims=True)
    dx = inv_sig * (dxh - m1 - xhat * m2) + g32
    dx_ref[0] = dx.astype(dx_ref.dtype)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def fused_linear_block_core(x, gamma, w_qkv, w_out, out_bias, ek, ev, heads,
                            scale, spatial_size, interpret, bwd_kernel,
                            layout):
    return _run_kernel(x, gamma, w_qkv, w_out, out_bias, ek, ev, heads=heads,
                       scale=scale, spatial_size=spatial_size,
                       interpret=interpret, layout=layout)


def _core_fwd(x, gamma, w_qkv, w_out, out_bias, ek, ev, heads, scale,
              spatial_size, interpret, bwd_kernel, layout):
    out = _run_kernel(x, gamma, w_qkv, w_out, out_bias, ek, ev, heads=heads,
                      scale=scale, spatial_size=spatial_size,
                      interpret=interpret, layout=layout)
    return out, (x, gamma, w_qkv, w_out, out_bias, ek, ev)


def _bwd_kernel_env() -> bool:
    import os
    return os.environ.get("VMT_LINEAR_BWD_KERNEL", "") == "1"


def _core_bwd(heads, scale, spatial_size, interpret, bwd_kernel, layout,
              residuals, g):
    if bwd_kernel or _bwd_kernel_env():
        run = _run_bwd_kernel
        if layout == "merged":
            # the merged backward is untiled (grid=(b,), whole-N blocks) —
            # the formulation whose forward twin failed to compile at the
            # flagship shape (~60 MB VMEM-resident); route big shapes to
            # the tiled-enough per-head kernel instead (both differentiate
            # the same math from the same primal residuals)
            x = residuals[0]
            hd = residuals[3].shape[0]
            est = 12 * x.shape[1] * hd * 4            # ~live f32 arrays
            if est <= 40 * 2 ** 20:
                run = _run_bwd_kernel_merged
        return run(residuals, g, heads=heads, scale=scale,
                   spatial_size=spatial_size, interpret=interpret)
    x, gamma, w_qkv, w_out, out_bias, ek, ev = residuals
    _, vjp = jax.vjp(
        lambda *args: reference_linear_block(
            *args, heads=heads, scale=scale, spatial_size=spatial_size),
        x, gamma, w_qkv, w_out, out_bias, ek, ev)
    return vjp(g)


def _run_bwd_kernel(residuals, g, *, heads, scale, spatial_size, interpret):
    """pallas_call plumbing for the backward kernel; returns the seven
    cotangents in custom-VJP argument order, mapped back from the kernel's
    head-leading weight layouts to the primal layouts."""
    x, gamma, w_qkv, w_out, out_bias, ek, ev = residuals
    b, n, c = x.shape
    hd = w_out.shape[0]
    d = hd // heads
    has_cond = ek is not None

    gamma2 = gamma.reshape(1, -1).astype(jnp.float32)
    wqkv_hm = w_qkv.reshape(c, 3, heads, d).transpose(2, 0, 1, 3) \
        .reshape(heads, c, 3 * d)
    wout_hm = w_out.astype(jnp.float32).reshape(heads, d, c)

    grid = (b,)
    kernel = functools.partial(_bwd_kernel, heads=heads, scale=scale,
                               inv_hw=1.0 / spatial_size, has_cond=has_cond)
    x_spec = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, c), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((heads, c, 3 * d), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    wout_spec = pl.BlockSpec((heads, d, c), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [x_spec, row_spec, wqkv_spec, wout_spec, x_spec]
    operands = [x, gamma2, wqkv_hm.astype(x.dtype), wout_hm,
                g.astype(x.dtype)]
    if has_cond:
        m_c = ek.shape[1]
        ek_h = ek.reshape(b, m_c, heads, d).transpose(0, 2, 1, 3)
        ev_h = ev.reshape(b, m_c, heads, d).transpose(0, 2, 1, 3)
        cond_spec = pl.BlockSpec((1, heads, m_c, d), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs += [cond_spec, cond_spec]
        operands += [ek_h, ev_h]

    out_shapes = [
        jax.ShapeDtypeStruct((b, n, c), x.dtype),                  # dx
        jax.ShapeDtypeStruct((1, c), jnp.float32),                 # dgamma
        jax.ShapeDtypeStruct((heads, c, 3 * d), jnp.float32),      # dwqkv
        jax.ShapeDtypeStruct((heads, d, c), jnp.float32),          # dwout
        jax.ShapeDtypeStruct((1, c), jnp.float32),                 # dobias
    ]
    out_specs = [x_spec, row_spec, wqkv_spec, wout_spec, row_spec]
    if has_cond:
        out_shapes += [
            jax.ShapeDtypeStruct((b, heads, m_c, d), jnp.float32),
            jax.ShapeDtypeStruct((b, heads, m_c, d), jnp.float32),
        ]
        out_specs += [cond_spec, cond_spec]

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)

    dx, dgamma, dwqkv_hm, dwout_hm, dobias = outs[:5]
    dwqkv = dwqkv_hm.reshape(heads, c, 3, d).transpose(1, 2, 0, 3) \
        .reshape(c, 3 * hd).astype(w_qkv.dtype)
    dwout = dwout_hm.reshape(hd, c).astype(w_out.dtype)
    dek = dev = None
    if has_cond:
        dek = outs[5].transpose(0, 2, 1, 3).reshape(b, m_c, hd) \
            .astype(ek.dtype)
        dev = outs[6].transpose(0, 2, 1, 3).reshape(b, m_c, hd) \
            .astype(ev.dtype)
    return (dx, dgamma.reshape(gamma.shape).astype(gamma.dtype),
            dwqkv, dwout,
            dobias.reshape(out_bias.shape).astype(out_bias.dtype),
            dek, dev)


def _run_bwd_kernel_merged(residuals, g, *, heads, scale, spatial_size,
                           interpret):
    """pallas_call plumbing for `_bwd_kernel_merged`: primal weight layouts,
    cotangents in custom-VJP argument order. One grid cell per folded frame
    (not yet spatially tiled — see the forward's tiling note)."""
    x, gamma, w_qkv, w_out, out_bias, ek, ev = residuals
    b, n, c = x.shape
    hd = w_out.shape[0]
    has_cond = ek is not None

    gamma2 = gamma.reshape(1, -1).astype(jnp.float32)

    grid = (b,)
    kernel = functools.partial(_bwd_kernel_merged, heads=heads, scale=scale,
                               inv_hw=1.0 / spatial_size, has_cond=has_cond)
    x_spec = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, c), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((c, 3 * hd), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    wout_spec = pl.BlockSpec((hd, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [x_spec, row_spec, wqkv_spec, wout_spec, x_spec]
    operands = [x, gamma2, w_qkv.astype(x.dtype), w_out.astype(x.dtype),
                g.astype(x.dtype)]
    if has_cond:
        m_c = ek.shape[1]
        cond_spec = pl.BlockSpec((1, m_c, hd), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs += [cond_spec, cond_spec]
        operands += [ek, ev]

    out_shapes = [
        jax.ShapeDtypeStruct((b, n, c), x.dtype),              # dx
        jax.ShapeDtypeStruct((1, c), jnp.float32),             # dgamma
        jax.ShapeDtypeStruct((c, 3 * hd), jnp.float32),        # dwqkv
        jax.ShapeDtypeStruct((hd, c), jnp.float32),            # dwout
        jax.ShapeDtypeStruct((1, c), jnp.float32),             # dobias
    ]
    out_specs = [x_spec, row_spec, wqkv_spec, wout_spec, row_spec]
    if has_cond:
        out_shapes += [jax.ShapeDtypeStruct((b, m_c, hd), jnp.float32),
                       jax.ShapeDtypeStruct((b, m_c, hd), jnp.float32)]
        out_specs += [cond_spec, cond_spec]

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)

    dx, dgamma, dwqkv, dwout, dobias = outs[:5]
    dek = dev = None
    if has_cond:
        dek = outs[5].astype(ek.dtype)
        dev = outs[6].astype(ev.dtype)
    return (dx, dgamma.reshape(gamma.shape).astype(gamma.dtype),
            dwqkv.astype(w_qkv.dtype), dwout.astype(w_out.dtype),
            dobias.reshape(out_bias.shape).astype(out_bias.dtype),
            dek, dev)


fused_linear_block_core.defvjp(_core_fwd, _core_bwd)


def _pick_tile_merged(n: int) -> int:
    for t in (2304, 1152, 768, 512, 384, 256, 128):
        if n % t == 0:
            return t
    return n


def _run_kernel_merged(x, gamma, w_qkv, w_out, out_bias, ek, ev, *, heads,
                       scale, spatial_size, interpret):
    """Two spatially-tiled pallas_calls (stats, then apply): all weights and
    the conditioning tokens stay in PRIMAL layout — no head-leading
    reshapes. VMEM per grid cell is bounded by the tile size, not N."""
    b, n, c = x.shape
    hd = w_out.shape[0]
    has_cond = ek is not None
    tile = _pick_tile_merged(n)
    n_tiles = n // tile

    gamma2 = gamma.reshape(1, -1).astype(jnp.float32)
    obias2 = out_bias.reshape(1, -1).astype(jnp.float32)
    wqkv_c = w_qkv.astype(x.dtype)

    x_spec = pl.BlockSpec((1, tile, c), lambda i, t: (i, t, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, c), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((c, 3 * hd), lambda i, t: (0, 0),
                             memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    # ---- stats kernel: ctx_raw (B, hd, hd) + z (B, 1, hd), accumulated
    # across the tile axis (revisited output blocks, zeroed at tile 0)
    stats_in_specs = [x_spec, row_spec, wqkv_spec]
    stats_operands = [x, gamma2, wqkv_c]
    if has_cond:
        m_c = ek.shape[1]
        cond_spec = pl.BlockSpec((1, m_c, hd), lambda i, t: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        stats_in_specs += [cond_spec, cond_spec]
        stats_operands += [ek, ev]
    ctx_raw, z = pl.pallas_call(
        functools.partial(_merged_stats_kernel, heads=heads,
                          inv_hw=1.0 / spatial_size, has_cond=has_cond),
        out_shape=[jax.ShapeDtypeStruct((b, hd, hd), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, hd), jnp.float32)],
        grid=(b, n_tiles),
        in_specs=stats_in_specs,
        out_specs=[pl.BlockSpec((1, hd, hd), lambda i, t: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, hd), lambda i, t: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        compiler_params=params,
        interpret=interpret,
    )(*stats_operands)

    # ---- apply kernel: per-tile q softmax + context application + out
    return pl.pallas_call(
        functools.partial(_merged_apply_kernel, heads=heads, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b, n_tiles),
        in_specs=[
            x_spec,
            row_spec,
            wqkv_spec,
            pl.BlockSpec((hd, c), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            row_spec,
            pl.BlockSpec((1, hd, hd), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=x_spec,
        compiler_params=params,
        interpret=interpret,
    )(x, gamma2, wqkv_c, w_out.astype(x.dtype), obias2, ctx_raw, z)


def _run_kernel(x, gamma, w_qkv, w_out, out_bias, ek, ev, *, heads, scale,
                spatial_size, interpret, layout="head"):
    if layout == "merged":
        return _run_kernel_merged(x, gamma, w_qkv, w_out, out_bias, ek, ev,
                                  heads=heads, scale=scale,
                                  spatial_size=spatial_size,
                                  interpret=interpret)
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
                       interpret: bool | None = None,
                       bwd_kernel: bool = False,
                       layout: str | None = None):
    """x: (B, N, C) with frames folded into B; w_qkv (C, 3*hidden);
    w_out (hidden, C); out_bias (C,); ek/ev: (B, Mc, hidden) conditioning
    keys/values (already projected), or None; spatial_size = H*W (the v
    scaling denominator, vddp.py:371).
    Returns x + block(x), differentiable. bwd_kernel=True (or env
    VMT_LINEAR_BWD_KERNEL=1) uses the whole-block backward kernel in place
    of the XLA-reference vjp. layout: 'merged' (default; all heads in
    full-lane tiled arrays — measured 20.1-20.3 vs the v1 per-head loop's
    32.2-32.7 ms/block and bench 8.46 vs 7.89 videos/min, BENCH_NOTES
    round-3) or 'head' (the v1 per-head loop); env VMT_LINEAR_LAYOUT
    overrides the default."""
    if interpret is None:
        import os
        interpret = os.environ.get("VMT_PALLAS_INTERPRET", "") == "1"
    if layout is None:
        import os
        layout = os.environ.get("VMT_LINEAR_LAYOUT", "merged")
    return fused_linear_block_core(x, gamma, w_qkv, w_out, out_bias, ek, ev,
                                   heads, scale, spatial_size, interpret,
                                   bwd_kernel, layout)
