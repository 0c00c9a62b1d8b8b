"""Factorized video U-Net denoiser, TPU-native.

Re-design of the reference Unet3D (vddp.py:574-821) with identical math but a
TPU-first execution plan:

  - channels-last (B, F, H, W, C) video layout; pseudo-3D convs run as 2D NHWC
    convolutions with frames folded into batch (MXU-tiled by XLA);
  - temporal attention operates on (B, H*W, F, C), spatial attention on
    (B, F, H*W, C) — pure batched einsums, no einops round-trips;
  - fp32 parameters, bf16 activations, fp32 norms/softmax;
  - rotary tables and T5 bucket tables are compile-time constants;
  - classifier-free guidance takes an explicit per-sample `null_cond_mask`
    (functional replacement of the Bernoulli sampling at vddp.py:749) so the
    CFG pair can be folded into one batched forward at sampling time.

Feature parity (SURVEY.md §2 M2, M4-M12): per-frame conditioning tokens +
mean-pooled hidden, learned null token/hidden, self-stacked and
cross-attention conditioning, spatial linear attention, relative position
bias slicing, rotary on conditioning keys, focus-present masking, the three
padding modes, and the ablation-only CNN/GRU signal embeddings.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from videometamaterials_tpu.ops.attention import (
    NEG_INF as _NEG_INF,
    linear_attention_tokens_first,
    stacked_softmax_attention,
)
from videometamaterials_tpu.ops.conv import (
    conv1x1,
    conv2d_spatial,
    conv_transpose2d_spatial,
)
from videometamaterials_tpu.ops.norms import channel_layer_norm, group_norm
from videometamaterials_tpu.ops.rotary import (
    apply_rotary,
    apply_rotary_heads,
    rotary_frequencies,
    rotary_head_matrices,
)
from videometamaterials_tpu.models.embeddings import (
    RelativePositionBias,
    SignalEmbedding,
    SinusoidalPosEmb,
)

_KERNEL_INIT = nn.initializers.lecun_normal()


def _dense(features, name, use_bias=True, dtype=jnp.float32):
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32, name=name)


class _RawKernel(nn.Module):
    """Parameter-compatible stand-in for nn.Dense(use_bias=False): creates
    `<name>/kernel` at the exact same tree path and returns the raw weight,
    for fused Pallas paths that consume the matrix directly. Keeps the torch
    checkpoint importer's name map valid across fused/unfused plans."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", _KERNEL_INIT, self.shape, jnp.float32)


class Block(nn.Module):
    """Conv(1,3,3) + GroupNorm + optional FiLM + SiLU (vddp.py:267-285)."""

    dim_out: int
    groups: int = 8
    padding_mode: str = "zeros"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift=None):
        cin = x.shape[-1]
        kernel = self.param("conv_kernel", _KERNEL_INIT, (3, 3, cin, self.dim_out),
                            jnp.float32)
        bias = self.param("conv_bias", nn.initializers.zeros, (self.dim_out,),
                          jnp.float32)
        x = conv2d_spatial(x.astype(self.dtype), kernel, bias,
                           padding_mode=self.padding_mode)
        gn_scale = self.param("gn_scale", nn.initializers.ones, (self.dim_out,),
                              jnp.float32)
        gn_bias = self.param("gn_bias", nn.initializers.zeros, (self.dim_out,),
                             jnp.float32)
        x = group_norm(x, gn_scale, gn_bias, self.groups)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale[:, None, None, None, :].astype(x.dtype) + 1) \
                + shift[:, None, None, None, :].astype(x.dtype)
        return nn.silu(x)


class ResnetBlock(nn.Module):
    """Two Blocks + 1x1 skip; FiLM scale/shift from the time+cond embedding
    (vddp.py:287-311)."""

    dim_out: int
    time_emb_dim: Optional[int] = None
    groups: int = 8
    padding_mode: str = "zeros"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb=None):
        scale_shift = None
        if self.time_emb_dim is not None:
            assert time_emb is not None, "time emb must be passed in"
            h_emb = _dense(self.dim_out * 2, "time_mlp")(nn.silu(
                time_emb.astype(jnp.float32)))
            scale_shift = jnp.split(h_emb, 2, axis=-1)

        h = Block(self.dim_out, self.groups, self.padding_mode, self.dtype,
                  name="block1")(x, scale_shift=scale_shift)
        h = Block(self.dim_out, self.groups, self.padding_mode, self.dtype,
                  name="block2")(h)

        if x.shape[-1] != self.dim_out:
            res_kernel = self.param("res_kernel", _KERNEL_INIT,
                                    (x.shape[-1], self.dim_out), jnp.float32)
            res_bias = self.param("res_bias", nn.initializers.zeros,
                                  (self.dim_out,), jnp.float32)
            x = conv1x1(x.astype(self.dtype), res_kernel, res_bias)
        return h + x.astype(h.dtype)


class Attention(nn.Module):
    """Shared full-softmax attention for temporal and spatial axes
    (vddp.py:396-535). Input x: (b, s, n, c) where s is the folded batch-like
    axis ((h w) for temporal, f for mid spatial) and n the token axis."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    use_rotary: bool = False
    cond_attention: str = "none"
    cond_dim: int = 64
    per_frame_cond: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        """Raw projection kernels (Linear without bias): shared verbatim by
        the XLA path and the fused Pallas block. The reference creates
        to_q/to_k/to_v unconditionally (vddp.py:415-417); here conditioning
        projections exist whenever a conditioning mode is configured."""
        hidden = self.heads * self.dim_head
        self.to_qkv_kernel = self.param("to_qkv_kernel", _KERNEL_INIT,
                                        (self.dim, hidden * 3), jnp.float32)
        self.to_out_kernel = self.param("to_out_kernel", _KERNEL_INIT,
                                        (hidden, self.dim), jnp.float32)
        if self.cond_attention != "none":
            self.to_k_kernel = self.param("to_k_kernel", _KERNEL_INIT,
                                          (self.cond_dim, hidden),
                                          jnp.float32)
            self.to_v_kernel = self.param("to_v_kernel", _KERNEL_INIT,
                                          (self.cond_dim, hidden),
                                          jnp.float32)
        if self.cond_attention == "cross-attention":
            self.to_q_kernel = self.param("to_q_kernel", _KERNEL_INIT,
                                          (self.dim, hidden), jnp.float32)

    def _cond_kv(self, label_emb):
        ek = conv1x1(label_emb.astype(self.dtype), self.to_k_kernel)
        ev = conv1x1(label_emb.astype(self.dtype), self.to_v_kernel)
        return ek, ev

    def __call__(self, x, pos_bias=None, focus_present_mask=None,
                 label_emb=None):
        b, s, n, c_in = x.shape
        hidden = self.heads * self.dim_head
        scale = self.dim_head ** -0.5
        x = x.astype(self.dtype)

        rot_freqs = None
        if self.use_rotary:
            rot_freqs = jnp.asarray(
                rotary_frequencies(n, min(32, self.dim_head)))

        def split_heads(t):  # (b, s, m, hidden) -> (b, s, heads, m, d)
            m = t.shape[2]
            return t.reshape(b, s, m, self.heads, self.dim_head).transpose(
                0, 1, 3, 2, 4)

        cond_used = self.cond_attention != "none" and label_emb is not None

        if self.cond_attention == "cross-attention" and cond_used:
            q = split_heads(conv1x1(x, self.to_q_kernel))
            ek, ev = self._cond_kv(label_emb)
            # (b, t, hidden) -> (b, s, heads, t, d)
            k = split_heads(jnp.broadcast_to(
                ek[:, None], (b, s, ek.shape[1], hidden)))
            v = split_heads(jnp.broadcast_to(
                ev[:, None], (b, s, ev.shape[1], hidden)))
            if rot_freqs is not None:
                q = apply_rotary(q, rot_freqs)
            out = stacked_softmax_attention(
                q, k, v, scale=scale, num_video_tokens=n, pos_bias=None,
                focus_present_mask=None)
            out = out.transpose(0, 1, 3, 2, 4).reshape(b, s, n, hidden)
            return conv1x1(out, self.to_out_kernel)

        # ---- self-attention (optionally with stacked conditioning tokens).
        # q/k/v stay in merged-heads layout (b, s, tokens, hidden); rotary is
        # applied per head-block without transposing.
        qkv = conv1x1(x, self.to_qkv_kernel)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if rot_freqs is not None:
            k = apply_rotary_heads(k, rot_freqs, self.heads)
            q = apply_rotary_heads(q, rot_freqs, self.heads)

        if cond_used:  # 'self-stacked'
            ek, ev = self._cond_kv(label_emb)
            if pos_bias is None and self.per_frame_cond:
                # spatial attention, per-frame alignment: one cond token per
                # frame; s == num_frames (vddp.py:459-462)
                assert ek.shape[1] == s, (
                    "per-frame cond tokens must align with frame axis")
                ek = ek[:, :, None, :]
                ev = ev[:, :, None, :]
            else:
                t_tok = ek.shape[1]
                if rot_freqs is not None and self.per_frame_cond:
                    # temporal attention: encode time into cond keys
                    # (vddp.py:470-471)
                    ek = apply_rotary_heads(ek, rot_freqs, self.heads)
                ek = jnp.broadcast_to(ek[:, None], (b, s, t_tok, hidden))
                ev = jnp.broadcast_to(ev[:, None], (b, s, t_tok, hidden))
            k = jnp.concatenate([ek, k], axis=-2)
            v = jnp.concatenate([ev, v], axis=-2)

        qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
        out = stacked_softmax_attention(
            qh, kh, vh, scale=scale, num_video_tokens=n,
            pos_bias=pos_bias,
            pos_bias_on_cond=(self.per_frame_cond and cond_used),
            focus_present_mask=(focus_present_mask
                                if not cond_used else None),
        )
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, s, n, hidden)
        return conv1x1(out, self.to_out_kernel)

    def _folded_temporal_weights(self, f):
        """Per-frame QKV weights with rotary and the 1/sqrt(d) q-scale
        folded in (shared by the XLA fast path and the fused Pallas block).
        Returns (w_all (f, c, 3*hidden), freqs)."""
        c_in = self.dim
        heads, dh = self.heads, self.dim_head
        hidden = heads * dh
        scale = dh ** -0.5
        w_q, w_k, w_v = jnp.split(self.to_qkv_kernel, 3, axis=-1)
        freqs = None
        if self.use_rotary:
            freqs_np = rotary_frequencies(f, min(32, dh))
            freqs = jnp.asarray(freqs_np)
            rot = jnp.asarray(rotary_head_matrices(freqs_np, dh))  # (f,d,d)
            # reference rotates AFTER scaling q (vddp.py:492-496); both are
            # linear so scale folds into the rotated q weights
            w_qf = jnp.einsum("chd,fde->fche", w_q.reshape(c_in, heads, dh),
                              rot * scale).reshape(f, c_in, hidden)
            w_kf = jnp.einsum("chd,fde->fche", w_k.reshape(c_in, heads, dh),
                              rot).reshape(f, c_in, hidden)
            w_vf = jnp.broadcast_to(w_v[None], (f, c_in, hidden))
        else:
            w_qf = jnp.broadcast_to((w_q * scale)[None], (f, c_in, hidden))
            w_kf = jnp.broadcast_to(w_k[None], (f, c_in, hidden))
            w_vf = jnp.broadcast_to(w_v[None], (f, c_in, hidden))
        # ONE projection pass: y is read once, not three times
        w_all = jnp.concatenate([w_qf, w_kf, w_vf], axis=-1)
        return w_all, freqs

    def _prepared_temporal_operands(self, f, label_emb):
        """Folded weights + conditioning K/V + combined bias for the
        whole-block temporal formulations (fused kernel and s-tiled XLA)."""
        w_all, freqs = self._folded_temporal_weights(f)
        cond_used = self.cond_attention == "self-stacked" \
            and label_emb is not None
        ek = ev = None
        t_tok = 0
        if cond_used:
            ek, ev = self._cond_kv(label_emb)             # (b, T, hidden)
            if self.use_rotary and self.per_frame_cond:
                ek = apply_rotary_heads(ek, freqs, self.heads)
            t_tok = ek.shape[1]
        return w_all, ek, ev, t_tok, cond_used

    def _temporal_bias_all(self, f, t_tok, cond_used, pos_bias):
        bias_all = jnp.zeros((f, f + t_tok, self.heads), jnp.float32)
        if pos_bias is not None:
            bias_v = pos_bias.astype(jnp.float32).transpose(1, 2, 0)
            bias_all = bias_all.at[:, :f].set(bias_v)
            if cond_used and self.per_frame_cond and t_tok == f:
                # per-frame cond: bias also lands on the cond block
                # (vddp.py:502-512)
                bias_all = bias_all.at[:, f:].set(bias_v)
        return bias_all

    def temporal_stiled(self, x_bfsc, norm_gamma, pos_bias=None,
                        label_emb=None, s_tile: int = 1152):
        """Whole temporal block as a lax.scan over spatial tiles (pure XLA).
        Per tile, the QKV expansion and score/weight tensors are working-set
        sized and XLA's fusion keeps them on-chip — tiling does not change
        total BYTES, it changes what XLA must materialize. Measured 1.14x
        faster than untiled temporal_xla at the level-0 module shape
        (62.1 vs 70.2 ms, BENCH_NOTES.md round-3 roofline); kept as the
        pure-XLA fallback where the fused Pallas kernel (1.9x) is
        unavailable. Math = temporal_xla with f32 score statistics (the
        kernel's XLA twin runs per tile)."""
        from videometamaterials_tpu.ops.pallas.fused_temporal_block import (
            reference_temporal_block,
        )

        b, f, s, c_in = x_bfsc.shape
        w_all, ek, ev, t_tok, cond_used = self._prepared_temporal_operands(
            f, label_emb)
        bias_all = self._temporal_bias_all(f, t_tok, cond_used, pos_bias)
        args = (norm_gamma, w_all.astype(self.dtype),
                self.to_out_kernel.astype(self.dtype),
                None if ek is None else ek.astype(self.dtype),
                None if ev is None else ev.astype(self.dtype), bias_all)

        n = s // s_tile if (s % s_tile == 0) else 1
        if n <= 1:
            return reference_temporal_block(x_bfsc, *args, heads=self.heads)
        xt = x_bfsc.reshape(b, f, n, s_tile, c_in).transpose(2, 0, 1, 3, 4)

        def body(_, xtile):
            return None, reference_temporal_block(xtile, *args,
                                                  heads=self.heads)

        _, out = jax.lax.scan(body, None, xt)
        return out.transpose(1, 2, 0, 3, 4).reshape(b, f, s, c_in)

    def temporal_fused(self, x_bfsc, norm_gamma, pos_bias=None,
                       label_emb=None, tile=None, bwd_kernel=False,
                       vjp_mode=None):
        """Whole temporal attention block as ONE Pallas kernel
        (ops/pallas/fused_temporal_block.py): QKV, scores, softmax and
        weights never leave VMEM — removes the multi-GB HBM round trips the
        XLA path pays at level-0 shapes (see the round-3 roofline in
        BENCH_NOTES.md). Same math as temporal_xla; bf16 compute."""
        from videometamaterials_tpu.ops.pallas.fused_temporal_block import (
            fused_temporal_block,
        )

        b, f, s, c_in = x_bfsc.shape
        heads = self.heads
        w_all, ek, ev, t_tok, cond_used = self._prepared_temporal_operands(
            f, label_emb)
        bias_all = self._temporal_bias_all(f, t_tok, cond_used, pos_bias)

        return fused_temporal_block(
            x_bfsc, norm_gamma, w_all.astype(self.dtype),
            self.to_out_kernel.astype(self.dtype),
            None if ek is None else ek.astype(self.dtype),
            None if ev is None else ev.astype(self.dtype),
            bias_all, heads=heads, tile=tile, bwd_kernel=bwd_kernel,
            vjp_mode=vjp_mode)

    def temporal_xla(self, x_bfsc, norm_gamma, pos_bias=None,
                     focus_present_mask=None, label_emb=None):
        """Whole temporal attention block (LN + QKV + rotary + attention +
        out-proj + residual) in frames-major (b, f, s, c) layout, optimized
        for HBM traffic on TPU — same math as __call__, verified against the
        reference torch model (tests/test_reference_parity.py):

          - NO layout transposes: scores/values contract via broadcast
            multiply-reduce over the folded spatial axis (VPU; the (11,32)
            per-position matmuls would run the MXU at <1% utilization);
          - rotary (and the q scale) fold into per-frame QKV weights
            (ops/rotary.py:rotary_head_matrices) — removes the separate
            rotary passes over Q and K;
          - conditioning K/V tokens are shared across spatial positions and
            enter the score/value reductions by broadcast — never
            materialized at (b, s, tokens, hidden) like the generic path's
            stacked concat (vddp.py:473-474 semantics, zero extra traffic).

        Supports cond_attention in ('none', 'self-stacked'); the wrapper
        falls back to the generic path for cross-attention."""
        b, f, s, c_in = x_bfsc.shape
        heads, dh = self.heads, self.dim_head
        hidden = heads * dh
        y = channel_layer_norm(x_bfsc, norm_gamma).astype(self.dtype)
        w_all, freqs = self._folded_temporal_weights(f)   # (f, c, 3*hidden)
        qkv = jnp.einsum("bfsc,fch->bfsh", y, w_all.astype(self.dtype))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, f, s, heads, dh)
        k = k.reshape(b, f, s, heads, dh)
        v = v.reshape(b, f, s, heads, dh)

        cond_used = self.cond_attention == "self-stacked" \
            and label_emb is not None
        t_tok = 0
        if cond_used:
            ek, ev = self._cond_kv(label_emb)           # (b, T, hidden)
            if self.use_rotary and self.per_frame_cond:
                ek = apply_rotary_heads(ek, freqs, heads)  # (vddp.py:470-471)
            t_tok = ek.shape[1]
            # q already carries the 1/sqrt(d) scale (folded into its
            # weights), so ek must not be scaled again
            ek = ek.reshape(b, t_tok, heads, dh).astype(jnp.float32)
            ev = ev.reshape(b, t_tok, heads, dh).astype(jnp.float32)

        # The (b, i, m, s, heads) score/weight tensors dominate the block's
        # HBM traffic (~1.1 GB each at the flagship shape). In the bf16
        # compute path they are STORED in bf16 — analogous to (but coarser
        # than) the reference's fp16-AMP half-precision sim (main.py:34
        # autocast; bf16 carries 7 mantissa bits vs fp16's 10) — while every
        # softmax statistic (max, sum) and accumulation still runs in
        # float32; on-TPU training convergence was re-validated with this
        # storage. fp32 configs (parity tests, torch A/B) keep
        # full-precision storage and are unchanged.
        store = jnp.float32 if self.dtype == jnp.float32 else self.dtype

        # scores (b, i, j, s, heads): broadcast-multiply-reduce over d keeps
        # the huge folded axis vectorized and lets XLA fuse the reduction
        # q (b,i,1,s,H,d) * k (b,1,j,s,H,d) -> sum d -> (b,i,j,s,H)
        sim_v = jnp.sum(
            (q[:, :, None] * k[:, None]).astype(jnp.float32),
            axis=-1).astype(store)
        bias = None
        if pos_bias is not None:
            bias = pos_bias.astype(jnp.float32)        # (H, i, j)
            bias = bias.transpose(1, 2, 0)[None, :, :, None, :]  # (1,i,j,1,H)
            sim_v = sim_v + bias.astype(store)

        if cond_used:
            # cond keys broadcast over s inside the fused reduce — never
            # materialized per spatial position
            sim_c = jnp.sum(
                q.astype(jnp.float32)[:, :, None]
                * ek[:, None, :, None], axis=-1).astype(store)  # (b,i,T,s,H)
            if bias is not None and self.per_frame_cond and t_tok == f:
                # per-frame cond: bias also lands on the cond block
                # (vddp.py:502-512)
                sim_c = sim_c + bias.astype(store)
            # JOINT softmax over [cond block | video block] WITHOUT the
            # concatenated (b, i, T+j, s, H) tensor the reference builds
            # (vddp.py:473-474): statistics reduce over each block and
            # combine — removes two full-sim HBM materializations (the
            # concat write and the attn re-slice)
            mx = jnp.maximum(
                jnp.max(sim_v, axis=2, keepdims=True),
                jnp.max(sim_c, axis=2, keepdims=True)).astype(jnp.float32)
            e_v = jnp.exp(sim_v.astype(jnp.float32) - mx)
            e_c = jnp.exp(sim_c.astype(jnp.float32) - mx)
            z = (jnp.sum(e_v, axis=2, keepdims=True)
                 + jnp.sum(e_c, axis=2, keepdims=True))
            attn_v = (e_v / z).astype(store)
            attn_c = (e_c / z).astype(store)
            out = jnp.sum(attn_v[..., None].astype(jnp.float32)
                          * v[:, None].astype(jnp.float32), axis=2)
            out = out + jnp.sum(attn_c[..., None].astype(jnp.float32)
                                * ev[:, None, :, None], axis=2)
        else:
            if focus_present_mask is not None:
                eye = jnp.eye(f, dtype=bool)[None, :, :, None, None]
                allow = jnp.where(
                    focus_present_mask[:, None, None, None, None], eye, True)
                sim_v = jnp.where(allow, sim_v,
                                  jnp.asarray(_NEG_INF, sim_v.dtype))
            # fp32 statistics; the exp/normalize upcast fuses into consumers
            # so only bf16 sim/attn ever hit HBM in the bf16 path
            mx = jnp.max(sim_v, axis=2, keepdims=True).astype(jnp.float32)
            e = jnp.exp(sim_v.astype(jnp.float32) - mx)
            attn = (e / jnp.sum(e, axis=2, keepdims=True)).astype(store)
            out = jnp.sum(attn[..., None].astype(jnp.float32)
                          * v[:, None].astype(jnp.float32), axis=2)
        out = out.astype(self.dtype).reshape(b, f, s, hidden)
        out = conv1x1(out, self.to_out_kernel)
        return x_bfsc + out.astype(x_bfsc.dtype)

class SpatialLinearAttention(nn.Module):
    """Linear attention over pixels per frame (vddp.py:313-378). Input:
    (b, f, h, w, c); frames fold into batch.

    Two execution plans sharing the same parameters:
      - default XLA path (this __call__ body, attention math in
        ops/attention.py:linear_attention_tokens_first);
      - fused (TPU): pass `norm_gamma` — ONE Pallas kernel computes the whole
        residual block (LN + QKV + both softmaxes + context + out-proj +
        residual) without leaving VMEM (ops/pallas/fused_linear_block.py)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    cond_attention: str = "none"
    cond_dim: int = 64
    per_frame_cond: bool = False
    dtype: jnp.dtype = jnp.float32
    # whole-block BACKWARD kernel under grad (fused plan only)
    use_bwd_kernel: bool = False

    def _fused_cond_kv(self, label_emb, b, f, hidden):
        """Projected conditioning K/V aligned to the folded frame axis:
        (b*f, Mc, hidden), per-frame -> one token per frame
        (vddp.py:343-346), else broadcast across frames."""
        kk = _RawKernel((label_emb.shape[-1], hidden), name="to_k")()
        vk = _RawKernel((label_emb.shape[-1], hidden), name="to_v")()
        ek = conv1x1(label_emb.astype(self.dtype), kk)    # (b, T, hidden)
        ev = conv1x1(label_emb.astype(self.dtype), vk)
        if self.per_frame_cond:
            assert ek.shape[1] == f, (
                "per-frame cond tokens must align with frame axis")
            return (ek.reshape(b * f, 1, hidden),
                    ev.reshape(b * f, 1, hidden))
        t_tok = ek.shape[1]
        ek = jnp.broadcast_to(ek[:, None], (b, f, t_tok, hidden))
        ev = jnp.broadcast_to(ev[:, None], (b, f, t_tok, hidden))
        return (ek.reshape(b * f, t_tok, hidden),
                ev.reshape(b * f, t_tok, hidden))

    @nn.compact
    def __call__(self, x, label_emb=None, norm_gamma=None):
        b, f, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        scale = self.dim_head ** -0.5

        if norm_gamma is not None:
            # fused whole-block plan (LN and residual INCLUDED)
            from videometamaterials_tpu.ops.pallas.fused_linear_block import (
                fused_linear_block,
            )

            assert self.cond_attention != "cross-attention"
            qkv_kernel = _RawKernel((c, hidden * 3), name="to_qkv")()
            cond_used = self.cond_attention != "none" and label_emb is not None
            ek = ev = None
            if cond_used:
                ek, ev = self._fused_cond_kv(label_emb, b, f, hidden)
            out_kernel = self.param("to_out_kernel", _KERNEL_INIT,
                                    (hidden, self.dim), jnp.float32)
            out_bias = self.param("to_out_bias", nn.initializers.zeros,
                                  (self.dim,), jnp.float32)
            x2 = x.reshape(b * f, h * w, c).astype(self.dtype)
            out = fused_linear_block(
                x2, norm_gamma.astype(jnp.float32),
                qkv_kernel.astype(self.dtype), out_kernel.astype(self.dtype),
                out_bias,
                None if ek is None else ek.astype(self.dtype),
                None if ev is None else ev.astype(self.dtype),
                heads=self.heads, scale=scale, spatial_size=h * w,
                bwd_kernel=self.use_bwd_kernel)
            # match the unfused plan's output dtype (x + y.astype(x.dtype))
            # so the two plans stay interchangeable even for fp32 inputs
            # under bf16 compute
            return out.reshape(b, f, h, w, c).astype(x.dtype)

        xf = x.reshape(b * f, h * w, c).astype(self.dtype)

        def to_heads(t):  # (bf, m, hidden) -> (bf, m, heads, d): reshape only
            return t.reshape(t.shape[0], t.shape[1], self.heads,
                             self.dim_head)

        cond_used = self.cond_attention != "none" and label_emb is not None

        if self.cond_attention == "cross-attention" and cond_used:
            q = to_heads(_dense(hidden, "to_q", use_bias=False,
                                dtype=self.dtype)(xf))
            ek = _dense(hidden, "to_k", use_bias=False, dtype=self.dtype)(
                label_emb.astype(self.dtype))
            ev = _dense(hidden, "to_v", use_bias=False, dtype=self.dtype)(
                label_emb.astype(self.dtype))
            t_tok = ek.shape[1]
            k = to_heads(jnp.broadcast_to(ek[:, None], (b, f, t_tok, hidden)
                                          ).reshape(b * f, t_tok, hidden))
            v = to_heads(jnp.broadcast_to(ev[:, None], (b, f, t_tok, hidden)
                                          ).reshape(b * f, t_tok, hidden))
        else:
            qkv = _dense(hidden * 3, "to_qkv", use_bias=False,
                         dtype=self.dtype)(xf)
            q, k, v = map(to_heads, jnp.split(qkv, 3, axis=-1))
            if cond_used:  # 'self-stacked'
                ek = _dense(hidden, "to_k", use_bias=False, dtype=self.dtype)(
                    label_emb.astype(self.dtype))
                ev = _dense(hidden, "to_v", use_bias=False, dtype=self.dtype)(
                    label_emb.astype(self.dtype))
                if self.per_frame_cond:
                    # align cond frame axis with folded frame axis
                    # (vddp.py:343-346): one token per frame
                    assert ek.shape[1] == f
                    ek = to_heads(ek.reshape(b * f, 1, hidden))
                    ev = to_heads(ev.reshape(b * f, 1, hidden))
                else:
                    t_tok = ek.shape[1]
                    ek = to_heads(jnp.broadcast_to(
                        ek[:, None], (b, f, t_tok, hidden)
                    ).reshape(b * f, t_tok, hidden))
                    ev = to_heads(jnp.broadcast_to(
                        ev[:, None], (b, f, t_tok, hidden)
                    ).reshape(b * f, t_tok, hidden))
                # cond tokens stack in FRONT (vddp.py:352-353)
                k = jnp.concatenate([ek, k], axis=1)
                v = jnp.concatenate([ev, v], axis=1)

        out = linear_attention_tokens_first(q, k, v, scale=scale,
                                            spatial_size=h * w)
        out = out.reshape(b * f, h * w, hidden)
        out_kernel = self.param("to_out_kernel", _KERNEL_INIT,
                                (hidden, self.dim), jnp.float32)
        out_bias = self.param("to_out_bias", nn.initializers.zeros,
                              (self.dim,), jnp.float32)
        out = conv1x1(out, out_kernel, out_bias)
        return out.reshape(b, f, h, w, self.dim)


class _PreNormResidual(nn.Module):
    """Residual(PreNorm(fn)) with the reference's scale-only channel
    LayerNorm (vddp.py:131-137, 245-264)."""

    dim: int
    inner: nn.Module

    @nn.compact
    def __call__(self, x, **kwargs):
        gamma = self.param("norm_gamma", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        return self.inner(channel_layer_norm(x, gamma), **kwargs) + x


class TemporalAttentionBlock(nn.Module):
    """PreNorm + residual full attention over the frame axis.

    The inner Attention is constructed INSIDE this module's scope (named
    'attn') so its parameters nest under `<block>/attn/...` — the layout the
    torch checkpoint importer targets. (Passing a pre-built module in as an
    attribute would register it in the scope that constructed it instead.)

    A whole-block Pallas kernel for this block was built and DELETED after
    on-TPU measurement: the per-position (11, 32) score/value contractions
    are inherently VPU work, and every Pallas formulation tried (batched
    dot_generals, broadcast-reduce with lane-padded d, per-key unrolled
    elementwise) measured 3x-2800x SLOWER than this XLA path (see
    BENCH_NOTES.md kernel ledger). The frames-major temporal_xla plan below
    is the fast path."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    use_rotary: bool = True
    cond_attention: str = "none"
    cond_dim: int = 64
    per_frame_cond: bool = False
    dtype: jnp.dtype = jnp.float32
    # Whole-block Pallas kernel (ops/pallas/fused_temporal_block.py):
    # keeps QKV/scores/weights VMEM-resident (see the round-3 roofline in
    # BENCH_NOTES.md). Falls back to temporal_xla for cross-attention or
    # when a focus_present_mask is active.
    use_fused_block: bool = False
    # s-tiled XLA plan (Attention.temporal_stiled): scan over spatial tiles
    # of this size; None = untiled temporal_xla. Ignored when the fused
    # kernel is active.
    s_tile: int | None = None
    # use the whole-block BACKWARD kernel under grad instead of the
    # XLA-reference vjp (fused_temporal_block.py:_bwd_kernel)
    use_bwd_kernel: bool = False
    # backward plan for the fused block ('recompute' | 'saved' | 'kernel';
    # None = env/default resolution in fused_temporal_block)
    vjp_mode: str | None = None

    def _make_attn(self):
        return Attention(dim=self.dim, heads=self.heads,
                         dim_head=self.dim_head, use_rotary=self.use_rotary,
                         cond_attention=self.cond_attention,
                         cond_dim=self.cond_dim,
                         per_frame_cond=self.per_frame_cond,
                         dtype=self.dtype, name="attn")

    def _fused_ok(self):
        """Same platform gate as the linear block: the Mosaic kernel only
        lowers on TPU; off-TPU the flag is ignored (temporal_xla runs)
        unless interpret mode is forced (parity tests)."""
        if not self.use_fused_block:
            return False
        import os
        if os.environ.get("VMT_PALLAS_INTERPRET", "") == "1":
            return True
        try:
            platform = jax.devices()[0].platform
        except RuntimeError:
            return False
        return platform in ("tpu", "axon")

    @nn.compact
    def __call__(self, x, pos_bias=None, focus_present_mask=None,
                 label_emb=None):
        b, f, h, w, c = x.shape
        gamma = self.param("norm_gamma", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        attn = self._make_attn()
        if self.cond_attention in ("none", "self-stacked"):
            # optimized frames-major path: no transposes, rotary folded
            # into weights, cond K/V never materialized per position
            x4 = x.reshape(b, f, h * w, c)
            if self._fused_ok() and focus_present_mask is None:
                out = attn.temporal_fused(x4, gamma, pos_bias=pos_bias,
                                          label_emb=label_emb,
                                          bwd_kernel=self.use_bwd_kernel,
                                          vjp_mode=self.vjp_mode)
            elif self.s_tile and focus_present_mask is None \
                    and (h * w) % self.s_tile == 0 and h * w > self.s_tile:
                out = attn.temporal_stiled(x4, gamma, pos_bias=pos_bias,
                                           label_emb=label_emb,
                                           s_tile=self.s_tile)
            else:
                out = attn.temporal_xla(
                    x4, gamma, pos_bias=pos_bias,
                    focus_present_mask=focus_present_mask,
                    label_emb=label_emb)
            return out.reshape(b, f, h, w, c)
        # generic fallback (cross-attention ablation)
        y = channel_layer_norm(x, gamma)
        y = y.transpose(0, 2, 3, 1, 4).reshape(b, h * w, f, c)
        y = attn(y, pos_bias=pos_bias,
                 focus_present_mask=focus_present_mask,
                 label_emb=label_emb)
        y = y.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        return x + y.astype(x.dtype)


class SpatialAttentionBlock(nn.Module):
    """PreNorm + residual full attention over pixels, frames folded:
    (b,f,h,w,c) <-> (b, f, h*w, c). Mid-block only (vddp.py:687-689).
    Inner Attention built in-scope as 'attn' (see TemporalAttentionBlock)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    cond_attention: str = "none"
    cond_dim: int = 64
    per_frame_cond: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, label_emb=None):
        b, f, h, w, c = x.shape
        gamma = self.param("norm_gamma", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        attn = Attention(dim=self.dim, heads=self.heads,
                         dim_head=self.dim_head, use_rotary=False,
                         cond_attention=self.cond_attention,
                         cond_dim=self.cond_dim,
                         per_frame_cond=self.per_frame_cond,
                         dtype=self.dtype, name="attn")
        y = channel_layer_norm(x, gamma)
        y = y.reshape(b, f, h * w, c)
        y = attn(y, label_emb=label_emb)
        y = y.reshape(b, f, h, w, c)
        return x + y.astype(x.dtype)


class SpatialLinearAttentionBlock(nn.Module):
    """PreNorm + residual linear attention; inner module built in-scope as
    'attn' (see TemporalAttentionBlock docstring). With use_fused_block, the
    whole residual block runs as ONE Pallas kernel on TPU (same params)."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    cond_attention: str = "none"
    cond_dim: int = 64
    per_frame_cond: bool = False
    dtype: jnp.dtype = jnp.float32
    use_fused_block: bool = False
    use_bwd_kernel: bool = False

    def _fused_ok(self):
        if not self.use_fused_block:
            return False
        if self.cond_attention == "cross-attention":
            return False
        if (self.heads * self.dim_head) % 128 != 0:
            return False
        try:
            platform = jax.devices()[0].platform
        except RuntimeError:
            return False
        return platform in ("tpu", "axon")

    @nn.compact
    def __call__(self, x, label_emb=None):
        gamma = self.param("norm_gamma", nn.initializers.ones, (self.dim,),
                           jnp.float32)
        attn = SpatialLinearAttention(
            dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            cond_attention=self.cond_attention, cond_dim=self.cond_dim,
            per_frame_cond=self.per_frame_cond, dtype=self.dtype,
            use_bwd_kernel=self.use_bwd_kernel, name="attn")
        if self._fused_ok():
            return attn(x, label_emb=label_emb, norm_gamma=gamma)
        y = attn(channel_layer_norm(x, gamma), label_emb=label_emb)
        return x + y.astype(x.dtype)


class Downsample(nn.Module):
    dim: int
    padding_mode: str = "zeros"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", _KERNEL_INIT, (4, 4, self.dim, self.dim),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        return conv2d_spatial(x.astype(self.dtype), kernel, bias, stride=2,
                              padding=1, padding_mode=self.padding_mode)


class Upsample(nn.Module):
    dim: int
    padding_mode: str = "zeros"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", _KERNEL_INIT, (4, 4, self.dim, self.dim),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        return conv_transpose2d_spatial(x.astype(self.dtype), kernel, bias,
                                        padding_mode=self.padding_mode)


class UNet3D(nn.Module):
    """The denoiser. See module docstring; ctor parity: vddp.py:574-713."""

    dim: int = 64
    out_dim: Optional[int] = None
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    channels: int = 3
    attn_heads: int = 8
    attn_dim_head: int = 32
    init_dim: Optional[int] = None
    init_kernel_size: int = 7
    use_sparse_linear_attn: bool = True
    resnet_groups: int = 8
    cond_attention: str = "none"
    cond_attention_tokens: int = 6
    cond_att_GRU: bool = False
    use_temporal_attention_cond: bool = False
    cond_to_time: str = "add"
    per_frame_cond: bool = False
    padding_mode: str = "zeros"
    compute_dtype: str = "bfloat16"
    # Fuse spatial linear-attention blocks into one Pallas kernel on TPU
    # (ops/pallas/fused_linear_block.py, measured faster than the XLA path):
    # False | True/'all' (every level) | 'level0' (only the full-resolution
    # blocks, which dominate traffic — and the fewest Mosaic shapes to
    # compile, which matters where kernel compiles are slow/flaky) |
    # int N (fuse blocks with dim <= N, e.g. 128 = levels 0+1).
    use_fused_linear_block: bool | str | int = False
    # Same tri-state for the fused temporal-attention Pallas kernel
    # (ops/pallas/fused_temporal_block.py).
    use_fused_temporal_block: bool | str | int = False
    # Use the whole-block BACKWARD kernels under grad (instead of the
    # XLA-reference vjp) wherever a fused block is selected above.
    fused_bwd_kernels: bool = False
    # jax.checkpoint (remat) the ResnetBlocks: recompute conv/GN
    # activations in the backward instead of storing them — trades FLOPs
    # for HBM so larger per-chip batches fit. Math-exact (same primals,
    # same grads).
    remat_blocks: bool = False
    # s-tiled XLA temporal plan: spatial tile size for lax.scan over tiles
    # (None = untiled); applies to levels where the tile divides h*w and is
    # smaller than it. Ignored where the fused kernel is selected.
    temporal_s_tile: int | None = None
    # Backward plan for the fused temporal blocks under grad:
    # 'recompute' (XLA-reference vjp), 'saved' (forward kernel emits the
    # softmax weights; hand-written XLA backward skips the sim/softmax
    # recompute), 'kernel' (whole-block backward Pallas kernel). None =
    # env VMT_TEMPORAL_VJP, then the kernel-module default.
    temporal_vjp: str | None = None

    def _tri_state(self, flag, dim):
        """False | True/'all' (every level) | 'level0' (full-res blocks) |
        int N (blocks with dim <= N, e.g. 128 = levels 0+1 — each distinct
        dim is one more Mosaic kernel shape to compile)."""
        if isinstance(flag, bool):
            return flag
        if isinstance(flag, int):
            return dim <= flag
        if isinstance(flag, str):
            if flag == "all":
                return True
            if flag == "level0":
                return dim == (self.init_dim or self.dim)
        return False

    @property
    def _dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def _cond_attention(self):
        return "self-stacked" if self.per_frame_cond else self.cond_attention

    @property
    def _cond_tokens(self):
        return 11 if self.per_frame_cond else self.cond_attention_tokens

    @property
    def _time_dim(self):
        return self.dim * 4

    @property
    def _cond_dim(self):
        return self._time_dim

    def _temporal_attn(self, dim, name):
        return TemporalAttentionBlock(
            dim=dim, heads=self.attn_heads, dim_head=self.attn_dim_head,
            use_rotary=True, cond_attention=self._cond_attention,
            cond_dim=self._cond_dim, per_frame_cond=self.per_frame_cond,
            dtype=self._dtype,
            use_fused_block=self._tri_state(self.use_fused_temporal_block,
                                            dim),
            s_tile=self.temporal_s_tile,
            use_bwd_kernel=self.fused_bwd_kernels,
            vjp_mode=self.temporal_vjp,
            name=name)

    def _spatial_linear_attn(self, dim, name):
        return SpatialLinearAttentionBlock(
            dim=dim, heads=self.attn_heads, dim_head=32,
            cond_attention=self._cond_attention, cond_dim=self._cond_dim,
            per_frame_cond=self.per_frame_cond, dtype=self._dtype,
            use_fused_block=self._tri_state(self.use_fused_linear_block, dim),
            use_bwd_kernel=self.fused_bwd_kernels,
            name=name)

    @nn.compact
    def __call__(self, x, time, cond=None, null_cond_mask=None,
                 focus_present_mask=None, cfg_tiled_pair=False):
        """x: (b, f, h, w, channels) in [-1, 1]; time: (b,) int/float;
        cond: (b, 11) per-frame stresses (or (b, 51) whole-signal mode);
        null_cond_mask: (b,) bool — True replaces conditioning with the
        learned null embeddings (classifier-free guidance dropout);
        focus_present_mask: (b,) bool or None.

        cfg_tiled_pair: the caller (diffusion.guided_eps) passes the
        UNTILED latent x at batch b while time/cond/null_cond_mask arrive
        CFG-folded at batch 2b ([cond-half; null-half]). The init conv and
        init temporal attention take no conditioning (vddp.py:742-743 pass
        neither cond nor t), so they run once on the unique latent and the
        result is tiled to 2b — the halves first diverge at the cond/time
        embeddings below. Tiling AFTER the init stage (instead of slicing
        a pre-tiled batch) keeps a batch-sharded x busy on every device.

        Returns predicted noise, (b, f, h, w, out_dim), float32 — where b
        is 2x the x batch under cfg_tiled_pair."""
        b, f, h, w, _ = x.shape
        if cfg_tiled_pair:
            if time.shape[0] != 2 * b:
                raise ValueError(
                    "cfg_tiled_pair expects untiled x with time/cond "
                    f"folded to 2x its batch; got x batch {b}, "
                    f"time batch {time.shape[0]}")
            if focus_present_mask is not None:
                raise ValueError(
                    "cfg_tiled_pair assumes sampling (no focus mask)")
            b = 2 * b
        dtype = self._dtype
        cdt = self._cond_attention
        time_dim = self._time_dim
        cond_dim = self._cond_dim
        x = x.astype(dtype)

        pos_bias = RelativePositionBias(
            heads=self.attn_heads, num_buckets=32, max_distance=32,
            name="time_rel_pos_bias")(f)

        init_dim = self.init_dim or self.dim
        ks = self.init_kernel_size
        init_kernel = self.param("init_conv_kernel", _KERNEL_INIT,
                                 (ks, ks, self.channels, init_dim), jnp.float32)
        init_bias = self.param("init_conv_bias", nn.initializers.zeros,
                               (init_dim,), jnp.float32)
        x = conv2d_spatial(x, init_kernel, init_bias,
                           padding_mode=self.padding_mode)

        x = self._temporal_attn(init_dim, "init_temporal_attn")(
            x, pos_bias=pos_bias, focus_present_mask=focus_present_mask)
        if cfg_tiled_pair:
            x = jnp.concatenate([x, x], axis=0)
        r = x

        # time embedding (vddp.py:637-642); exact (erf) GELU like torch
        t_emb = SinusoidalPosEmb(self.dim, name="time_pos_emb")(time)
        t_emb = _dense(time_dim, "time_mlp_1")(t_emb)
        t_emb = nn.gelu(t_emb, approximate=False)
        t_emb = _dense(time_dim, "time_mlp_2")(t_emb)

        # conditioning path (vddp.py:751-770)
        if self.per_frame_cond:
            tokens = _dense(cond_dim, "sign_emb")(
                cond.astype(jnp.float32)[..., None])     # (b, f, cond_dim)
            pooled = tokens.mean(axis=-2)
            hidden = nn.LayerNorm(epsilon=1e-5, name="cond_hidden_norm")(pooled)
            hidden = _dense(cond_dim, "cond_hidden_1")(hidden)
            hidden = nn.silu(hidden)
            hidden = _dense(time_dim, "cond_hidden_2")(hidden)
        else:
            hidden = SignalEmbedding("CNN", init_channel=1,
                                     channel_upsamplings=(16, 32, 64, 128,
                                                          cond_dim),
                                     name="sign_emb_CNN")(cond)
            if cdt != "none" and not self.cond_att_GRU:
                tokens = jnp.broadcast_to(
                    hidden[:, None], (b, self._cond_tokens, cond_dim))
            elif cdt != "none" and self.cond_att_GRU:
                tokens = SignalEmbedding("GRU", init_channel=1,
                                         channel_upsamplings=(16, 32, 64, 128,
                                                              cond_dim),
                                         name="sign_emb_GRU")(cond)
            else:
                tokens = None

        # classifier-free guidance null replacement (vddp.py:772-784)
        if null_cond_mask is None:
            null_cond_mask = jnp.zeros((b,), dtype=bool)
        if cdt != "none":
            # reference hardcodes 11 tokens for per-frame cond (vddp.py:603);
            # here the null token follows the actual frame/token count.
            null_token = self.param("null_text_token",
                                    nn.initializers.normal(stddev=1.0),
                                    (1, tokens.shape[1], cond_dim),
                                    jnp.float32)
            tokens = jnp.where(null_cond_mask[:, None, None],
                               null_token.astype(tokens.dtype), tokens)
        null_hidden = self.param("null_text_hidden",
                                 nn.initializers.normal(stddev=1.0),
                                 (1, time_dim), jnp.float32)
        hidden = jnp.where(null_cond_mask[:, None],
                           null_hidden.astype(hidden.dtype), hidden)

        if self.cond_to_time == "add":
            t = t_emb + hidden
        elif self.cond_to_time == "concat":
            t = jnp.concatenate([t_emb, hidden], axis=-1)
        else:
            raise ValueError(f"unknown cond_to_time: {self.cond_to_time}")

        tokens_temporal = tokens if self.use_temporal_attention_cond else None

        dims = [init_dim, *(self.dim * m for m in self.dim_mults)]
        in_out = list(zip(dims[:-1], dims[1:]))
        num_res = len(in_out)
        time_emb_dim = (time_dim + cond_dim if self.cond_to_time == "concat"
                        else cond_dim)

        Res = nn.remat(ResnetBlock) if self.remat_blocks else ResnetBlock

        hs = []
        for i, (_, dim_out) in enumerate(in_out):
            is_last = i >= num_res - 1
            x = Res(dim_out, time_emb_dim, self.resnet_groups,
                            self.padding_mode, dtype,
                            name=f"down_{i}_block1")(x, t)
            x = Res(dim_out, time_emb_dim, self.resnet_groups,
                            self.padding_mode, dtype,
                            name=f"down_{i}_block2")(x, t)
            if self.use_sparse_linear_attn:
                x = self._spatial_linear_attn(dim_out, f"down_{i}_spatial_attn")(
                    x, label_emb=tokens)
            x = self._temporal_attn(dim_out, f"down_{i}_temporal_attn")(
                x, pos_bias=pos_bias, focus_present_mask=focus_present_mask,
                label_emb=tokens_temporal)
            hs.append(x)
            if not is_last:
                x = Downsample(dim_out, self.padding_mode, dtype,
                               name=f"down_{i}_downsample")(x)

        mid_dim = dims[-1]
        x = Res(mid_dim, time_emb_dim, self.resnet_groups,
                        self.padding_mode, dtype, name="mid_block1")(x, t)
        # NB the reference builds the mid spatial attention WITHOUT passing
        # attn_dim_head, so it always gets the Attention default dim_head=32
        # (vddp.py:687,400-401); mirrored here for checkpoint parity.
        x = SpatialAttentionBlock(
            dim=mid_dim, heads=self.attn_heads, dim_head=32,
            cond_attention=cdt, cond_dim=cond_dim,
            per_frame_cond=self.per_frame_cond, dtype=dtype,
            name="mid_spatial_attn")(x, label_emb=tokens)
        x = self._temporal_attn(mid_dim, "mid_temporal_attn")(
            x, pos_bias=pos_bias, focus_present_mask=focus_present_mask,
            label_emb=tokens_temporal)
        x = Res(mid_dim, time_emb_dim, self.resnet_groups,
                        self.padding_mode, dtype, name="mid_block2")(x, t)

        for i, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = i >= num_res - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = Res(dim_in, time_emb_dim, self.resnet_groups,
                            self.padding_mode, dtype,
                            name=f"up_{i}_block1")(x, t)
            x = Res(dim_in, time_emb_dim, self.resnet_groups,
                            self.padding_mode, dtype,
                            name=f"up_{i}_block2")(x, t)
            if self.use_sparse_linear_attn:
                x = self._spatial_linear_attn(dim_in, f"up_{i}_spatial_attn")(
                    x, label_emb=tokens)
            x = self._temporal_attn(dim_in, f"up_{i}_temporal_attn")(
                x, pos_bias=pos_bias, focus_present_mask=focus_present_mask,
                label_emb=tokens_temporal)
            if not is_last:
                x = Upsample(dim_in, self.padding_mode, dtype,
                             name=f"up_{i}_upsample")(x)

        x = jnp.concatenate([x, r.astype(x.dtype)], axis=-1)
        x = Res(self.dim, None, self.resnet_groups, self.padding_mode,
                        dtype, name="final_block")(x)
        out_dim = self.out_dim or self.channels
        fk = self.param("final_conv_kernel", _KERNEL_INIT,
                        (self.dim, out_dim), jnp.float32)
        fb = self.param("final_conv_bias", nn.initializers.zeros, (out_dim,),
                        jnp.float32)
        return conv1x1(x, fk, fb).astype(jnp.float32)

    @classmethod
    def from_config(cls, cfg) -> "UNet3D":
        """Build from a ModelConfig (mirrors main.py:62-80)."""
        return cls(
            dim=cfg.unet_dim,
            dim_mults=tuple(cfg.dim_mults),
            channels=len(cfg.selected_channels),
            attn_heads=cfg.unet_attn_heads,
            attn_dim_head=cfg.unet_attn_dim_head,
            init_kernel_size=cfg.init_kernel_size,
            use_sparse_linear_attn=cfg.unet_use_sparse_linear_attn,
            resnet_groups=cfg.unet_resnet_groups,
            cond_attention=cfg.unet_cond_attention,
            cond_attention_tokens=cfg.unet_cond_attention_tokens,
            cond_att_GRU=cfg.unet_cond_att_GRU,
            use_temporal_attention_cond=cfg.unet_temporal_att_cond,
            cond_to_time=cfg.unet_cond_to_time,
            per_frame_cond=cfg.per_frame_cond,
            padding_mode=cfg.padding_mode,
            compute_dtype=cfg.compute_dtype,
            use_fused_linear_block=getattr(
                cfg, "use_fused_linear_block", False),
            use_fused_temporal_block=getattr(
                cfg, "use_fused_temporal_block", False),
            temporal_s_tile=getattr(cfg, "temporal_s_tile", None),
            temporal_vjp=getattr(cfg, "temporal_vjp", None),
            fused_bwd_kernels=getattr(cfg, "fused_bwd_kernels", False),
            remat_blocks=getattr(cfg, "remat_blocks", False),
        )
