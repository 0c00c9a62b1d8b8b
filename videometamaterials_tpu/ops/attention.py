"""Softmax attention core with conditioning-token stacking.

Functional core of the reference's shared Attention class (vddp.py:396-535),
used for both temporal attention (x as (b, hw, f, c)) and mid-block spatial
attention (x as (b, f, hw, c)). The conditioning minutiae preserved here
(SURVEY.md §7.3 item 1):

  - 'self-stacked' mode concatenates projected conditioning tokens to K and V
    *in front of* the video tokens (vddp.py:473-474);
  - relative position bias is added only to the video-token block of the
    similarity matrix sim[..., -n:], and — per-frame conditioning in temporal
    attention — also to the conditioning block sim[..., :n] (vddp.py:502-512);
  - rotary embedding applies to Q and K, and to conditioning keys only when
    per-frame conditioning rides temporal attention (vddp.py:448-449, 470-471,
    495-496);
  - focus_present masking reduces temporal attention to self-attention for
    masked batch entries (vddp.py:514-524).

Matmuls run on the MXU in the input dtype (bf16 in production) accumulating
to float32; softmax runs in float32.
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def stacked_softmax_attention(
    q: jnp.ndarray,           # (b, s, h, n, d)   s = folded "batch-like" axis
    k: jnp.ndarray,           # (b, s, h, m, d)   m = n_cond + n (or n if no cond)
    v: jnp.ndarray,           # (b, s, h, m, d)
    *,
    scale: float,
    num_video_tokens: int,
    pos_bias: jnp.ndarray | None = None,        # (h, n, n)
    pos_bias_on_cond: bool = False,
    focus_present_mask: jnp.ndarray | None = None,  # (b,) bool
    impl: str = "auto",
) -> jnp.ndarray:
    """Returns (b, s, h, n, d). Inputs already projected/rotated/stacked.

    impl: 'dot' lowers the score/value contractions to batched matmuls —
    right when n is large (mid-block spatial attention, n=144). 'vpu' uses
    broadcast-multiply-reduce — right for the temporal axis where each
    matmul is a tiny (11x32)@(32x22): the MXU pads those tiles to 128 and
    runs at <1% utilization, while the VPU form keeps the huge folded s axis
    (up to 9216) as the vectorized dimension. 'auto' picks by token count."""
    n = num_video_tokens
    m = k.shape[-2]
    if impl == "auto":
        impl = "vpu" if max(n, m) <= 64 else "dot"
    q = q * scale
    if impl == "vpu":
        sim = jnp.sum(
            (q[..., :, None, :] * k[..., None, :, :]).astype(jnp.float32),
            axis=-1)
    else:
        sim = jnp.einsum("bshid,bshjd->bshij", q, k,
                         preferred_element_type=jnp.float32)

    if pos_bias is not None:
        m = sim.shape[-1]
        bias = pos_bias.astype(jnp.float32)[None, None]  # (1,1,h,n,n)
        # bias applies to the trailing (video-token) block of K; expressed as a
        # zero-pad so XLA fuses the add instead of scattering.
        full = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (0, 0), (m - n, 0)))
        if pos_bias_on_cond and m != n:
            full = full + jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (0, 0), (0, m - n)))
        sim = sim + full

    if focus_present_mask is not None:
        # per-sample: attend only to self (identity over the video tokens).
        # Only defined when no conditioning tokens are stacked (m == n),
        # mirroring the reference's reachable configurations (vddp.py:514-524).
        assert sim.shape[-1] == n, "focus_present masking requires unstacked K"
        eye = jnp.eye(n, dtype=bool)
        allow = jnp.where(focus_present_mask[:, None, None, None, None],
                          eye[None, None, None], True)
        sim = jnp.where(allow, sim, NEG_INF)

    sim = sim - jnp.max(sim, axis=-1, keepdims=True)
    attn = jnp.exp(sim)
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    if impl == "vpu":
        out = jnp.sum(attn[..., :, :, None]
                      * v[..., None, :, :].astype(jnp.float32), axis=-2)
    else:
        out = jnp.einsum("bshij,bshjd->bshid", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def linear_attention(
    q: jnp.ndarray,  # (B, h, d, N)  — reference layout b h c n (vddp.py:337)
    k: jnp.ndarray,  # (B, h, d, M)  M = n_cond + N
    v: jnp.ndarray,  # (B, h, e, M)
    *,
    scale: float,
    spatial_size: int,
) -> jnp.ndarray:
    """Efficiency (linear) attention over pixels per frame (vddp.py:313-378).

    q softmaxes over its feature axis, k over its token axis; v is scaled by
    1/(H*W) (vddp.py:367-371). Two MXU contractions replace the O(N^2) score
    matrix. Returns (B, h, e, N)."""
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    q32 = jnp.exp(q32 - jnp.max(q32, axis=-2, keepdims=True))
    q32 = q32 / jnp.sum(q32, axis=-2, keepdims=True)
    k32 = jnp.exp(k32 - jnp.max(k32, axis=-1, keepdims=True))
    k32 = k32 / jnp.sum(k32, axis=-1, keepdims=True)
    q32 = q32 * scale
    v32 = v.astype(jnp.float32) / spatial_size
    context = jnp.einsum("bhdn,bhen->bhde", k32, v32,
                         preferred_element_type=jnp.float32)
    out = jnp.einsum("bhde,bhdn->bhen", context, q32,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def linear_attention_tokens_first(
    q: jnp.ndarray,  # (B, N, h, d) — natural projection layout, no transpose
    k: jnp.ndarray,  # (B, M, h, d)
    v: jnp.ndarray,  # (B, M, h, d)
    *,
    scale: float,
    spatial_size: int,
) -> jnp.ndarray:
    """Same math as linear_attention but in tokens-first layout: avoids the
    (B, hw, h*d) -> (B, h, d, hw) head-split transpose that costs a full HBM
    pass per operand. The long token axis is the contraction axis (MXU K),
    softmaxes are fused reduces over the existing layout. Returns
    (B, N, h, d)."""
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    # q: softmax over features d; k: softmax over tokens M (vddp.py:367-368)
    q32 = jnp.exp(q32 - jnp.max(q32, axis=-1, keepdims=True))
    q32 = q32 / jnp.sum(q32, axis=-1, keepdims=True)
    k32 = jnp.exp(k32 - jnp.max(k32, axis=1, keepdims=True))
    k32 = k32 / jnp.sum(k32, axis=1, keepdims=True)
    q32 = q32 * scale
    v32 = v.astype(jnp.float32) / spatial_size
    context = jnp.einsum("bnhd,bnhe->bhde", k32, v32,
                         preferred_element_type=jnp.float32)
    out = jnp.einsum("bhde,bnhd->bnhe", context, q32,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)
