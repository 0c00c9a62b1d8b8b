"""Fused temporal-attention block kernel: parity with the XLA reference and
with the module's unfused path (which is itself torch-parity tested)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videometamaterials_tpu.models.unet3d import (
    Attention,
    TemporalAttentionBlock,
)
from videometamaterials_tpu.ops.pallas.fused_block import (
    fused_temporal_block,
    reference_temporal_block,
    rotate_half_matrix,
)

B, F, S, C = 2, 5, 16, 8
HEADS, D = 4, 32           # hidden = 128 (lane-aligned), rot_dim == D
HD = HEADS * D


def _rand(shape, seed, scale=1.0):
    return (np.random.default_rng(seed).normal(size=shape) * scale
            ).astype(np.float32)


def _inputs(with_cond):
    x = jnp.asarray(_rand((B, F, S, C), 0))
    gamma = jnp.asarray(_rand((C,), 1, 0.2) + 1.0)
    w_qkv = jnp.asarray(_rand((C, 3 * HD), 2, 0.1))
    w_out = jnp.asarray(_rand((HD, C), 3, 0.1))
    m = 2 * F if with_cond else F
    bias = jnp.asarray(_rand((HEADS, F, m), 4, 0.3))
    rot = min(32, D)
    from videometamaterials_tpu.ops.rotary import rotary_frequencies
    freqs = jnp.asarray(rotary_frequencies(F, rot))
    if with_cond:
        ek = jnp.asarray(_rand((B, F, HD), 5, 0.5))
        ev = jnp.asarray(_rand((B, F, HD), 6, 0.5))
    else:
        ek = ev = None
    return x, gamma, w_qkv, w_out, ek, ev, bias, freqs


@pytest.mark.parametrize("with_cond", [False, True])
def test_kernel_matches_xla_reference(with_cond):
    x, gamma, w_qkv, w_out, ek, ev, bias, freqs = _inputs(with_cond)
    got = np.asarray(fused_temporal_block(
        x, gamma, w_qkv, w_out, ek, ev, bias, freqs, heads=HEADS,
        scale=D ** -0.5, interpret=True))
    want = np.asarray(reference_temporal_block(
        x, gamma, w_qkv, w_out, ek, ev, bias, freqs, heads=HEADS,
        scale=D ** -0.5))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_rotate_half_matrix_matches_interleaved():
    from videometamaterials_tpu.ops.rotary import _rotate_half_interleaved
    r = rotate_half_matrix(8, 8)
    t = _rand((3, 5, 8), 9)
    want = np.asarray(_rotate_half_interleaved(jnp.asarray(t)))
    np.testing.assert_allclose(t @ r, want, rtol=1e-6)
    # partial rotation: tail columns stay zero
    r2 = rotate_half_matrix(8, 4)
    assert (r2[4:, :] == 0).all() and (r2[:, 4:] == 0).all()


def test_module_fused_path_matches_unfused():
    """End-to-end: TemporalAttentionBlock fused kernel (interpret) ==
    the XLA path, including the half-split weight permutation trick and
    per-frame conditioned keys."""
    os.environ["VMT_PALLAS_INTERPRET"] = "1"
    try:
        kw = dict(dim=C, heads=HEADS, dim_head=D, use_rotary=True,
                  cond_attention="self-stacked", cond_dim=12,
                  per_frame_cond=True, dtype=jnp.float32)
        block_x = TemporalAttentionBlock(**kw, use_fused_block=False)
        rng = jax.random.PRNGKey(0)
        h = w = 4
        x = jax.random.normal(rng, (B, F, h, w, C))
        pos_bias = jax.random.normal(rng, (HEADS, F, F))
        label = jax.random.normal(rng, (B, F, 12))
        params = block_x.init(rng, x, pos_bias=pos_bias, label_emb=label)
        want = block_x.apply(params, x, pos_bias=pos_bias, label_emb=label)

        block_f = TemporalAttentionBlock(**kw, use_fused_block=True)

        # bypass the TPU-platform gate for the interpret-mode test
        object.__setattr__(block_f, "_fused_ok",
                           lambda focus_present_mask: True)
        got = block_f.apply(params, x, pos_bias=pos_bias, label_emb=label)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-4, atol=5e-4)
    finally:
        os.environ.pop("VMT_PALLAS_INTERPRET", None)


def test_kernel_is_differentiable():
    x, gamma, w_qkv, w_out, ek, ev, bias, freqs = _inputs(True)
    w_qkv_p = w_qkv

    def loss_fused(x, w):
        return jnp.sum(jnp.square(fused_temporal_block(
            x, gamma, w, w_out, ek, ev, bias, freqs, heads=HEADS,
            scale=D ** -0.5, interpret=True)))

    def loss_ref(x, w):
        return jnp.sum(jnp.square(reference_temporal_block(
            x, gamma, w, w_out, ek, ev, bias, freqs, heads=HEADS,
            scale=D ** -0.5)))

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w_qkv_p)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w_qkv_p)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               rtol=1e-3, atol=1e-3)
