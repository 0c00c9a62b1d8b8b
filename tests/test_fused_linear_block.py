"""Fused spatial linear-attention block kernel: parity with the XLA
reference and with the module's unfused path (itself torch-parity tested)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videometamaterials_tpu.models.unet3d import SpatialLinearAttentionBlock
from videometamaterials_tpu.ops.pallas.fused_linear_block import (
    fused_linear_block,
    reference_linear_block,
)

B2, N, C = 6, 16, 8            # folded (b*f), tokens, channels
HEADS, D = 4, 32               # hidden = 128 (lane-aligned)
HD = HEADS * D


def _rand(shape, seed, scale=1.0):
    return (np.random.default_rng(seed).normal(size=shape) * scale
            ).astype(np.float32)


def _inputs(n_cond):
    x = jnp.asarray(_rand((B2, N, C), 0))
    gamma = jnp.asarray(_rand((C,), 1, 0.2) + 1.0)
    w_qkv = jnp.asarray(_rand((C, 3 * HD), 2, 0.1))
    w_out = jnp.asarray(_rand((HD, C), 3, 0.1))
    out_bias = jnp.asarray(_rand((C,), 4, 0.1))
    if n_cond:
        ek = jnp.asarray(_rand((B2, n_cond, HD), 5, 0.5))
        ev = jnp.asarray(_rand((B2, n_cond, HD), 6, 0.5))
    else:
        ek = ev = None
    return x, gamma, w_qkv, w_out, out_bias, ek, ev


@pytest.mark.parametrize("layout", ["head", "merged"])
@pytest.mark.parametrize("n_cond", [0, 1, 6])
def test_kernel_matches_xla_reference(n_cond, layout):
    args = _inputs(n_cond)
    got = np.asarray(fused_linear_block(
        *args, heads=HEADS, scale=D ** -0.5, spatial_size=N, interpret=True,
        layout=layout))
    want = np.asarray(reference_linear_block(
        *args, heads=HEADS, scale=D ** -0.5, spatial_size=N))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_merged_layout_is_differentiable():
    """grad flows through the merged-layout forward (the custom-VJP backward
    is layout-independent: the XLA-reference vjp)."""
    args = _inputs(2)

    def loss(x, gamma, w_qkv, w_out, out_bias, ek, ev, layout):
        return jnp.sum(fused_linear_block(
            x, gamma, w_qkv, w_out, out_bias, ek, ev, heads=HEADS,
            scale=D ** -0.5, spatial_size=N, interpret=True,
            layout=layout) ** 2)

    g_m = jax.grad(loss, argnums=(0, 2))(*args, "merged")
    g_h = jax.grad(loss, argnums=(0, 2))(*args, "head")
    for a, b in zip(jax.tree.leaves(g_m), jax.tree.leaves(g_h)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("per_frame", [True, False])
def test_module_fused_path_matches_unfused(per_frame, monkeypatch):
    """End-to-end: SpatialLinearAttentionBlock fused kernel (interpret) ==
    the XLA path, per-frame and broadcast conditioning alignments."""
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    b, f, h, w = 2, 3, 4, 4
    kw = dict(dim=C, heads=HEADS, dim_head=D, cond_attention="self-stacked",
              cond_dim=12, per_frame_cond=per_frame, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, f, h, w, C))
    t_tok = f if per_frame else 5
    label = jax.random.normal(rng, (b, t_tok, 12))

    block_x = SpatialLinearAttentionBlock(**kw, use_fused_block=False)
    params = block_x.init(rng, x, label_emb=label)
    want = block_x.apply(params, x, label_emb=label)

    block_f = SpatialLinearAttentionBlock(**kw, use_fused_block=True)
    # bypass the TPU-platform gate for the interpret-mode test
    object.__setattr__(block_f, "_fused_ok", lambda: True)
    got = block_f.apply(params, x, label_emb=label)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)


def test_module_fused_init_matches_unfused_param_tree():
    """Initializing THROUGH the fused path creates the identical param tree
    (checkpoint compatibility both directions)."""
    b, f, h, w = 2, 3, 4, 4
    kw = dict(dim=C, heads=HEADS, dim_head=D, cond_attention="self-stacked",
              cond_dim=12, per_frame_cond=True, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (b, f, h, w, C))
    label = jax.random.normal(rng, (b, f, 12))

    p_unfused = SpatialLinearAttentionBlock(**kw, use_fused_block=False) \
        .init(rng, x, label_emb=label)
    block_f = SpatialLinearAttentionBlock(**kw, use_fused_block=True)
    object.__setattr__(block_f, "_fused_ok", lambda: True)
    import os
    os.environ["VMT_PALLAS_INTERPRET"] = "1"
    try:
        p_fused = block_f.init(rng, x, label_emb=label)
    finally:
        os.environ.pop("VMT_PALLAS_INTERPRET", None)

    paths_u = set(jax.tree_util.tree_flatten_with_path(p_unfused)[0][i][0]
                  for i in range(len(jax.tree_util.tree_leaves(p_unfused))))
    paths_f = set(jax.tree_util.tree_flatten_with_path(p_fused)[0][i][0]
                  for i in range(len(jax.tree_util.tree_leaves(p_fused))))
    assert paths_u == paths_f


def test_unet_from_config_fused_flag_matches_off(monkeypatch):
    """End-to-end config plumbing: UNet3D.from_config with
    use_fused_linear_block='level0' (kernel in interpret mode, platform gate
    bypassed) produces the same output as the flag-off model on the same
    params — guards the tri-state resolution and the block wiring."""
    import videometamaterials_tpu.models.unet3d as u
    from videometamaterials_tpu.config import ModelConfig
    from videometamaterials_tpu.models import UNet3D

    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(u.SpatialLinearAttentionBlock, "_fused_ok",
                        lambda self: self.use_fused_block)

    kw = dict(image_size=16, num_frames=3, unet_dim=8, dim_mults=(1, 2),
              unet_attn_heads=4, unet_attn_dim_head=32,  # hidden=128 gate
              compute_dtype="float32")
    m_off = UNet3D.from_config(ModelConfig(**kw))
    m_on = UNet3D.from_config(ModelConfig(**kw,
                                          use_fused_linear_block="level0"))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    cond = jax.random.normal(rng, (2, 3))
    params = m_off.init(rng, x, t, cond)
    want = m_off.apply(params, x, t, cond)
    got = m_on.apply(params, x, t, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


def test_kernel_is_differentiable():
    x, gamma, w_qkv, w_out, out_bias, ek, ev = _inputs(1)

    def loss_fused(x, w):
        return jnp.sum(jnp.square(fused_linear_block(
            x, gamma, w, w_out, out_bias, ek, ev, heads=HEADS,
            scale=D ** -0.5, spatial_size=N, interpret=True)))

    def loss_ref(x, w):
        return jnp.sum(jnp.square(reference_linear_block(
            x, gamma, w, w_out, out_bias, ek, ev, heads=HEADS,
            scale=D ** -0.5, spatial_size=N)))

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w_qkv)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w_qkv)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("layout", ["head", "merged"])
@pytest.mark.parametrize("n_cond", [0, 6])
def test_backward_kernel_matches_xla_vjp(n_cond, layout, monkeypatch):
    """VMT_LINEAR_BWD_KERNEL=1 swaps the custom-VJP backward from the XLA
    vjp to the whole-block backward kernel (per layout); all cotangents
    must agree."""
    x, gamma, w_qkv, w_out, out_bias, ek, ev = _inputs(n_cond)

    def grads(with_kernel):
        if with_kernel:
            monkeypatch.setenv("VMT_LINEAR_BWD_KERNEL", "1")
        else:
            monkeypatch.delenv("VMT_LINEAR_BWD_KERNEL", raising=False)
        if n_cond:
            def loss(*args):
                out = fused_linear_block(*args, heads=HEADS, scale=D ** -0.5,
                                         spatial_size=N, interpret=True,
                                         layout=layout)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=tuple(range(7)))(
                x, gamma, w_qkv, w_out, out_bias, ek, ev)
        def loss(x_, gamma_, wq_, wo_, ob_):
            out = fused_linear_block(x_, gamma_, wq_, wo_, ob_, None, None,
                                     heads=HEADS, scale=D ** -0.5,
                                     spatial_size=N, interpret=True,
                                     layout=layout)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=tuple(range(5)))(
            x, gamma, w_qkv, w_out, out_bias)

    ref = grads(False)
    got = grads(True)
    names = (("x", "gamma", "w_qkv", "w_out", "out_bias", "ek", "ev")
             if n_cond else ("x", "gamma", "w_qkv", "w_out", "out_bias"))
    for name, a, b in zip(names, got, ref):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b32).max(), 1e-3)
        np.testing.assert_allclose(a32 / scale, b32 / scale,
                                   rtol=0, atol=5e-2, err_msg=name)
        assert np.abs(a32).max() > 0, name


def test_unet_from_config_bwd_kernels_plumbed(monkeypatch):
    """Config plumbing of fused_bwd_kernels: with the flag on, a UNet3D
    grad actually INVOKES both backward kernels, and the grads track the
    matched fused model's XLA-vjp grads. (Numerical authority for the
    backward kernels lives in the per-block cotangent oracle tests — at
    UNet depth, bf16-in-kernel vs fp32-reference rounding amplifies on
    tiny bias leaves, so the tree comparison here is deliberately loose.)"""
    import sys

    import videometamaterials_tpu.models.unet3d as u
    import videometamaterials_tpu.ops.pallas.fused_temporal_block  # noqa: F401
    from videometamaterials_tpu.config import ModelConfig
    from videometamaterials_tpu.models import UNet3D

    # the package __init__ re-exports functions under the submodule names,
    # so attribute-style `import ... as` would grab the function
    fl = sys.modules["videometamaterials_tpu.ops.pallas.fused_linear_block"]
    ft = sys.modules["videometamaterials_tpu.ops.pallas.fused_temporal_block"]

    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    monkeypatch.setattr(u.SpatialLinearAttentionBlock, "_fused_ok",
                        lambda self: self.use_fused_block)
    calls = {"lin": 0, "tmp": 0}
    orig_lin, orig_tmp = fl._run_bwd_kernel, ft._run_bwd_kernel
    orig_lin_m = fl._run_bwd_kernel_merged

    def count_lin(*a, **k):
        calls["lin"] += 1
        return orig_lin(*a, **k)

    def count_lin_m(*a, **k):
        # merged layout (the default) routes to its own bwd kernel
        calls["lin"] += 1
        return orig_lin_m(*a, **k)

    def count_tmp(*a, **k):
        calls["tmp"] += 1
        return orig_tmp(*a, **k)

    monkeypatch.setattr(fl, "_run_bwd_kernel", count_lin)
    monkeypatch.setattr(fl, "_run_bwd_kernel_merged", count_lin_m)
    monkeypatch.setattr(ft, "_run_bwd_kernel", count_tmp)

    kw = dict(image_size=16, num_frames=3, unet_dim=8, dim_mults=(1, 2),
              unet_attn_heads=4, unet_attn_dim_head=32,
              compute_dtype="float32",
              use_fused_linear_block="all", use_fused_temporal_block="all")
    m_f = UNet3D.from_config(ModelConfig(**kw))
    m_fb = UNet3D.from_config(ModelConfig(**kw, fused_bwd_kernels=True))
    assert m_fb.fused_bwd_kernels
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    cond = jax.random.normal(rng, (2, 3))
    params = m_f.init(rng, x, t, cond)

    def loss(m, p):
        return jnp.sum(m.apply(p, x, t, cond) ** 2)

    g_f = jax.grad(lambda p: loss(m_f, p))(params)
    assert calls == {"lin": 0, "tmp": 0}  # flag off -> XLA vjp
    g_fb = jax.grad(lambda p: loss(m_fb, p))(params)
    assert calls["lin"] > 0 and calls["tmp"] > 0

    def close(a, b):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b32).max(), 1e-3)
        np.testing.assert_allclose(a32 / scale, b32 / scale,
                                   rtol=0, atol=0.35)

    jax.tree_util.tree_map(close, g_fb, g_f)


def test_merged_layout_finite_under_extreme_scales():
    """Numerical-stability regression: the merged layout must stay finite
    (and, for the q softmax, exact) where its first form NaN'd.

    (a) one head's q logits sitting ~200 above the others' used to zero
    the other heads' segment sums via the shared all-lane row max
    (s_h=0 -> inf -> NaN); the per-head max shift matches the reference.
    (b) a feature whose k logits all sit below exp's underflow used to
    give z=0 -> 1/z=inf; the symmetric k clamp keeps z positive (the
    output deviates from the exact softmax only in that saturated regime,
    so (b) asserts finiteness, not parity)."""
    args = list(_inputs(0))
    w_qkv = np.asarray(args[2]).copy()
    w_qkv[:, 0:D] *= 1000.0                      # head-0 q logits ~O(300)
    args[2] = jnp.asarray(w_qkv)
    got = np.asarray(fused_linear_block(
        *args, heads=HEADS, scale=D ** -0.5, spatial_size=N, interpret=True,
        layout="merged"))
    assert np.isfinite(got).all()
    want = np.asarray(reference_linear_block(
        *args, heads=HEADS, scale=D ** -0.5, spatial_size=N))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    args = list(_inputs(0))
    x = np.asarray(args[0]).copy()
    x[:, :, 0] = 10.0                            # y[:, 0] large positive
    w_qkv = np.asarray(args[2]).copy()
    w_qkv[:, HD:2 * HD] = 0.0
    w_qkv[0, HD] = -80.0                         # k[:, 0] ~ -200 everywhere
    args[0], args[2] = jnp.asarray(x), jnp.asarray(w_qkv)
    got = np.asarray(fused_linear_block(
        *args, heads=HEADS, scale=D ** -0.5, spatial_size=N, interpret=True,
        layout="merged"))
    assert np.isfinite(got).all()
