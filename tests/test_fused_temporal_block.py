"""Fused temporal-attention block kernel (ops/pallas/fused_temporal_block):
interpret-mode parity with the XLA reference twin and with the module's
temporal_xla path (itself pinned against the real reference torch model in
test_reference_parity), plus the custom-VJP backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videometamaterials_tpu.models.unet3d import TemporalAttentionBlock
from videometamaterials_tpu.ops.pallas.fused_temporal_block import (
    fused_temporal_block,
    reference_temporal_block,
)

B, F, S, C = 2, 5, 256, 8      # S = 2 tiles of 128 -> exercises the grid
HEADS, D = 4, 32               # hidden = 128 (lane-aligned)
HD = HEADS * D


def _rand(shape, seed, scale=1.0):
    return (np.random.default_rng(seed).normal(size=shape) * scale
            ).astype(np.float32)


def _inputs(n_cond, bias=True):
    x = jnp.asarray(_rand((B, F, S, C), 0), jnp.bfloat16)
    gamma = jnp.asarray(_rand((C,), 1, 0.2) + 1.0)
    w_all = jnp.asarray(_rand((F, C, 3 * HD), 2, 0.1), jnp.bfloat16)
    w_out = jnp.asarray(_rand((HD, C), 3, 0.1), jnp.bfloat16)
    if n_cond:
        ek = jnp.asarray(_rand((B, n_cond, HD), 5, 0.5), jnp.bfloat16)
        ev = jnp.asarray(_rand((B, n_cond, HD), 6, 0.5), jnp.bfloat16)
    else:
        ek = ev = None
    bias_all = jnp.asarray(_rand((F, F + n_cond, HEADS), 7, 0.3)) if bias \
        else jnp.zeros((F, F + n_cond, HEADS), jnp.float32)
    return x, gamma, w_all, w_out, ek, ev, bias_all


@pytest.mark.parametrize("n_cond", [0, F])
def test_kernel_matches_xla_reference(n_cond):
    args = _inputs(n_cond)
    got = np.asarray(fused_temporal_block(*args, heads=HEADS, tile=128,
                                          interpret=True), np.float32)
    want = np.asarray(reference_temporal_block(*args, heads=HEADS),
                      np.float32)
    # bf16 inputs: products/projections agree; only summation order differs
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
    assert not np.allclose(got, np.asarray(args[0], np.float32))


@pytest.mark.parametrize("n_cond", [0, F])
def test_merged_softmax_layout_bit_equals_split(n_cond):
    """The full-lane softmax layout performs the SAME floating ops in the
    same per-element order as the split layout (only the lane packing
    differs), so interpret-mode outputs must be bit-identical."""
    args = _inputs(n_cond)
    split = np.asarray(fused_temporal_block(
        *args, heads=HEADS, tile=128, interpret=True,
        softmax_layout="split"), np.float32)
    merged = np.asarray(fused_temporal_block(
        *args, heads=HEADS, tile=128, interpret=True,
        softmax_layout="merged"), np.float32)
    np.testing.assert_array_equal(split, merged)


@pytest.mark.parametrize("n_cond", [0, F])
def test_merged_softmax_grads_match_split(n_cond):
    """Both layouts share the XLA-reference custom VJP; grads must agree."""
    args = _inputs(n_cond)

    def loss(layout):
        def f(x):
            rest = args[1:]
            return jnp.sum(fused_temporal_block(
                x, *rest, heads=HEADS, tile=128, interpret=True,
                softmax_layout=layout).astype(jnp.float32) ** 2)
        return np.asarray(jax.grad(f)(args[0]), np.float32)

    np.testing.assert_array_equal(loss("split"), loss("merged"))


def test_single_tile_matches_multi_tile():
    args = _inputs(F)
    a = np.asarray(fused_temporal_block(*args, heads=HEADS, tile=256,
                                        interpret=True), np.float32)
    b = np.asarray(fused_temporal_block(*args, heads=HEADS, tile=128,
                                        interpret=True), np.float32)
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_backward_matches_reference():
    args = _inputs(F)
    x, gamma, w_all, w_out, ek, ev, bias_all = args

    def loss_fused(x_, w_all_):
        out = fused_temporal_block(x_, gamma, w_all_, w_out, ek, ev,
                                   bias_all, heads=HEADS, tile=128,
                                   interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(x_, w_all_):
        out = reference_temporal_block(x_, gamma, w_all_, w_out, ek, ev,
                                       bias_all, heads=HEADS)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w_all)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w_all)
    np.testing.assert_allclose(np.asarray(gx_f, np.float32),
                               np.asarray(gx_r, np.float32),
                               rtol=1e-1, atol=1e-1)
    np.testing.assert_allclose(np.asarray(gw_f, np.float32),
                               np.asarray(gw_r, np.float32),
                               rtol=1e-1, atol=1e-1)


@pytest.mark.parametrize("cond", ["self-stacked", "none"])
def test_module_fused_path_matches_temporal_xla(cond, monkeypatch):
    """TemporalAttentionBlock(use_fused_block=True) must agree with the
    (torch-parity-pinned) temporal_xla plan on the SAME parameters,
    including rotary folding, conditioning K/V and the relative position
    bias slicing."""
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, F, 16, 16, C), jnp.bfloat16) * 0.5
    label = jax.random.normal(rng, (B, F, 32), jnp.float32) * 0.5
    pos_bias = jax.random.normal(rng, (HEADS, F, F), jnp.float32) * 0.3
    kw = dict(dim=C, heads=HEADS, dim_head=D, use_rotary=True,
              cond_attention=cond, cond_dim=32, per_frame_cond=True,
              dtype=jnp.bfloat16)
    block_x = TemporalAttentionBlock(**kw, use_fused_block=False)
    block_f = TemporalAttentionBlock(**kw, use_fused_block=True)
    params = block_x.init(rng, x, pos_bias=pos_bias,
                          label_emb=label if cond != "none" else None)
    want = block_x.apply(params, x, pos_bias=pos_bias,
                         label_emb=label if cond != "none" else None)
    got = block_f.apply(params, x, pos_bias=pos_bias,
                        label_emb=label if cond != "none" else None)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("cond", ["self-stacked", "none"])
def test_module_stiled_path_matches_temporal_xla(cond):
    """The s-tiled XLA plan (scan over spatial tiles) must agree with
    temporal_xla on the same parameters — tiling is a scheduling change,
    not a math change."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, F, 16, 16, C), jnp.bfloat16) * 0.5
    label = jax.random.normal(rng, (B, F, 32), jnp.float32) * 0.5
    pos_bias = jax.random.normal(rng, (HEADS, F, F), jnp.float32) * 0.3
    kw = dict(dim=C, heads=HEADS, dim_head=D, use_rotary=True,
              cond_attention=cond, cond_dim=32, per_frame_cond=True,
              dtype=jnp.bfloat16)
    block_x = TemporalAttentionBlock(**kw)
    block_s = TemporalAttentionBlock(**kw, s_tile=64)   # 256 = 4 tiles
    params = block_x.init(rng, x, pos_bias=pos_bias,
                          label_emb=label if cond != "none" else None)
    want = block_x.apply(params, x, pos_bias=pos_bias,
                         label_emb=label if cond != "none" else None)
    got = block_s.apply(params, x, pos_bias=pos_bias,
                        label_emb=label if cond != "none" else None)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_focus_present_falls_back_to_xla(monkeypatch):
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, F, 8, 8, C), jnp.bfloat16)
    kw = dict(dim=C, heads=HEADS, dim_head=D, use_rotary=True,
              cond_attention="none", cond_dim=32, per_frame_cond=True,
              dtype=jnp.bfloat16)
    block_f = TemporalAttentionBlock(**kw, use_fused_block=True)
    params = block_f.init(rng, x)
    mask = jnp.array([True, False])
    out = block_f.apply(params, x, focus_present_mask=mask)
    want = TemporalAttentionBlock(**kw, use_fused_block=False).apply(
        params, x, focus_present_mask=mask)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want, np.float32))


def test_module_stiled_gradients_match_temporal_xla():
    """The s-tiled plan is pure XLA and differentiable for free — gradient
    parity with the untiled plan is the precondition for running it in the
    TRAIN step (scripts/train_probe.py --s-tile). fp32 for tolerance."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, F, 16, 16, C)) * 0.5
    label = jax.random.normal(rng, (B, F, 32)) * 0.5
    pos_bias = jax.random.normal(rng, (HEADS, F, F)) * 0.3
    kw = dict(dim=C, heads=HEADS, dim_head=D, use_rotary=True,
              cond_attention="self-stacked", cond_dim=32,
              per_frame_cond=True, dtype=jnp.float32)
    block_x = TemporalAttentionBlock(**kw)
    block_s = TemporalAttentionBlock(**kw, s_tile=64)   # 256 = 4 tiles
    params = block_x.init(rng, x, pos_bias=pos_bias, label_emb=label)

    def loss(blk, p, xx):
        out = blk.apply(p, xx, pos_bias=pos_bias, label_emb=label)
        return jnp.sum(out ** 2)

    lx, gx = jax.value_and_grad(lambda p: loss(block_x, p, x))(params)
    ls, gs = jax.value_and_grad(lambda p: loss(block_s, p, x))(params)
    np.testing.assert_allclose(float(lx), float(ls), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        gx, gs)
    dxa = jax.grad(lambda xx: loss(block_x, params, xx))(x)
    dxb = jax.grad(lambda xx: loss(block_s, params, xx))(x)
    np.testing.assert_allclose(np.asarray(dxa), np.asarray(dxb),
                               rtol=2e-4, atol=2e-5)


def test_backward_bias_grad_matches_reference():
    """Regression: bias_all carries the TRAINABLE relative position bias;
    its cotangent was once dropped (None), silently freezing rel_pos_bias
    under fused_blocks_in_training."""
    x, gamma, w_all, w_out, ek, ev, bias_all = _inputs(F)

    def loss(fn, b_):
        return jnp.sum(fn(b_).astype(jnp.float32) ** 2)

    gb_f = jax.grad(lambda b_: loss(
        lambda bb: fused_temporal_block(x, gamma, w_all, w_out, ek, ev, bb,
                                        heads=HEADS, tile=128,
                                        interpret=True), b_))(bias_all)
    gb_r = jax.grad(lambda b_: loss(
        lambda bb: reference_temporal_block(x, gamma, w_all, w_out, ek, ev,
                                            bb, heads=HEADS), b_))(bias_all)
    assert float(jnp.max(jnp.abs(gb_f))) > 0.0
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_r),
                               rtol=1e-1, atol=1e-1)


@pytest.mark.parametrize("n_cond", [0, F])
def test_backward_kernel_matches_xla_vjp(n_cond, monkeypatch):
    """VMT_TEMPORAL_BWD_KERNEL=1 swaps the custom-VJP backward from the
    XLA-reference vjp to the whole-block backward Pallas kernel; every
    cotangent (x, gamma, w_all, w_out, ek, ev, bias_all) must agree."""
    x, gamma, w_all, w_out, ek, ev, bias_all = _inputs(n_cond)

    def grads(with_kernel):
        if with_kernel:
            monkeypatch.setenv("VMT_TEMPORAL_BWD_KERNEL", "1")
        else:
            monkeypatch.delenv("VMT_TEMPORAL_BWD_KERNEL", raising=False)
        if n_cond:
            def loss(x_, gamma_, w_all_, w_out_, ek_, ev_, b_):
                out = fused_temporal_block(x_, gamma_, w_all_, w_out_,
                                           ek_, ev_, b_, heads=HEADS,
                                           tile=128, interpret=True)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=tuple(range(7)))(
                x, gamma, w_all, w_out, ek, ev, bias_all)
        def loss(x_, gamma_, w_all_, w_out_, b_):
            out = fused_temporal_block(x_, gamma_, w_all_, w_out_,
                                       None, None, b_, heads=HEADS,
                                       tile=128, interpret=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=tuple(range(5)))(
            x, gamma, w_all, w_out, bias_all)

    ref = grads(False)
    got = grads(True)
    names = (("x", "gamma", "w_all", "w_out", "ek", "ev", "bias_all")
             if n_cond else ("x", "gamma", "w_all", "w_out", "bias_all"))
    for name, a, b_ in zip(names, got, ref):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        scale = max(np.abs(b32).max(), 1e-3)
        np.testing.assert_allclose(a32 / scale, b32 / scale,
                                   rtol=0, atol=5e-2, err_msg=name)
        assert np.abs(a32).max() > 0, name


@pytest.mark.parametrize("n_cond", [0, F])
def test_savedp_vjp_matches_xla_vjp(n_cond):
    """vjp_mode='saved' emits the softmax weights from the forward kernel
    and backs them through the hand-written XLA backward — no sim/softmax
    recompute. Forward must be BIT-equal to the merged-layout kernel;
    every cotangent must agree with the XLA-reference vjp to bf16 scale
    (the jacobian consumes the bf16-rounded p)."""
    x, gamma, w_all, w_out, ek, ev, bias_all = _inputs(n_cond)
    args = (x, gamma, w_all, w_out, ek, ev, bias_all)

    f_merged = np.asarray(fused_temporal_block(
        *args, heads=HEADS, tile=128, interpret=True,
        softmax_layout="merged"), np.float32)
    f_saved = np.asarray(fused_temporal_block(
        *args, heads=HEADS, tile=128, interpret=True,
        vjp_mode="saved"), np.float32)
    np.testing.assert_array_equal(f_merged, f_saved)

    argnums = tuple(range(7)) if n_cond else (0, 1, 2, 3, 6)

    def grads(mode):
        def loss(x_, gamma_, w_all_, w_out_, ek_, ev_, b_):
            out = fused_temporal_block(x_, gamma_, w_all_, w_out_, ek_, ev_,
                                       b_, heads=HEADS, tile=128,
                                       interpret=True, vjp_mode=mode)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=argnums)(*args)

    ref = grads("recompute")
    got = grads("saved")
    names = [("x", "gamma", "w_all", "w_out", "ek", "ev", "bias_all")[i]
             for i in argnums]
    for name, a, b_ in zip(names, got, ref):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b_, np.float32)
        scale = max(np.abs(b32).max(), 1e-3)
        np.testing.assert_allclose(a32 / scale, b32 / scale,
                                   rtol=0, atol=5e-2, err_msg=name)
        assert np.abs(a32).max() > 0, name


@pytest.mark.parametrize("bwd_plan", ["kernel", "saved"])
def test_module_fused_grads_match_unfused(bwd_plan, monkeypatch):
    """Module-level: grads (params, x, pos_bias) through the fused block —
    with the backward kernel / the saved-p backward on — match the
    temporal_xla plan. Covers the bias_all construction (.at[].set of
    pos_bias) and rotary-fold paths."""
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    if bwd_plan == "kernel":
        monkeypatch.setenv("VMT_TEMPORAL_BWD_KERNEL", "1")
    else:
        monkeypatch.setenv("VMT_TEMPORAL_VJP", "saved")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, F, 16, 16, C), jnp.bfloat16) * 0.5
    label = jax.random.normal(rng, (B, F, 32), jnp.float32) * 0.5
    pos_bias = jax.random.normal(rng, (HEADS, F, F), jnp.float32) * 0.3
    kw = dict(dim=C, heads=HEADS, dim_head=D, use_rotary=True,
              cond_attention="self-stacked", cond_dim=32,
              per_frame_cond=True, dtype=jnp.bfloat16)
    block_x = TemporalAttentionBlock(**kw, use_fused_block=False)
    block_f = TemporalAttentionBlock(**kw, use_fused_block=True)
    params = block_x.init(rng, x, pos_bias=pos_bias, label_emb=label)

    def loss(blk, p, xx, pb):
        out = blk.apply(p, xx, pos_bias=pb, label_emb=label)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gp_x, gx_x, gb_x = jax.grad(
        lambda p, xx, pb: loss(block_x, p, xx, pb),
        argnums=(0, 1, 2))(params, x, pos_bias)
    gp_f, gx_f, gb_f = jax.grad(
        lambda p, xx, pb: loss(block_f, p, xx, pb),
        argnums=(0, 1, 2))(params, x, pos_bias)

    def close(a, b, name):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b32).max(), 1e-3)
        np.testing.assert_allclose(a32 / scale, b32 / scale,
                                   rtol=0, atol=5e-2, err_msg=name)

    jax.tree_util.tree_map(lambda a, b: close(a, b, "params"), gp_f, gp_x)
    close(gx_f, gx_x, "x")
    close(gb_f, gb_x, "pos_bias")
    assert float(jnp.max(jnp.abs(gb_f))) > 0
