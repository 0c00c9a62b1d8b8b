"""bf16 inference-weight copies (utils.cast_params_for_inference).

Every cast leaf is consumed by the forward via `.astype(compute_dtype)`, so
under bf16 compute sampling from the cast tree must be BIT-identical to
sampling from the fp32 masters — the cast only halves per-step weight HBM
reads. These tests pin that bit-identity end-to-end (DDPM and DDIM), the
allowlist split (norm/time/cond leaves stay fp32), and the fp32-model
identity gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videometamaterials_tpu.config import ModelConfig
from videometamaterials_tpu.diffusion import GaussianDiffusion
from videometamaterials_tpu.models import UNet3D
from videometamaterials_tpu.utils import cast_params_for_inference


def _tiny_cfg(**kw):
    base = dict(image_size=16, num_frames=3, unet_dim=8, dim_mults=(1, 2),
                unet_attn_heads=2, unet_attn_dim_head=4, train_timesteps=4,
                sampling_timesteps=4, compute_dtype="bfloat16")
    base.update(kw)
    return ModelConfig(**base)


def _init(cfg):
    model = UNet3D.from_config(cfg)
    x = jnp.zeros((1, cfg.num_frames, cfg.image_size, cfg.image_size,
                   cfg.channels), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x,
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, cfg.num_frames)))
    return model, params


def test_allowlist_split():
    cfg = _tiny_cfg()
    _, params = _init(cfg)
    cast = cast_params_for_inference(params)
    flat = jax.tree_util.tree_flatten_with_path(cast)[0]
    casted, kept = [], []
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        (casted if leaf.dtype == jnp.bfloat16 else kept).append(name)
    # the heavy matmul/conv leaves are cast ...
    assert any("conv_kernel" in n for n in casted)
    assert any("spatial_attn/attn/to_qkv/kernel" in n for n in casted)
    assert any("downsample" in n for n in casted)
    # the temporal to_qkv_kernel is rotary-folded in fp32 first — NOT cast
    assert any("to_qkv_kernel" in n for n in kept)
    assert all("to_qkv_kernel" not in n for n in casted)
    # ... fp32-math leaves are not
    for frag in ("gn_scale", "gn_bias", "norm_gamma", "time_mlp",
                 "relative_attention_bias", "null_text", "sign_emb"):
        assert all(frag not in n for n in casted), frag
        assert any(frag in n for n in kept), frag
    # cast leaves dominate the parameter bytes (that's the point); at this
    # tiny dim the fp32 time-MLPs are proportionally large — flagship dim 64
    # measures >0.97
    nbytes_cast = sum(l.size for p, l in flat if l.dtype == jnp.bfloat16)
    nbytes_total = sum(l.size for p, l in flat)
    assert nbytes_cast / nbytes_total > 0.75


def test_forward_bit_identical_under_bf16():
    cfg = _tiny_cfg()
    model, params = _init(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (2, cfg.num_frames, cfg.image_size, cfg.image_size,
                           cfg.channels))
    t = jnp.array([1, 3], jnp.int32)
    c = jax.random.uniform(jax.random.PRNGKey(2), (2, cfg.num_frames))
    mask = jnp.zeros((2,), bool)
    a = model.apply(params, x, t, c, null_cond_mask=mask)
    b = model.apply(cast_params_for_inference(params), x, t, c,
                    null_cond_mask=mask)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("sampler", ["ddpm", "ddim"])
def test_sample_bit_identical(sampler):
    cfg = _tiny_cfg(sampling_timesteps=4 if sampler == "ddpm" else 2)
    model, params = _init(cfg)
    cond = jax.random.uniform(jax.random.PRNGKey(3), (2, cfg.num_frames))
    on = GaussianDiffusion.from_config(model, cfg)
    off = GaussianDiffusion.from_config(
        model, cfg.replace(bf16_inference_weights=False))
    assert on.bf16_inference_weights and not off.bf16_inference_weights
    assert (sampler == "ddim") == on.is_ddim_sampling
    rng = jax.random.PRNGKey(4)
    va = on.sample(params, rng, cond, guidance_scale=5.0)
    vb = off.sample(params, rng, cond, guidance_scale=5.0)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_sample_bit_identical_with_fused_kernels(monkeypatch):
    """Production composition: fused Pallas blocks (interpret mode) + bf16
    weight copies. The kernels consume the same pre-cast leaves via
    .astype(compute_dtype), so bit-identity must survive the kernel path."""
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    cfg = _tiny_cfg(unet_attn_heads=4, unet_attn_dim_head=32,  # hidden=128
                    use_fused_temporal_block="all",
                    use_fused_linear_block="all",
                    train_timesteps=3, sampling_timesteps=3)
    model, params = _init(cfg)
    cond = jax.random.uniform(jax.random.PRNGKey(3), (2, cfg.num_frames))
    on = GaussianDiffusion.from_config(model, cfg)
    off = GaussianDiffusion.from_config(
        model, cfg.replace(bf16_inference_weights=False))
    rng = jax.random.PRNGKey(4)
    va = on.sample(params, rng, cond, guidance_scale=5.0)
    vb = off.sample(params, rng, cond, guidance_scale=5.0)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_fp32_model_is_identity():
    cfg = _tiny_cfg(compute_dtype="float32")
    model, params = _init(cfg)
    diff = GaussianDiffusion.from_config(model, cfg)
    out = diff._inference_params(params)
    assert out is params  # gate, not a cast
