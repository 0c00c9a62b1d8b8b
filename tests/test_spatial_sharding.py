"""Latency-mode spatial (height-axis) sharding of the sampling chain.

SURVEY.md §2.3 covers throughput via batch sharding; this mode divides a
SINGLE video's denoising work across the mesh instead — one
with_sharding_constraint on the scan carry and GSPMD derives the conv halo
exchanges and attention collectives. These tests pin numerical parity with
unsharded sampling on the virtual CPU mesh and the fused-kernel guard.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from videometamaterials_tpu.config import ModelConfig
from videometamaterials_tpu.diffusion import GaussianDiffusion
from videometamaterials_tpu.models import UNet3D
from videometamaterials_tpu.parallel.mesh import (
    frame_video_sharding,
    spatial_video_sharding,
)


def _tiny(**kw):
    base = dict(image_size=16, num_frames=3, unet_dim=8, dim_mults=(1, 2),
                unet_attn_heads=2, unet_attn_dim_head=4, train_timesteps=6,
                sampling_timesteps=6, compute_dtype="float32",
                sample_scan_chunk=None)
    base.update(kw)
    cfg = ModelConfig(**base)
    model = UNet3D.from_config(cfg)
    x = jnp.zeros((1, cfg.num_frames, cfg.image_size, cfg.image_size,
                   cfg.channels), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x,
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, cfg.num_frames)))
    return cfg, model, params


def _space_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("space",))


@pytest.mark.parametrize("chunked", [False, True])
def test_spatially_sharded_sampling_matches_unsharded(chunked):
    cfg, model, params = _tiny(sample_scan_chunk=3 if chunked else None)
    plain = GaussianDiffusion.from_config(model, cfg)
    spatial = dataclasses.replace(
        plain, sample_spatial_sharding=spatial_video_sharding(_space_mesh(4)))

    cond = jax.random.uniform(jax.random.PRNGKey(1), (2, cfg.num_frames))
    rng = jax.random.PRNGKey(2)
    a = np.asarray(plain.sample(params, rng, cond, guidance_scale=5.0))
    b = np.asarray(spatial.sample(params, rng, cond, guidance_scale=5.0))
    # GSPMD may reorder reductions across shards; fp32 tolerance only.
    # Height sharding splits the GroupNorm spatial reductions, and the
    # default one-pass E[x^2]-mu^2 statistics (ops/norms.py) are more
    # sensitive to partial-sum regrouping than two-pass — measured drift
    # ~7e-4 through the 6-step sampling chain, hence the looser bound.
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=2e-3)


def test_frame_sharded_sampling_matches_unsharded():
    """Sequence-parallel variant (SURVEY.md §5.7): FRAME axis sharded —
    halo-free convs, temporal-attention K/V all-gathers over 'seq'."""
    cfg, model, params = _tiny(num_frames=4)
    plain = GaussianDiffusion.from_config(model, cfg)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("seq",))
    seq = dataclasses.replace(
        plain, sample_spatial_sharding=frame_video_sharding(mesh))

    cond = jax.random.uniform(jax.random.PRNGKey(1), (2, cfg.num_frames))
    rng = jax.random.PRNGKey(2)
    a = np.asarray(plain.sample(params, rng, cond, guidance_scale=5.0))
    b = np.asarray(seq.sample(params, rng, cond, guidance_scale=5.0))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-4)


def test_spatial_sharding_rejects_fused_kernels():
    cfg, _, _ = _tiny()
    fused_cfg = dataclasses.replace(cfg, use_fused_temporal_block="all")
    fused_model = UNet3D.from_config(fused_cfg)
    base = GaussianDiffusion.from_config(fused_model, fused_cfg)
    with pytest.raises(ValueError, match="XLA plans"):
        dataclasses.replace(
            base,
            sample_spatial_sharding=spatial_video_sharding(_space_mesh(4)))


@pytest.mark.slow
def test_sharded_sampling_collective_schedule():
    """Pin the GSPMD-inferred collective STRUCTURE of the two sharded
    sampling modes (VERDICT r3 ask #7; full dump: scripts/
    dump_sharding_hlo.py -> docs/collectives_hlo.md):

    - latency mode (height-sharded) must contain collective-permute halo
      exchanges (spatial convs need neighbour edge rows) and all-gathers
      (spatial attention);
    - sequence mode (frame-sharded) must be HALO-FREE (convs fold frames
      into batch; zero collective-permutes) with all-gathers for the
      temporal-attention K/V."""
    import re

    def compiled_text(diff, params, cond):
        fn = jax.jit(lambda p, r, c: diff.sample(
            p, r, c, guidance_scale=5.0, inside_jit=True))
        return fn.lower(params, jax.random.PRNGKey(1), cond).compile(
        ).as_text()

    def counts(text):
        out = {}
        for kind in ("all-gather", "all-reduce", "collective-permute"):
            out[kind] = len(re.findall(
                rf"(?m)^\s*(?:ROOT )?%?{kind}[-.\w]*\s*=", text))
        return out

    cfg, model, params = _tiny(num_frames=4, train_timesteps=2,
                               sampling_timesteps=2)
    plain = GaussianDiffusion.from_config(model, cfg)
    cond = jnp.zeros((1, cfg.num_frames), jnp.float32)

    lat = dataclasses.replace(
        plain, sample_spatial_sharding=spatial_video_sharding(
            _space_mesh(4)))
    c_lat = counts(compiled_text(lat, params, cond))
    assert c_lat["collective-permute"] > 0, c_lat   # conv halo exchanges
    assert c_lat["all-gather"] > 0, c_lat           # spatial attention

    seq_mesh = Mesh(np.asarray(jax.devices()[:4]), ("seq",))
    seq = dataclasses.replace(
        plain, sample_spatial_sharding=frame_video_sharding(seq_mesh))
    c_seq = counts(compiled_text(seq, params, cond))
    assert c_seq["collective-permute"] == 0, c_seq  # halo-free convs
    assert c_seq["all-gather"] > 0, c_seq           # temporal K/V gathers
