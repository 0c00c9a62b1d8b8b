"""GaussianDiffusion process math: q_sample statistics, thresholding
methods, DDPM step behavior, chunked-sampler equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videometamaterials_tpu.diffusion import GaussianDiffusion
from videometamaterials_tpu.diffusion.gaussian import (
    normalize_img,
    unnormalize_img,
)


class _IdentityModel:
    """Stand-in denoiser: predicts zeros (so x_recon == scaled x_t)."""

    def apply(self, params, x, t, cond, null_cond_mask=None,
              focus_present_mask=None, cfg_tiled_pair=False):
        return jnp.zeros_like(x)


def _diff(**kw):
    defaults = dict(model=_IdentityModel(), image_size=8, num_frames=2,
                    channels=1, timesteps=16, use_dynamic_thres=True)
    defaults.update(kw)
    return GaussianDiffusion(**defaults)


def test_normalize_roundtrip():
    x = jnp.linspace(0, 1, 11)
    np.testing.assert_allclose(unnormalize_img(normalize_img(x)), x,
                               rtol=1e-6)


def test_q_sample_endpoints():
    d = _diff()
    x0 = jnp.ones((2, 2, 8, 8, 1))
    noise = jnp.full_like(x0, 2.0)
    # t=0: mostly signal
    out0 = d.q_sample(x0, jnp.zeros((2,), jnp.int32), noise)
    np.testing.assert_allclose(np.asarray(out0),
                               np.asarray(x0) * float(d.schedule.sqrt_alphas_cumprod[0])
                               + 2.0 * float(d.schedule.sqrt_one_minus_alphas_cumprod[0]),
                               rtol=1e-5)
    # late t: mostly noise
    outT = d.q_sample(x0, jnp.full((2,), 15, jnp.int32), noise)
    assert abs(np.asarray(outT).mean() - 2.0) < 1.0


def test_bisect_threshold_matches_sort():
    rng = np.random.default_rng(0)
    # large per-sample population: the count-quantile and the interpolated
    # sort-quantile coincide to ~1/n
    x = jnp.asarray(rng.normal(scale=3.0, size=(2, 2, 64, 64, 1)),
                    jnp.float32)
    d_sort = _diff(dynamic_thres_method="sort")
    d_bis = _diff(dynamic_thres_method="bisect")
    a = np.asarray(d_sort._maybe_threshold(x))
    b = np.asarray(d_bis._maybe_threshold(x))
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=5e-3)
    assert np.abs(a).max() <= 1.0 + 1e-6


def test_static_threshold_clips():
    d = _diff(use_dynamic_thres=False)
    x = jnp.asarray([[-3.0, 0.5, 3.0]])
    np.testing.assert_allclose(np.asarray(d._maybe_threshold(x)),
                               [[-1.0, 0.5, 1.0]])


def test_chunked_sampler_matches_single_scan():
    d1 = _diff(timesteps=8)
    d2 = _diff(timesteps=8, scan_chunk_size=3)   # 3+3+2: remainder chunk
    rng = jax.random.PRNGKey(0)
    cond = jnp.zeros((2, 2))
    out1 = np.asarray(d1.sample(None, rng, cond, guidance_scale=1.0))
    out2 = np.asarray(d2.sample(None, rng, cond, guidance_scale=1.0))
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-5)


def test_ddpm_final_step_adds_no_noise():
    d = _diff(timesteps=4, use_dynamic_thres=False)
    rng = jax.random.PRNGKey(1)
    x = jnp.ones((1, 2, 8, 8, 1)) * 0.3
    t0 = jnp.zeros((1,), jnp.int32)
    a = d.p_sample(None, jax.random.PRNGKey(2), x, t0, None, 1.0)
    b = d.p_sample(None, jax.random.PRNGKey(3), x, t0, None, 1.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_loss_shape_guard():
    d = _diff()
    with pytest.raises(AssertionError):
        d.loss(None, jax.random.PRNGKey(0),
               jnp.zeros((1, 3, 8, 8, 1)), jnp.zeros((1, 2)))


def test_chunked_ddim_matches_single_scan():
    d1 = _diff(timesteps=8, sampling_timesteps=4)
    d2 = _diff(timesteps=8, sampling_timesteps=4, scan_chunk_size=3)
    assert d1.is_ddim_sampling
    rng = jax.random.PRNGKey(0)
    cond = jnp.zeros((2, 2))
    out1 = np.asarray(d1.sample(None, rng, cond, guidance_scale=1.0))
    out2 = np.asarray(d2.sample(None, rng, cond, guidance_scale=1.0))
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-5)


def test_interpolate_latent_mix():
    d = _diff(timesteps=6, use_dynamic_thres=False)
    rng = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, 2, 8, 8, 1))
    x2 = jnp.ones((1, 2, 8, 8, 1))
    out = d.interpolate(None, rng, x1, x2, t=4, lam=0.5)
    assert out.shape == x1.shape
    assert np.isfinite(np.asarray(out)).all()


class _CondNullModel:
    """Denoiser whose conditional and null predictions differ: cond branch
    returns a structured field, null branch returns a damped one, so CFG
    extrapolation (w>1) inflates the output std measurably."""

    def apply(self, params, x, t, cond, null_cond_mask=None,
              focus_present_mask=None, cfg_tiled_pair=False):
        if cfg_tiled_pair:
            # mirror UNet3D's shared-init contract: x arrives un-doubled
            # and the model tiles it to match the 2b cond/mask batch
            x = jnp.concatenate([x, x], axis=0)
        base = (jnp.sin(jnp.arange(x.size, dtype=jnp.float32)) + 1.5
                ).reshape(x.shape)  # offset: no zeros (ratio test divides)
        scale = jnp.where(null_cond_mask, 0.25, 1.0)
        return base * scale.reshape((-1,) + (1,) * (x.ndim - 1))


def test_cfg_rescale_off_is_identity_and_on_restores_cond_std():
    kw = dict(model=_CondNullModel(), image_size=8, num_frames=2,
              channels=1, timesteps=16)
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 2, 8, 8, 1))
    t = jnp.zeros((2,), jnp.int32)
    cond = jnp.zeros((2, 2))

    base = GaussianDiffusion(**kw).guided_eps(None, x, t, cond, 5.0)
    off = GaussianDiffusion(**kw, cfg_rescale=0.0).guided_eps(
        None, x, t, cond, 5.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(off))

    # phi=1: per-sample std equals the conditional prediction's exactly
    full = GaussianDiffusion(**kw, cfg_rescale=1.0).guided_eps(
        None, x, t, cond, 5.0)
    eps_cond = GaussianDiffusion(**kw).guided_eps(None, x, t, cond, 1.0)
    np.testing.assert_allclose(
        np.asarray(full).std(axis=(1, 2, 3, 4)),
        np.asarray(eps_cond).std(axis=(1, 2, 3, 4)), rtol=1e-5)
    # and the direction is preserved (pure per-sample scaling of eps_cfg)
    ratio = np.asarray(full) / np.asarray(base)
    np.testing.assert_allclose(
        ratio, np.broadcast_to(ratio.mean(axis=(1, 2, 3, 4), keepdims=True),
                               ratio.shape), rtol=1e-4)

    # phi=0.5 blends: std strictly between eps_cfg's and eps_cond's
    half = GaussianDiffusion(**kw, cfg_rescale=0.5).guided_eps(
        None, x, t, cond, 5.0)
    s_half = np.asarray(half).std(axis=(1, 2, 3, 4))
    s_base = np.asarray(base).std(axis=(1, 2, 3, 4))
    s_cond = np.asarray(eps_cond).std(axis=(1, 2, 3, 4))
    assert ((s_half > np.minimum(s_base, s_cond))
            & (s_half < np.maximum(s_base, s_cond))).all()


def test_sampler_cfg_rescale_through_jitted_scan():
    """cfg_rescale must survive the full jitted scan sampler (not just the
    directly-called guided_eps): phi=0 is bit-identical to the default, a
    nonzero phi changes the output and stays finite."""
    kw = dict(model=_CondNullModel(), image_size=8, num_frames=2,
              channels=1, timesteps=6)
    rng = jax.random.PRNGKey(0)
    cond = jnp.zeros((2, 2))
    base = GaussianDiffusion(**kw).sample(
        None, rng, cond, guidance_scale=5.0)
    off = GaussianDiffusion(**kw, cfg_rescale=0.0).sample(
        None, rng, cond, guidance_scale=5.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(off))
    on = GaussianDiffusion(**kw, cfg_rescale=0.7).sample(
        None, rng, cond, guidance_scale=5.0)
    assert np.isfinite(np.asarray(on)).all()
    assert not np.array_equal(np.asarray(on), np.asarray(base))


def test_traced_guidance_matches_static():
    """guidance_scale / cfg_rescale passed as jax scalars (traced operands,
    so sweep arms share one compiled program) must reproduce the
    Python-float (compiled-in) path."""
    kw = dict(model=_CondNullModel(), image_size=8, num_frames=2,
              channels=1, timesteps=6)
    rng = jax.random.PRNGKey(0)
    cond = jnp.zeros((2, 2))

    # w traced, phi 0: the traced program computes the rescale branch with
    # phi=0, which is an exact identity
    static = GaussianDiffusion(**kw).sample(None, rng, cond,
                                            guidance_scale=5.0)
    traced = GaussianDiffusion(**kw).sample(
        None, rng, cond, guidance_scale=jnp.float32(5.0),
        cfg_rescale=jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(static), np.asarray(traced))

    # nonzero phi: traced operand vs config-static value (weak-typed float
    # math differs only in the (1 - phi) rounding)
    static_phi = GaussianDiffusion(**kw, cfg_rescale=0.7).sample(
        None, rng, cond, guidance_scale=5.0)
    traced_phi = GaussianDiffusion(**kw).sample(
        None, rng, cond, guidance_scale=jnp.float32(5.0),
        cfg_rescale=jnp.float32(0.7))
    np.testing.assert_allclose(np.asarray(static_phi),
                               np.asarray(traced_phi), rtol=2e-5, atol=2e-6)


def test_traced_guidance_shares_one_chunk_program():
    """In the chunked sampler, different traced (w, phi) values must reuse
    the SAME jitted chunk entries (the whole point: no recompile per arm)."""
    d = GaussianDiffusion(model=_CondNullModel(), image_size=8, num_frames=2,
                          channels=1, timesteps=6, scan_chunk_size=4)
    rng = jax.random.PRNGKey(1)
    cond = jnp.zeros((2, 2))
    a = d.sample(None, rng, cond, guidance_scale=jnp.float32(2.0),
                 cfg_rescale=jnp.float32(0.0))
    keys_after_first = set(d._jit_cache)
    b = d.sample(None, rng, cond, guidance_scale=jnp.float32(7.0),
                 cfg_rescale=jnp.float32(0.5))
    assert set(d._jit_cache) == keys_after_first
    assert all("traced" in k for k in keys_after_first)
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    # and the chunked traced path equals the single-scan traced path
    d1 = GaussianDiffusion(model=_CondNullModel(), image_size=8,
                           num_frames=2, channels=1, timesteps=6)
    ref = d1.sample(None, rng, cond, guidance_scale=jnp.float32(2.0),
                    cfg_rescale=jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_traced_guidance_under_outer_jit():
    """The Trainer's non-chunked sample fn jits sample() with (w, phi) as
    arguments; outputs must match the compiled-in-float program."""
    kw = dict(model=_CondNullModel(), image_size=8, num_frames=2,
              channels=1, timesteps=6)
    d = GaussianDiffusion(**kw)
    rng = jax.random.PRNGKey(2)
    cond = jnp.zeros((2, 2))
    jitted = jax.jit(lambda r, c, w, phi: d.sample(
        None, r, c, guidance_scale=w, inside_jit=True, cfg_rescale=phi))
    out = jitted(rng, cond, jnp.float32(5.0), jnp.float32(0.0))
    ref = jax.jit(lambda r, c: d.sample(
        None, r, c, guidance_scale=5.0, inside_jit=True))(rng, cond)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_reduce_csv_to_first_n_rows(tmp_path):
    from videometamaterials_tpu.postproc.metrics import (
        reduce_csv_to_first_n_rows,
    )
    p = tmp_path / "t.csv"
    p.write_text("a\nb\nc\nd\n")
    reduce_csv_to_first_n_rows(str(p), 2)
    assert p.read_text() == "a\nb\n"


def test_guided_eps_shared_init_matches_plain():
    """cfg_shared_init runs the cond-independent init stage once per CFG
    pair inside the UNet; guided_eps output must be bit-identical."""
    from videometamaterials_tpu.models import UNet3D
    model = UNet3D(dim=8, dim_mults=(1, 2), channels=3, attn_heads=2,
                   attn_dim_head=4, per_frame_cond=True,
                   use_temporal_attention_cond=True, compute_dtype="float32")
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (2, 3, 8, 8, 3))
    t = jnp.full((2,), 4, jnp.int32)
    cond = jax.random.normal(rng, (2, 3))
    params = model.init(rng, x, t, cond)
    kw = dict(model=model, image_size=8, num_frames=3, channels=3,
              timesteps=16)
    on = GaussianDiffusion(**kw, cfg_shared_init=True).guided_eps(
        params, x, t, cond, 5.0)
    off = GaussianDiffusion(**kw, cfg_shared_init=False).guided_eps(
        params, x, t, cond, 5.0)
    np.testing.assert_array_equal(np.asarray(on), np.asarray(off))
