"""Full-model numerical A/B against the reference PyTorch implementation.

Instantiates the actual reference Unet3D/GaussianDiffusion from
/root/reference (with minimal shims for the two uninstalled helper packages,
tests/ref_shims/), exports its real state dict through the torch importer,
and asserts the JAX rebuild matches:

  - Unet3D.forward, conditional and null branches (vddp.py:730-821),
  - forward_with_guidance_scale (vddp.py:715-728) vs the folded-CFG forward,
  - GaussianDiffusion.p_mean_variance incl. dynamic thresholding
    (vddp.py:935-954) with the torch-exact 'sort' quantile.

This pins the conditioning minutiae (rotary on cond keys, bias slicing,
self-stacked k/v alignment, null-token handling; vddp.py:451-512) to the real
module tree rather than synthetic state dicts (SURVEY.md §7.3 items 1-2).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ref_shims")
_REF = "/root/reference"

# tiny-but-full config: both resolutions, attention at every site,
# per-frame conditioning (which forces 11 frames: vddp.py:603)
DIM = 16
DIM_MULTS = (1, 2)
CHANNELS = 3
HEADS = 2
DIM_HEAD = 8
IMG = 16
FRAMES = 11
TIMESTEPS = 8


@pytest.fixture(scope="module")
def vddp():
    if not os.path.isdir(_REF):
        pytest.skip("reference checkout not available")
    for p in (_SHIMS, _REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    import denoising_diffusion_pytorch.video_denoising_diffusion_pytorch as m
    return m


@pytest.fixture(scope="module")
def pair(vddp):
    """(torch (unet, diffusion), jax (model, diffusion, params))."""
    import jax
    import jax.numpy as jnp

    from videometamaterials_tpu.diffusion import GaussianDiffusion
    from videometamaterials_tpu.models import UNet3D
    from videometamaterials_tpu.training.torch_import import import_state_dict

    torch.manual_seed(0)
    t_unet = vddp.Unet3D(
        dim=DIM, dim_mults=DIM_MULTS, channels=CHANNELS, attn_heads=HEADS,
        attn_dim_head=DIM_HEAD, init_kernel_size=3,
        use_sparse_linear_attn=True, resnet_groups=8,
        use_temporal_attention_cond=True, cond_to_time="add",
        per_frame_cond=True, padding_mode="zeros").eval()
    t_diff = vddp.GaussianDiffusion(
        t_unet, image_size=IMG, num_frames=FRAMES, channels=CHANNELS,
        timesteps=TIMESTEPS, loss_type="l1", use_dynamic_thres=True,
        sampling_timesteps=TIMESTEPS).eval()

    j_unet = UNet3D(
        dim=DIM, dim_mults=DIM_MULTS, channels=CHANNELS, attn_heads=HEADS,
        attn_dim_head=DIM_HEAD, init_kernel_size=3,
        use_sparse_linear_attn=True, resnet_groups=8,
        use_temporal_attention_cond=True, cond_to_time="add",
        per_frame_cond=True, padding_mode="zeros", compute_dtype="float32")
    j_diff = GaussianDiffusion(
        model=j_unet, image_size=IMG, num_frames=FRAMES, channels=CHANNELS,
        timesteps=TIMESTEPS, loss_type="l1", use_dynamic_thres=True,
        dynamic_thres_method="sort", sampling_timesteps=TIMESTEPS)

    rng = jax.random.PRNGKey(0)
    template = j_unet.init(
        rng, jnp.zeros((1, FRAMES, IMG, IMG, CHANNELS)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, FRAMES)))
    # the REAL reference state dict: denoise_fn.-prefixed params + schedule
    # buffers + rotary inv_freq buffers, exactly as checkpoint.pt stores it
    state = {k: v.detach().cpu().numpy()
             for k, v in t_diff.state_dict().items()}
    params = import_state_dict(state, template,
                               num_resolutions=len(DIM_MULTS), strict=True)
    params = jax.tree.map(jnp.asarray, params)
    return (t_unet, t_diff), (j_unet, j_diff, params)


def _inputs(seed=0, batch=2):
    rng = np.random.RandomState(seed)
    x = rng.standard_normal((batch, CHANNELS, FRAMES, IMG, IMG)).astype(
        np.float32)
    t = np.array([3, TIMESTEPS - 1][:batch], dtype=np.int64)
    cond = rng.uniform(-1.0, 1.0, (batch, FRAMES)).astype(np.float32)
    return x, t, cond


def _to_jax_video(x):
    return np.transpose(x, (0, 2, 3, 4, 1))      # (b,c,f,h,w)->(b,f,h,w,c)


def _to_torch_video(x):
    return np.transpose(x, (0, 4, 1, 2, 3))


def test_forward_parity_cond_and_null(pair):
    import jax.numpy as jnp

    (t_unet, _), (j_unet, _, params) = pair
    x, t, cond = _inputs()

    for null in (False, True):
        with torch.no_grad():
            ref = t_unet(torch.from_numpy(x), torch.from_numpy(t),
                         cond=torch.from_numpy(cond),
                         null_cond_prob=1.0 if null else 0.0).numpy()
        got = j_unet.apply(
            params, jnp.asarray(_to_jax_video(x)), jnp.asarray(t),
            jnp.asarray(cond),
            null_cond_mask=jnp.full((x.shape[0],), null, dtype=bool))
        np.testing.assert_allclose(
            _to_jax_video(ref), np.asarray(got), atol=2e-4, rtol=1e-3,
            err_msg=f"forward mismatch (null={null})")


def test_guidance_scale_parity(pair):
    import jax.numpy as jnp

    (t_unet, _), (_, j_diff, params) = pair
    x, t, cond = _inputs(seed=1)

    with torch.no_grad():
        ref = t_unet.forward_with_guidance_scale(
            torch.from_numpy(x), torch.from_numpy(t),
            cond=torch.from_numpy(cond), guidance_scale=5.0).numpy()
    got = j_diff.guided_eps(params, jnp.asarray(_to_jax_video(x)),
                            jnp.asarray(t), jnp.asarray(cond),
                            guidance_scale=5.0)
    np.testing.assert_allclose(_to_jax_video(ref), np.asarray(got),
                               atol=1e-3, rtol=1e-3)


def test_p_mean_variance_parity(pair):
    """One full sampler-step worth of math: guided eps -> x0 -> dynamic
    threshold (torch-exact quantile) -> posterior moments."""
    import jax.numpy as jnp

    (_, t_diff), (_, j_diff, params) = pair
    x, t, cond = _inputs(seed=2)

    with torch.inference_mode():
        r_mean, r_var, r_logvar = t_diff.p_mean_variance(
            torch.from_numpy(x), torch.from_numpy(t), clip_denoised=True,
            cond=torch.from_numpy(cond), guidance_scale=5.0)
    g_mean, g_var, g_logvar = j_diff.p_mean_variance(
        params, jnp.asarray(_to_jax_video(x)), jnp.asarray(t),
        jnp.asarray(cond), guidance_scale=5.0)

    np.testing.assert_allclose(_to_jax_video(r_mean.numpy()),
                               np.asarray(g_mean), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(r_logvar.numpy().reshape(-1),
                               np.asarray(g_logvar).reshape(-1),
                               atol=1e-5, rtol=1e-5)


def test_gru_signal_embedding_parity(vddp):
    """Ablation GRU conditioning encoder: torch nn.GRU weights map exactly
    onto the flax GRUCell stack (vddp.py:547,563-572)."""
    import jax
    import jax.numpy as jnp

    from videometamaterials_tpu.models.embeddings import SignalEmbedding
    from videometamaterials_tpu.training.torch_import import import_state_dict

    hidden = 24
    torch.manual_seed(0)
    t_mod = vddp.SignalEmbedding(
        "GRU", init_channel=1,
        channel_upsamplings=[16, 32, 64, 128, hidden]).eval()

    j_mod = SignalEmbedding("GRU", init_channel=1,
                            channel_upsamplings=(16, 32, 64, 128, hidden))
    x = np.random.RandomState(0).uniform(-1, 1, (2, 51)).astype(np.float32)
    inner = j_mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    template = {"params": {"sign_emb_GRU": inner["params"]}}
    state = {"sign_emb_GRU." + k: v.detach().numpy()
             for k, v in t_mod.state_dict().items()}
    merged = import_state_dict(state, template, num_resolutions=2,
                               strict=True)

    with torch.no_grad():
        want = t_mod(torch.from_numpy(x)).numpy()
    got = j_mod.apply({"params": merged["params"]["sign_emb_GRU"]},
                      jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-4)


def test_ddim_trajectory_parity(pair, monkeypatch):
    """Full multi-step DDIM chain (eta=0 -> deterministic given x_T) against
    the reference ddim_sample (vddp.py:986-1018): timestep pairing,
    predict_start, alpha coefficients and the final-step continue branch."""
    import jax
    import jax.numpy as jnp

    from videometamaterials_tpu.diffusion import GaussianDiffusion
    from videometamaterials_tpu.diffusion.gaussian import unnormalize_img

    (t_unet, _), (j_unet, _, params) = pair
    sampling = 4
    t_diff = type(pair[0][1])(
        t_unet, image_size=IMG, num_frames=FRAMES, channels=CHANNELS,
        timesteps=TIMESTEPS, loss_type="l1", use_dynamic_thres=True,
        sampling_timesteps=sampling).eval()
    j_diff = GaussianDiffusion(
        model=j_unet, image_size=IMG, num_frames=FRAMES, channels=CHANNELS,
        timesteps=TIMESTEPS, loss_type="l1", use_dynamic_thres=True,
        dynamic_thres_method="sort", sampling_timesteps=sampling)
    assert t_diff.is_ddim_sampling and j_diff.is_ddim_sampling

    rng_np = np.random.RandomState(7)
    shape = (2, CHANNELS, FRAMES, IMG, IMG)
    x_t = rng_np.standard_normal(shape).astype(np.float32)
    cond = rng_np.uniform(-1, 1, (2, FRAMES)).astype(np.float32)

    # inject x_T into the reference sampler (it draws it internally)
    fixed = torch.from_numpy(x_t)
    orig_randn = torch.randn

    def fake_randn(*args, **kwargs):
        size = args[0] if isinstance(args[0], (tuple, torch.Size)) else args
        if tuple(size) == shape:
            return fixed.clone().to(**{k: v for k, v in kwargs.items()
                                       if k in ("device", "dtype")})
        return orig_randn(*args, **kwargs)

    monkeypatch.setattr(torch, "randn", fake_randn)
    with torch.inference_mode():
        want = t_diff.ddim_sample(shape, cond=torch.from_numpy(cond),
                                  guidance_scale=5.0).numpy()

    total, steps = TIMESTEPS, sampling
    times = list(reversed(np.linspace(-1, total - 1, num=steps + 1)
                          .astype(np.int64).tolist()))
    pairs_np = np.asarray(list(zip(times[:-1], times[1:])), dtype=np.int32)
    img, _ = j_diff._ddim_scan(
        params, jnp.asarray(_to_jax_video(x_t)), jax.random.PRNGKey(0),
        jnp.asarray(pairs_np), jnp.asarray(cond), 5.0)
    got = unnormalize_img(img)
    # untrained net + CFG w=5 amplifies values to ~1e3 over the chain;
    # agreement is ~1.5e-4 relative (fp32 accumulation over 4 steps)
    np.testing.assert_allclose(_to_jax_video(want), np.asarray(got),
                               atol=0.2, rtol=2e-3)


@pytest.mark.slow
def test_flagship_shape_import_forward_parity(vddp):
    """Paper-config torch import A/B (VERDICT r3 ask #3): the real reference
    Unet3D at FLAGSHIP shape — dim 64, dim_mults (1,2,4,8), 96x96, 11 frames
    (/root/reference/main.py:62-80) — exported through its state dict,
    imported, and forward-compared. A level-indexing or layout bug in the
    importer's name map that only manifests with 4 resolutions
    (vddp.py:574-713) would pass the tiny-config tests and corrupt a real
    pretrained-weights import; this exercises every level of the map."""
    import jax
    import jax.numpy as jnp

    from videometamaterials_tpu.models import UNet3D
    from videometamaterials_tpu.training.torch_import import import_state_dict

    dim, mults, img, frames, channels = 64, (1, 2, 4, 8), 96, 11, 3
    torch.manual_seed(0)
    t_unet = vddp.Unet3D(
        dim=dim, dim_mults=mults, channels=channels, attn_heads=8,
        attn_dim_head=32, use_sparse_linear_attn=True, resnet_groups=8,
        use_temporal_attention_cond=True, cond_to_time="add",
        per_frame_cond=True, padding_mode="zeros").eval()

    j_unet = UNet3D(
        dim=dim, dim_mults=mults, channels=channels, attn_heads=8,
        attn_dim_head=32, use_sparse_linear_attn=True, resnet_groups=8,
        use_temporal_attention_cond=True, cond_to_time="add",
        per_frame_cond=True, padding_mode="zeros", compute_dtype="float32")

    rng = jax.random.PRNGKey(0)
    # shape-only template (no init compute): every leaf must be overwritten
    # by the importer under strict=True anyway
    shapes = jax.eval_shape(
        j_unet.init, rng, jnp.zeros((1, frames, img, img, channels)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, frames)))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    state = {"denoise_fn." + k: v.detach().cpu().numpy()
             for k, v in t_unet.state_dict().items()}
    params = import_state_dict(state, template, num_resolutions=len(mults),
                               strict=True)
    params = jax.tree.map(jnp.asarray, params)

    rng_np = np.random.RandomState(0)
    x = rng_np.standard_normal((2, channels, frames, img, img)).astype(
        np.float32) * 0.5
    t = np.array([3, 200], dtype=np.int64)
    cond = rng_np.uniform(-1.0, 1.0, (2, frames)).astype(np.float32)

    for null in (False, True):
        with torch.no_grad():
            want = t_unet(torch.from_numpy(x), torch.from_numpy(t),
                          cond=torch.from_numpy(cond),
                          null_cond_prob=1.0 if null else 0.0).numpy()
        got = j_unet.apply(
            params, jnp.asarray(_to_jax_video(x)), jnp.asarray(t),
            jnp.asarray(cond),
            null_cond_mask=jnp.full((2,), null, dtype=bool))
        np.testing.assert_allclose(
            _to_jax_video(want), np.asarray(got), atol=3e-4, rtol=1e-3,
            err_msg=f"flagship forward mismatch (null={null})")
