"""Schedule parity tests against independently-coded reference formulas
(Nichol & Dhariwal cosine schedule; DDPM posterior identities)."""

import numpy as np
import torch

from videometamaterials_tpu.ops.schedules import (
    cosine_beta_schedule,
    extract,
    make_schedule,
)


def _torch_cosine_betas(timesteps, s=0.008):
    # reference formula re-derived in torch float64 (vddp.py:829-839)
    steps = timesteps + 1
    x = torch.linspace(0, timesteps, steps, dtype=torch.float64)
    ac = torch.cos(((x / timesteps) + s) / (1 + s) * torch.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return torch.clip(betas, 0, 0.9999).numpy()


def test_cosine_betas_match_torch_float64():
    for T in (16, 256, 1000):
        mine = cosine_beta_schedule(T)
        ref = _torch_cosine_betas(T)
        np.testing.assert_allclose(mine, ref, rtol=1e-12, atol=1e-15)


def test_schedule_tables_identities():
    s = make_schedule(256)
    ac = np.asarray(s.alphas_cumprod, np.float64)
    np.testing.assert_allclose(np.asarray(s.sqrt_alphas_cumprod),
                               np.sqrt(ac), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s.sqrt_one_minus_alphas_cumprod),
                               np.sqrt(1 - ac), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod_prev)[1:], ac[:-1],
                               rtol=1e-5)
    assert np.asarray(s.alphas_cumprod_prev)[0] == 1.0
    # posterior mean coefficients sum to 1 at x_start == x_t == x
    c1 = np.asarray(s.posterior_mean_coef1, np.float64)
    c2 = np.asarray(s.posterior_mean_coef2, np.float64)
    betas = np.asarray(s.betas, np.float64)
    acp = np.asarray(s.alphas_cumprod_prev, np.float64)
    np.testing.assert_allclose(
        c1, betas * np.sqrt(acp) / (1 - ac), rtol=1e-3)
    np.testing.assert_allclose(
        c2, (1 - acp) * np.sqrt(1 - betas) / (1 - ac), rtol=1e-3)
    # variance positive and log-clipped
    assert (np.asarray(s.posterior_variance)[1:] > 0).all()
    assert np.isfinite(np.asarray(s.posterior_log_variance_clipped)).all()


def test_extract_gathers_and_reshapes():
    import jax.numpy as jnp
    table = jnp.arange(10.0)
    t = jnp.array([0, 3, 9])
    out = extract(table, t, ndim=5)
    assert out.shape == (3, 1, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [0, 3, 9])
