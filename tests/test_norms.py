"""GroupNorm / channel LayerNorm parity vs torch on video tensors."""

import jax.numpy as jnp
import numpy as np
import torch

from videometamaterials_tpu.ops.norms import channel_layer_norm, group_norm


def test_group_norm_matches_torch():
    rng = np.random.default_rng(0)
    b, f, h, w, c = 2, 3, 4, 4, 16
    x = rng.normal(size=(b, f, h, w, c)).astype(np.float32)
    scale = rng.normal(size=(c,)).astype(np.float32)
    bias = rng.normal(size=(c,)).astype(np.float32)

    got = np.asarray(group_norm(x, scale, bias, num_groups=4))

    gn = torch.nn.GroupNorm(4, c, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.tensor(scale))
        gn.bias.copy_(torch.tensor(bias))
    xt = torch.tensor(x).permute(0, 4, 1, 2, 3)  # (b, c, f, h, w)
    want = gn(xt).permute(0, 2, 3, 4, 1).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_channel_layer_norm_matches_reference_semantics():
    """Scale-only LN over channels with biased variance (vddp.py:245-254)."""
    rng = np.random.default_rng(1)
    b, f, h, w, c = 2, 3, 5, 5, 8
    x = rng.normal(size=(b, f, h, w, c)).astype(np.float32)
    gamma = rng.normal(size=(c,)).astype(np.float32)

    got = np.asarray(channel_layer_norm(x, gamma))

    xt = torch.tensor(x).permute(0, 4, 1, 2, 3)
    var = torch.var(xt, dim=1, unbiased=False, keepdim=True)
    mean = torch.mean(xt, dim=1, keepdim=True)
    g = torch.tensor(gamma).view(1, c, 1, 1, 1)
    want = ((xt - mean) / (var + 1e-5).sqrt() * g).permute(
        0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_one_pass_stats_matches_two_pass():
    """E[x^2]-mean^2 one-pass statistics (VMT_ONEPASS_NORMS) agree with the
    default centered two-pass form to fp32 roundoff on both norms, including
    a shifted distribution (the cancellation-prone case) and bf16 inputs."""
    import videometamaterials_tpu.ops.norms as norms

    rng = np.random.default_rng(7)
    b, f, h, w, c = 2, 3, 8, 8, 16
    x = (rng.normal(size=(b, f, h, w, c)) * 0.5 + 3.0).astype(np.float32)
    gamma = rng.normal(size=(c,)).astype(np.float32)
    scale = rng.normal(size=(c,)).astype(np.float32)
    bias = rng.normal(size=(c,)).astype(np.float32)

    orig = norms.ONE_PASS_STATS
    try:
        norms.ONE_PASS_STATS = False
        ln2 = np.asarray(norms.channel_layer_norm(x, gamma))
        gn2 = np.asarray(norms.group_norm(x, scale, bias, 4))
        ln2_bf = np.asarray(norms.channel_layer_norm(
            jnp.asarray(x, jnp.bfloat16), gamma), np.float32)
        norms.ONE_PASS_STATS = True
        ln1 = np.asarray(norms.channel_layer_norm(x, gamma))
        gn1 = np.asarray(norms.group_norm(x, scale, bias, 4))
        ln1_bf = np.asarray(norms.channel_layer_norm(
            jnp.asarray(x, jnp.bfloat16), gamma), np.float32)
    finally:
        norms.ONE_PASS_STATS = orig

    np.testing.assert_allclose(ln1, ln2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gn1, gn2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ln1_bf, ln2_bf, rtol=1e-2, atol=1e-2)
