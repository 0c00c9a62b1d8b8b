"""Attention-core parity vs literal torch implementations of the reference
equations (vddp.py:396-535 full attention, vddp.py:313-378 linear attention)."""

import numpy as np
import torch

from videometamaterials_tpu.ops.attention import (
    linear_attention,
    stacked_softmax_attention,
)


def _rand(shape, seed):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def _torch_softmax_attention(q, k, v, scale, pos_bias=None,
                             pos_bias_on_cond=False, n=None):
    q = torch.tensor(q) * scale
    k, v = torch.tensor(k), torch.tensor(v)
    sim = torch.einsum("bshid,bshjd->bshij", q, k)
    if pos_bias is not None:
        pb = torch.tensor(pos_bias)
        sim[..., -n:] = sim[..., -n:] + pb
        if pos_bias_on_cond and sim.shape[-1] != n:
            sim[..., :n] = sim[..., :n] + pb
    sim = sim - sim.amax(dim=-1, keepdim=True)
    attn = sim.softmax(dim=-1)
    return torch.einsum("bshij,bshjd->bshid", attn, v).numpy()


def test_stacked_attention_no_cond_matches_torch():
    b, s, h, n, d = 2, 3, 2, 5, 4
    q, k, v = (_rand((b, s, h, n, d), i) for i in range(3))
    got = np.asarray(stacked_softmax_attention(
        q, k, v, scale=d ** -0.5, num_video_tokens=n))
    want = _torch_softmax_attention(q, k, v, d ** -0.5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_stacked_attention_bias_slicing_matches_reference():
    """Cond tokens stacked in front of K: bias lands on the video block, and
    (per-frame) on the cond block too (vddp.py:502-512)."""
    b, s, h, n, d = 1, 2, 2, 5, 4
    q = _rand((b, s, h, n, d), 0)
    k = _rand((b, s, h, 2 * n, d), 1)   # n cond + n video tokens
    v = _rand((b, s, h, 2 * n, d), 2)
    bias = _rand((h, n, n), 3)

    got = np.asarray(stacked_softmax_attention(
        q, k, v, scale=d ** -0.5, num_video_tokens=n, pos_bias=bias,
        pos_bias_on_cond=False))
    want = _torch_softmax_attention(q, k, v, d ** -0.5, pos_bias=bias, n=n)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    got2 = np.asarray(stacked_softmax_attention(
        q, k, v, scale=d ** -0.5, num_video_tokens=n, pos_bias=bias,
        pos_bias_on_cond=True))
    want2 = _torch_softmax_attention(q, k, v, d ** -0.5, pos_bias=bias,
                                     pos_bias_on_cond=True, n=n)
    np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-5)
    assert not np.allclose(got, got2)


def test_focus_present_masks_to_identity_attention():
    b, s, h, n, d = 2, 2, 1, 4, 3
    q, k, v = (_rand((b, s, h, n, d), i + 10) for i in range(3))
    mask = np.array([True, False])
    got = np.asarray(stacked_softmax_attention(
        q, k, v, scale=1.0, num_video_tokens=n,
        focus_present_mask=mask))
    # masked sample: each token attends only to itself -> output == v
    np.testing.assert_allclose(got[0], v[0], rtol=1e-5, atol=1e-6)
    # unmasked sample: plain attention
    want = _torch_softmax_attention(q[1:], k[1:], v[1:], 1.0)
    np.testing.assert_allclose(got[1:], want, rtol=1e-4, atol=1e-5)


def test_linear_attention_matches_torch_reference():
    """q softmax over features, k over tokens, v / (h*w) (vddp.py:367-375)."""
    B, h, d, n = 3, 2, 4, 10
    hw = 25
    q = _rand((B, h, d, n), 0)
    k = _rand((B, h, d, n + 1), 1)
    v = _rand((B, h, d, n + 1), 2)
    scale = d ** -0.5

    got = np.asarray(linear_attention(q, k, v, scale=scale, spatial_size=hw))

    qt = torch.tensor(q).softmax(dim=-2) * scale
    kt = torch.tensor(k).softmax(dim=-1)
    vt = torch.tensor(v) / hw
    context = torch.einsum("bhdn,bhen->bhde", kt, vt)
    want = torch.einsum("bhde,bhdn->bhen", context, qt).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_linear_attention_layouts_agree():
    """tokens-first formulation == reference-layout formulation."""
    from videometamaterials_tpu.ops.attention import (
        linear_attention_tokens_first,
    )
    B, h, d, n = 2, 3, 4, 9
    hw = 16
    q = _rand((B, h, d, n), 30)
    k = _rand((B, h, d, n + 1), 31)
    v = _rand((B, h, d, n + 1), 32)
    ref = np.asarray(linear_attention(q, k, v, scale=0.5, spatial_size=hw))

    qt = np.ascontiguousarray(q.transpose(0, 3, 1, 2))  # (B, n, h, d)
    kt = np.ascontiguousarray(k.transpose(0, 3, 1, 2))
    vt = np.ascontiguousarray(v.transpose(0, 3, 1, 2))
    got = np.asarray(linear_attention_tokens_first(qt, kt, vt, scale=0.5,
                                                   spatial_size=hw))
    np.testing.assert_allclose(got.transpose(0, 2, 3, 1), ref, rtol=1e-4,
                               atol=1e-5)
