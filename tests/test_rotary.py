"""Rotary embedding parity with the lucidrains interleaved convention used by
the reference (rotary-embedding-torch; see ops/rotary.py docstring)."""

import numpy as np

from videometamaterials_tpu.ops.rotary import apply_rotary, rotary_frequencies


def _slow_rotary(x, theta=10000.0):
    """Literal per-element implementation of the interleaved convention."""
    *lead, n, d = x.shape
    out = np.array(x, dtype=np.float64)
    inv = 1.0 / (theta ** (np.arange(0, d, 2) / d))
    for pos in range(n):
        for i in range(d // 2):
            ang = pos * inv[i]
            c, s = np.cos(ang), np.sin(ang)
            x0 = np.array(x[..., pos, 2 * i], np.float64)
            x1 = np.array(x[..., pos, 2 * i + 1], np.float64)
            out[..., pos, 2 * i] = x0 * c - x1 * s
            out[..., pos, 2 * i + 1] = x0 * s + x1 * c
    return out


def test_apply_rotary_matches_slow_reference():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 7, 8)).astype(np.float32)
    freqs = rotary_frequencies(7, 8)
    got = np.asarray(apply_rotary(x, freqs))
    want = _slow_rotary(x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rotary_norm_preserving():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 11, 32)).astype(np.float32)
    freqs = rotary_frequencies(11, 32)
    y = np.asarray(apply_rotary(x, freqs))
    np.testing.assert_allclose(np.linalg.norm(y, axis=-1),
                               np.linalg.norm(x, axis=-1), rtol=1e-5)


def test_rotary_partial_rotation_passthrough():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    freqs = rotary_frequencies(5, 8)  # rotate only first 8 features
    y = np.asarray(apply_rotary(x, freqs))
    np.testing.assert_array_equal(y[..., 8:], x[..., 8:])
    assert not np.allclose(y[..., :8][..., 2:], x[..., :8][..., 2:])


def test_rotary_head_matrices_match_apply():
    """Folding rotary into a per-position matrix (for weight-fused QKV) must
    equal the direct interleaved rotation, incl. partial rotation."""
    import jax.numpy as jnp

    from videometamaterials_tpu.ops.rotary import (
        apply_rotary_heads,
        rotary_frequencies,
        rotary_head_matrices,
    )

    for dh, rot in ((8, 8), (12, 8)):
        freqs = rotary_frequencies(7, rot)
        a = rotary_head_matrices(freqs, dh)          # (7, dh, dh)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(3, 7, 2 * dh)).astype(np.float32)  # heads=2
        want = np.asarray(apply_rotary_heads(jnp.asarray(x),
                                             jnp.asarray(freqs), 2))
        xh = x.reshape(3, 7, 2, dh)
        got = np.einsum("bfhd,fde->bfhe", xh, a).reshape(3, 7, 2 * dh)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
