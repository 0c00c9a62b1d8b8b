"""UNet3D configuration-space coverage: padding modes, conditioning modes,
and the ablation-only whole-signal embeddings (SURVEY.md §2 M6, M11, M12)."""

import jax
import jax.numpy as jnp
import pytest

from videometamaterials_tpu.models import UNet3D

B, F, IMG = 1, 3, 8


def _run(model, cond_len=F):
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((B, F, IMG, IMG, 3)) * 0.1
    t = jnp.zeros((B,), jnp.int32)
    cond = jnp.linspace(-1, 1, B * cond_len).reshape(B, cond_len)
    params = model.init(rng, x, t, cond)
    out = model.apply(params, x, t, cond)
    assert out.shape == (B, F, IMG, IMG, 3)
    assert jnp.isfinite(out).all()
    return params, out


@pytest.mark.parametrize("padding_mode", ["zeros", "circular", "circular_1d"])
def test_padding_modes(padding_mode):
    model = UNet3D(dim=8, dim_mults=(1, 2), channels=3, attn_heads=2,
                   attn_dim_head=4, per_frame_cond=True,
                   use_temporal_attention_cond=True,
                   padding_mode=padding_mode, compute_dtype="float32")
    _run(model)


def test_circular_padding_is_horizontally_shift_equivariant():
    """Periodic in x: rolling the input along W rolls the output."""
    model = UNet3D(dim=8, dim_mults=(1, 2), channels=3, attn_heads=2,
                   attn_dim_head=4, per_frame_cond=True,
                   use_temporal_attention_cond=False,
                   use_sparse_linear_attn=False,
                   padding_mode="circular", compute_dtype="float32")
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (B, F, IMG, IMG, 3))
    t = jnp.zeros((B,), jnp.int32)
    cond = jnp.zeros((B, F))
    params = model.init(rng, x, t, cond)
    out = model.apply(params, x, t, cond)
    out_rolled = model.apply(params, jnp.roll(x, 2, axis=3), t, cond)
    import numpy as np
    np.testing.assert_allclose(np.asarray(jnp.roll(out, 2, axis=3)),
                               np.asarray(out_rolled), rtol=2e-2, atol=2e-3)


def test_whole_signal_cnn_embedding():
    """per_frame_cond=False ablation: 51-point signal through the CNN
    embedding, cond tokens broadcast (vddp.py:760-767)."""
    model = UNet3D(dim=8, dim_mults=(1, 2), channels=3, attn_heads=2,
                   attn_dim_head=4, per_frame_cond=False,
                   cond_attention="self-stacked", cond_attention_tokens=6,
                   use_temporal_attention_cond=True, compute_dtype="float32")
    _run(model, cond_len=51)


def test_cross_attention_mode():
    model = UNet3D(dim=8, dim_mults=(1, 2), channels=3, attn_heads=2,
                   attn_dim_head=4, per_frame_cond=False,
                   cond_attention="cross-attention", cond_attention_tokens=4,
                   use_temporal_attention_cond=False,
                   compute_dtype="float32")
    _run(model, cond_len=51)


def test_gru_embedding_tokens():
    from videometamaterials_tpu.models.embeddings import SignalEmbedding
    import numpy as np
    emb = SignalEmbedding("GRU", init_channel=1,
                          channel_upsamplings=(4, 4, 4, 4, 16))
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 10))
    params = emb.init(rng, x)
    out = emb.apply(params, x)
    assert out.shape == (2, 10, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_null_cond_mask_changes_output():
    model = UNet3D(dim=8, dim_mults=(1, 2), channels=3, attn_heads=2,
                   attn_dim_head=4, per_frame_cond=True,
                   use_temporal_attention_cond=True, compute_dtype="float32")
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, F, IMG, IMG, 3))
    t = jnp.zeros((2,), jnp.int32)
    cond = jax.random.normal(rng, (2, F))
    params = model.init(rng, x, t, cond)
    out_c = model.apply(params, x, t, cond,
                        null_cond_mask=jnp.array([False, False]))
    out_n = model.apply(params, x, t, cond,
                        null_cond_mask=jnp.array([True, False]))
    import numpy as np
    assert not np.allclose(out_c[0], out_n[0])      # nulled sample changed
    np.testing.assert_allclose(out_c[1], out_n[1], rtol=1e-5, atol=1e-5)


def test_cfg_tiled_pair_matches_plain_forward():
    """cfg_tiled_pair takes the UNTILED latent, computes the
    cond-independent init stage once, and tiles; output must be
    bit-identical to the plain doubled forward (same per-sample math,
    vddp.py:742-743 take no conditioning)."""
    import numpy as np
    model = UNet3D(dim=8, dim_mults=(1, 2), channels=3, attn_heads=2,
                   attn_dim_head=4, per_frame_cond=True,
                   use_temporal_attention_cond=True, compute_dtype="float32")
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, F, IMG, IMG, 3))
    t = jnp.full((2,), 5, jnp.int32)
    cond = jax.random.normal(rng, (2, F))
    params = model.init(rng, x, t, cond)
    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    cond2 = jnp.concatenate([cond, cond], axis=0)
    mask2 = jnp.array([False, False, True, True])
    plain = model.apply(params, x2, t2, cond2, null_cond_mask=mask2)
    shared = model.apply(params, x, t2, cond2, null_cond_mask=mask2,
                         cfg_tiled_pair=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(shared))


def test_cfg_tiled_pair_rejects_bad_inputs():
    model = UNet3D(dim=8, dim_mults=(1, 2), channels=3, attn_heads=2,
                   attn_dim_head=4, per_frame_cond=True, compute_dtype="float32")
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, F, IMG, IMG, 3))
    t = jnp.zeros((2,), jnp.int32)
    cond = jnp.zeros((2, F))
    params = model.init(rng, x, t, cond)
    t4 = jnp.zeros((4,), jnp.int32)
    cond4 = jnp.zeros((4, F))
    with pytest.raises(ValueError):
        # time not folded to 2x the x batch
        model.apply(params, x, t, cond, cfg_tiled_pair=True)
    with pytest.raises(ValueError):
        model.apply(params, x, t4, cond4, cfg_tiled_pair=True,
                    null_cond_mask=jnp.array([False, False, True, True]),
                    focus_present_mask=jnp.array([True, False]))
