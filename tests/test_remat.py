"""remat_blocks (jax.checkpoint on the ResnetBlocks): a memory knob, not a
math change. Numerics authority: the single-block float64-oracle test —
remat's grads sit at fp32-rounding distance (~2e-6 relative) from the
float64 truth, exactly like the plain block. At UNet depth the conv_bias
grads are near-cancelled sums where that rounding amplifies, so the
whole-model check normalizes by the global gradient scale."""

import jax
import jax.numpy as jnp
import numpy as np

from videometamaterials_tpu.config import ModelConfig
from videometamaterials_tpu.models import UNet3D


def test_remat_single_block_matches_float64_oracle():
    import flax.linen as nn

    from videometamaterials_tpu.models.unet3d import ResnetBlock

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3, 16, 16, 8), jnp.float32)
    t = jax.random.normal(rng, (2, 16), jnp.float32)
    blk = ResnetBlock(8, 16, 4, "zeros", jnp.float32)
    blk_r = nn.remat(ResnetBlock)(8, 16, 4, "zeros", jnp.float32)
    params = blk.init(rng, x, t)

    def grads(b, dtype):
        with jax.enable_x64(dtype == jnp.float64):
            xx, tt = x.astype(dtype), t.astype(dtype)
            pp = jax.tree.map(lambda a: a.astype(dtype), params)
            g = jax.grad(lambda q: jnp.sum(b.apply(q, xx, tt) ** 2))(pp)
            return jax.tree.map(lambda a: np.asarray(a, np.float64), g)

    g_plain = grads(blk, jnp.float32)
    g_remat = grads(blk_r, jnp.float32)
    g_oracle = grads(blk, jnp.float64)

    def dist(ga, gb):
        return max(float(np.abs(np.asarray(a, np.float64)
                                - np.asarray(b, np.float64)).max())
                   for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)))

    scale = max(float(np.abs(leaf).max()) for leaf in jax.tree.leaves(g_oracle))
    # remat grads are as close to the float64 truth as the plain grads
    assert dist(g_remat, g_oracle) < 1e-4 * scale
    assert dist(g_plain, g_oracle) < 1e-4 * scale


def test_remat_blocks_unet_plumbing_and_parity():
    kw = dict(image_size=16, num_frames=3, unet_dim=8, dim_mults=(1, 2),
              unet_attn_heads=2, unet_attn_dim_head=4,
              compute_dtype="float32")
    m = UNet3D.from_config(ModelConfig(**kw))
    m_r = UNet3D.from_config(ModelConfig(**kw, remat_blocks=True))
    assert m_r.remat_blocks

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 3, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    cond = jax.random.normal(rng, (2, 3))
    params = m.init(rng, x, t, cond)
    params_r = m_r.init(rng, x, t, cond)
    # identical parameter tree (names and shapes): checkpoints interchange
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_r))

    np.testing.assert_allclose(
        np.asarray(m.apply(params, x, t, cond)),
        np.asarray(m_r.apply(params, x, t, cond)), rtol=2e-5, atol=2e-5)

    def loss(mod, p):
        return jnp.sum(mod.apply(p, x, t, cond) ** 2)

    g = jax.grad(lambda p: loss(m, p))(params)
    g_r = jax.grad(lambda p: loss(m_r, p))(params)
    gscale = max(float(np.abs(np.asarray(leaf)).max())
                 for leaf in jax.tree.leaves(g))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0, atol=2e-3 * gscale),
        g_r, g)
