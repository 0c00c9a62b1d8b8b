"""Data-parallel SPMD correctness on the 8-device virtual CPU mesh:
the same global batch must produce the same loss/updates regardless of how
many devices it is sharded over (the XLA psum replaces DDP all-reduce)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from videometamaterials_tpu.config import ModelConfig
from videometamaterials_tpu.diffusion import GaussianDiffusion
from videometamaterials_tpu.models import UNet3D

IMG, FRAMES = 8, 2


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(image_size=IMG, num_frames=FRAMES, unet_dim=8,
                      dim_mults=(1, 2), unet_attn_heads=2,
                      unet_attn_dim_head=4, train_timesteps=4,
                      sampling_timesteps=4, compute_dtype="float32")
    model = UNet3D.from_config(cfg)
    diffusion = GaussianDiffusion.from_config(model, cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((8, FRAMES, IMG, IMG, 3))
    cond = jnp.zeros((8, FRAMES))
    params = model.init(rng, x[:1], jnp.zeros((1,), jnp.int32), cond[:1])
    videos = jax.random.uniform(rng, (8, FRAMES, IMG, IMG, 3))
    labels = jax.random.normal(rng, (8, FRAMES))
    return diffusion, params, videos, labels


def _run_steps(diffusion, params, videos, labels, devices, n_steps=2):
    mesh = Mesh(np.asarray(devices), ("data",))
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    # SGD: parameter updates stay proportional to gradients, so the check
    # isn't swamped by Adam's sign-like amplification of reduction-order fp
    # noise on near-zero gradients
    tx = optax.sgd(1e-2)

    def step(params, opt_state, v, l, rng):
        loss, grads = jax.value_and_grad(
            lambda p: diffusion.loss(p, rng, v, l, null_cond_prob=0.5))(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step = jax.jit(step, in_shardings=(repl, repl, bsh, bsh, None),
                   out_shardings=(repl, repl, None))
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(tx.init(params), repl)
    v = jax.device_put(videos, bsh)
    l = jax.device_put(labels, bsh)
    losses = []
    for i in range(n_steps):
        params, opt_state, loss = step(params, opt_state, v, l,
                                       jax.random.PRNGKey(7 + i))
        losses.append(float(loss))
    return losses, jax.device_get(params)


def test_dp_loss_invariant_to_device_count(setup):
    diffusion, params, videos, labels = setup
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual devices"
    losses_1, params_1 = _run_steps(diffusion, params, videos, labels,
                                    devs[:1])
    losses_8, params_8 = _run_steps(diffusion, params, videos, labels,
                                    devs[:8])
    np.testing.assert_allclose(losses_1, losses_8, rtol=1e-4)
    flat_1 = jax.tree.leaves(params_1)
    flat_8 = jax.tree.leaves(params_8)
    for a, b in zip(flat_1, flat_8):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_sampling_sharded_equals_replicated(setup):
    diffusion, params, videos, labels = setup
    devs = jax.devices()
    mesh8 = Mesh(np.asarray(devs[:8]), ("data",))
    rng = jax.random.PRNGKey(3)
    cond = jax.device_get(labels)

    # sample() is traced under an outer jit here, so inside_jit=True is
    # required (host-driven scan chunking is impossible under a trace) —
    # the same contract the Trainer and __graft_entry__ follow
    out_1 = np.asarray(jax.jit(
        lambda p, r, c: diffusion.sample(p, r, c, guidance_scale=2.0,
                                         inside_jit=True))(
        params, rng, jnp.asarray(cond)))

    bsh = NamedSharding(mesh8, P("data"))
    repl = NamedSharding(mesh8, P())
    fn = jax.jit(lambda p, r, c: diffusion.sample(p, r, c,
                                                  guidance_scale=2.0,
                                                  inside_jit=True),
                 in_shardings=(repl, None, bsh))
    out_8 = np.asarray(fn(jax.device_put(params, repl), rng,
                          jax.device_put(jnp.asarray(cond), bsh)))
    np.testing.assert_allclose(out_1, out_8, rtol=2e-3, atol=2e-3)

    # traced (w, phi) operands through the SHARDED program — the Trainer's
    # sweep path (replicated scalars, batch-sharded cond) must reproduce
    # the compiled-in-constant program bit-exactly
    fn_t = jax.jit(lambda p, r, c, w, phi: diffusion.sample(
        p, r, c, guidance_scale=w, inside_jit=True, cfg_rescale=phi),
        in_shardings=(repl, None, bsh, None, None))
    out_t = np.asarray(fn_t(jax.device_put(params, repl), rng,
                            jax.device_put(jnp.asarray(cond), bsh),
                            jnp.float32(2.0), jnp.float32(0.0)))
    np.testing.assert_array_equal(out_8, out_t)
