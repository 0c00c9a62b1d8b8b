#!/usr/bin/env python
"""Training-step throughput on the local accelerator: jitted loss+grad+Adam
+EMA at flagship config, scan-timed like perf_probe."""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--fused-linear", default="level0")
    p.add_argument("--fused-temporal", default="all")  # production default
    p.add_argument("--s-tile", type=int, default=0,
                   help="temporal_s_tile for the XLA plan (0 = untiled); "
                        "differentiable for free, unlike the Pallas kernels")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the ResnetBlocks (memory/FLOPs "
                        "trade; enables larger --batch values)")
    p.add_argument("--bwd-kernels", action="store_true",
                   help="whole-block backward kernels for the fused blocks")
    args = p.parse_args()

    from videometamaterials_tpu.config import ModelConfig
    from videometamaterials_tpu.diffusion import GaussianDiffusion
    from videometamaterials_tpu.models import UNet3D

    def tri(v):
        return False if v in ("", "off", "False") else \
            (int(v) if v.isdigit() else v)

    cfg = ModelConfig(use_fused_linear_block=tri(args.fused_linear),
                      use_fused_temporal_block=tri(args.fused_temporal),
                      temporal_s_tile=args.s_tile or None,
                      remat_blocks=args.remat,
                      fused_bwd_kernels=args.bwd_kernels)
    model = UNet3D.from_config(cfg)
    diffusion = GaussianDiffusion.from_config(model, cfg)
    tx = optax.adam(cfg.learning_rate)

    rng = jax.random.PRNGKey(0)
    B = args.batch
    x1 = jnp.zeros((1, 11, 96, 96, 3))
    t0 = time.time()
    params = jax.jit(model.init)(rng, x1, jnp.zeros((1,), jnp.int32),
                                 jnp.zeros((1, 11)))
    opt_state = tx.init(params)
    jax.block_until_ready(params)
    print(f"init {time.time()-t0:.1f}s", flush=True)

    def one_step(carry, i):
        params, opt_state, ema = carry
        step_rng = jax.random.fold_in(rng, i)
        videos = jax.random.uniform(step_rng, (B, 11, 96, 96, 3))
        labels = jax.random.normal(step_rng, (B, 11))
        loss, grads = jax.value_and_grad(
            lambda p: diffusion.loss(p, step_rng, videos, labels,
                                     null_cond_prob=0.1))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = jax.tree.map(lambda e, q: e * 0.995 + 0.005 * q, ema, params)
        return (params, opt_state, ema), loss

    @jax.jit
    def run(params, opt_state, ema):
        (params, opt_state, ema), losses = jax.lax.scan(
            one_step, (params, opt_state, ema), jnp.arange(args.iters))
        return params, opt_state, ema, losses

    ema = jax.tree.map(jnp.copy, params)
    t0 = time.time()
    params, opt_state, ema, losses = run(params, opt_state, ema)
    jax.block_until_ready(losses)
    print(f"compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    params, opt_state, ema, losses = run(params, opt_state, ema)
    jax.block_until_ready(losses)
    dt = (time.time() - t0) / args.iters
    print(f"steady: {dt*1000:.0f} ms/step -> {1/dt:.2f} steps/s "
          f"(global batch {B})", flush=True)


if __name__ == "__main__":
    main()
