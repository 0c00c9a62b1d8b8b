#!/usr/bin/env python
"""Trustworthy full-model timing on the TPU tunnel: a lax.scan repeatedly
applies the flagship denoiser with data-dependent inputs (the relay memoizes
identical executions, so single-call timings lie). Reports s/forward."""

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--sparse-linear-attn", type=int, default=1)
    p.add_argument("--temporal-cond", type=int, default=1)
    args = p.parse_args()

    from videometamaterials_tpu.config import ModelConfig
    from videometamaterials_tpu.models import UNet3D

    cfg = ModelConfig(compute_dtype=args.dtype,
                      unet_use_sparse_linear_attn=bool(args.sparse_linear_attn),
                      unet_temporal_att_cond=bool(args.temporal_cond))
    model = UNet3D.from_config(cfg)
    rng = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, 11, 96, 96, 3), jnp.float32)
    t0 = time.time()
    params = jax.jit(model.init)(rng, x1, jnp.zeros((1,), jnp.int32),
                                 jnp.zeros((1, 11)))
    jax.block_until_ready(params)
    print(f"init: {time.time()-t0:.1f}s", flush=True)

    B = args.batch
    t = jnp.zeros((B,), jnp.int32)
    c = jnp.zeros((B, 11))

    def body(img, i):
        eps = model.apply(params, img, t + i, c)
        return img - 0.01 * eps, None

    @jax.jit
    def scan_n(img, n_static=args.iters):
        out, _ = jax.lax.scan(body, img, jnp.arange(n_static))
        return out

    img = jax.random.normal(rng, (B, 11, 96, 96, 3), jnp.float32)
    t0 = time.time()
    out = scan_n(img)
    jax.block_until_ready(out)
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = scan_n(out)
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"steady: {dt:.2f}s for {args.iters} iters -> "
          f"{dt/args.iters*1000:.0f} ms/forward (batch {B})", flush=True)


if __name__ == "__main__":
    main()
