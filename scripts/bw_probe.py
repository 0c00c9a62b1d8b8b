#!/usr/bin/env python
"""In-process A/B of bf16 sampling-weight copies at the bench workload.

Runs the exact bench.py workload (batch 4, DDPM 256, CFG w=5, fused
kernels at production defaults) with bf16_inference_weights on and off in
ONE process, interleaved (relay fast/slow phases make separate-process
comparisons unreliable, BENCH_NOTES.md). Prints per-run times and the
best-of per arm.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    from videometamaterials_tpu.config import ModelConfig
    from videometamaterials_tpu.diffusion import GaussianDiffusion
    from videometamaterials_tpu.models import UNet3D

    cfg = ModelConfig(use_fused_linear_block="level0",
                      use_fused_temporal_block="all")
    model = UNet3D.from_config(cfg)
    arms = {
        "bw_on": GaussianDiffusion.from_config(model, cfg),
        "bw_off": GaussianDiffusion.from_config(
            model, cfg.replace(bf16_inference_weights=False)),
    }

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, cfg.num_frames, cfg.image_size, cfg.image_size,
                   cfg.channels), jnp.float32)
    params = jax.jit(model.init)(rng, x, jnp.zeros((1,), jnp.int32),
                                 jnp.zeros((1, cfg.num_frames)))
    cond = jax.random.uniform(rng, (args.batch, cfg.num_frames), jnp.float32,
                              -1.0, 1.0)

    for name, d in arms.items():
        t0 = time.perf_counter()
        jax.block_until_ready(d.sample(params, rng, cond, guidance_scale=5.0))
        print(f"warm {name}: {time.perf_counter()-t0:.1f}s", flush=True)

    best = {k: float("inf") for k in arms}
    for i in range(args.rounds):
        for name, d in arms.items():
            t0 = time.perf_counter()
            out = d.sample(params, jax.random.fold_in(rng, i), cond,
                           guidance_scale=5.0)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
            print(f"round {i} {name}: {dt:.2f}s "
                  f"({args.batch*60/dt:.2f} videos/min)", flush=True)
    for name, dt in best.items():
        print(f"BEST {name}: {dt:.2f}s -> {args.batch*60/dt:.2f} videos/min",
              flush=True)


if __name__ == "__main__":
    main()
