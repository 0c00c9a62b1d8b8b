#!/usr/bin/env python
"""General in-process A/B of sampler-path variants at the bench workload.

Each arm is a ModelConfig variant (or the one-pass-norms module patch,
which is applied only while the arm's programs trace). All arms run in ONE
process, interleaved round-robin, so relay fast/slow phases hit every arm
equally (BENCH_NOTES.md methodology). Example:

    python scripts/sampler_ab_probe.py --arms default,onepass,fl_all
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def arm_config(name, base):
    """ModelConfig for an arm name ('onepass'/'smerged' use base + module
    patch applied only while the arm's programs trace)."""
    if name in ("default", "onepass", "smerged", "smerged_onepass"):
        return base
    if name == "thres_sort":
        return base.replace(dynamic_thres_method="sort")
    if name == "bw_off":
        return base.replace(bf16_inference_weights=False)
    if name == "fl_all":
        return base.replace(use_fused_linear_block="all")
    if name == "fl_off":
        return base.replace(use_fused_linear_block=False)
    if name == "ft_level0":
        return base.replace(use_fused_temporal_block="level0")
    if name == "sharedinit_off":
        return base.replace(cfg_shared_init=False)
    if name.startswith("stile"):
        return base.replace(use_fused_temporal_block=False,
                            temporal_s_tile=int(name[5:]))
    if name.startswith("ddim"):
        # DDIM with reduced steps (vddp.py:909-911,986-1018): the cheap
        # throughput lever; quality cost measured separately via the
        # eval_demo_quality trade curve
        return base.replace(sampling_timesteps=int(name[4:]))
    raise SystemExit(f"unknown arm {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="default,onepass")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=4)
    # the relay MEMOIZES identical (program, inputs) executions; a per-process
    # salt keeps repeat probe invocations from replaying cached results
    import os
    ap.add_argument("--salt", type=int, default=os.getpid() % 100_000)
    args = ap.parse_args()

    from videometamaterials_tpu.config import ModelConfig
    from videometamaterials_tpu.diffusion import GaussianDiffusion
    from videometamaterials_tpu.models import UNet3D
    from videometamaterials_tpu.ops import norms

    base = ModelConfig(use_fused_linear_block="all",
                       use_fused_temporal_block="all")
    names = args.arms.split(",")
    arms = {}
    for n in names:
        cfg = arm_config(n, base)
        model = UNet3D.from_config(cfg)
        arms[n] = (model, GaussianDiffusion.from_config(model, cfg))

    rng = jax.random.PRNGKey(0)
    m0 = arms[names[0]][0]
    x = jnp.zeros((1, base.num_frames, base.image_size, base.image_size,
                   base.channels), jnp.float32)
    params = jax.jit(m0.init)(rng, x, jnp.zeros((1,), jnp.int32),
                              jnp.zeros((1, base.num_frames)))
    cond = jax.random.uniform(rng, (args.batch, base.num_frames), jnp.float32,
                              -1.0, 1.0)

    # warm each arm; the one-pass-stats flag and the temporal softmax
    # layout are read at TRACE time, so patch the module globals only
    # around the matching arm's first (tracing) call
    from videometamaterials_tpu.ops.pallas import fused_temporal_block as ftb
    for n, (_, d) in arms.items():
        norms.ONE_PASS_STATS = "onepass" in n
        ftb.DEFAULT_SOFTMAX_LAYOUT = "merged" if "smerged" in n else "split"
        t0 = time.perf_counter()
        jax.block_until_ready(d.sample(params, rng, cond, guidance_scale=5.0))
        print(f"warm {n}: {time.perf_counter()-t0:.1f}s", flush=True)
    norms.ONE_PASS_STATS = False
    ftb.DEFAULT_SOFTMAX_LAYOUT = "split"

    best = {n: float("inf") for n in arms}
    for i in range(args.rounds):
        for n, (_, d) in arms.items():
            t0 = time.perf_counter()
            out = d.sample(params,
                           jax.random.fold_in(rng, args.salt * 100 + i),
                           cond, guidance_scale=5.0)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            best[n] = min(best[n], dt)
            print(f"round {i} {n}: {dt:.2f}s "
                  f"({args.batch*60/dt:.2f} videos/min)", flush=True)
    for n, dt in best.items():
        print(f"BEST {n}: {dt:.2f}s -> {args.batch*60/dt:.2f} videos/min",
              flush=True)


if __name__ == "__main__":
    main()
