#!/usr/bin/env python
"""Round-4 re-sweep of the bench sampling batch size + scan-chunk length.

The shipped bench batch (4) was chosen by the post-round-2 sweep
(4 -> 5.39, 8 -> 5.11, 16 -> 5.14 videos/min). Since then the per-step
forward got another ~1.7x cheaper (fused temporal at all levels, CFG
shared-init fold, one-pass norms: 5.44 -> 9.12 videos/min at batch 4),
which shifts the batch optimum again — cheaper math raises the relative
weight of per-step fixed overhead and changes the bandwidth/compute mix.
The scan chunk (64) trades watchdog safety against per-chunk host
dispatch through the relay; 128-step chunks stay far under the ~60 s
watchdog at these rates.

Arms are (batch, chunk) pairs, run interleaved in ONE process with salted
RNG per round (relay memoization + fast/slow phases — BENCH_NOTES
methodology). Throughput is normalized to videos/min.

    python scripts/batch_chunk_sweep.py --arms 4:64,8:64,16:64,4:128,8:128
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="4:64,8:64,16:64,4:128,8:128")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--salt", type=int, default=os.getpid() % 100_000)
    ap.add_argument("--log", default="/tmp/batch_chunk_sweep.log",
                    help="line-flushed progress log — survives the parent "
                         "being killed (a '| tail' pipe does NOT: it "
                         "buffers everything until exit)")
    args = ap.parse_args()

    logf = open(args.log, "a", buffering=1)

    def say(msg):
        print(msg, flush=True)
        logf.write(msg + "\n")

    from videometamaterials_tpu.config import ModelConfig
    from videometamaterials_tpu.diffusion import GaussianDiffusion
    from videometamaterials_tpu.models import UNet3D

    base = ModelConfig(use_fused_linear_block="all",
                       use_fused_temporal_block="all")
    model = UNet3D.from_config(base)

    arms = []
    for a in args.arms.split(","):
        b, c = a.split(":")
        cfg = base.replace(sample_scan_chunk=int(c))
        arms.append((int(b), int(c),
                     GaussianDiffusion.from_config(model, cfg)))

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, base.num_frames, base.image_size, base.image_size,
                   base.channels), jnp.float32)
    params = jax.jit(model.init)(rng, x, jnp.zeros((1,), jnp.int32),
                                 jnp.zeros((1, base.num_frames)))
    conds = {b: jax.random.uniform(rng, (b, base.num_frames), jnp.float32,
                                   -1.0, 1.0)
             for b in {b for b, _, _ in arms}}

    for b, c, d in arms:
        t0 = time.perf_counter()
        jax.block_until_ready(d.sample(params, rng, conds[b],
                                       guidance_scale=5.0))
        say(f"warm b{b} c{c}: {time.perf_counter()-t0:.1f}s")

    best = {}
    for i in range(args.rounds):
        for b, c, d in arms:
            t0 = time.perf_counter()
            out = d.sample(params,
                           jax.random.fold_in(rng, args.salt * 100 + i),
                           conds[b], guidance_scale=5.0)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            key = (b, c)
            best[key] = min(best.get(key, float("inf")), dt)
            say(f"round {i} b{b} c{c}: {dt:.2f}s "
                f"({b*60/dt:.2f} videos/min)")
    for (b, c), dt in sorted(best.items()):
        say(f"BEST b{b} c{c}: {dt:.2f}s -> {b*60/dt:.2f} videos/min")


if __name__ == "__main__":
    main()
