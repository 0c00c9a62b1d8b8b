#!/usr/bin/env python
"""Interleaved one-process A/B of TRAINING-plan variants at flagship shape.

Each arm is a full jitted train step (loss+grad+Adam+EMA, scan-chained over
--iters steps so the relay cannot memoize and params actually evolve). All
arms run in ONE process, round-robin, per the BENCH_NOTES methodology (relay
fast/slow phases hit every arm equally). Measures VERDICT r3 ask #2: does
the residual-saving custom VJP (temporal_vjp='saved') make the fused
temporal kernel pay under grad vs the shipped plain-XLA train plan?

Arms:
  xla    - plain XLA plans under grad (the shipping plan-split baseline)
  saved  - fused temporal kernel (all levels) with the residual-saving VJP
           (forward kernel emits softmax weights; hand-written XLA backward
           skips the sim/softmax recompute)
  rec    - fused temporal kernel with the recompute VJP (round-3's losing
           312 ms/step plan, isolates the saved-vs-recompute delta)
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


ARMS = {
    "xla": dict(use_fused_temporal_block=False, use_fused_linear_block=False),
    "saved": dict(use_fused_temporal_block="all",
                  use_fused_linear_block=False, temporal_vjp="saved"),
    "rec": dict(use_fused_temporal_block="all",
                use_fused_linear_block=False, temporal_vjp="recompute"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="xla,saved")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    import os
    ap.add_argument("--salt", type=int, default=os.getpid() % 100_000)
    ap.add_argument("--image-size", type=int, default=96)
    ap.add_argument("--frames", type=int, default=11)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    from videometamaterials_tpu.config import ModelConfig
    from videometamaterials_tpu.diffusion import GaussianDiffusion
    from videometamaterials_tpu.models import UNet3D

    names = args.arms.split(",")
    rng = jax.random.PRNGKey(0)
    B = args.batch
    tx = optax.adam(1e-4)

    arms = {}
    for n in names:
        cfg = ModelConfig(image_size=args.image_size,
                          num_frames=args.frames, unet_dim=args.dim,
                          **ARMS[n])
        model = UNet3D.from_config(cfg)
        diffusion = GaussianDiffusion.from_config(model, cfg)

        def one_step(carry, i, diffusion=diffusion):
            params, opt_state, ema = carry
            step_rng = jax.random.fold_in(rng, i)
            videos = jax.random.uniform(
                step_rng, (B, args.frames, args.image_size,
                           args.image_size, 3))
            labels = jax.random.normal(step_rng, (B, args.frames))
            loss, grads = jax.value_and_grad(
                lambda p: diffusion.loss(p, step_rng, videos, labels,
                                         null_cond_prob=0.1))(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema = jax.tree.map(lambda e, q: e * 0.995 + 0.005 * q,
                               ema, params)
            return (params, opt_state, ema), loss

        # donate the state buffers like the real fused train step does —
        # without donation the 'saved' plan's backward OOMs HBM by ~93 MB
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def run(params, opt_state, ema, start, _one_step=one_step):
            (params, opt_state, ema), losses = jax.lax.scan(
                _one_step, (params, opt_state, ema),
                start + jnp.arange(args.iters))
            return params, opt_state, ema, losses

        x1 = jnp.zeros((1, args.frames, args.image_size,
                        args.image_size, 3))
        params = jax.jit(model.init)(rng, x1, jnp.zeros((1,), jnp.int32),
                                     jnp.zeros((1, args.frames)))
        state = (params, tx.init(params), jax.tree.map(jnp.copy, params))
        arms[n] = (run, state)

    # warm (compile) each arm with one chained window
    for n in names:
        run, state = arms[n]
        t0 = time.time()
        out = run(*state, jnp.int32(args.salt))
        jax.block_until_ready(out)
        arms[n] = (run, out[:3])
        print(f"warm {n}: {time.time()-t0:.1f}s "
              f"loss {float(out[3][-1]):.3f}", flush=True)

    best = {n: float("inf") for n in names}
    for i in range(args.rounds):
        for n in names:
            run, state = arms[n]
            t0 = time.perf_counter()
            out = run(*state, jnp.int32(args.salt + (i + 1) * args.iters))
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.iters * 1000
            arms[n] = (run, out[:3])
            best[n] = min(best[n], dt)
            print(f"round {i} {n}: {dt:.1f} ms/step "
                  f"loss {float(out[3][-1]):.3f}", flush=True)
    for n, dt in best.items():
        print(f"BEST {n}: {dt:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
