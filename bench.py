#!/usr/bin/env python
"""Headline benchmark: guided sample generation throughput + training
step throughput.

Reference baseline (BASELINE.md): a batch of 4 conditioned videos, DDPM 256
steps, classifier-free guidance w=5, takes ~1 minute on an RTX 6000
=> 4 videos/min. This benchmark runs the identical workload (paper-config
UNet3D, 3x11x96x96, 256 ancestral steps, CFG pair folded into one batched
forward) on one TPU chip and reports videos/min/chip.

It also measures the fused training step (loss+grad+Adam+EMA at the
reference's global batch 4, model.yaml:2, on the shipping XLA train plans —
BASELINE.md:27 names train steps/sec a target metric; the reference
publishes no number for it, so vs_baseline is null) as a scan-chained
probe per the BENCH_NOTES methodology (fresh salted data per step — the
relay memoizes identical executions).

Prints one JSON line per metric; the LAST line is the headline
guided-sampling metric: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

# persistent compile cache: XLA compiles take minutes through the remote
# compile service; warm runs skip them entirely
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

BASELINE_VIDEOS_PER_MIN = 4.0   # README.md:53 (RTX 6000)
# The metric is videos/min/CHIP. Batch 4 — the reference README's exact
# workload — measured best in the post-kernel sweep (scripts/bench_sweep.py:
# 4 -> 5.39, 8 -> 5.11, 16 -> 5.14 videos/min); the round-1 optimum of 8
# moved down once the per-step forward got cheaper.
BATCH = 4
GUIDANCE = 5.0


def main():
    from videometamaterials_tpu.config import ModelConfig
    from videometamaterials_tpu.diffusion import GaussianDiffusion
    from videometamaterials_tpu.models import UNet3D

    # paper config, DDPM 256/256; fused linear-attention Pallas kernel at
    # the full-resolution level (chained-scan A/B: 28.7 vs 32.3 ms/block).
    # Level 1 measured a 6.5x standalone win (9.6 vs 62.6 ms) but ZERO
    # in-graph bench change (5.40 vs 5.44 best-of-3) — XLA schedules the
    # in-context level-1 block fine; one Mosaic shape kept for cold compiles.
    import os
    # VMT_BENCH_FUSED_TEMPORAL: A/B hook for the fused temporal kernel
    # ('off' | 'level0' | 'all' | int N). Default ON at every level:
    # in-graph bench 7.89 ('all') vs 7.57 (level0) vs 5.44 (off)
    # videos/min (BENCH_NOTES.md round-3 roofline + sweep).
    ft = os.environ.get("VMT_BENCH_FUSED_TEMPORAL", "all")
    ft = int(ft) if ft.isdigit() else (False if ft in ("", "off") else ft)
    # VMT_BENCH_TEMPORAL_STILE: s-tiled XLA temporal plan (tile size)
    st = os.environ.get("VMT_BENCH_TEMPORAL_STILE", "")
    st = int(st) if st.isdigit() else None
    # VMT_BENCH_FUSED_LINEAR: same A/B hook for the linear kernel
    # ('off' | 'level0' | 'all' | int N). Default 'all' since the
    # merged-heads layout: bench 8.86 ('all') vs 8.79 (level0),
    # reproduced pre-fold as 8.52 vs 8.46 (BENCH_NOTES round 3).
    fl = os.environ.get("VMT_BENCH_FUSED_LINEAR", "all")
    fl = int(fl) if fl.isdigit() else (False if fl in ("", "off") else fl)
    # VMT_BENCH_BF16_WEIGHTS: A/B hook for bf16 weight copies in the
    # sampling scans ('off' to disable). Bit-identical output either way
    # (tests/test_inference_cast.py); only HBM weight traffic changes.
    bw = os.environ.get("VMT_BENCH_BF16_WEIGHTS", "on") not in ("off", "0")
    # VMT_BENCH_SHARED_INIT: A/B hook for the shared CFG init stage
    # ('off' to trace the plain doubled-batch forward). Bit-identical
    # output either way (tests/test_unet_variants.py).
    si = os.environ.get("VMT_BENCH_SHARED_INIT", "on") not in ("off", "0")
    cfg = ModelConfig(use_fused_linear_block=fl,
                      use_fused_temporal_block=ft,
                      temporal_s_tile=st,
                      bf16_inference_weights=bw,
                      cfg_shared_init=si)
    model = UNet3D.from_config(cfg)
    diffusion = GaussianDiffusion.from_config(model, cfg)

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, cfg.num_frames, cfg.image_size, cfg.image_size,
                   cfg.channels), jnp.float32)
    params = jax.jit(model.init)(rng, x, jnp.zeros((1,), jnp.int32),
                                 jnp.zeros((1, cfg.num_frames)))

    cond = jax.random.uniform(rng, (BATCH, cfg.num_frames), jnp.float32,
                              -1.0, 1.0)
    # chunked sampler jits its own scan segments (survives runtimes that
    # watchdog long single programs); no outer jit
    sample = lambda p, r, c: diffusion.sample(p, r, c,
                                              guidance_scale=GUIDANCE)

    # warmup/compile
    jax.block_until_ready(sample(params, rng, cond))

    # best of 3: the TPU relay oscillates between fast and slow phases
    # (repeat runs of the identical cached program differ by ~11%, see
    # BENCH_NOTES.md), so the minimum is the workload's actual time — the
    # standard microbenchmark convention for environmental noise
    n_runs = 3
    elapsed = float("inf")
    for i in range(n_runs):
        t0 = time.perf_counter()
        out = sample(params, jax.random.fold_in(rng, i), cond)
        jax.block_until_ready(out)
        elapsed = min(elapsed, time.perf_counter() - t0)

    videos_per_min = BATCH * 60.0 / elapsed

    # ---- training throughput (VERDICT r4 ask #4): jitted fused train step
    # (loss+grad+Adam+EMA) at global batch 4 on the XLA train plans — the
    # exact configuration Trainer trains with (plan split, BENCH_NOTES) —
    # timed as a scan chain so the relay cannot memoize repeated steps.
    import optax

    train_cfg = ModelConfig()       # XLA plans (fused blocks are
    train_model = UNet3D.from_config(train_cfg)   # sampling-only)
    train_diff = GaussianDiffusion.from_config(train_model, train_cfg)
    tx = optax.adam(train_cfg.learning_rate)
    TRAIN_BATCH = 4                 # reference global batch (model.yaml:2)
    ITERS = 8

    def one_step(carry, i):
        p, opt_state, ema = carry
        step_rng = jax.random.fold_in(rng, i)
        videos = jax.random.uniform(
            step_rng, (TRAIN_BATCH, cfg.num_frames, cfg.image_size,
                       cfg.image_size, cfg.channels))
        labels = jax.random.normal(step_rng, (TRAIN_BATCH, cfg.num_frames))
        loss, grads = jax.value_and_grad(
            lambda q: train_diff.loss(q, step_rng, videos, labels,
                                      null_cond_prob=0.1))(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        ema = jax.tree.map(lambda e, q: e * 0.995 + 0.005 * q, ema, p)
        return (p, opt_state, ema), loss

    @jax.jit
    def train_chain(p, opt_state, ema, salt):
        (p, opt_state, ema), losses = jax.lax.scan(
            one_step, (p, opt_state, ema), salt + jnp.arange(ITERS))
        return p, opt_state, ema, losses

    # same param tree as the fused plans (models/unet3d.py _RawKernel)
    opt_state = jax.jit(tx.init)(params)
    ema = jax.tree.map(jnp.copy, params)
    state = (params, opt_state, ema)
    # warmup/compile (salted so later timed runs see fresh data)
    p_, o_, e_, losses = train_chain(*state, jnp.int32(10_000))
    jax.block_until_ready(losses)
    state = (p_, o_, e_)
    step_time = float("inf")
    for i in range(n_runs):
        t0 = time.perf_counter()
        p_, o_, e_, losses = train_chain(*state, jnp.int32((i + 1) * ITERS))
        jax.block_until_ready(losses)
        state = (p_, o_, e_)
        step_time = min(step_time, (time.perf_counter() - t0) / ITERS)

    print(json.dumps({
        "metric": "train_steps_per_sec",
        "value": round(1.0 / step_time, 2),
        "unit": f"steps/s (global batch {TRAIN_BATCH})",
        "vs_baseline": None,
    }))
    print(json.dumps({
        "metric": "guided_videos_per_min_per_chip",
        "value": round(videos_per_min, 2),
        "unit": "videos/min",
        "vs_baseline": round(videos_per_min / BASELINE_VIDEOS_PER_MIN, 2),
    }))


if __name__ == "__main__":
    main()
