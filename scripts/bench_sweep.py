#!/usr/bin/env python
"""Sweep guided-sampling throughput configurations on the real TPU.

Each config = (batch, fused linear-attention block, scan chunk). Prints one
JSON line
per config; errors are caught and logged so one flaky Mosaic compile does not
kill the sweep. Run in background: compiles take minutes per program through
the remote-compile service (persistent cache at /tmp/jax_cache makes repeats
free).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")

GUIDANCE = 5.0


def run(batch, fused, chunk, ft=False, n_runs=2):
    from videometamaterials_tpu.config import ModelConfig
    from videometamaterials_tpu.diffusion import GaussianDiffusion
    from videometamaterials_tpu.models import UNet3D

    cfg = ModelConfig(use_fused_linear_block="level0" if fused else False,
                      use_fused_temporal_block=ft,
                      sample_scan_chunk=chunk)
    model = UNet3D.from_config(cfg)
    diffusion = GaussianDiffusion.from_config(model, cfg)

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, cfg.num_frames, cfg.image_size, cfg.image_size,
                   cfg.channels), jnp.float32)
    params = jax.jit(model.init)(rng, x, jnp.zeros((1,), jnp.int32),
                                 jnp.zeros((1, cfg.num_frames)))
    cond = jax.random.uniform(rng, (batch, cfg.num_frames), jnp.float32,
                              -1.0, 1.0)
    t0 = time.perf_counter()
    jax.block_until_ready(diffusion.sample(params, rng, cond,
                                           guidance_scale=GUIDANCE))
    warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = None
    for i in range(n_runs):
        out = diffusion.sample(params, jax.random.fold_in(rng, i + 1), cond,
                               guidance_scale=GUIDANCE)
    jax.block_until_ready(out)
    el = (time.perf_counter() - t0) / n_runs
    print(json.dumps({
        "batch": batch, "fused": fused, "fused_temporal": ft, "chunk": chunk,
        "warm_s": round(warm, 1), "sample_call_s": round(el, 2),
        "videos_per_min": round(batch * 60.0 / el, 2),
    }), flush=True)


def main():
    configs = [(4, False, 64, False), (8, False, 64, False),
               (16, False, 32, False), (8, True, 64, False),
               (4, True, 64, False)]
    if len(sys.argv) > 1:  # e.g. "8,True,64 16,True,32,level0"
        configs = []
        for spec in sys.argv[1:]:
            parts = spec.split(",")
            b, f, c = parts[:3]
            ft = parts[3] if len(parts) > 3 else "False"
            ft = False if ft in ("False", "") else ft
            configs.append((int(b), f == "True", int(c), ft))
    for batch, fused, chunk, ft in configs:
        for attempt in range(2):
            try:
                run(batch, fused, chunk, ft)
                break
            except Exception as e:  # noqa: BLE001 — log and continue sweep
                print(json.dumps({"batch": batch, "fused": fused,
                                  "fused_temporal": ft,
                                  "chunk": chunk, "attempt": attempt,
                                  "error": repr(e)[:400]}), flush=True)


if __name__ == "__main__":
    main()
