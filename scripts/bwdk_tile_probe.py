#!/usr/bin/env python
"""Can the temporal BACKWARD kernel compile at the production shape with a
smaller spatial tile? The default tile (1152 at s=9216) crashed the remote
compile helper; the gate shape (s=576, tile=576) compiled fine. This probes
tile values directly through fused_temporal_block with bwd_kernel=True and
times grad vs the recompute backward at the same tile."""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")

from videometamaterials_tpu.ops.pallas.fused_temporal_block import (  # noqa
    fused_temporal_block,
)

B, F, HEADS, D, C = 16, 11, 8, 32, 64
HIDDEN = HEADS * D
S = 96 * 96
T_TOK = 11
ITERS = 6


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiles", default="576,384")
    args = p.parse_args()

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, F, S, C), jnp.bfloat16)
    gamma = jnp.ones((C,), jnp.float32)
    w_all = jax.random.normal(rng, (F, C, 3 * HIDDEN), jnp.bfloat16) * 0.1
    w_out = jax.random.normal(rng, (HIDDEN, C), jnp.bfloat16) * 0.1
    ek = jax.random.normal(rng, (B, T_TOK, HIDDEN), jnp.bfloat16) * 0.5
    ev = jax.random.normal(rng, (B, T_TOK, HIDDEN), jnp.bfloat16) * 0.5
    bias_all = jax.random.normal(rng, (F, F + T_TOK, HEADS), jnp.float32)

    for tile_s in args.tiles.split(","):
        tile = int(tile_s)
        for bwd_kernel in (True, False):
            def loss(x_, w_):
                out = fused_temporal_block(
                    x_, gamma, w_, w_out, ek, ev, bias_all, heads=HEADS,
                    tile=tile, interpret=False, bwd_kernel=bwd_kernel)
                return jnp.sum(out.astype(jnp.float32) * 1e-3)

            grad_fn = jax.grad(loss, argnums=(0, 1))

            def body(carry, _):
                x_, w_ = carry
                dx, dw = grad_fn(x_, w_)
                return ((dx * 0.1 + x * 0.3).astype(x.dtype),
                        (dw * 0.1 + w_all * 0.3).astype(w_all.dtype)), None

            @jax.jit
            def run(x_, w_):
                (x_, w_), _ = jax.lax.scan(body, (x_, w_), None,
                                           length=ITERS)
                return x_, w_

            name = f"tile{tile}/{'bwdk' if bwd_kernel else 'recompute'}"
            try:
                t0 = time.time()
                jax.block_until_ready(run(x, w_all))
                comp = time.time() - t0
                t0 = time.time()
                jax.block_until_ready(run(x * 1.001, w_all))
                ms = (time.time() - t0) / ITERS * 1000
                print(json.dumps({"arm": name, "ms_per_grad": round(ms, 1),
                                  "first_run_s": round(comp, 1)}),
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"arm": name, "error": repr(e)[:300]}),
                      flush=True)


if __name__ == "__main__":
    main()
