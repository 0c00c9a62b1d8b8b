#!/usr/bin/env python
"""Phase attribution for the fused temporal kernel: interleaved chained-scan
timing of the production kernel vs single-phase ablations (the `ablate`
probe hook in ops/pallas/fused_temporal_block._kernel).

Arms (one Mosaic kernel each, separate jitted programs):
  full     — production kernel
  proj     — LN + folded-QKV matmul skipped (q/k/v = lane-tiled x copies)
  score    — q*k products + selector matmuls skipped (constant scores)
  softmax  — max/exp/normalize skipped (raw scaled scores as weights)
  expand1  — only frame 0's expand matmul + fma runs (z keeps exps live)

full - arm ~ that phase's cost (expand1 measures ~10/11 of the expand
phase). Methodology per BENCH_NOTES: one process, arms interleaved across
rounds, every timed run salted (the relay memoizes identical executions).
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")

import videometamaterials_tpu.ops.pallas.fused_temporal_block as ftb  # noqa: E402

B, F, HEADS, D = 16, 11, 8, 32
HW = int(os.environ.get("PROBE_HW", "96"))
C = int(os.environ.get("PROBE_C", "64"))
T_TOK = 11
ITERS = 10

_SALT = [os.getpid() % 100_000]


def chain_timer(name, apply_fn, x0):
    def body(x, _):
        y = apply_fn(x)
        return y * 0.3 + 0.05, None

    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out

    def fresh():
        _SALT[0] += 1
        return x0 * (1.0 + (_SALT[0] % 13) * 0.01)

    try:
        t0 = time.time()
        jax.block_until_ready(run(fresh()))
        compile_s = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(run(fresh()))
        ms = (time.time() - t0) / ITERS * 1000
        print(json.dumps({"arm": name, "ms_per_apply": round(ms, 1),
                          "first_run_s": round(compile_s, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"arm": name, "error": repr(e)[:400]}), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--arms", default="full,proj,score,softmax,expand1")
    args = p.parse_args()

    hidden = HEADS * D
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 8)
    s = HW * HW
    x = jax.random.normal(ks[0], (B, F, s, C), jnp.bfloat16)
    gamma = jax.random.normal(ks[1], (C,), jnp.float32) * 0.1 + 1.0
    w_all = jax.random.normal(ks[2], (F, C, 3 * hidden), jnp.float32) * 0.05
    w_out = jax.random.normal(ks[3], (hidden, C), jnp.float32) * 0.05
    ek = jax.random.normal(ks[4], (B, T_TOK, hidden), jnp.float32)
    ev = jax.random.normal(ks[5], (B, T_TOK, hidden), jnp.float32)
    bias_all = jax.random.normal(ks[6], (F, F + T_TOK, HEADS), jnp.float32)

    def make_apply(ablate):
        def apply_fn(y):
            return ftb._run_kernel(y, gamma, w_all, w_out, ek, ev, bias_all,
                                   heads=HEADS, tile=None, interpret=False,
                                   ablate=ablate)
        return apply_fn

    arms = [a.strip() for a in args.arms.split(",") if a.strip()]
    for r in range(args.rounds):
        for arm in arms:
            ablate = "" if arm == "full" else arm
            chain_timer(f"{arm}_r{r}", make_apply(ablate), x)


if __name__ == "__main__":
    main()
