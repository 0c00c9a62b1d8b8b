#!/usr/bin/env python
"""Trustworthy per-block A/B timing on the TPU tunnel.

Chains each block N times inside one jitted lax.scan with a data dependence
(output feeds the next input) so the relay cannot memoize or reorder
anything; reports ms/application from the second (cache-warm) program run.
Eager per-call timings through the relay are NOT reliable — a pure
elementwise probe measured 0.1 ms for an op whose output alone is 700 MB.

Variants: XLA temporal block, XLA spatial linear block, fused Pallas
linear block, plus an affine no-op chain that bounds the scan/chain
overhead. (The fused TEMPORAL kernel this probe once measured at 3x the
XLA path has been deleted — see BENCH_NOTES.md.)
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")

from videometamaterials_tpu.models.unet3d import (  # noqa: E402
    SpatialLinearAttentionBlock,
    TemporalAttentionBlock,
)

import os
B, F, HEADS, D = 16, 11, 8, 32
HW = int(os.environ.get("PROBE_HW", "96"))     # 96 = level 0, 48 = level 1
C = int(os.environ.get("PROBE_C", "64"))       # 64 = level 0, 128 = level 1
COND_DIM = 256
ITERS = 10


def chain_timer(name, block_apply, x0):
    """Scan-chain block_apply ITERS times; time the second program run."""

    def body(x, _):
        y = block_apply(x)
        # cheap affine keeps magnitudes bounded over the chain; identical
        # cost in every variant
        return y * 0.3 + 0.05, None

    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out

    try:
        t0 = time.time()
        jax.block_until_ready(run(x0))
        compile_s = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(run(x0 * 1.001))
        ms = (time.time() - t0) / ITERS * 1000
        print(json.dumps({"block": name, "ms_per_apply": round(ms, 1),
                          "first_run_s": round(compile_s, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"block": name, "error": repr(e)[:400]}), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="noop,xla_t,xla_l,fused_l")
    args = p.parse_args()
    variants = set(args.variants.split(","))

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, F, HW, HW, C), jnp.bfloat16)
    label = jax.random.normal(rng, (B, F, COND_DIM), jnp.float32)
    kw = dict(dim=C, heads=HEADS, dim_head=D, cond_attention="self-stacked",
              cond_dim=COND_DIM, per_frame_cond=True, dtype=jnp.bfloat16)

    t_block = TemporalAttentionBlock(**kw, use_rotary=True)
    pos_bias = jax.random.normal(rng, (HEADS, F, F), jnp.float32)
    params_t = jax.jit(t_block.init)(rng, x, pos_bias=pos_bias,
                                     label_emb=label)
    l_block = SpatialLinearAttentionBlock(**kw, use_fused_block=False)
    params_l = jax.jit(l_block.init)(rng, x, label_emb=label)

    l_fused = SpatialLinearAttentionBlock(**kw, use_fused_block=True)

    t_fused = TemporalAttentionBlock(**kw, use_rotary=True,
                                     use_fused_block=True)

    if "noop" in variants:
        chain_timer("noop_chain", lambda y: y, x)
    if "xla_t" in variants:
        chain_timer("xla_temporal", lambda y: t_block.apply(
            params_t, y, pos_bias=pos_bias, label_emb=label), x)
    if "fused_t" in variants:
        chain_timer("fused_temporal", lambda y: t_fused.apply(
            params_t, y, pos_bias=pos_bias, label_emb=label), x)
    if "stiled_t" in variants:
        t_stiled = TemporalAttentionBlock(**kw, use_rotary=True,
                                          s_tile=1152)
        chain_timer("stiled_temporal", lambda y: t_stiled.apply(
            params_t, y, pos_bias=pos_bias, label_emb=label), x)
    if "xla_l" in variants:
        chain_timer("xla_linear", lambda y: l_block.apply(
            params_l, y, label_emb=label), x)
    if "fused_l" in variants:
        chain_timer("fused_linear", lambda y: l_fused.apply(
            params_l, y, label_emb=label), x)
    if "fused_l2" in variants:
        # merged-heads layout: env is read at trace time (inside chain_timer)
        os.environ["VMT_LINEAR_LAYOUT"] = "merged"
        chain_timer("fused_linear_merged", lambda y: l_fused.apply(
            params_l, y, label_emb=label), x)
        os.environ.pop("VMT_LINEAR_LAYOUT")


if __name__ == "__main__":
    main()
