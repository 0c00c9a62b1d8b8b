#!/usr/bin/env python
"""Interleaved A/B: pre-fold vs folded-cond fused temporal kernel.

One process, both arms traced against the SAME block params, interleaved
twice (prefold, folded, prefold, folded) per the BENCH_NOTES methodology —
the relay's fast/slow phases make separate-process A/Bs unreliable.

Arm switch: `Attention` imports `fused_temporal_block` from the kernel
module at trace time, so patching the module attribute around each arm's
chain_timer (which re-traces) selects the kernel version. The pre-fold
version is materialized FROM GIT HISTORY at runtime (the kernel module as
of commit 9de9add, the last pre-fold state) — no frozen source copy lives
in the tree.
"""

import argparse
import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")


def _load_prefold_kernel():
    """Import the pre-fold kernel module straight out of git history."""
    src = subprocess.run(
        ["git", "-C", "/root/repo", "show",
         "9de9add:videometamaterials_tpu/ops/pallas/fused_temporal_block.py"],
        check=True, capture_output=True, text=True).stdout
    f = tempfile.NamedTemporaryFile("w", suffix="_prefold_kernel.py",
                                    delete=False)
    f.write(src)
    f.close()
    spec = importlib.util.spec_from_file_location("prefold_temporal_kernel",
                                                  f.name)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


prefold = _load_prefold_kernel()
import videometamaterials_tpu.ops.pallas.fused_temporal_block as ftb  # noqa: E402
from videometamaterials_tpu.models.unet3d import (  # noqa: E402
    TemporalAttentionBlock,
)

B, F, HEADS, D = 16, 11, 8, 32
HW = int(os.environ.get("PROBE_HW", "96"))
C = int(os.environ.get("PROBE_C", "64"))
COND_DIM = 256
ITERS = 10
_FOLDED = ftb.fused_temporal_block
_PREFOLD = prefold.fused_temporal_block


_SALT = [os.getpid() % 100_000]


def chain_timer(name, block_apply, x0):
    def body(x, _):
        y = block_apply(x)
        return y * 0.3 + 0.05, None

    @jax.jit
    def run(x):
        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return out

    def fresh():
        # unique input per execution: the relay memoizes identical
        # (program, input) runs and can replay them in ~0 ms
        _SALT[0] += 1
        # step must survive bf16 rounding (eps ~ 0.004 near 1.0)
        return x0 * (1.0 + (_SALT[0] % 13) * 0.01)

    try:
        t0 = time.time()
        jax.block_until_ready(run(fresh()))
        compile_s = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(run(fresh()))
        ms = (time.time() - t0) / ITERS * 1000
        print(json.dumps({"block": name, "ms_per_apply": round(ms, 1),
                          "first_run_s": round(compile_s, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"block": name, "error": repr(e)[:400]}), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rounds", type=int, default=2)
    args = p.parse_args()

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, F, HW, HW, C), jnp.bfloat16)
    label = jax.random.normal(rng, (B, F, COND_DIM), jnp.float32)
    kw = dict(dim=C, heads=HEADS, dim_head=D, cond_attention="self-stacked",
              cond_dim=COND_DIM, per_frame_cond=True, dtype=jnp.bfloat16)
    block = TemporalAttentionBlock(**kw, use_rotary=True,
                                   use_fused_block=True)
    pos_bias = jax.random.normal(rng, (HEADS, F, F), jnp.float32)
    params = jax.jit(block.init)(rng, x, pos_bias=pos_bias, label_emb=label)

    def apply(y):
        return block.apply(params, y, pos_bias=pos_bias, label_emb=label)

    for r in range(args.rounds):
        ftb.fused_temporal_block = _PREFOLD
        chain_timer(f"prefold_r{r}", apply, x)
        ftb.fused_temporal_block = _FOLDED
        chain_timer(f"folded_r{r}", apply, x)


if __name__ == "__main__":
    main()
