#!/usr/bin/env python
"""On-TPU A/B of the whole-block BACKWARD Pallas kernels (round 3).

Three arms per block, interleaved in ONE process (the A/B methodology the
relay's fast/slow phases require — see CLAUDE.md):

  xla        grad through the plain XLA block        (plan-split training arm)
  recompute  grad through the fused block, custom VJP recomputes the XLA
             forward (kernel_fwd + xla_fwd + xla_bwd)
  bwdk       grad through the fused block with the whole-block backward
             kernel (kernel_fwd + kernel_bwd)

Before timing, a small-shape numerics gate compares every cotangent of the
bwdk arm against the XLA vjp ON THE REAL DEVICE (interpret-mode parity is
already pinned in tests; Mosaic lowering is what this checks).

Timing is chained-scan (dx feeds the next x through a bounded affine), second
program run, arms interleaved and the whole set run twice.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")

from videometamaterials_tpu.models.unet3d import (  # noqa: E402
    SpatialLinearAttentionBlock,
    TemporalAttentionBlock,
)

HEADS, D, COND_DIM = 8, 32, 256
ITERS = 8


def make_blocks(kind, c, **flags):
    kw = dict(dim=c, heads=HEADS, dim_head=D, cond_attention="self-stacked",
              cond_dim=COND_DIM, per_frame_cond=True, dtype=jnp.bfloat16)
    if kind == "temporal":
        return TemporalAttentionBlock(**kw, use_rotary=True, **flags)
    return SpatialLinearAttentionBlock(**kw, **flags)


def block_grad_fn(block, kind, params, pos_bias, label):
    def loss(p, x):
        if kind == "temporal":
            y = block.apply(p, x, pos_bias=pos_bias, label_emb=label)
        else:
            y = block.apply(p, x, label_emb=label)
        return jnp.sum(y.astype(jnp.float32) * 1e-3)

    return jax.grad(loss, argnums=(0, 1))


def numerics_gate(kind):
    """Small-shape on-device cotangent parity: bwdk vs XLA vjp."""
    b, f, hw, c = 2, 11, 24, 64
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (b, f, hw, hw, c), jnp.bfloat16)
    label = jax.random.normal(rng, (b, f, COND_DIM), jnp.float32)
    pos_bias = jax.random.normal(rng, (HEADS, f, f), jnp.float32)

    ref = make_blocks(kind, c)
    if kind == "temporal":
        params = jax.jit(ref.init)(rng, x, pos_bias=pos_bias,
                                   label_emb=label)
    else:
        params = jax.jit(ref.init)(rng, x, label_emb=label)
    arms = {
        "xla": ref,
        "bwdk": make_blocks(kind, c, use_fused_block=True,
                            use_bwd_kernel=True),
    }
    grads = {}
    for name, blk in arms.items():
        g = jax.jit(block_grad_fn(blk, kind, params, pos_bias, label))
        grads[name] = jax.tree.map(lambda a: jax.device_get(a),
                                   g(params, x))
    gp_x, gx_x = grads["xla"]
    gp_k, gx_k = grads["bwdk"]
    worst = 0.0
    for (path, a), (_, bb) in zip(
            jax.tree_util.tree_flatten_with_path(gp_x)[0],
            jax.tree_util.tree_flatten_with_path(gp_k)[0]):
        import numpy as np
        scale = max(float(np.abs(a).max()), 1e-6)
        err = float(np.abs(np.asarray(a, np.float32)
                           - np.asarray(bb, np.float32)).max()) / scale
        worst = max(worst, err)
        if err > 2e-2:
            print(json.dumps({"gate": kind, "param": str(path),
                              "rel_err": err}), flush=True)
    import numpy as np
    scale = max(float(np.abs(gx_x).max()), 1e-6)
    err = float(np.abs(np.asarray(gx_x, np.float32)
                       - np.asarray(gx_k, np.float32)).max()) / scale
    worst = max(worst, err)
    print(json.dumps({"gate": kind, "worst_rel_err": round(worst, 5)}),
          flush=True)
    return worst < 5e-2


def chain_grad_timer(name, grad_fn, params, x0):
    def body(x, _):
        _, gx = grad_fn(params, x)
        # bounded affine on the cotangent keeps the chain data-dependent
        # without blowing up magnitudes; identical cost in every arm
        return (gx * 0.1 + x0 * 0.3).astype(x0.dtype), None

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
        print(json.dumps({"arm": name, "ms_per_grad": round(ms, 1),
                          "first_run_s": round(compile_s, 1)}), flush=True)
        return ms
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"arm": name, "error": repr(e)[:400]}), flush=True)
        return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kinds", default="temporal,linear")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--hw", type=int, default=96)
    p.add_argument("--c", type=int, default=64)
    p.add_argument("--skip-gate", action="store_true")
    p.add_argument("--arms", default="xla,recompute,bwdk")
    args = p.parse_args()

    for kind in args.kinds.split(","):
        if not args.skip_gate:
            ok = numerics_gate(kind)
            if not ok:
                print(json.dumps({"gate": kind, "status": "FAIL"}),
                      flush=True)
                continue

        b, f, hw, c = args.batch, 11, args.hw, args.c
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (b, f, hw, hw, c), jnp.bfloat16)
        label = jax.random.normal(rng, (b, f, COND_DIM), jnp.float32)
        pos_bias = jax.random.normal(rng, (HEADS, f, f), jnp.float32)
        ref = make_blocks(kind, c)
        if kind == "temporal":
            params = jax.jit(ref.init)(rng, x, pos_bias=pos_bias,
                                       label_emb=label)
        else:
            params = jax.jit(ref.init)(rng, x, label_emb=label)

        arm_blocks = {
            "xla": ref,
            "recompute": make_blocks(kind, c, use_fused_block=True),
            "bwdk": make_blocks(kind, c, use_fused_block=True,
                                use_bwd_kernel=True),
        }
        wanted = [a for a in args.arms.split(",") if a in arm_blocks]
        # two interleaved passes over the arms (relay phase noise)
        for rep in range(2):
            for arm in wanted:
                g = block_grad_fn(arm_blocks[arm], kind, params,
                                  pos_bias, label)
                chain_grad_timer(f"{kind}/{arm}/run{rep}", g, params, x)


if __name__ == "__main__":
    main()
