#!/usr/bin/env python
"""Compile-only preflight of the fused temporal kernel variants on the REAL
Mosaic backend (no execution): catches layout casts interpret mode accepts
but hardware rejects (e.g. the merged-layout (groups, heads) -> (1, G*H)
in-kernel reshape) without paying a full sampler-program remote compile.

Usage: python scripts/kernel_compile_preflight.py [--layouts merged,split]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layouts", default="merged,savedp")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=11)
    ap.add_argument("--spatial", type=int, default=96 * 96)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim-head", type=int, default=32)
    args = ap.parse_args()

    from videometamaterials_tpu.ops.pallas.fused_temporal_block import (
        fused_temporal_block,
        fused_temporal_block_savedp,
    )

    b, f, s, c = args.batch, args.frames, args.spatial, args.channels
    hidden = args.heads * args.dim_head
    t = f  # per-frame conditioning tokens
    shapes = dict(
        x=jax.ShapeDtypeStruct((b, f, s, c), jnp.bfloat16),
        gamma=jax.ShapeDtypeStruct((c,), jnp.float32),
        w_all=jax.ShapeDtypeStruct((f, c, 3 * hidden), jnp.float32),
        w_out=jax.ShapeDtypeStruct((hidden, c), jnp.float32),
        ek=jax.ShapeDtypeStruct((b, t, hidden), jnp.bfloat16),
        ev=jax.ShapeDtypeStruct((b, t, hidden), jnp.bfloat16),
        bias_all=jax.ShapeDtypeStruct((f, f + t, args.heads), jnp.float32),
    )

    for name in args.layouts.split(","):
        if name == "savedp":
            fn = lambda **kw: fused_temporal_block_savedp(
                kw["x"], kw["gamma"], kw["w_all"], kw["w_out"], kw["ek"],
                kw["ev"], kw["bias_all"], heads=args.heads, tile=None,
                interpret=False)
        else:
            fn = lambda _l=name, **kw: fused_temporal_block(
                kw["x"], kw["gamma"], kw["w_all"], kw["w_out"], kw["ek"],
                kw["ev"], kw["bias_all"], heads=args.heads,
                softmax_layout=_l, interpret=False)
        t0 = time.time()
        jax.jit(lambda kw, _fn=fn: _fn(**kw)).lower(shapes).compile()
        print(f"PREFLIGHT OK {name}: compiled in {time.time()-t0:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
