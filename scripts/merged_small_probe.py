#!/usr/bin/env python
"""Does the merged-layout linear kernel lower at all on real TPU?
Runs it at a small spatial shape (N=2304, live VMEM comparable to the v1
kernel that compiles fine) and checks parity vs the XLA reference on
device. Separates 'VMEM/size blowup at N=9216' from 'operation does not
lower'."""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")

from videometamaterials_tpu.ops.pallas.fused_linear_block import (  # noqa
    fused_linear_block,
    reference_linear_block,
)

B2, N, C = 4, 48 * 48, 64
HEADS, D = 8, 32
HD = HEADS * D

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B2, N, C)), jnp.bfloat16)
gamma = jnp.asarray(rng.normal(size=(C,)) * 0.2 + 1.0, jnp.float32)
w_qkv = jnp.asarray(rng.normal(size=(C, 3 * HD)) * 0.1, jnp.float32)
w_out = jnp.asarray(rng.normal(size=(HD, C)) * 0.1, jnp.float32)
out_bias = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
ek = jnp.asarray(rng.normal(size=(B2, 11, HD)) * 0.5, jnp.bfloat16)
ev = jnp.asarray(rng.normal(size=(B2, 11, HD)) * 0.5, jnp.bfloat16)

want = np.asarray(jax.jit(lambda *a: reference_linear_block(
    *a, heads=HEADS, scale=D ** -0.5, spatial_size=N))(
    x, gamma, w_qkv, w_out, out_bias, ek, ev), np.float32)

for layout in ("merged", "head"):
    try:
        got = np.asarray(jax.jit(lambda *a: fused_linear_block(
            *a, heads=HEADS, scale=D ** -0.5, spatial_size=N,
            interpret=False, layout=layout))(
            x, gamma, w_qkv, w_out, out_bias, ek, ev), np.float32)
        err = float(np.max(np.abs(got - want))
                    / max(1e-6, float(np.max(np.abs(want)))))
        print(json.dumps({"layout": layout, "worst_rel_err": round(err, 5)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"layout": layout, "error": repr(e)[:300]}),
              flush=True)
