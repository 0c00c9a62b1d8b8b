#!/usr/bin/env python
"""Level-0 temporal block: fused Pallas kernel vs the optimized XLA path,
timed on the real TPU at the flagship shape (b=16 CFG-folded, f=11, s=96^2,
c=64, 8 heads x 32). Distinct inputs per call (the relay memoizes identical
executions)."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")

from videometamaterials_tpu.models.unet3d import Attention  # noqa: E402
from videometamaterials_tpu.ops.pallas.fused_block import (  # noqa: E402
    fused_temporal_block,
)
from videometamaterials_tpu.ops.rotary import rotary_frequencies  # noqa: E402

B, F, S, C, HEADS, D = 16, 11, 9216, 64, 8, 32
HD = HEADS * D
N_CALLS = 6

rng = np.random.default_rng(0)
xs = [jnp.asarray(rng.normal(size=(B, F, S, C)), jnp.bfloat16)
      for _ in range(N_CALLS)]
gamma = jnp.ones((C,), jnp.float32)
w_qkv = jnp.asarray(rng.normal(size=(C, 3 * HD)) * 0.05, jnp.float32)
w_out = jnp.asarray(rng.normal(size=(HD, C)) * 0.05, jnp.float32)
w_k = jnp.asarray(rng.normal(size=(256, HD)) * 0.05, jnp.float32)
w_v = jnp.asarray(rng.normal(size=(256, HD)) * 0.05, jnp.float32)
label = jnp.asarray(rng.normal(size=(B, F, 256)) * 0.3, jnp.float32)
bias = jnp.asarray(rng.normal(size=(HEADS, F, 2 * F)) * 0.3, jnp.float32)
pos_bias = jnp.asarray(rng.normal(size=(HEADS, F, F)) * 0.3, jnp.float32)
freqs = jnp.asarray(rotary_frequencies(F, 32))


def timeit(name, fn, args_list):
    try:
        jax.block_until_ready(fn(args_list[0]))          # compile
        t0 = time.perf_counter()
        for a in args_list[1:]:
            out = fn(a)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / (len(args_list) - 1) * 1000
        print(json.dumps({"path": name, "ms_per_call": round(ms, 1)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"path": name, "error": repr(e)[:4000]}), flush=True)


# ---- fused Pallas (same program as the cached compile test: bf16 weights)
ekv = {
    "ek": jnp.asarray(rng.normal(size=(B, F, HD)) * 0.3, jnp.bfloat16),
    "ev": jnp.asarray(rng.normal(size=(B, F, HD)) * 0.3, jnp.bfloat16),
}
timeit("pallas_fused", lambda x: fused_temporal_block(
    x, gamma, w_qkv.astype(jnp.bfloat16), w_out.astype(jnp.bfloat16),
    ekv["ek"], ekv["ev"], bias, freqs, heads=HEADS, scale=D ** -0.5), xs)

# ---- optimized XLA path (Attention.temporal_xla)
attn = Attention(dim=C, heads=HEADS, dim_head=D, use_rotary=True,
                 cond_attention="self-stacked", cond_dim=256,
                 per_frame_cond=True, dtype=jnp.bfloat16)
params = {"params": {"to_qkv_kernel": w_qkv, "to_out_kernel": w_out,
                     "to_k_kernel": w_k, "to_v_kernel": w_v}}
xla_fn = jax.jit(lambda x: attn.apply(params, x, gamma, pos_bias=pos_bias,
                                      label_emb=label,
                                      method=Attention.temporal_xla))
timeit("xla_temporal", xla_fn, xs)
