#!/usr/bin/env python
"""Level-0 spatial linear-attention block: fused Pallas kernel vs the XLA
path, timed on the real TPU at the flagship shape (b=16 CFG-folded, f=11,
96x96 pixels, c=64, 8 heads x 32). Distinct inputs per call (the relay
memoizes identical executions). Also asserts numerical parity on-device."""

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
)
from videometamaterials_tpu.ops.pallas.fused_linear_block import (  # noqa: E402
    fused_linear_block,
)

B, F, H, W, C, HEADS, D = 16, 11, 96, 96, 64, 8, 32
HD = HEADS * D
N_CALLS = 6

rng = np.random.default_rng(0)
xs = [jnp.asarray(rng.normal(size=(B, F, H, W, C)), jnp.bfloat16)
      for _ in range(N_CALLS)]
label = jnp.asarray(rng.normal(size=(B, F, 256)) * 0.3, jnp.float32)

kw = dict(dim=C, heads=HEADS, dim_head=D, cond_attention="self-stacked",
          cond_dim=256, per_frame_cond=True, dtype=jnp.bfloat16)
block_x = SpatialLinearAttentionBlock(**kw, use_fused_block=False)
params = jax.jit(block_x.init)(jax.random.PRNGKey(0), xs[0],
                               label_emb=label)
block_f = SpatialLinearAttentionBlock(**kw, use_fused_block=True)

xla_fn = jax.jit(lambda x: block_x.apply(params, x, label_emb=label))
fused_fn = jax.jit(lambda x: block_f.apply(params, x, label_emb=label))


def timeit(name, fn, args_list):
    try:
        out0 = jax.block_until_ready(fn(args_list[0]))   # compile
        t0 = time.perf_counter()
        for a in args_list[1:]:
            out = fn(a)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / (len(args_list) - 1) * 1000
        print(json.dumps({"path": name, "ms_per_call": round(ms, 1)}),
              flush=True)
        return out0
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"path": name, "error": repr(e)[:300]}), flush=True)
        return None


want = timeit("xla_linear_block", xla_fn, xs)
got = timeit("pallas_fused_linear", fused_fn, xs)
if want is not None and got is not None:
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    print(json.dumps({"max_abs_diff": round(err, 5)}), flush=True)
