#!/usr/bin/env python
"""Component-level timing of the flagship forward on the TPU tunnel.

Ablates block families (monkeypatched to identity) to attribute ms/forward:
full, -temporal attention, -spatial linear attention, -both. Scan-based with
data-dependent inputs (the relay memoizes identical executions)."""

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, "/root/repo")

ITERS = 16
BATCH = 8           # CFG-folded batch for the bench's sampling batch of 4


def time_variant(name, no_temporal=False, no_linear=False, no_mid=False,
                 no_gn=False):
    import videometamaterials_tpu.models.unet3d as u
    from videometamaterials_tpu.config import ModelConfig
    from videometamaterials_tpu.models import UNet3D

    orig_t = u.TemporalAttentionBlock.__call__
    orig_s = u.SpatialAttentionBlock.__call__
    orig_l = u.SpatialLinearAttentionBlock.__call__
    orig_gn = u.group_norm
    try:
        if no_temporal:
            u.TemporalAttentionBlock.__call__ = lambda self, x, **kw: x
        if no_linear:
            u.SpatialLinearAttentionBlock.__call__ = \
                lambda self, x, **kw: x
        if no_mid:
            u.SpatialAttentionBlock.__call__ = lambda self, x, **kw: x
        if no_gn == "bf16":
            # same two-pass structure, statistics in the input dtype:
            # separates "statistics passes" cost from "fp32 upcast
            # materialization" cost
            def _gn_bf16(x, scale, bias, groups, eps=1e-5):
                b, c = x.shape[0], x.shape[-1]
                g = x.reshape(b, -1, groups, c // groups)
                mean = jnp.mean(g, axis=(1, 3), keepdims=True)
                var = jnp.mean(jnp.square(g - mean), axis=(1, 3),
                               keepdims=True)
                out = ((g - mean) / jnp.sqrt(var + eps)).reshape(x.shape)
                return out * scale.astype(x.dtype) + bias.astype(x.dtype)
            u.group_norm = _gn_bf16
        elif no_gn:
            # one-pass elementwise stand-in: isolates the cost of
            # GroupNorm's full-tensor statistics passes (the affine stays
            # so the epilogue fusion structure is unchanged)
            u.group_norm = lambda x, scale, bias, groups, eps=1e-5: (
                x * scale.astype(x.dtype) + bias.astype(x.dtype))

        import os
        ft = os.environ.get("VMT_BENCH_FUSED_TEMPORAL", "all")
        ft = int(ft) if ft.isdigit() else (False if ft in ("", "off") else ft)
        cfg = ModelConfig(use_fused_linear_block="level0",  # bench config
                          use_fused_temporal_block=ft)
        model = UNet3D.from_config(cfg)
        rng = jax.random.PRNGKey(0)
        params = jax.jit(model.init)(
            rng, jnp.zeros((1, 11, 96, 96, 3), jnp.float32),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 11)))
        t = jnp.zeros((BATCH,), jnp.int32)
        c = jnp.zeros((BATCH, 11))

        def body(img, i):
            eps = model.apply(params, img, t + i, c)
            return img - 0.01 * eps, None

        @jax.jit
        def scan_n(img):
            out, _ = jax.lax.scan(body, img, jnp.arange(ITERS))
            return out

        img = jax.random.normal(rng, (BATCH, 11, 96, 96, 3), jnp.float32)
        t0 = time.time()
        out = scan_n(img)
        jax.block_until_ready(out)
        warm = time.time() - t0
        t0 = time.time()
        out = scan_n(out)
        jax.block_until_ready(out)
        dt = time.time() - t0
        print(json.dumps({"variant": name, "warm_s": round(warm, 1),
                          "ms_per_forward": round(dt / ITERS * 1000, 1)}),
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name, "error": repr(e)[:300]}),
              flush=True)
    finally:
        u.TemporalAttentionBlock.__call__ = orig_t
        u.SpatialAttentionBlock.__call__ = orig_s
        u.SpatialLinearAttentionBlock.__call__ = orig_l
        u.group_norm = orig_gn


VARIANTS = {
    "full": {},
    "no_temporal": dict(no_temporal=True),
    "no_linear": dict(no_linear=True),
    "convs_only": dict(no_temporal=True, no_linear=True, no_mid=True),
    "convs_only_nogn": dict(no_temporal=True, no_linear=True, no_mid=True,
                            no_gn=True),
    "full_nogn": dict(no_gn=True),
    "no_mid_only": dict(no_mid=True),
    "convs_only_gnbf16": dict(no_temporal=True, no_linear=True, no_mid=True,
                              no_gn="bf16"),
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["full", "no_temporal", "no_linear", "convs_only"]
    for n in names:
        time_variant(n, **VARIANTS[n])
