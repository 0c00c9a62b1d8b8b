#!/usr/bin/env python
"""Decompose the temporal-attention block's time against a byte/flop roofline
(VERDICT round-2 item 1).

Standalone reimplementation of the temporal_xla math (models/unet3d.py) with
raw weight arrays, chained-scan timed (block_probe.py methodology: output
feeds next input inside one jitted lax.scan; second program run timed).

Variants:
  copy      — pure HBM copy of a qkv-sized tensor: calibrates the effective
              streaming bandwidth at this program size (the 51 GB/s
              perf_probe number is from a much smaller elementwise chain)
  full      — whole block (LN + per-frame qkv proj + scores + joint softmax
              + values + out-proj + residual)
  proj      — LN + qkv projection only (+ cheap fold back to input shape):
              isolates the 12x-channel-expansion HBM traffic
  attnmath  — scores/softmax/values from broadcast-derived q,k,v (no
              projection, minimal input traffic): what a VMEM-resident
              fused kernel would pay for the attention math + sim traffic
  stiled    — full block as a lax.scan over spatial tiles (the XLA s-tiling
              A/B the verdict asked for; per-tile intermediates still round-
              trip HBM, so total qkv bytes are unchanged — expectation: no
              win)

Prints measured ms/apply plus the byte-count model per variant.
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

from videometamaterials_tpu.ops.norms import channel_layer_norm  # noqa: E402
from videometamaterials_tpu.ops.rotary import (  # noqa: E402
    rotary_frequencies,
    rotary_head_matrices,
)

F, HEADS, D = 11, 8, 32
HIDDEN = HEADS * D
ITERS = 8


def make_weights(rng, c):
    """Per-frame qkv weights with rotary+scale folded (temporal_xla's
    preparation), out-proj, bias, cond K/V."""
    ks = jax.random.split(rng, 6)
    scale = D ** -0.5
    w_q = jax.random.normal(ks[0], (c, HIDDEN), jnp.float32) * 0.05
    w_k = jax.random.normal(ks[1], (c, HIDDEN), jnp.float32) * 0.05
    w_v = jax.random.normal(ks[2], (c, HIDDEN), jnp.float32) * 0.05
    freqs = rotary_frequencies(F, min(32, D))
    rot = jnp.asarray(rotary_head_matrices(freqs, D))
    w_qf = jnp.einsum("chd,fde->fche", w_q.reshape(c, HEADS, D),
                      rot * scale).reshape(F, c, HIDDEN)
    w_kf = jnp.einsum("chd,fde->fche", w_k.reshape(c, HEADS, D),
                      rot).reshape(F, c, HIDDEN)
    w_vf = jnp.broadcast_to(w_v[None], (F, c, HIDDEN))
    w_all = jnp.concatenate([w_qf, w_kf, w_vf], axis=-1)      # (F, c, 3h)
    w_out = jax.random.normal(ks[3], (HIDDEN, c), jnp.float32) * 0.05
    gamma = jnp.ones((c,), jnp.float32)
    return w_all, w_out, gamma


def attention_core(q, k, v, ek, ev, pos_bias, store):
    """scores + joint softmax + values, exactly the temporal_xla sequence."""
    sim_v = jnp.sum((q[:, :, None] * k[:, None]).astype(jnp.float32),
                    axis=-1).astype(store)
    bias = pos_bias.astype(jnp.float32).transpose(1, 2, 0)[None, :, :, None]
    sim_v = sim_v + bias.astype(store)                    # (1, i, j, 1, H)
    sim_c = jnp.sum(q.astype(jnp.float32)[:, :, None]
                    * ek[:, None, :, None], axis=-1).astype(store)
    sim_c = sim_c + bias.astype(store)
    mx = jnp.maximum(jnp.max(sim_v, axis=2, keepdims=True),
                     jnp.max(sim_c, axis=2, keepdims=True)).astype(jnp.float32)
    e_v = jnp.exp(sim_v.astype(jnp.float32) - mx)
    e_c = jnp.exp(sim_c.astype(jnp.float32) - mx)
    z = (jnp.sum(e_v, axis=2, keepdims=True)
         + jnp.sum(e_c, axis=2, keepdims=True))
    attn_v = (e_v / z).astype(store)
    attn_c = (e_c / z).astype(store)
    out = jnp.sum(attn_v[..., None].astype(jnp.float32)
                  * v[:, None].astype(jnp.float32), axis=2)
    out = out + jnp.sum(attn_c[..., None].astype(jnp.float32)
                        * ev[:, None, :, None], axis=2)
    return out


def full_block(x, gamma, w_all, w_out, ek, ev, pos_bias, dtype=jnp.bfloat16):
    b, f, s, c = x.shape
    store = dtype
    y = channel_layer_norm(x, gamma).astype(dtype)
    qkv = jnp.einsum("bfsc,fch->bfsh", y, w_all.astype(dtype))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, f, s, HEADS, D)
    k = k.reshape(b, f, s, HEADS, D)
    v = v.reshape(b, f, s, HEADS, D)
    out = attention_core(q, k, v, ek, ev, pos_bias, store)
    out = out.astype(dtype).reshape(b, f, s, HIDDEN)
    out = jnp.einsum("bfsh,hc->bfsc", out, w_out.astype(dtype))
    return x + out.astype(x.dtype)


def proj_only(x, gamma, w_all, dtype=jnp.bfloat16):
    b, f, s, c = x.shape
    y = channel_layer_norm(x, gamma).astype(dtype)
    qkv = jnp.einsum("bfsc,fch->bfsh", y, w_all.astype(dtype))
    # force the full qkv tensor to exist, then fold back to input shape
    return x + qkv.reshape(b, f, s, -1, c).sum(axis=3).astype(x.dtype) * 0.01


def attnmath_only(x, ek, ev, pos_bias, dtype=jnp.bfloat16):
    """q,k,v derived from x by broadcast (c=64 -> 256 via 4x repeat view):
    minimal input bytes, full attention math + sim/attn traffic."""
    b, f, s, c = x.shape
    xh = x.astype(dtype).reshape(b, f, s, 1, c // D, D)
    xh = jnp.broadcast_to(xh, (b, f, s, HEADS // (c // D), c // D, D))
    xh = xh.reshape(b, f, s, HEADS, D)
    out = attention_core(xh, xh * 0.9, xh * 1.1, ek, ev, pos_bias, dtype)
    # (b,f,s,H,D) -> fold back to c
    out = out.reshape(b, f, s, HEADS // (c // D), c).sum(axis=3)
    return x + out.astype(x.dtype) * 0.01


def stiled_block(x, gamma, w_all, w_out, ek, ev, pos_bias, tile,
                 dtype=jnp.bfloat16):
    b, f, s, c = x.shape
    n = s // tile
    xt = x.reshape(b, f, n, tile, c).transpose(2, 0, 1, 3, 4)

    def body(_, xtile):
        return None, full_block(xtile, gamma, w_all, w_out, ek, ev, pos_bias,
                                dtype)

    _, out = jax.lax.scan(body, None, xt)
    return out.transpose(1, 2, 0, 3, 4).reshape(b, f, s, c)


def chain_timer(name, apply_fn, x0, model_bytes=None, model_ms=None):
    def body(x, _):
        y = apply_fn(x)
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
        rec = {"block": name, "ms_per_apply": round(ms, 1),
               "first_run_s": round(compile_s, 1)}
        if model_bytes is not None:
            rec["model_GB"] = round(model_bytes / 1e9, 2)
        if model_ms is not None:
            rec["model_ms_at_51GBs"] = round(model_ms, 1)
        print(json.dumps(rec), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"block": name, "error": repr(e)[:400]}),
              flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="copy,full,proj,attnmath,stiled")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--hw", type=int, default=96)
    p.add_argument("--c", type=int, default=64)
    p.add_argument("--tile", type=int, default=1152)
    args = p.parse_args()
    variants = set(args.variants.split(","))
    B, C = args.batch, args.c
    S = args.hw * args.hw

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, F, S, C), jnp.bfloat16)
    w_all, w_out, gamma = make_weights(rng, C)
    ek = jax.random.normal(rng, (B, F, HEADS, D), jnp.float32) * 0.1
    ev = jax.random.normal(rng, (B, F, HEADS, D), jnp.float32) * 0.1
    pos_bias = jax.random.normal(rng, (HEADS, F, F), jnp.float32)

    GB = 1e9
    x_b = B * F * S * C * 2
    qkv_b = B * F * S * 3 * HIDDEN * 2
    sim_b = B * F * F * S * HEADS * 2
    out_b = B * F * S * HIDDEN * 2
    # byte models (write+read per materialized tensor, x read twice for
    # residual)
    model_full = 2 * x_b + 2 * qkv_b + 6 * sim_b + 2 * out_b + x_b
    model_proj = 2 * x_b + 2 * qkv_b + x_b
    model_attn = 2 * x_b + 6 * sim_b + 2 * out_b
    print(json.dumps({
        "shape": {"B": B, "F": F, "S": S, "C": C},
        "bytes_GB": {"x": round(x_b / GB, 2), "qkv": round(qkv_b / GB, 2),
                     "sim_each": round(sim_b / GB, 2),
                     "out": round(out_b / GB, 2)}}), flush=True)

    if "copy" in variants:
        big = jax.random.normal(rng, (qkv_b // 2 // 128, 128), jnp.bfloat16)
        chain_timer("copy_qkv_sized", lambda y: y + 1.0, big,
                    model_bytes=2 * qkv_b, model_ms=2 * qkv_b / (51 * GB)
                    * 1000)
    if "full" in variants:
        chain_timer("full", lambda y: full_block(
            x=y, gamma=gamma, w_all=w_all, w_out=w_out, ek=ek, ev=ev,
            pos_bias=pos_bias), x,
            model_bytes=model_full,
            model_ms=model_full / (51 * GB) * 1000)
    if "proj" in variants:
        chain_timer("proj_only", lambda y: proj_only(y, gamma, w_all), x,
                    model_bytes=model_proj,
                    model_ms=model_proj / (51 * GB) * 1000)
    if "attnmath" in variants:
        chain_timer("attnmath_only", lambda y: attnmath_only(
            y, ek, ev, pos_bias), x,
            model_bytes=model_attn,
            model_ms=model_attn / (51 * GB) * 1000)
    if "stiled" in variants:
        chain_timer(f"stiled_{args.tile}", lambda y: stiled_block(
            y, gamma, w_all, w_out, ek, ev, pos_bias, args.tile), x,
            model_bytes=model_full,
            model_ms=model_full / (51 * GB) * 1000)


if __name__ == "__main__":
    main()
