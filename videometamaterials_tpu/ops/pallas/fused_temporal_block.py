"""Pallas TPU kernel: whole temporal-attention block, fused.

One kernel computes, per (batch, spatial-tile) grid cell, the residual
temporal attention block of the reference (vddp.py:396-535 wrapped in
Residual(PreNorm(...))):

    out = x + W_out @ softmax( (R_i W_q LN(x)_i)^T (R_j W_k LN(x)_j) + bias
                               | cond block ) @ [v | ev]

with rotary (R_f) and the 1/sqrt(d) scale pre-folded into per-frame QKV
weights (ops/rotary.py) exactly as the XLA fast path (Attention.temporal_xla)
does.

Why this exists — the roofline (BENCH_NOTES.md round 3): at the flagship
level-0 shape the XLA path materializes the 12x-channel-expanded QKV tensor
(~2.5 GB at CFG batch 16) plus four score/weight tensors (~0.3 GB each) in
HBM; the block is bandwidth-bound at several GB per call while the VPU math
is ~10 ms. Keeping QKV/scores/weights VMEM-resident reduces HBM traffic to
one read of x and one write of out (~0.2 GB).

Mosaic design (the layout the round-2 attempts did NOT try — see the kernel
ledger in BENCH_NOTES.md for the three losing formulations):
  - every bulk tensor keeps the MERGED-HEADS width (hidden=256 or 3*hidden
    lanes — full 128-lane utilization; round-2's losers worked at per-head
    width 32);
  - the per-head score reduction sum_d q*k is a (TS, hidden) elementwise
    product followed by a constant BLOCK-DIAGONAL SELECTOR matmul
    (hidden, heads) on the MXU — a segmented lane reduction without any
    lane-group primitive;
  - head->hidden broadcasts in the value accumulation use the transposed
    selector (heads, hidden), again on the MXU;
  - frames (11) and the token loop are fully unrolled Python; softmax
    statistics stay in f32 registers; only x and out touch HBM.

Backward: jax.custom_vjp. Default backward is the vjp of the numerically
equivalent XLA reference (`reference_temporal_block`) — under grad the
block then costs kernel_fwd + xla_fwd + xla_bwd (the reason the Trainer's
plan split trains on XLA plans). Opt-in VMT_TEMPORAL_BWD_KERNEL=1 switches
to a whole-block BACKWARD Pallas kernel (`_bwd_kernel`): it recomputes the
forward VMEM-resident and emits all seven cotangents in one pass, so HBM
traffic is one read of (x, g) and one write of dx plus the small parameter
grads — the same roofline argument as the forward kernel. Interpret-mode
parity with the XLA vjp is pinned in tests/test_fused_temporal_block.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videometamaterials_tpu.ops.norms import channel_layer_norm


def _selector(hidden: int, heads: int, dtype):
    """(hidden, heads) 0/1 block-diagonal: column h sums lanes of head h."""
    d = hidden // heads
    row = jax.lax.broadcasted_iota(jnp.int32, (hidden, heads), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (hidden, heads), 1)
    return (row // d == col).astype(dtype)


# Module default for the softmax lane layout inside the forward kernel
# ("split" | "merged"); probes patch this between arms, bench/env override
# via VMT_TEMPORAL_SOFTMAX. See _kernel for the layouts.
DEFAULT_SOFTMAX_LAYOUT = "split"


# Backward-plan default for the fused block under grad
# ("recompute" = XLA-reference vjp (re-runs the XLA forward),
#  "saved"     = forward kernel emits the softmax weights p and a
#                hand-written XLA backward consumes them (skips the
#                sim/softmax recompute — VERDICT r3 ask #2),
#  "kernel"    = whole-block backward Pallas kernel, measured slower).
# Env VMT_TEMPORAL_VJP overrides; explicit call args override both.
DEFAULT_VJP_MODE = "recompute"


def _kernel(x_ref, gamma_ref, wall_ref, wout_ref, bias_ref, *refs,
            f: int, heads: int, d: int, has_cond: bool, t_tok: int,
            ablate: str = "", softmax_layout: str = "split",
            emit_p: bool = False):
    # `ablate` is a PROBE-ONLY hook (scripts/temporal_phase_probe.py): it
    # skips one phase ("score" | "softmax" | "expand" | "proj") so chained
    # timing differences attribute the kernel's cost per phase. Production
    # paths never set it.
    refs = list(refs)
    p_ref = refs.pop() if emit_p else None
    if has_cond:
        eksel_ref, evexp_ref, out_ref = refs
    else:
        (out_ref,) = refs
    hidden = heads * d
    ts = x_ref.shape[2]
    sel = _selector(hidden, heads, jnp.bfloat16)          # (hidden, heads)
    expand = sel.T                                        # (heads, hidden)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    gamma = gamma_ref[0]                                  # (1, C) f32 row

    # ---- LN + per-frame folded QKV projection (rotary+scale in weights)
    q, k, v = [], [], []
    xs = []
    for fi in range(f):
        xf = x_ref[0, fi]                                 # (TS, C)
        xs.append(xf)
        if ablate == "proj":
            # probe: skip LN + QKV matmul; q/k/v from lane-tiled x copies
            qkv = jnp.concatenate([xf.astype(jnp.bfloat16)]
                                  * (3 * hidden // xf.shape[1]), axis=1)
        else:
            x32 = xf.astype(jnp.float32)
            mu = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
            y = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)
                 * gamma).astype(jnp.bfloat16)            # (TS, C)
            qkv = mm(y, wall_ref[fi]).astype(jnp.bfloat16)  # (TS, 3*hidden)
        q.append(qkv[:, :hidden])
        k.append(qkv[:, hidden:2 * hidden])
        v.append(qkv[:, 2 * hidden:])

    # Merged layout gets the bias pre-flattened to (F, (F+T)*heads) on the
    # host: an in-kernel (groups, heads) -> (1, groups*heads) reshape is a
    # sublane->lane layout cast Mosaic rejects ("unsupported shape cast");
    # a 2-D row slice of the pre-merged table is layout-free.
    bias = bias_ref[...]          # (F, F+T, heads) | (F, (F+T)*heads) merged
    w_out_mat = wout_ref[...]

    # Conditioning keys/values are per-frame CONSTANTS across positions, so
    # their score and expand phases fold into two per-batch matrices built
    # outside the kernel (round-3 fold, see _run_kernel): scores for ALL
    # (t, h) at once via q_i @ Ek_sel (one K=hidden matmul replaces t_tok
    # 16x-padded selector matmuls), and the value accumulation via one
    # (TS, t_tok*heads) @ Ev_exp matmul (replaces t_tok expand matmuls).
    if has_cond:
        eksel = eksel_ref[0]                              # (hidden, T*heads)
        evexp = evexp_ref[0]                              # (T*heads, hidden)

    # ---- per query frame: scores -> softmax -> values -> out-proj
    for i in range(f):
        q_i = q[i]

        if softmax_layout == "merged" and not ablate:
            # Round-4 full-lane softmax (the round-3 phase probe's finding:
            # the split layout runs 22 exps/normalizes on separate
            # (TS, heads=8) arrays — 8 of 128 lanes busy, the round-2
            # lane-padding trap inside the shipping kernel). Concatenate the
            # per-key-group scores to ONE (TS, groups*heads) array so bias
            # add, exp, and the 1/z normalize each run once at full lane
            # width. Op ORDER per element is identical to the split path
            # (same ascending-j max/sum folds), so outputs are bit-equal.
            groups = f + (t_tok if has_cond else 0)
            sims_nb = [mm(q_i * k[j], sel) for j in range(f)]
            if has_cond:
                sims_nb.append(mm(q_i, eksel))        # (TS, T*heads) merged
            sim_all = jnp.concatenate(sims_nb, axis=1) + bias[i:i + 1, :]
            m = sim_all[:, :heads]
            for jg in range(1, groups):
                m = jnp.maximum(m, sim_all[:, jg * heads:(jg + 1) * heads])
            e_all = jnp.exp(sim_all - jnp.tile(m, (1, groups)))  # ONE exp
            z = e_all[:, :heads]
            for jg in range(1, groups):
                z = z + e_all[:, jg * heads:(jg + 1) * heads]
            p_all = (e_all * jnp.tile(1.0 / z, (1, groups))
                     ).astype(jnp.bfloat16)           # ONE normalize + cast
            if emit_p:
                # residual for the saved-p backward: exactly the bf16
                # weights the expand phase consumes below
                p_ref[0, i] = p_all
            acc = jnp.zeros((ts, hidden), jnp.float32)
            for j in range(f):
                a = mm(p_all[:, j * heads:(j + 1) * heads], expand)
                acc = acc + a * v[j].astype(jnp.float32)
            if has_cond:
                acc = acc + mm(p_all[:, f * heads:], evexp)
            out_f = mm(acc.astype(jnp.bfloat16), w_out_mat)
            out_ref[0, i] = (xs[i].astype(jnp.float32)
                             + out_f).astype(out_ref.dtype)
            continue

        sims = []
        if ablate == "score":
            # probe: skip q*k products + selector matmuls; constant scores
            # (v stays live through the expand phase, so the QKV projection
            # is not dead-code-eliminated)
            for j in range(f + (t_tok if has_cond else 0)):
                sims.append(jnp.broadcast_to(bias[i, j].reshape(1, heads),
                                             (ts, heads)))
        else:
            for j in range(f):
                prod = q_i * k[j]                         # (TS, hidden) bf16
                sim = mm(prod, sel)                       # (TS, heads) f32
                sims.append(sim + bias[i, j].reshape(1, heads))
            if has_cond:
                csim = mm(q_i, eksel)                     # (TS, T*heads) f32
                for ti in range(t_tok):
                    sims.append(csim[:, ti * heads:(ti + 1) * heads]
                                + bias[i, f + ti].reshape(1, heads))

        if ablate == "softmax":
            # probe: skip max/exp/normalize; raw (scaled) scores as weights
            es = [s_ * 1e-3 for s_ in sims]
            inv_z = jnp.ones((ts, heads), jnp.float32)
        else:
            m = sims[0]
            for s_ in sims[1:]:
                m = jnp.maximum(m, s_)
            es = [jnp.exp(s_ - m) for s_ in sims]
            z = es[0]
            for e_ in es[1:]:
                z = z + e_
            inv_z = 1.0 / z

        acc = jnp.zeros((ts, hidden), jnp.float32)
        n_exp = 1 if ablate == "expand1" else f
        for j in range(n_exp):
            # probe "expand1": only frame 0's expand matmul + fma runs (z
            # keeps every exp live); full - expand1 ~ 10/11 of this phase
            a = mm((es[j] * inv_z).astype(jnp.bfloat16),
                   expand)                                # (TS, hidden) f32
            acc = acc + a * v[j].astype(jnp.float32)
        if has_cond and ablate != "expand1":
            pc = jnp.concatenate(
                [es[f + ti] * inv_z for ti in range(t_tok)],
                axis=1).astype(jnp.bfloat16)              # (TS, T*heads)
            acc = acc + mm(pc, evexp)                     # (TS, hidden) f32

        out_f = mm(acc.astype(jnp.bfloat16), w_out_mat)   # (TS, C) f32
        out_ref[0, i] = (xs[i].astype(jnp.float32)
                         + out_f).astype(out_ref.dtype)


def _bwd_kernel(x_ref, gamma_ref, wall_ref, wout_ref, bias_ref, *refs,
                f: int, heads: int, d: int, has_cond: bool, t_tok: int):
    """Whole-block backward: recompute the forward VMEM-resident, then emit
    every cotangent. Layout rules are the forward kernel's (merged-heads
    lanes, selector/expand matmuls for segmented head reductions); column
    sums lower as (1, TS) @ (TS, N) MXU matmuls (sublane multi_reductions
    do not lower — BENCH_NOTES kernel ledger). Grid-accumulated outputs
    (dgamma/dwall/dwout/dbias; dek/dev per batch row) follow the Pallas
    revisited-block pattern: zeroed on their first visit, += after."""
    if has_cond:
        (ek_ref, ev_ref, g_ref, dx_ref, dgamma_ref, dwall_ref, dwout_ref,
         dbias_ref, dek_ref, dev_ref) = refs
    else:
        (g_ref, dx_ref, dgamma_ref, dwall_ref, dwout_ref, dbias_ref) = refs
    hidden = heads * d
    ts = x_ref.shape[2]
    c = x_ref.shape[3]
    sel = _selector(hidden, heads, jnp.bfloat16)          # (hidden, heads)
    expand = sel.T                                        # (heads, hidden)
    ones_bf = jnp.ones((1, ts), jnp.bfloat16)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mm_ts(a, b):  # contract the TS (row) axis: (TS, M)^T @ (TS, N)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def mm_cT(a, b):  # (TS, N) @ (M, N)^T
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def colsum(a):    # (TS, N) -> (1, N) via MXU (sublane reduce workaround)
        return mm(ones_bf, a.astype(jnp.bfloat16))

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init_global():
        dgamma_ref[...] = jnp.zeros_like(dgamma_ref)
        dwall_ref[...] = jnp.zeros_like(dwall_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    if has_cond:
        @pl.when(pl.program_id(1) == 0)
        def _init_batch():
            dek_ref[...] = jnp.zeros_like(dek_ref)
            dev_ref[...] = jnp.zeros_like(dev_ref)

    gamma = gamma_ref[0]                                  # (1, C) f32 row

    # ---- forward recompute: LN stats + folded QKV, kept resident
    q, k, v, xhat, inv_sig, ys, gs = [], [], [], [], [], [], []
    for fi in range(f):
        xf = x_ref[0, fi]                                 # (TS, C)
        x32 = xf.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        isg = jax.lax.rsqrt(var + 1e-5)
        xh = (x32 - mu) * isg
        y = (xh * gamma).astype(jnp.bfloat16)
        qkv = mm(y, wall_ref[fi]).astype(jnp.bfloat16)
        q.append(qkv[:, :hidden])
        k.append(qkv[:, hidden:2 * hidden])
        v.append(qkv[:, 2 * hidden:])
        xhat.append(xh)
        inv_sig.append(isg)
        ys.append(y)
        gs.append(g_ref[0, fi])                           # (TS, C) cotangent

    ekh, evh = [], []
    if has_cond:
        for ti in range(t_tok):
            ekh.append(ek_ref[0, ti].reshape(1, hidden))
            evh.append(ev_ref[0, ti].reshape(1, hidden))

    bias = bias_ref[...]
    w_out_mat = wout_ref[...]                             # (hidden, C) bf16

    dq = [None] * f
    dk = [jnp.zeros((ts, hidden), jnp.float32) for _ in range(f)]
    dv = [jnp.zeros((ts, hidden), jnp.float32) for _ in range(f)]
    dek_acc = [jnp.zeros((1, hidden), jnp.float32) for _ in range(t_tok)]
    dev_acc = [jnp.zeros((1, hidden), jnp.float32) for _ in range(t_tok)]
    dwout_acc = jnp.zeros((hidden, c), jnp.float32)
    dbias_rows = []                                       # f x (f+t) of (1,H)

    for i in range(f):
        q_i = q[i]
        # --- recompute scores/softmax for query frame i
        sims = []
        for j in range(f):
            sims.append(mm(q_i * k[j], sel) + bias[i, j].reshape(1, heads))
        for ti in range(t_tok):
            sims.append(mm(q_i * ekh[ti].astype(jnp.bfloat16), sel)
                        + bias[i, f + ti].reshape(1, heads))
        m = sims[0]
        for s_ in sims[1:]:
            m = jnp.maximum(m, s_)
        es = [jnp.exp(s_ - m) for s_ in sims]
        z = es[0]
        for e_ in es[1:]:
            z = z + e_
        inv_z = 1.0 / z
        p = [e_ * inv_z for e_ in es]                     # (TS, heads) f32

        # --- acc recompute + dv/dp in one pass
        g_i = gs[i]
        g_acc32 = mm_cT(g_i, w_out_mat)                   # (TS, hidden) f32
        g_acc = g_acc32.astype(jnp.bfloat16)
        acc = jnp.zeros((ts, hidden), jnp.float32)
        dp = []
        for j in range(f):
            a_pj = mm(p[j].astype(jnp.bfloat16), expand)  # (TS, hidden) f32
            acc = acc + a_pj * v[j].astype(jnp.float32)
            dv[j] = dv[j] + a_pj * g_acc32
            dp.append(mm(g_acc * v[j], sel))              # (TS, heads) f32
        for ti in range(t_tok):
            a_pc = mm(p[f + ti].astype(jnp.bfloat16), expand)
            ev_t = evh[ti].astype(jnp.float32)
            acc = acc + a_pc * ev_t
            dev_acc[ti] = dev_acc[ti] + colsum(a_pc * g_acc32)
            dp.append(mm(g_acc * evh[ti].astype(jnp.bfloat16), sel))

        dwout_acc = dwout_acc + mm_ts(acc.astype(jnp.bfloat16), g_i)

        # --- softmax backward
        t_sum = p[0] * dp[0]
        for mi in range(1, f + t_tok):
            t_sum = t_sum + p[mi] * dp[mi]
        ds = [p[mi] * (dp[mi] - t_sum) for mi in range(f + t_tok)]
        dbias_rows.append([colsum(ds_m) for ds_m in ds])  # (1, heads) each

        # --- score backward: dq_i, dk_j, dek_t
        dq_i = jnp.zeros((ts, hidden), jnp.float32)
        for j in range(f):
            e_ds = mm(ds[j].astype(jnp.bfloat16), expand)  # (TS, hidden) f32
            dq_i = dq_i + e_ds * k[j].astype(jnp.float32)
            dk[j] = dk[j] + e_ds * q_i.astype(jnp.float32)
        for ti in range(t_tok):
            e_ds = mm(ds[f + ti].astype(jnp.bfloat16), expand)
            dq_i = dq_i + e_ds * ekh[ti].astype(jnp.float32)
            dek_acc[ti] = dek_acc[ti] + colsum(
                e_ds * q_i.astype(jnp.float32))
        dq[i] = dq_i

    # --- per-frame projection + LN backward
    for fi in range(f):
        dqkv = jnp.concatenate(
            [dq[fi], dk[fi], dv[fi]], axis=1).astype(jnp.bfloat16)
        dwall_ref[fi] += mm_ts(ys[fi], dqkv)              # (C, 3*hidden)
        dy = mm_cT(dqkv, wall_ref[fi])                    # (TS, C) f32
        dgamma_ref[...] += colsum(xhat[fi] * dy)
        dxh = dy * gamma
        m1 = jnp.mean(dxh, axis=-1, keepdims=True)
        m2 = jnp.mean(dxh * xhat[fi], axis=-1, keepdims=True)
        dx_f = inv_sig[fi] * (dxh - m1 - xhat[fi] * m2)
        dx_ref[0, fi] = (gs[fi].astype(jnp.float32)
                         + dx_f).astype(dx_ref.dtype)

    dwout_ref[...] += dwout_acc
    dbias_ref[...] += jnp.stack(
        [jnp.concatenate(rows, axis=0) for rows in dbias_rows])
    if has_cond:
        dek_ref[...] += jnp.stack(dek_acc, axis=1)      # (1, T, hidden)
        dev_ref[...] += jnp.stack(dev_acc, axis=1)


def reference_temporal_block(x, gamma, w_all, w_out, ek, ev, bias_all, *,
                             heads: int):
    """Pure-XLA twin of the kernel math (the frames-major temporal_xla
    formulation, models/unet3d.py): used as the custom-VJP backward and as
    the parity oracle in tests.
    x: (B, F, S, C); w_all: (F, C, 3*hidden) with rotary+scale folded;
    ek/ev: (B, T, hidden) or None; bias_all: (F, F+T, heads) f32."""
    b, f, s, c = x.shape
    hidden = w_out.shape[0]
    d = hidden // heads
    dtype = w_all.dtype

    y = channel_layer_norm(x, gamma).astype(dtype)
    qkv = jnp.einsum("bfsc,fch->bfsh", y, w_all)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, f, s, heads, d)
    k = k.reshape(b, f, s, heads, d)
    v = v.reshape(b, f, s, heads, d)

    sim_v = jnp.sum((q[:, :, None] * k[:, None]).astype(jnp.float32),
                    axis=-1)                              # (b, i, j, s, H)
    sim_v = sim_v + bias_all[None, :, :f, None, :]
    if ek is not None:
        t_tok = ek.shape[1]
        ekh = ek.reshape(b, t_tok, heads, d).astype(jnp.float32)
        evh = ev.reshape(b, t_tok, heads, d).astype(jnp.float32)
        sim_c = jnp.sum(q.astype(jnp.float32)[:, :, None]
                        * ekh[:, None, :, None], axis=-1)  # (b, i, T, s, H)
        sim_c = sim_c + bias_all[None, :, f:, None, :]
        mx = jnp.maximum(jnp.max(sim_v, axis=2, keepdims=True),
                         jnp.max(sim_c, axis=2, keepdims=True))
        e_v = jnp.exp(sim_v - mx)
        e_c = jnp.exp(sim_c - mx)
        z = (jnp.sum(e_v, axis=2, keepdims=True)
             + jnp.sum(e_c, axis=2, keepdims=True))
        out = jnp.sum((e_v / z)[..., None] * v[:, None].astype(jnp.float32),
                      axis=2)
        out = out + jnp.sum((e_c / z)[..., None]
                            * evh[:, None, :, None], axis=2)
    else:
        mx = jnp.max(sim_v, axis=2, keepdims=True)
        e_v = jnp.exp(sim_v - mx)
        out = jnp.sum((e_v / jnp.sum(e_v, axis=2, keepdims=True))[..., None]
                      * v[:, None].astype(jnp.float32), axis=2)
    out = out.astype(dtype).reshape(b, f, s, hidden)
    out = jnp.einsum("bfsh,hc->bfsc", out, w_out.astype(dtype))
    return x + out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_temporal_block_core(x, gamma, w_all, w_out, ek, ev, bias_all,
                              heads, tile, interpret, bwd_kernel,
                              softmax_layout):
    return _run_kernel(x, gamma, w_all, w_out, ek, ev, bias_all,
                       heads=heads, tile=tile, interpret=interpret,
                       softmax_layout=softmax_layout)


def _core_fwd(x, gamma, w_all, w_out, ek, ev, bias_all, heads, tile,
              interpret, bwd_kernel, softmax_layout):
    out = _run_kernel(x, gamma, w_all, w_out, ek, ev, bias_all,
                      heads=heads, tile=tile, interpret=interpret,
                      softmax_layout=softmax_layout)
    return out, (x, gamma, w_all, w_out, ek, ev, bias_all)


def _bwd_kernel_env() -> bool:
    import os
    return os.environ.get("VMT_TEMPORAL_BWD_KERNEL", "") == "1"


def _core_bwd(heads, tile, interpret, bwd_kernel, softmax_layout,
              residuals, g):
    if bwd_kernel or _bwd_kernel_env():
        return _run_bwd_kernel(residuals, g, heads=heads, tile=tile,
                               interpret=interpret)
    x, gamma, w_all, w_out, ek, ev, bias_all = residuals
    # bias_all is differentiable too: it carries the TRAINABLE relative
    # position bias (models/unet3d.py:_temporal_bias_all), which would
    # silently stop training under fused_blocks_in_training if its
    # cotangent were dropped
    _, vjp = jax.vjp(
        lambda x_, gamma_, w_all_, w_out_, ek_, ev_, bias_: (
            reference_temporal_block(
                x_, gamma_, w_all_, w_out_, ek_, ev_, bias_, heads=heads)),
        x, gamma, w_all, w_out, ek, ev, bias_all)
    return vjp(g)


def _run_bwd_kernel(residuals, g, *, heads, tile, interpret):
    """pallas_call plumbing for _bwd_kernel. Returns the seven cotangents
    in the custom-VJP argument order, cast back to the primal dtypes.
    Grid-accumulated grads come out in f32 (the accumulation dtype)."""
    x, gamma, w_all, w_out, ek, ev, bias_all = residuals
    b, f, s, c = x.shape
    hidden = w_out.shape[0]
    d = hidden // heads
    has_cond = ek is not None
    t_tok = ek.shape[1] if has_cond else 0
    tile = tile or _pick_tile(s)
    assert s % tile == 0, (s, tile)

    gamma2 = gamma.reshape(1, -1).astype(jnp.float32)
    bias2 = bias_all.astype(jnp.float32)

    grid = (b, s // tile)
    kernel = functools.partial(_bwd_kernel, f=f, heads=heads, d=d,
                               has_cond=has_cond, t_tok=t_tok)
    x_spec = pl.BlockSpec((1, f, tile, c), lambda bi, ti: (bi, 0, ti, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [
        x_spec,
        pl.BlockSpec((1, c), lambda bi, ti: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((f, c, 3 * hidden), lambda bi, ti: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, c), lambda bi, ti: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((f, f + t_tok, heads), lambda bi, ti: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, gamma2, w_all.astype(jnp.bfloat16),
                w_out.astype(jnp.bfloat16), bias2]
    cond_spec = pl.BlockSpec((1, t_tok, hidden), lambda bi, ti: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
    if has_cond:
        in_specs += [cond_spec, cond_spec]
        operands += [ek.astype(jnp.bfloat16), ev.astype(jnp.bfloat16)]
    in_specs.append(x_spec)                                # g
    operands.append(g.astype(x.dtype))

    out_shapes = [
        jax.ShapeDtypeStruct((b, f, s, c), x.dtype),               # dx
        jax.ShapeDtypeStruct((1, c), jnp.float32),                 # dgamma
        jax.ShapeDtypeStruct((f, c, 3 * hidden), jnp.float32),     # dwall
        jax.ShapeDtypeStruct((hidden, c), jnp.float32),            # dwout
        jax.ShapeDtypeStruct((f, f + t_tok, heads), jnp.float32),  # dbias
    ]
    out_specs = [
        x_spec,
        pl.BlockSpec((1, c), lambda bi, ti: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((f, c, 3 * hidden), lambda bi, ti: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, c), lambda bi, ti: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((f, f + t_tok, heads), lambda bi, ti: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if has_cond:
        out_shapes += [jax.ShapeDtypeStruct((b, t_tok, hidden), jnp.float32),
                       jax.ShapeDtypeStruct((b, t_tok, hidden), jnp.float32)]
        out_specs += [cond_spec, cond_spec]

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)

    dx, dgamma, dwall, dwout, dbias = outs[:5]
    dek = dev = None
    if has_cond:
        dek = outs[5].astype(ek.dtype)
        dev = outs[6].astype(ev.dtype)
    return (dx, dgamma.reshape(gamma.shape).astype(gamma.dtype),
            dwall.astype(w_all.dtype), dwout.astype(w_out.dtype),
            dek, dev, dbias.astype(bias_all.dtype))


fused_temporal_block_core.defvjp(_core_fwd, _core_bwd)


def temporal_bwd_from_p(x, gamma, w_all, w_out, ek, ev, bias_all, p, g, *,
                        heads: int):
    """Hand-written XLA backward of the fused temporal block given the SAVED
    softmax weights p (the forward kernel's bf16 p_all residual,
    (B, F, S, (F+T)*heads) with key-group-major lanes).

    This is the vjp of reference_temporal_block with the sim/softmax
    forward recompute removed: only the cheap LN+QKV projection is redone
    (jax.vjp over `proj` below supplies dx/dgamma/dwall exactly); the
    attention backward is the standard softmax-jacobian algebra driven by p.
    Using the bf16-rounded p in the jacobian (instead of the f32 weights the
    true linearization differentiates) perturbs cotangents at bf16 relative
    scale — the same order as the forward's own bf16 expand phase and the
    accepted backward-kernel gate (BENCH_NOTES round 3, 0.53% worst rel)."""
    b, f, s, c = x.shape
    hidden = w_out.shape[0]
    d = hidden // heads
    dtype = w_all.dtype
    has_cond = ek is not None
    t_tok = ek.shape[1] if has_cond else 0
    f32 = jnp.float32

    def proj(x_, gamma_, w_all_):
        y = channel_layer_norm(x_, gamma_).astype(dtype)
        return jnp.einsum("bfsc,fch->bfsh", y, w_all_)

    qkv, proj_vjp = jax.vjp(proj, x, gamma, w_all)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, f, s, heads, d).astype(f32)
    k = k.reshape(b, f, s, heads, d).astype(f32)
    v = v.reshape(b, f, s, heads, d).astype(f32)

    p_v = p[..., :f * heads].reshape(b, f, s, f, heads).astype(f32)
    g32 = g.astype(f32)
    dout = jnp.einsum("bisc,nc->bisn", g32,
                      w_out.astype(f32)).reshape(b, f, s, heads, d)

    # value-side cotangents + out recompute (for dwout)
    out_h = jnp.einsum("bisjh,bjshd->bishd", p_v, v)
    dp_v = jnp.einsum("bishd,bjshd->bisjh", dout, v)
    dv = jnp.einsum("bisjh,bishd->bjshd", p_v, dout)
    tsum = jnp.einsum("bisjh,bisjh->bish", p_v, dp_v)
    if has_cond:
        ekh = ek.reshape(b, t_tok, heads, d).astype(f32)
        evh = ev.reshape(b, t_tok, heads, d).astype(f32)
        p_c = p[..., f * heads:].reshape(b, f, s, t_tok, heads).astype(f32)
        out_h = out_h + jnp.einsum("bisth,bthd->bishd", p_c, evh)
        dp_c = jnp.einsum("bishd,bthd->bisth", dout, evh)
        dev = jnp.einsum("bisth,bishd->bthd", p_c, dout
                         ).reshape(b, t_tok, hidden).astype(ev.dtype)
        tsum = tsum + jnp.einsum("bisth,bisth->bish", p_c, dp_c)
    dwout = jnp.einsum("bisn,bisc->nc",
                       out_h.reshape(b, f, s, hidden).astype(dtype), g32
                       ).astype(w_out.dtype)

    # softmax jacobian + score backward
    ds_v = p_v * (dp_v - tsum[:, :, :, None, :])
    dbias = jnp.einsum("bisjh->ijh", ds_v)
    dq = jnp.einsum("bisjh,bjshd->bishd", ds_v, k)
    dk = jnp.einsum("bisjh,bishd->bjshd", ds_v, q)
    dek = None
    dev = dev if has_cond else None
    if has_cond:
        ds_c = p_c * (dp_c - tsum[:, :, :, None, :])
        dbias = jnp.concatenate(
            [dbias, jnp.einsum("bisth->ith", ds_c)], axis=1)
        dq = dq + jnp.einsum("bisth,bthd->bishd", ds_c, ekh)
        dek = jnp.einsum("bisth,bishd->bthd", ds_c, q
                         ).reshape(b, t_tok, hidden).astype(ek.dtype)

    dqkv = jnp.concatenate(
        [dq.reshape(b, f, s, hidden), dk.reshape(b, f, s, hidden),
         dv.reshape(b, f, s, hidden)], axis=-1).astype(qkv.dtype)
    dx, dgamma, dwall = proj_vjp(dqkv)
    dx = (dx.astype(f32) + g32).astype(x.dtype)           # residual path
    return (dx, dgamma, dwall, dwout, dek, dev,
            dbias.astype(bias_all.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_temporal_block_savedp(x, gamma, w_all, w_out, ek, ev, bias_all,
                                heads, tile, interpret):
    out, _ = _run_kernel(x, gamma, w_all, w_out, ek, ev, bias_all,
                         heads=heads, tile=tile, interpret=interpret,
                         softmax_layout="merged", emit_p=True)
    return out


def _savedp_fwd(x, gamma, w_all, w_out, ek, ev, bias_all, heads, tile,
                interpret):
    out, p = _run_kernel(x, gamma, w_all, w_out, ek, ev, bias_all,
                         heads=heads, tile=tile, interpret=interpret,
                         softmax_layout="merged", emit_p=True)
    return out, (x, gamma, w_all, w_out, ek, ev, bias_all, p)


def _savedp_bwd(heads, tile, interpret, residuals, g):
    x, gamma, w_all, w_out, ek, ev, bias_all, p = residuals
    return temporal_bwd_from_p(x, gamma, w_all, w_out, ek, ev, bias_all,
                               p, g, heads=heads)


fused_temporal_block_savedp.defvjp(_savedp_fwd, _savedp_bwd)


def _pick_tile(s: int) -> int:
    for t in (1152, 1024, 768, 512, 384, 256, 128):
        if s % t == 0:
            return t
    return s


def _run_kernel(x, gamma, w_all, w_out, ek, ev, bias_all, *, heads, tile,
                interpret, ablate: str = "", softmax_layout: str = "split",
                emit_p: bool = False):
    b, f, s, c = x.shape
    hidden = w_out.shape[0]
    d = hidden // heads
    has_cond = ek is not None
    t_tok = ek.shape[1] if has_cond else 0
    tile = tile or _pick_tile(s)
    assert s % tile == 0, (s, tile)
    if emit_p:
        assert softmax_layout == "merged" and not ablate, (
            "emit_p requires the merged softmax layout (p_all exists there)")

    gamma2 = gamma.reshape(1, -1).astype(jnp.float32)
    bias2 = bias_all.astype(jnp.float32)                  # (F, F+T, heads)
    merged_bias = softmax_layout == "merged" and not ablate
    if merged_bias:
        # host-side flatten; in-kernel sublane->lane reshape is unsupported
        bias2 = bias2.reshape(f, (f + t_tok) * heads)

    grid = (b, s // tile)
    kernel = functools.partial(_kernel, f=f, heads=heads, d=d,
                               has_cond=has_cond, t_tok=t_tok,
                               ablate=ablate, softmax_layout=softmax_layout,
                               emit_p=emit_p)
    bias_spec = (pl.BlockSpec((f, (f + t_tok) * heads),
                              lambda bi, ti: (0, 0),
                              memory_space=pltpu.VMEM)
                 if merged_bias else
                 pl.BlockSpec((f, f + t_tok, heads),
                              lambda bi, ti: (0, 0, 0),
                              memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((1, f, tile, c), lambda bi, ti: (bi, 0, ti, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), lambda bi, ti: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((f, c, 3 * hidden), lambda bi, ti: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, c), lambda bi, ti: (0, 0),
                     memory_space=pltpu.VMEM),
        bias_spec,
    ]
    operands = [x, gamma2, w_all.astype(jnp.bfloat16),
                w_out.astype(jnp.bfloat16), bias2]
    if has_cond:
        # Fold the position-constant conditioning K/V into two per-batch
        # matrices (XLA, trivial FLOPs): Ek_sel[b, lane, t*H + h] =
        # ek[b, t, lane] * [head(lane) == h] makes q_i @ Ek_sel the scores
        # for all (t, h) at once; Ev_exp[b, t*H + h, lane] =
        # ev[b, t, lane] * [head(lane) == h] makes one matmul of the
        # softmaxed cond weights accumulate all cond values. Replaces
        # 2*t_tok 16x-padded selector/expand matmuls per query frame with
        # 1 + 1 (t_tok*heads = 88-lane) matmuls — roughly half the
        # kernel's padded MXU work at t_tok == f.
        sel_np = _selector(hidden, heads, jnp.bfloat16)   # (hidden, heads)
        eksel = (ek.astype(jnp.bfloat16).transpose(0, 2, 1)[:, :, :, None]
                 * sel_np[None, :, None, :]).reshape(b, hidden,
                                                     t_tok * heads)
        evexp = (ev.astype(jnp.bfloat16)[:, :, None, :]
                 * sel_np.T[None, None, :, :]).reshape(b, t_tok * heads,
                                                       hidden)
        in_specs += [
            pl.BlockSpec((1, hidden, t_tok * heads),
                         lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tok * heads, hidden),
                         lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [eksel, evexp]

    out_shape = jax.ShapeDtypeStruct((b, f, s, c), x.dtype)
    out_spec = pl.BlockSpec((1, f, tile, c), lambda bi, ti: (bi, 0, ti, 0),
                            memory_space=pltpu.VMEM)
    if emit_p:
        groups = f + t_tok
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, f, s, groups * heads),
                                          jnp.bfloat16)]
        out_spec = [out_spec,
                    pl.BlockSpec((1, f, tile, groups * heads),
                                 lambda bi, ti: (bi, 0, ti, 0),
                                 memory_space=pltpu.VMEM)]

    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


def fused_temporal_block(x, gamma, w_all, w_out, ek, ev, bias_all, *,
                         heads: int, tile: int | None = None,
                         interpret: bool | None = None,
                         bwd_kernel: bool = False,
                         softmax_layout: str | None = None,
                         vjp_mode: str | None = None):
    """x: (B, F, S, C); gamma (C,); w_all (F, C, 3*hidden) rotary+scale
    folded; w_out (hidden, C); ek/ev (B, T, hidden) conditioning K/V
    (rotary already applied to ek), or None; bias_all (F, F+T, heads) with
    the cond columns zeroed when the reference adds no cond bias.
    Returns x + block(x); differentiable.

    softmax_layout 'merged' runs bias/exp/normalize on one full-lane
    (TS, groups*heads) array (bit-equal op order); None resolves env
    VMT_TEMPORAL_SOFTMAX, then DEFAULT_SOFTMAX_LAYOUT.

    vjp_mode picks the backward plan under grad: 'recompute' (XLA-reference
    vjp), 'saved' (forward kernel emits the softmax weights; hand-written
    XLA backward skips the sim/softmax recompute — forces the merged
    layout), or 'kernel' (whole-block backward Pallas kernel). None
    resolves bwd_kernel=True -> 'kernel', then env VMT_TEMPORAL_VJP, then
    DEFAULT_VJP_MODE."""
    import os
    if interpret is None:
        interpret = os.environ.get("VMT_PALLAS_INTERPRET", "") == "1"
    if softmax_layout is None:
        softmax_layout = os.environ.get("VMT_TEMPORAL_SOFTMAX",
                                        DEFAULT_SOFTMAX_LAYOUT)
    assert softmax_layout in ("split", "merged"), softmax_layout
    if vjp_mode is None:
        vjp_mode = "kernel" if bwd_kernel else os.environ.get(
            "VMT_TEMPORAL_VJP", DEFAULT_VJP_MODE)
    assert vjp_mode in ("recompute", "saved", "kernel"), vjp_mode
    if vjp_mode == "saved":
        return fused_temporal_block_savedp(x, gamma, w_all, w_out, ek, ev,
                                           bias_all, heads, tile, interpret)
    return fused_temporal_block_core(x, gamma, w_all, w_out, ek, ev,
                                     bias_all, heads, tile, interpret,
                                     vjp_mode == "kernel", softmax_layout)
