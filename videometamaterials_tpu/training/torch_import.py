"""Import reference PyTorch checkpoints into this framework's parameter tree.

The reference publishes `checkpoint.pt` dicts {model, optimizer, steps, ema}
(vddp.py:1534-1561) whose `model`/`ema` entries are state dicts of
GaussianDiffusion(denoise_fn=Unet3D). This module maps those tensors onto our
flax UNet3D parameter tree, handling:

  - conv kernel layout OIDHW -> HWIO (depth-1 kernels squeezed),
  - ConvTranspose3d kernels -> forward-conv orientation (spatial flip +
    in/out transpose; see ops/conv.py),
  - Linear weights -> Dense kernels (transpose),
  - module-name mapping (downs.N.K, Residual/PreNorm nesting, Sequential
    indices) -> our explicit names (down_N_block1, ..._temporal_attn/attn),
  - 'module.' (DDP) and 'denoise_fn.' prefixes; diffusion buffers skipped
    (schedules are recomputed exactly).

Tensors arrive as numpy arrays: `state_dict_to_numpy` converts a torch
checkpoint without needing torch at import time.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

# ---------------------------------------------------------------- transforms


def _t_linear(w):            # (out, in) -> (in, out)
    return np.ascontiguousarray(w.T)


def _t_conv_spatial(w):      # (O, I, 1, kh, kw) -> (kh, kw, I, O)
    return np.ascontiguousarray(w[:, :, 0].transpose(2, 3, 1, 0))


def _t_conv1x1(w):           # (O, I, 1, 1, 1) or (O, I, 1, 1) -> (I, O)
    return np.ascontiguousarray(w.reshape(w.shape[0], w.shape[1]).T)


def _t_conv_transpose(w):    # (I, O, 1, kh, kw) -> flipped (kh, kw, I, O)
    w = w[:, :, 0]
    w = w[:, :, ::-1, ::-1]
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))


def _t_conv1d(w):            # (O, I, k) -> (k, I, O)
    return np.ascontiguousarray(w.transpose(2, 1, 0))


def _t_gamma(w):             # (1, C, 1, 1, 1) -> (C,)
    return np.ascontiguousarray(w.reshape(-1))


def _t_id(w):
    return np.ascontiguousarray(w)


# ------------------------------------------------------------- name mapping


def _attention_entries(torch_prefix: str, flax_prefix: tuple, wrapped: bool):
    """Residual(PreNorm(EinopsToAndFrom(Attention))) (temporal/mid-spatial,
    wrapped=True adds the EinopsToAndFrom '.fn')."""
    inner = f"{torch_prefix}.fn.fn.fn" if wrapped else f"{torch_prefix}.fn.fn"
    e = {f"{torch_prefix}.fn.norm.gamma":
         (flax_prefix + ("norm_gamma",), _t_gamma)}
    for name in ("to_qkv", "to_q", "to_k", "to_v", "to_out"):
        e[f"{inner}.{name}.weight"] = (
            flax_prefix + ("attn", f"{name}_kernel"), _t_linear)
    return e


def _linear_attention_entries(torch_prefix: str, flax_prefix: tuple):
    """Residual(PreNorm(SpatialLinearAttention)). to_qkv/to_q are 1x1 Conv2d,
    to_k/to_v are Linear, to_out is 1x1 Conv2d with bias."""
    inner = f"{torch_prefix}.fn.fn"
    e = {f"{torch_prefix}.fn.norm.gamma":
         (flax_prefix + ("norm_gamma",), _t_gamma)}
    for name in ("to_qkv", "to_q"):
        e[f"{inner}.{name}.weight"] = (
            flax_prefix + ("attn", name, "kernel"), _t_conv1x1)
    for name in ("to_k", "to_v"):
        e[f"{inner}.{name}.weight"] = (
            flax_prefix + ("attn", name, "kernel"), _t_linear)
    e[f"{inner}.to_out.weight"] = (
        flax_prefix + ("attn", "to_out_kernel"), _t_conv1x1)
    e[f"{inner}.to_out.bias"] = (
        flax_prefix + ("attn", "to_out_bias"), _t_id)
    return e


def _resnet_block_entries(torch_prefix: str, flax_prefix: tuple,
                          has_time_mlp: bool = True):
    e = {}
    if has_time_mlp:
        e[f"{torch_prefix}.mlp.1.weight"] = (
            flax_prefix + ("time_mlp", "kernel"), _t_linear)
        e[f"{torch_prefix}.mlp.1.bias"] = (
            flax_prefix + ("time_mlp", "bias"), _t_id)
    for blk in ("block1", "block2"):
        for proj in (f"{torch_prefix}.{blk}.proj",
                     f"{torch_prefix}.{blk}.proj.conv"):  # circular_1d wraps
            e[f"{proj}.weight"] = (
                flax_prefix + (blk, "conv_kernel"), _t_conv_spatial)
            e[f"{proj}.bias"] = (flax_prefix + (blk, "conv_bias"), _t_id)
        e[f"{torch_prefix}.{blk}.norm.weight"] = (
            flax_prefix + (blk, "gn_scale"), _t_id)
        e[f"{torch_prefix}.{blk}.norm.bias"] = (
            flax_prefix + (blk, "gn_bias"), _t_id)
    e[f"{torch_prefix}.res_conv.weight"] = (
        flax_prefix + ("res_kernel",), _t_conv1x1)
    e[f"{torch_prefix}.res_conv.bias"] = (
        flax_prefix + ("res_bias",), _t_id)
    return e


def build_key_map(num_resolutions: int = 4) -> dict:
    """torch state-dict key -> (flax param path under 'params', transform)."""
    m: dict[str, tuple[tuple, Callable]] = {
        "init_conv.weight": (("init_conv_kernel",), _t_conv_spatial),
        "init_conv.conv.weight": (("init_conv_kernel",), _t_conv_spatial),
        "init_conv.bias": (("init_conv_bias",), _t_id),
        "init_conv.conv.bias": (("init_conv_bias",), _t_id),
        "time_rel_pos_bias.relative_attention_bias.weight": (
            ("time_rel_pos_bias", "relative_attention_bias"), _t_id),
        "time_mlp.1.weight": (("time_mlp_1", "kernel"), _t_linear),
        "time_mlp.1.bias": (("time_mlp_1", "bias"), _t_id),
        "time_mlp.3.weight": (("time_mlp_2", "kernel"), _t_linear),
        "time_mlp.3.bias": (("time_mlp_2", "bias"), _t_id),
        "sign_emb.weight": (("sign_emb", "kernel"), _t_linear),
        "sign_emb.bias": (("sign_emb", "bias"), _t_id),
        "cond_token_to_hidden.0.weight": (
            ("cond_hidden_norm", "scale"), _t_id),
        "cond_token_to_hidden.0.bias": (("cond_hidden_norm", "bias"), _t_id),
        "cond_token_to_hidden.1.weight": (
            ("cond_hidden_1", "kernel"), _t_linear),
        "cond_token_to_hidden.1.bias": (("cond_hidden_1", "bias"), _t_id),
        "cond_token_to_hidden.3.weight": (
            ("cond_hidden_2", "kernel"), _t_linear),
        "cond_token_to_hidden.3.bias": (("cond_hidden_2", "bias"), _t_id),
        "null_text_token": (("null_text_token",), _t_id),
        "null_text_hidden": (("null_text_hidden",), _t_id),
        "final_conv.1.weight": (("final_conv_kernel",), _t_conv1x1),
        "final_conv.1.bias": (("final_conv_bias",), _t_id),
    }
    # signal embedding CNN (5 Conv1d stages at Sequential indices 0,2,4,6,8)
    for i in range(5):
        m[f"sign_emb_CNN.emb_model.{i * 2}.weight"] = (
            ("sign_emb_CNN", f"conv1d_{i}", "kernel"), _t_conv1d)
        m[f"sign_emb_CNN.emb_model.{i * 2}.bias"] = (
            ("sign_emb_CNN", f"conv1d_{i}", "bias"), _t_id)

    m.update(_attention_entries("init_temporal_attn",
                                ("init_temporal_attn",), wrapped=True))
    for i in range(num_resolutions):
        for stage, flax_side in (("downs", "down"), ("ups", "up")):
            p = f"{stage}.{i}"
            f = f"{flax_side}_{i}"
            m.update(_resnet_block_entries(f"{p}.0", (f + "_block1",)))
            m.update(_resnet_block_entries(f"{p}.1", (f + "_block2",)))
            m.update(_linear_attention_entries(f"{p}.2",
                                               (f + "_spatial_attn",)))
            m.update(_attention_entries(f"{p}.3", (f + "_temporal_attn",),
                                        wrapped=True))
        # down: stride-2 conv; up: transposed conv (possibly wrapped)
        for key in (f"downs.{i}.4.weight", f"downs.{i}.4.conv.weight"):
            m[key] = ((f"down_{i}_downsample", "kernel"), _t_conv_spatial)
        for key in (f"downs.{i}.4.bias", f"downs.{i}.4.conv.bias"):
            m[key] = ((f"down_{i}_downsample", "bias"), _t_id)
        for key in (f"ups.{i}.4.weight", f"ups.{i}.4.conv_transpose.weight"):
            m[key] = ((f"up_{i}_upsample", "kernel"), _t_conv_transpose)
        for key in (f"ups.{i}.4.bias", f"ups.{i}.4.conv_transpose.bias"):
            m[key] = ((f"up_{i}_upsample", "bias"), _t_id)

    m.update(_resnet_block_entries("mid_block1", ("mid_block1",)))
    m.update(_resnet_block_entries("mid_block2", ("mid_block2",)))
    m.update(_attention_entries("mid_spatial_attn", ("mid_spatial_attn",),
                                wrapped=True))
    m.update(_attention_entries("mid_temporal_attn", ("mid_temporal_attn",),
                                wrapped=True))
    m.update(_resnet_block_entries("final_conv.0", ("final_block",),
                                   has_time_mlp=False))
    return m


_SKIP_BUFFERS = {
    "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod", "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
    "posterior_variance", "posterior_log_variance_clipped",
    "posterior_mean_coef1", "posterior_mean_coef2",
}


def _strip_prefix(key: str) -> str:
    for prefix in ("module.", "denoise_fn."):
        if key.startswith(prefix):
            key = key[len(prefix):]
            return _strip_prefix(key)
    return key


def _expand_gru_keys(state: dict) -> dict:
    """Rewrite torch nn.GRU parameters (sign_emb_GRU.emb_model.weight_ih_l{k}
    etc., gate order r|z|n stacked along dim 0) into per-gate flax GRUCell
    leaves. Exact correspondence:

        flax ir/iz/in kernel = W_i{r,z,n}^T     flax h* kernel = W_h*^T
        flax ir/iz bias      = b_i* + b_h*      (flax hr/hz have no bias)
        flax in bias         = b_in             flax hn bias = b_hn

    (torch: n = tanh(W_in x + b_in + r*(W_hn h + b_hn)); flax GRUCell is the
    same formula with the i/h biases fused for r and z.)"""
    out = dict(state)
    for layer in range(8):
        wih = out.pop(f"sign_emb_GRU.emb_model.weight_ih_l{layer}", None)
        if wih is None:
            continue
        whh = out.pop(f"sign_emb_GRU.emb_model.weight_hh_l{layer}")
        bih = out.pop(f"sign_emb_GRU.emb_model.bias_ih_l{layer}")
        bhh = out.pop(f"sign_emb_GRU.emb_model.bias_hh_l{layer}")
        h = whh.shape[1]
        cell = f"sign_emb_GRU.__gru_cell_{layer}"
        for gi, gate in enumerate(("r", "z", "n")):
            sl = slice(gi * h, (gi + 1) * h)
            out[f"{cell}.i{gate}.kernel"] = np.ascontiguousarray(wih[sl].T)
            out[f"{cell}.h{gate}.kernel"] = np.ascontiguousarray(whh[sl].T)
        out[f"{cell}.ir.bias"] = bih[0:h] + bhh[0:h]
        out[f"{cell}.iz.bias"] = bih[h:2 * h] + bhh[h:2 * h]
        out[f"{cell}.in.bias"] = bih[2 * h:3 * h]
        out[f"{cell}.hn.bias"] = bhh[2 * h:3 * h]
    return out


def _gru_key_map() -> dict:
    m = {}
    for layer in range(8):
        cell = f"sign_emb_GRU.__gru_cell_{layer}"
        flax_cell = ("sign_emb_GRU", f"gru_cell_{layer}")
        for gate in ("ir", "iz", "in", "hr", "hz", "hn"):
            m[f"{cell}.{gate}.kernel"] = (
                flax_cell + (gate, "kernel"), _t_id)
        for gate in ("ir", "iz", "in", "hn"):
            m[f"{cell}.{gate}.bias"] = (flax_cell + (gate, "bias"), _t_id)
    return m


def import_state_dict(state: dict, params_template: dict,
                      num_resolutions: int = 4,
                      strict: bool = True) -> dict:
    """Map a {torch_key: np.ndarray} dict onto a copy of `params_template`
    (the flax variables dict {'params': {...}})."""
    import jax

    key_map = build_key_map(num_resolutions)
    key_map.update(_gru_key_map())
    state = _expand_gru_keys(
        {_strip_prefix(k): v for k, v in state.items()})
    out = jax.tree.map(np.asarray, params_template)

    def set_path(tree, path, value):
        node = tree["params"]
        for p in path[:-1]:
            if p not in node:
                raise KeyError(f"flax path {path} missing at {p}")
            node = node[p]
        leaf = node[path[-1]]
        if tuple(leaf.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch at {path}: ckpt {value.shape} vs "
                f"model {leaf.shape}")
        node[path[-1]] = value.astype(leaf.dtype)

    unused, missing = [], []
    hit_paths = set()
    for key, tensor in state.items():
        base = _strip_prefix(key)
        if base in _SKIP_BUFFERS or ".rotary_emb." in base:
            continue
        if base not in key_map:
            unused.append(key)
            continue
        path, transform = key_map[base]
        try:
            set_path(out, path, transform(np.asarray(tensor)))
            hit_paths.add(path)
        except KeyError:
            missing.append(key)

    if strict and unused:
        raise KeyError(f"unmapped checkpoint keys: {unused[:10]}"
                       f"{'...' if len(unused) > 10 else ''}")
    if strict and missing:
        # The reference instantiates some modules unconditionally even when
        # the config never uses them (to_q/to_k/to_v created for every
        # Attention, vddp.py:415-417; the whole-signal CNN/GRU embedders
        # exist alongside per-frame conditioning). Our model only creates
        # live parameters, so those checkpoint keys legitimately have no
        # destination; anything else missing is a structural mapping bug.
        dead = (".to_q.weight", ".to_k.weight", ".to_v.weight",
                "sign_emb_CNN.", "sign_emb_GRU.")
        real_missing = [k for k in missing
                        if not any(s in k for s in dead)]
        if real_missing:
            raise KeyError(
                f"checkpoint keys mapped to paths absent from the model: "
                f"{real_missing[:10]}"
                f"{'...' if len(real_missing) > 10 else ''}")
    return out


def state_dict_to_numpy(checkpoint_path: str, which: str = "ema") -> dict:
    """Load a reference checkpoint.pt and return {key: np.ndarray} for the
    requested entry ('model' or 'ema'). Requires torch (CPU)."""
    import torch

    obj = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    state = obj[which] if which in obj else obj
    return {k: v.detach().cpu().numpy() for k, v in state.items()
            if hasattr(v, "detach")}
