"""Small shared utilities."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def count_parameters(params) -> int:
    """Number of scalars in a parameter pytree (src/utils.py:8-9)."""
    return sum(int(p.size) for p in jax.tree.leaves(params))


# UNet3D leaves the forward consumes via `.astype(compute_dtype)` — conv
# kernels/biases, attention projections, resampling convs. Everything NOT
# listed feeds float32 math (norm scales, FiLM/time MLPs, conditioning
# encoders, relative-bias tables, null tokens) and must stay float32.
# The full-Attention `to_qkv_kernel` is deliberately ABSENT: the temporal
# fast paths fold rotary + q-scale into it in float32 BEFORE the compute
# cast (models/unet3d.py:_folded_temporal_weights), and the folded result
# is loop-invariant (hoisted out of the sampling scan) so pre-casting it
# would change numerics without saving per-step traffic.
_CAST_LEAF_NAMES = frozenset((
    "conv_kernel", "conv_bias", "res_kernel", "res_bias",
    "init_conv_kernel", "init_conv_bias",
    "final_conv_kernel", "final_conv_bias",
    "to_out_kernel", "to_out_bias",
    "to_k_kernel", "to_v_kernel", "to_q_kernel",
))
_CAST_SCOPE_NAMES = frozenset(("to_q", "to_k", "to_v", "to_qkv"))


def cast_params_for_inference(params, dtype=jnp.bfloat16):
    """bf16 weight copies for sampling: cast the matmul/conv kernels of a
    UNet3D parameter tree to `dtype`, leaving fp32-math leaves untouched.

    Every cast leaf is one the forward pass itself casts to the compute
    dtype at the point of use, so under bf16 compute the result is
    BIT-IDENTICAL to sampling from the fp32 tree (same one-step rounding) —
    the only change is that each diffusion step reads half the weight bytes
    from HBM. The reference keeps fp16 AMP weight copies implicitly via
    accelerate (vddp.py:1419-1427); here the copy is explicit and lives only
    inside the sampling scan programs. Training always sees fp32 masters.

    Allowlist-based: unknown leaves (e.g. CNN/GRU conditioning encoders)
    conservatively stay float32."""
    def leaf(path, x):
        names = [getattr(k, "key", str(k)) for k in path]
        base = str(names[-1])
        scope = str(names[-2]) if len(names) > 1 else ""
        if base in _CAST_LEAF_NAMES:
            return x.astype(dtype)
        if base in ("kernel", "bias") and (
                scope in _CAST_SCOPE_NAMES
                or scope.endswith(("downsample", "upsample"))):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map_with_path(leaf, params)


