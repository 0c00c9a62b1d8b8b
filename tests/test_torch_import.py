"""Torch checkpoint importer: synthetic state dicts in reference layouts must
land on the right flax leaves with the right transforms."""

import jax
import numpy as np
import pytest

from videometamaterials_tpu.models import UNet3D
from videometamaterials_tpu.training.torch_import import (
    _t_conv1d,
    _t_conv1x1,
    _t_conv_spatial,
    _t_conv_transpose,
    _t_gamma,
    _t_linear,
    build_key_map,
    import_state_dict,
)

_INVERSE_SHAPES = {
    _t_linear: lambda s: (s[1], s[0]),
    _t_conv_spatial: lambda s: (s[3], s[2], 1, s[0], s[1]),
    _t_conv1x1: lambda s: (s[1], s[0], 1, 1, 1),
    _t_conv_transpose: lambda s: (s[2], s[3], 1, s[0], s[1]),
    _t_conv1d: lambda s: (s[2], s[1], s[0]),
    _t_gamma: lambda s: (1, s[0], 1, 1, 1),
}


def _tiny_unet():
    return UNet3D(dim=8, dim_mults=(1, 2), channels=3, attn_heads=2,
                  attn_dim_head=4, use_sparse_linear_attn=True,
                  use_temporal_attention_cond=True, per_frame_cond=True,
                  compute_dtype="float32")


def _flax_leaf(params, path):
    node = params["params"]
    for p in path:
        if p not in node:
            return None
        node = node[p]
    return node


def test_import_roundtrip_places_every_leaf():
    model = _tiny_unet()
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp
    x = jnp.zeros((1, 3, 8, 8, 3))
    params = model.init(rng, x, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1, 3)))

    key_map = build_key_map(num_resolutions=2)
    rng_np = np.random.default_rng(0)
    state, expected = {}, {}
    for torch_key, (path, transform) in key_map.items():
        leaf = _flax_leaf(params, path)
        if leaf is None:
            continue                      # param not present in this config
        if torch_key in expected:
            continue
        inv = _INVERSE_SHAPES.get(transform, lambda s: s)
        torch_shape = inv(tuple(leaf.shape))
        # skip alias keys (e.g. '.conv.weight' circular variants)
        if any(k in torch_key for k in (".proj.conv.", ".4.conv.",
                                        ".conv_transpose.")):
            continue
        arr = rng_np.normal(size=torch_shape).astype(np.float32)
        state["module.denoise_fn." + torch_key] = arr
        expected[path] = transform(arr)

    # the map's load-bearing destinations must EXIST in the template — a
    # missing path means leaf placement silently no-ops (the round-1 flax
    # scoping bug hid exactly this way; see tests/test_reference_parity.py)
    for path in [("init_temporal_attn", "attn", "to_qkv_kernel"),
                 ("init_temporal_attn", "attn", "to_out_kernel"),
                 ("down_0_temporal_attn", "attn", "to_k_kernel"),
                 ("down_0_spatial_attn", "attn", "to_qkv", "kernel"),
                 ("down_0_spatial_attn", "attn", "to_out_kernel"),
                 ("mid_spatial_attn", "attn", "to_v_kernel"),
                 ("up_1_temporal_attn", "attn", "to_qkv_kernel")]:
        assert _flax_leaf(params, path) is not None, path

    imported = import_state_dict(state, params, num_resolutions=2)
    n_checked = 0
    for path, want in expected.items():
        got = _flax_leaf(imported, path)
        np.testing.assert_allclose(np.asarray(got), want, err_msg=str(path))
        n_checked += 1
    # every major component must be covered
    assert n_checked > 80


def test_import_rejects_unknown_keys_when_strict():
    model = _tiny_unet()
    import jax.numpy as jnp
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 8, 8, 3)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3)))
    with pytest.raises(KeyError):
        import_state_dict({"not.a.real.key": np.zeros((1,))}, params,
                          num_resolutions=2)
    # rotary buffers and diffusion schedule buffers are silently skipped
    out = import_state_dict(
        {"betas": np.zeros((8,)),
         "init_temporal_attn.fn.fn.fn.rotary_emb.freqs": np.zeros((2,))},
        params, num_resolutions=2)
    assert out is not None
