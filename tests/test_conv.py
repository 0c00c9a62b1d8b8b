"""Pseudo-3D conv parity vs torch Conv3d / ConvTranspose3d, including the
manual circular-padding recipes of the reference (vddp.py:163-243)."""

import numpy as np
import torch
import torch.nn.functional as F

from videometamaterials_tpu.ops.conv import (
    conv1x1,
    conv2d_spatial,
    conv_transpose2d_spatial,
)


def _to_torch_video(x):
    # (b, f, h, w, c) -> (b, c, f, h, w)
    return torch.tensor(x).permute(0, 4, 1, 2, 3)


def _from_torch_video(y):
    return y.permute(0, 2, 3, 4, 1).detach().numpy()


def _rand(shape, seed):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def _torch_kernel_3d(kernel):
    # HWIO (kh, kw, cin, cout) -> torch OIDHW (cout, cin, 1, kh, kw)
    k = torch.tensor(kernel).permute(3, 2, 0, 1).unsqueeze(2)
    return k


def test_conv3x3_zeros_matches_torch():
    x = _rand((2, 3, 6, 6, 4), 0)
    kernel = _rand((3, 3, 4, 5), 1)
    bias = _rand((5,), 2)
    got = np.asarray(conv2d_spatial(x, kernel, bias, padding_mode="zeros"))
    want = F.conv3d(_to_torch_video(x), _torch_kernel_3d(kernel),
                    torch.tensor(bias), padding=(0, 1, 1))
    np.testing.assert_allclose(got, _from_torch_video(want), rtol=1e-4,
                               atol=1e-5)


def test_conv7x7_init_matches_torch():
    x = _rand((1, 2, 9, 9, 3), 3)
    kernel = _rand((7, 7, 3, 8), 4)
    bias = _rand((8,), 5)
    got = np.asarray(conv2d_spatial(x, kernel, bias, padding_mode="zeros"))
    want = F.conv3d(_to_torch_video(x), _torch_kernel_3d(kernel),
                    torch.tensor(bias), padding=(0, 3, 3))
    np.testing.assert_allclose(got, _from_torch_video(want), rtol=1e-4,
                               atol=1e-5)


def test_conv_circular_matches_torch_circular_padding():
    x = _rand((2, 2, 6, 6, 4), 6)
    kernel = _rand((3, 3, 4, 4), 7)
    bias = _rand((4,), 8)
    got = np.asarray(conv2d_spatial(x, kernel, bias, padding_mode="circular"))
    xt = _to_torch_video(x)
    xt = F.pad(xt, (1, 1, 1, 1, 0, 0), mode="circular")
    want = F.conv3d(xt, _torch_kernel_3d(kernel), torch.tensor(bias))
    np.testing.assert_allclose(got, _from_torch_video(want), rtol=1e-4,
                               atol=1e-5)


def test_conv_circular_1d_matches_reference_recipe():
    """Horizontal wrap, vertical zeros (Circular_1d_Conv3d, vddp.py:218-237)."""
    x = _rand((1, 2, 5, 5, 3), 9)
    kernel = _rand((3, 3, 3, 3), 10)
    bias = _rand((3,), 11)
    got = np.asarray(conv2d_spatial(x, kernel, bias,
                                    padding_mode="circular_1d"))
    xt = _to_torch_video(x)
    xt = F.pad(xt, (1, 1, 0, 0, 0, 0), mode="circular")   # last dim = W
    xt = F.pad(xt, (0, 0, 1, 1, 0, 0), mode="constant")   # H zeros
    want = F.conv3d(xt, _torch_kernel_3d(kernel), torch.tensor(bias))
    np.testing.assert_allclose(got, _from_torch_video(want), rtol=1e-4,
                               atol=1e-5)


def test_downsample_matches_torch_stride2():
    x = _rand((2, 2, 8, 8, 4), 12)
    kernel = _rand((4, 4, 4, 4), 13)
    bias = _rand((4,), 14)
    got = np.asarray(conv2d_spatial(x, kernel, bias, stride=2, padding=1,
                                    padding_mode="zeros"))
    want = F.conv3d(_to_torch_video(x), _torch_kernel_3d(kernel),
                    torch.tensor(bias), stride=(1, 2, 2), padding=(0, 1, 1))
    assert got.shape == (2, 2, 4, 4, 4)
    np.testing.assert_allclose(got, _from_torch_video(want), rtol=1e-4,
                               atol=1e-5)


def _torch_transpose_kernel(kernel):
    """HWIO forward-orientation kernel -> torch ConvTranspose3d weight
    (cin, cout, 1, kh, kw) with spatial flip (see ops/conv.py docstring)."""
    k = torch.tensor(kernel)                       # (kh, kw, ci, co)
    k = torch.flip(k, dims=(0, 1)).permute(2, 3, 0, 1).unsqueeze(2)
    return k


def test_upsample_zeros_matches_torch_convtranspose():
    x = _rand((2, 2, 5, 5, 3), 15)
    kernel = _rand((4, 4, 3, 3), 16)
    bias = _rand((3,), 17)
    got = np.asarray(conv_transpose2d_spatial(x, kernel, bias,
                                              padding_mode="zeros"))
    want = F.conv_transpose3d(_to_torch_video(x),
                              _torch_transpose_kernel(kernel),
                              torch.tensor(bias), stride=(1, 2, 2),
                              padding=(0, 1, 1))
    assert got.shape == (2, 2, 10, 10, 3)
    np.testing.assert_allclose(got, _from_torch_video(want), rtol=1e-4,
                               atol=1e-5)


def test_upsample_circular_matches_reference_recipe():
    """CircularUpsample (vddp.py:163-185): wrap-pad input by 2, transposed
    conv with padding 5."""
    x = _rand((1, 2, 5, 5, 3), 18)
    kernel = _rand((4, 4, 3, 3), 19)
    bias = _rand((3,), 20)
    got = np.asarray(conv_transpose2d_spatial(x, kernel, bias,
                                              padding_mode="circular"))
    xt = _to_torch_video(x)
    xt = F.pad(xt, (2, 2, 2, 2, 0, 0), mode="circular")
    want = F.conv_transpose3d(xt, _torch_transpose_kernel(kernel),
                              torch.tensor(bias), stride=(1, 2, 2),
                              padding=(0, 5, 5))
    assert got.shape == (1, 2, 10, 10, 3)
    np.testing.assert_allclose(got, _from_torch_video(want), rtol=1e-4,
                               atol=1e-5)


def test_upsample_circular_1d_matches_reference_recipe():
    x = _rand((1, 2, 5, 5, 3), 21)
    kernel = _rand((4, 4, 3, 3), 22)
    bias = _rand((3,), 23)
    got = np.asarray(conv_transpose2d_spatial(x, kernel, bias,
                                              padding_mode="circular_1d"))
    xt = _to_torch_video(x)
    xt = F.pad(xt, (2, 2, 0, 0, 0, 0), mode="circular")
    xt = F.pad(xt, (0, 0, 2, 2, 0, 0), mode="constant")
    want = F.conv_transpose3d(xt, _torch_transpose_kernel(kernel),
                              torch.tensor(bias), stride=(1, 2, 2),
                              padding=(0, 5, 5))
    np.testing.assert_allclose(got, _from_torch_video(want), rtol=1e-4,
                               atol=1e-5)


def test_conv1x1_matches_torch():
    x = _rand((2, 3, 4, 4, 6), 24)
    kernel = _rand((6, 2), 25)
    bias = _rand((2,), 26)
    got = np.asarray(conv1x1(x, kernel, bias))
    w = torch.tensor(kernel).permute(1, 0).reshape(2, 6, 1, 1, 1)
    want = F.conv3d(_to_torch_video(x), w, torch.tensor(bias))
    np.testing.assert_allclose(got, _from_torch_video(want), rtol=1e-4,
                               atol=1e-5)
