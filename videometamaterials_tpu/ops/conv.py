"""Pseudo-3D (spatial-only) convolutions for video tensors, TPU-native.

The reference uses torch Conv3d/ConvTranspose3d with kernels (1, k, k) — i.e.
no temporal mixing (vddp.py:153-243, 267-285, 625-628). On TPU we therefore
fold frames into the batch axis and run true 2D NHWC convolutions, which XLA
tiles directly onto the MXU; a Conv3d with a size-1 depth kernel would only
obscure that.

Layout: video tensors are (B, F, H, W, C) throughout the framework; kernels
are HWIO. Three padding modes with parity to the reference:
  'zeros'       symmetric zero padding (torch padding_mode='zeros')
  'circular'    periodic in both H and W (manual wrap-pad + VALID conv,
                the trick at vddp.py:163-237)
  'circular_1d' periodic in W (horizontal) only, zeros in H (vddp.py:218-237)

Transposed conv (Upsample, kernel (1,4,4), stride (1,2,2), padding (0,1,1))
is expressed as an input-dilated forward convolution so all padding modes are
uniform: conv_transpose(x, W; s, p) == conv(dilate(x, s), flipped(W); pad k-1-p).
For the circular variants the reference wrap-pads the input by k-1-p=2 first
and lets the layer crop (vddp.py:172-185); here that crop is a negative pad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# dimension numbers for (N, H, W, C) x (H, W, I, O)
_DN = lax.ConvDimensionNumbers(
    lhs_spec=(0, 3, 1, 2),
    rhs_spec=(3, 2, 0, 1),
    out_spec=(0, 3, 1, 2),
)
_DN_STR = ("NHWC", "HWIO", "NHWC")


def _fold_frames(x: jnp.ndarray):
    b, f, h, w, c = x.shape
    return x.reshape(b * f, h, w, c), (b, f)


def _unfold_frames(y: jnp.ndarray, bf) -> jnp.ndarray:
    b, f = bf
    return y.reshape(b, f, *y.shape[1:])


def _wrap_pad_2d(x: jnp.ndarray, pad_h: int, pad_w: int, mode: str) -> jnp.ndarray:
    """Pad H and W of an (N, H, W, C) tensor per padding mode; 'zeros' is a
    no-op here (handled by the conv's own padding)."""
    if mode == "zeros" or (pad_h == 0 and pad_w == 0):
        return x
    if mode == "circular":
        return jnp.pad(x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)), mode="wrap")
    if mode == "circular_1d":
        # horizontal (W) periodic, vertical (H) zeros — vddp.py:228-234
        x = jnp.pad(x, ((0, 0), (0, 0), (pad_w, pad_w), (0, 0)), mode="wrap")
        return jnp.pad(x, ((0, 0), (pad_h, pad_h), (0, 0), (0, 0)), mode="constant")
    raise ValueError(f"unknown padding mode: {mode}")


def conv2d_spatial(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None,
                   *, stride: int = 1, padding: int | None = None,
                   padding_mode: str = "zeros") -> jnp.ndarray:
    """Spatial conv over a (B, F, H, W, C) video; kernel (kh, kw, Cin, Cout).

    `padding` defaults to (k-1)//2 (the reference's SAME-style padding)."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    if padding is None:
        assert kh % 2 == 1 and kw % 2 == 1
        padding = kh // 2
    xf, bf = _fold_frames(x)
    if padding_mode == "zeros":
        pad = [(padding, padding), (padding, padding)]
    else:
        xf = _wrap_pad_2d(xf, padding, padding, padding_mode)
        pad = [(0, 0), (0, 0)]
    y = lax.conv_general_dilated(
        xf, kernel.astype(xf.dtype),
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=_DN_STR,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return _unfold_frames(y, bf)


def conv_transpose2d_spatial(x: jnp.ndarray, kernel: jnp.ndarray,
                             bias: jnp.ndarray | None, *,
                             stride: int = 2, kernel_size: int = 4,
                             padding: int = 1,
                             padding_mode: str = "zeros") -> jnp.ndarray:
    """Transposed spatial conv (the Upsample op, vddp.py:153-159): kernel 4,
    stride 2, padding 1 -> exact 2x upsampling. kernel is (kh, kw, Cin, Cout)
    in *forward-conv* orientation (pre-flipped relative to torch's
    ConvTranspose weight; the checkpoint importer performs the flip)."""
    k, s, p = kernel_size, stride, padding
    edge = k - 1 - p  # forward-conv edge padding equivalent to transposed pad p
    xf, bf = _fold_frames(x)
    if padding_mode == "zeros":
        pad = [(edge, edge), (edge, edge)]
    else:
        # Reference recipe (vddp.py:172-185): wrap-pad the *input* by
        # edge = k-1-p per side, then let the transposed conv crop the excess.
        # Its layer padding P' = k+s+p-2, so the equivalent forward-conv pad is
        # k-1-P' = 1-s-p (negative => crop of the dilated, wrapped input).
        xf = _wrap_pad_2d(xf, edge, edge, padding_mode)
        crop = 1 - s - p
        pad = [(crop, crop), (crop, crop)]
    y = lax.conv_general_dilated(
        xf, kernel.astype(xf.dtype),
        window_strides=(1, 1),
        padding=pad,
        lhs_dilation=(s, s),
        dimension_numbers=_DN_STR,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return _unfold_frames(y, bf)


def conv1x1(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Pointwise channel mix on channels-last tensors of any rank: a matmul,
    which XLA maps straight onto the MXU (torch Conv3d(dim, out, 1))."""
    y = jnp.einsum("...i,io->...o", x, kernel.astype(x.dtype))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
