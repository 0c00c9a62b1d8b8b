"""Conditioning and position embedding modules.

- SinusoidalPosEmb: log-spaced sin||cos timestep embedding (vddp.py:139-151).
- RelativePositionBias: learned T5 bucket bias for temporal attention
  (vddp.py:70-108); the bucket table is a compile-time constant since the
  frame count is static under jit.
- SignalEmbedding: whole-signal CNN/GRU encoder of the stress-strain curve;
  ablation-only in the reference (used when per_frame_cond=False,
  vddp.py:538-572).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from videometamaterials_tpu.ops.relative_bias import temporal_bucket_table


class SinusoidalPosEmb(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        scale = math.log(10000.0) / (half - 1)
        freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -scale)
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class RelativePositionBias(nn.Module):
    heads: int = 8
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, num_frames: int) -> jnp.ndarray:
        """Returns (heads, n, n) float32 bias."""
        table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(stddev=1.0),
            (self.num_buckets, self.heads), jnp.float32)
        buckets = temporal_bucket_table(
            num_frames, num_buckets=self.num_buckets,
            max_distance=self.max_distance)
        values = table[jnp.asarray(buckets)]          # (n, n, heads)
        return jnp.transpose(values, (2, 0, 1))


class SignalEmbedding(nn.Module):
    """CNN: five stride-2 Conv1d(k=4,p=1) + SiLU stages over the 1-channel
    signal; GRU: 3-layer GRU, last hidden sequence output. Output dim =
    channel_upsamplings[-1] (=cond_dim). Parity: vddp.py:538-572."""

    cond_arch: str                       # 'CNN' | 'GRU'
    init_channel: int = 1
    channel_upsamplings: Sequence[int] = (16, 32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.cond_arch == "CNN":
            # x: (b, L) -> (b, L, 1) channels-last 1D conv stack
            h = x[..., None].astype(self.dtype)
            chans = [self.init_channel, *self.channel_upsamplings]
            for i, (cin, cout) in enumerate(zip(chans[:-1], chans[1:])):
                h = nn.Conv(cout, kernel_size=(4,), strides=(2,),
                            padding=[(1, 1)], dtype=self.dtype,
                            name=f"conv1d_{i}")(h)
                h = nn.silu(h)
            # length collapses 51 -> 1 over 5 stride-2 stages; squeeze like
            # torch.squeeze (vddp.py:571)
            return h.reshape(h.shape[0], -1, h.shape[-1]).mean(axis=1) \
                if h.shape[1] > 1 else h[:, 0, :]
        elif self.cond_arch == "GRU":
            # x: (b, L) -> tokens (b, L, hidden): top layer of a 3-layer GRU,
            # full hidden sequence (torch nn.GRU batch_first output).
            h = x[..., None].astype(jnp.float32)
            hidden = self.channel_upsamplings[-1]
            for layer in range(3):
                # cell named explicitly so its params nest deterministically
                # (torch_import maps nn.GRU weight_ih/hh_l{k} onto them)
                h = nn.RNN(nn.GRUCell(features=hidden,
                                      name=f"gru_cell_{layer}"),
                           name=f"gru_l{layer}")(h)
            return h.astype(self.dtype)
        else:
            raise ValueError(f"Unknown architecture: {self.cond_arch}")
