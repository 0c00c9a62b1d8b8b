"""Minimal test shim for the `rotary_embedding_torch` package (not installed
in this image) so the reference implementation at /root/reference imports.

Reproduces exactly the behavior the reference uses (vddp.py:612,448-471):
`RotaryEmbedding(dim).rotate_queries_or_keys(t)` with lucidrains' interleaved
pair convention:

    inv_freq_i = theta^(-2i/dim)
    angle[n, 2i] = angle[n, 2i+1] = n * inv_freq_i
    out = t * cos(angle) + rotate_half(t) * sin(angle)
    rotate_half: (x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...)

Features beyond the first `dim` pass through unrotated.
"""

import torch
from torch import nn


def _rotate_half(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x.unbind(dim=-1)
    return torch.stack((-x2, x1), dim=-1).reshape(*x.shape[:-2], -1)


class RotaryEmbedding(nn.Module):
    def __init__(self, dim, theta=10000):
        super().__init__()
        inv_freq = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
        self.register_buffer("inv_freq", inv_freq)

    def rotate_queries_or_keys(self, t, seq_dim=-2):
        seq_len = t.shape[seq_dim]
        freqs = torch.einsum(
            "i,j->ij",
            torch.arange(seq_len, device=t.device,
                         dtype=self.inv_freq.dtype),
            self.inv_freq)
        freqs = freqs.repeat_interleave(2, dim=-1)        # (n, dim)
        rot_dim = freqs.shape[-1]
        t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
        t_rot = t_rot * freqs.cos() + _rotate_half(t_rot) * freqs.sin()
        if t_pass.shape[-1] == 0:
            return t_rot
        return torch.cat((t_rot, t_pass), dim=-1)
