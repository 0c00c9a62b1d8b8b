"""Minimal test shim for `einops_exts` (not installed) covering the two
symbols the reference uses (vddp.py:17): check_shape and rearrange_many."""

from einops import rearrange


def rearrange_many(tensors, pattern, **kwargs):
    return tuple(rearrange(t, pattern, **kwargs) for t in tensors)


def check_shape(tensor, pattern, **kwargs):
    names = pattern.split()
    assert tensor.ndim == len(names), (pattern, tuple(tensor.shape))
    for name, size in zip(names, tensor.shape):
        if name in kwargs:
            assert kwargs[name] == size, (pattern, tuple(tensor.shape), kwargs)
    return tensor
