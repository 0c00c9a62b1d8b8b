"""Minimal torchvision.transforms shim: just the callables the reference
uses (vddp.py:10,1092,1101,1250-1254). ToTensor/ToPILImage are functional so
gif_to_tensor/video_tensor_to_gif work; the geometric transforms implement
the standard PIL semantics for the sizes the tests use."""

import numpy as np
import torch
from PIL import Image


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class ToTensor:
    def __call__(self, pic):
        arr = np.array(pic, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr).permute(2, 0, 1).contiguous()
        return t.float().div(255.0)


class ToPILImage:
    def __call__(self, tensor):
        arr = tensor.detach().cpu().numpy()
        arr = (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        arr = np.transpose(arr, (1, 2, 0))
        if arr.shape[-1] == 1:
            return Image.fromarray(arr[:, :, 0], mode="L")
        return Image.fromarray(arr)


class Resize:
    def __init__(self, size):
        self.size = size

    def __call__(self, img):
        if isinstance(self.size, int):
            w, h = img.size
            if min(w, h) == self.size:
                return img
            if w < h:
                return img.resize((self.size, int(self.size * h / w)),
                                  Image.BILINEAR)
            return img.resize((int(self.size * w / h), self.size),
                              Image.BILINEAR)
        return img.resize(tuple(self.size[::-1]), Image.BILINEAR)


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        w, h = img.size
        th, tw = self.size
        left = int(round((w - tw) / 2.0))
        top = int(round((h - th) / 2.0))
        return img.crop((left, top, left + tw, top + th))


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        if torch.rand(1).item() < self.p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img


class Lambda:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, x):
        return self.fn(x)
