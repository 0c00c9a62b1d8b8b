"""GIF <-> array conversion (host-side I/O layer).

Parity with the reference's PIL-based helpers (vddp.py:1071-1124):
  gif_to_array    decodes all frames, single channel, uint8 (F, H, W)
  array_to_gif    writes a (F, H, W) float [0,1] tensor as an L->P palette GIF
                  (the reference's video_tensor_to_gif with optimize=False)
  cast_num_frames truncate or zero-pad the frame axis
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def seek_all_frames(img: Image.Image, mode: str = "L"):
    i = 0
    while True:
        try:
            img.seek(i)
            yield img.convert(mode)
        except EOFError:
            break
        i += 1


def gif_to_array(path: str | Path, image_size: int | None = None,
                 expected_frames: int | None = None) -> np.ndarray:
    """Decode a single-channel GIF to uint8 (F, H, W). If image_size is given
    and differs, frames are resized (bilinear) + center-cropped like the
    reference transform pipeline (vddp.py:1250-1255).

    GIF encoders (Pillow, imageio) merge identical consecutive frames into a
    single frame with an extended duration. When `expected_frames` is given
    and fewer frames decode, the merge is inverted by repeating each frame in
    proportion to its duration — reconstructing the true frame sequence."""
    img = Image.open(path)
    frames, durations = [], []
    i = 0
    while True:
        try:
            img.seek(i)
        except EOFError:
            break
        durations.append(float(img.info.get("duration", 0) or 0))
        frame = img.convert("L")
        if image_size is not None and frame.size != (image_size, image_size):
            w, h = frame.size
            scale = image_size / min(w, h)
            frame = frame.resize((round(w * scale), round(h * scale)),
                                 Image.BILINEAR)
            w, h = frame.size
            left = (w - image_size) // 2
            top = (h - image_size) // 2
            frame = frame.crop((left, top, left + image_size,
                                top + image_size))
        frames.append(np.asarray(frame, dtype=np.uint8))
        i += 1

    if expected_frames is not None and 0 < len(frames) < expected_frames:
        total = sum(durations)
        if total <= 0:
            reps = [expected_frames // len(frames)] * len(frames)
            reps[-1] += expected_frames - sum(reps)
        else:
            # exact proportional expansion via cumulative rounding: rounding
            # error stays within +-0.5 frame at every boundary and the total
            # always equals expected_frames (no drift dumped on the tail)
            edges = np.round(np.cumsum(durations)
                             * expected_frames / total).astype(int)
            reps = np.diff(np.concatenate([[0], edges])).tolist()
        frames = [f for f, r in zip(frames, reps) for _ in range(r)]
    return np.stack(frames, axis=0)


def array_to_gif(video: np.ndarray, path: str | Path, duration: int = 200,
                 loop: int = 0) -> None:
    """video: (F, H, W) float in [0,1] or uint8. Saved with the reference's
    L->P palette conversion (vddp.py:1091-1098)."""
    if video.dtype != np.uint8:
        video = np.clip(np.round(np.asarray(video) * 255.0), 0, 255
                        ).astype(np.uint8)
    images = [Image.fromarray(f, mode="L").convert("P") for f in video]
    images[0].save(str(path), save_all=True, append_images=images[1:],
                   duration=duration, loop=loop, optimize=False)


def cast_num_frames(video: np.ndarray, frames: int) -> np.ndarray:
    """Truncate or zero-pad the leading frame axis (vddp.py:1115-1124)."""
    f = video.shape[0]
    if f == frames:
        return video
    if f > frames:
        return video[:frames]
    pad = [(0, frames - f)] + [(0, 0)] * (video.ndim - 1)
    return np.pad(video, pad)
