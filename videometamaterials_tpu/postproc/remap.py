"""Lagrangian -> Eulerian pixel remapping and frame cleanup (host-side).

Re-design of src/utils.py:164-307: scatter pixel values by their displacement
maps (horizontal wrap-around, vertical clamp), hole-filling smoothing, outlier
artifact removal, and grid-GIF cropping. Scan-order/in-place semantics of the
reference loops are preserved where they affect results (smoothing cascades)."""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageSequence


def remove_artifacts(image: np.ndarray, threshold: float = 10,
                     check_isolated_pixels: bool = False) -> np.ndarray:
    """Replace pixels that deviate strongly from their 4-neighbor mean
    (src/utils.py:198-222). Mutates and returns `image`."""
    pixels = len(image)
    for i in range(pixels):
        for j in range(pixels):
            neighbors = []
            if i > 0:
                neighbors.append(image[i - 1, j])
            if i < pixels - 1:
                neighbors.append(image[i + 1, j])
            if j > 0:
                neighbors.append(image[i, j - 1])
            if j < pixels - 1:
                neighbors.append(image[i, j + 1])
            if check_isolated_pixels:
                avg_abs = np.mean(np.abs(neighbors))
                if np.abs(avg_abs - image[i, j]) > threshold \
                        and avg_abs < 1e-6:
                    image[i, j] = avg_abs
            else:
                if len(neighbors) == 4:
                    avg = np.mean(neighbors)
                    if np.abs(avg - image[i, j]) > threshold:
                        image[i, j] = avg
    return image


def smooth_frame(frame: np.ndarray, neighbors_required: int = 3,
                 recursive: bool = True) -> np.ndarray:
    """Fill zero pixels from >=3 nonzero neighbors until stable
    (src/utils.py:224-253), then remove outliers."""
    pixels = len(frame)
    out = frame.copy()
    update = True
    while update:
        update = False
        for i in range(pixels):
            for j in range(pixels):
                if out[i, j] == 0:
                    neighbors = []
                    if i > 0:
                        neighbors.append(out[i - 1, j])
                    if i < pixels - 1:
                        neighbors.append(out[i + 1, j])
                    if j > 0:
                        neighbors.append(out[i, j - 1])
                    if j < pixels - 1:
                        neighbors.append(out[i, j + 1])
                    nz = [v for v in neighbors if v != 0]
                    if len(nz) >= neighbors_required:
                        avg = np.mean(nz)
                        if avg != out[i, j]:
                            update = True
                            out[i, j] = avg
        if not recursive:
            break
    return remove_artifacts(out)


def update_pixel_positions(shift_x: np.ndarray, shift_y: np.ndarray,
                           pixel_values: np.ndarray,
                           bin_data: np.ndarray) -> np.ndarray:
    """Scatter Lagrangian pixel values to Eulerian positions per frame:
    x wraps periodically, y clamps to the frame (src/utils.py:255-270)."""
    frames, pixels, _ = shift_x.shape
    result = np.zeros((frames, pixels, pixels))
    for f in range(frames):
        for x_l in range(pixels):
            for y_l in range(pixels):
                x_e = (x_l + shift_x[f, y_l, x_l]) % pixels
                y_e = y_l - shift_y[f, y_l, x_l]
                if 0 <= y_e < pixels and bin_data[f, y_l, x_l] != 0:
                    result[f, int(y_e), int(x_e)] = pixel_values[f, y_l, x_l]
        result[f] = smooth_frame(result[f])
    return result


def convert_isolated_pixels_gif(gif_path: str) -> None:
    """Make isolated (all-transparent-neighbor) pixels transparent in an RGBA
    GIF (src/utils.py:164-196)."""
    import imageio

    img = Image.open(gif_path)
    frames = []
    offsets = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    for frame in ImageSequence.Iterator(img):
        frame = frame.convert("RGBA")
        data = frame.load()
        width, height = frame.size
        for y in range(height):
            for x in range(width):
                r, g, b, a = data[x, y]
                if a == 0:
                    continue
                isolated = True
                for dx, dy in offsets:
                    nx_, ny_ = x + dx, y + dy
                    if 0 <= nx_ < width and 0 <= ny_ < height:
                        if data[nx_, ny_][3] != 0:
                            isolated = False
                            break
                if isolated:
                    data[x, y] = (r, g, b, 0)
        frames.append(frame)
    imageio.v3.imwrite(gif_path, frames, plugin="pillow", mode="RGBA",
                       duration=200, loop=0, disposal=2, quantize=256)


def grid_gif_to_array(path: str) -> tuple[np.ndarray, int, int]:
    """Decode a (possibly grid-tiled) prediction GIF to (F, H, W) uint8 and
    return the grid extent in 100px cells (src/utils.py:272-290)."""
    import imageio

    reader = imageio.get_reader(path)
    first = reader.get_data(0)
    tot_rows, tot_cols = first.shape[0] // 100, first.shape[1] // 100
    if tot_rows == 0 and tot_cols == 0:
        tot_rows, tot_cols = 1, 1
    num_frames = reader.get_length()
    if num_frames != 11:
        print("Warning: Number of frames of provided gif is not 11. This is "
              "likely due to convergence problems in the simulation.")
    if tot_rows == 1 and tot_cols == 1:
        # single cell: a bare 96x96 FEM gif or a 100x100 padded grid cell
        # (the reference hardcodes 96 here, src/utils.py:281, and would crash
        # on padded 1x1 grids)
        frames = np.zeros((num_frames, first.shape[0], first.shape[1]),
                          dtype=np.uint8)
    else:
        frames = np.zeros((num_frames, 100 * tot_rows, 100 * tot_cols),
                          dtype=np.uint8)
    for i in range(num_frames):
        frame = reader.get_data(i)
        if frame.ndim == 3:
            frame = frame[:, :, 0]
        frames[i] = frame
    reader.close()
    return frames, tot_rows, tot_cols


def crop_gif(path: str, row: int, col: int, save: bool = True):
    """Extract one 96x96 cell (2px unpad) from a grid GIF
    (src/utils.py:292-307)."""
    import imageio

    frames, tot_rows, tot_cols = grid_gif_to_array(path)
    if row >= tot_rows or col >= tot_cols:
        raise IndexError(
            f"grid cell ({row},{col}) out of range for a {tot_rows}x"
            f"{tot_cols} prediction grid in {path}")
    if not (tot_rows == 1 and tot_cols == 1):
        frames = frames[:, row * 100:(row + 1) * 100,
                        col * 100:(col + 1) * 100].astype(np.uint8)
        pad = 2
        frames = frames[:, pad:-pad, pad:-pad]
    elif frames.shape[-1] == 100:
        # 1x1 padded grid cell
        frames = frames[:, 2:-2, 2:-2]
    if save:
        out = path[:-4] + f"-{row}-{col}.gif"
        imageio.mimsave(out, list(frames), duration=0.2)
        return None
    return frames
