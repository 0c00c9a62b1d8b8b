"""Video metamaterial dataset: multi-GIF channel stacks + stress-strain labels.

Re-design of the reference Dataset (vddp.py:1126-1397) for TPU feeding:

  - the per-item recipe is preserved exactly: decode GIF -> [0,1], un-normalize
    to the per-sample physical range (frame_range_data.csv), zero out void
    pixels (where topology == 0), re-normalize to the dataset-global range,
    select channels (vddp.py:1304-1394);
  - instead of per-item decoding in a dataloader worker pool, all GIFs are
    decoded ONCE into a packed uint8 cache (memory-mapped .npy); batches are
    materialized by a vectorized numpy transform — the whole dataset transform
    is a handful of fused multiplies, and batch assembly is pure slicing;
  - labels: 51-point stress curves interpolated to num_frames with the first
    eval point at 1% strain (vddp.py:1260-1269), normalized to [-1,1] with
    'global-min-max-2' fitted on the TRAINING set only (vddp.py:1276-1283);
  - min_max_values.csv is written with the exact reference format
    (vddp.py:1210-1246) so downstream FEM/visualization tooling is unchanged.

Directory contract (identical to the reference):
  <folder>/gifs/{topo,u_1,u_2,s_mises,s_22,ener}/<idx>.gif
  <folder>/frame_range_data.csv
  <folder>/stress_strain_data.csv
"""

from __future__ import annotations

import csv
import json
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from videometamaterials_tpu.data.gif_io import cast_num_frames, gif_to_array
from videometamaterials_tpu.data.normalization import Normalization

_LAGR_CHANNELS = ("u_1", "u_2", "s_mises", "s_22")
_EULER_CHANNELS = ("topo", "s_mises", "s_22", "ener")


def _sorted_gif_paths(folder: Path) -> list[Path]:
    paths = sorted(folder.glob("*.gif"), key=lambda p: int(p.stem))
    assert all(int(p.stem) == i for i, p in enumerate(paths)), \
        "file position is not equal to index"   # vddp.py:1150
    return paths


def interpolate_labels(labels: np.ndarray, num_frames: int,
                       strain: float = 0.2) -> np.ndarray:
    """51 -> num_frames interpolation, first eval point at 1% of max strain
    (vddp.py:1260-1269)."""
    given = np.linspace(0.0, strain, num=labels.shape[1])
    eval_pts = np.linspace(0.0, strain, num=num_frames)
    eval_pts[0] = 0.01 * strain
    return np.stack([np.interp(eval_pts, given, row) for row in labels])


class VideoDataset:
    def __init__(
        self,
        folder: str | Path,
        image_size: int,
        labels_scaling: Optional[Normalization] = None,
        selected_channels: Sequence[int] = (0, 1, 2, 3),
        num_frames: int = 16,
        per_frame_cond: bool = False,
        reference_frame: str = "eulerian",
        force_num_frames: bool = True,
        horizontal_flip: bool = False,
        rebuild_cache: bool = False,
        flip_seed: int = 0,
    ):
        self.folder = Path(folder)
        self.image_size = image_size
        self.selected_channels = list(selected_channels)
        self.num_frames = num_frames
        self.reference_frame = reference_frame
        # augmentation parity with T.RandomHorizontalFlip (vddp.py:1252);
        # default off, as in the reference entry point
        self.horizontal_flip = horizontal_flip
        self._flip_rng = np.random.default_rng(flip_seed)

        if reference_frame == "lagrangian" and num_frames == 1:
            # 2-channel topology/s_22 ablation (vddp.py:1370-1392)
            self.channel_names = ("topo", "s_22")
            self.selected_channels = [0, 1]
        elif reference_frame == "lagrangian":
            self.channel_names = _LAGR_CHANNELS
        elif reference_frame == "eulerian":
            self.channel_names = _EULER_CHANNELS
        else:
            raise ValueError(f"unknown reference_frame: {reference_frame}")

        # ---- per-sample physical ranges and dataset-global extrema
        self.frame_ranges = np.genfromtxt(self.folder / "frame_range_data.csv",
                                          delimiter=",").astype(np.float64)
        if self.frame_ranges.ndim == 1:
            self.frame_ranges = self.frame_ranges[None, :]
        self._compute_global_ranges()
        self._write_min_max_values()

        # ---- packed pixel cache
        self._cache = self._build_or_load_cache(rebuild_cache, force_num_frames)

        n = self._cache.shape[0]
        assert self.frame_ranges.shape[0] >= n, \
            "frame_range_data.csv rows must cover every sample"

        # ---- labels
        labels_np = np.genfromtxt(self.folder / "stress_strain_data.csv",
                                  delimiter=",").astype(np.float64)
        if labels_np.ndim == 1:
            labels_np = labels_np[None, :]
        if per_frame_cond:
            labels_np = interpolate_labels(labels_np, num_frames)
        else:
            # drop the all-zero first column (vddp.py:1271-1272)
            labels_np = labels_np[:, 1:]
        self.raw_labels = labels_np.astype(np.float32)
        if labels_scaling is None:
            self.labels_scaling = Normalization.fit(
                self.raw_labels, strategy="global-min-max-2")
        else:
            self.labels_scaling = labels_scaling
        self.labels = self.labels_scaling.normalize(self.raw_labels
                                                    ).astype(np.float32)

    # ------------------------------------------------------------------ cache
    def _cache_path(self) -> Path:
        tag = f"{self.reference_frame}_{self.image_size}_{self.num_frames}"
        return self.folder / f".packed_{tag}.npy"

    def _build_or_load_cache(self, rebuild: bool, force_num_frames: bool):
        path = self._cache_path()
        meta_path = path.with_suffix(".json")
        if path.exists() and meta_path.exists() and not rebuild:
            meta = json.loads(meta_path.read_text())
            if meta.get("channels") == list(self.channel_names):
                return np.load(path, mmap_mode="r")
        # decode every gif once; store uint8 (N, F, H, W, C)
        chans = {}
        for name in set(self.channel_names) | {"topo"}:
            chans[name] = _sorted_gif_paths(self.folder / "gifs" / name)
        n = len(chans["topo"])
        for name, paths in chans.items():
            assert len(paths) == n, (
                "number of files in fields and top folders are not equal.")
        assert n > 0, "could not find any gif files in folder"

        packed = np.zeros((n, self.num_frames, self.image_size,
                           self.image_size, len(self.channel_names) + 1),
                          dtype=np.uint8)
        for i in range(n):
            for c, name in enumerate(self.channel_names):
                vid = gif_to_array(chans[name][i], self.image_size,
                                   expected_frames=self.num_frames)
                if force_num_frames:
                    vid = cast_num_frames(vid, self.num_frames)
                packed[i, :, :, :, c] = vid
            topo = gif_to_array(chans["topo"][i], self.image_size,
                                expected_frames=self.num_frames)
            if force_num_frames:
                topo = cast_num_frames(topo, self.num_frames)
            packed[i, :, :, :, -1] = topo   # mask channel, always last
        np.save(path, packed)
        meta_path.write_text(json.dumps({"channels": list(self.channel_names)}))
        return np.load(path, mmap_mode="r")

    # ------------------------------------------------------- physical ranges
    def _compute_global_ranges(self):
        fr = self.frame_ranges
        if self.reference_frame == "eulerian":
            self.max_s_mises = fr[:, 0].max()
            self.min_s_22 = fr[:, 1].min()
            self.max_s_22 = fr[:, 2].max()
            self.max_strain_energy = fr[:, 3].max()
            self.zero_u_2 = None
        else:
            self.min_u_1 = fr[:, 0].min()
            self.max_u_1 = fr[:, 1].max()
            self.min_u_2 = fr[:, 2].min()
            self.max_u_2 = fr[:, 3].max()
            self.max_s_mises = fr[:, 4].max()
            self.min_s_22 = fr[:, 5].min()
            self.max_s_22 = fr[:, 6].max()
            self.max_strain_energy = fr[:, 7].max()
            # normalized pixel value of zero vertical displacement — used for
            # topology extraction downstream (vddp.py:1230)
            self.zero_u_2 = float(
                (0.0 - self.min_u_2) / (self.max_u_2 - self.min_u_2))

    def _write_min_max_values(self):
        """Exact reference CSV (vddp.py:1210-1246)."""
        if self.reference_frame == "eulerian":
            rows = [("max_s_mises", self.max_s_mises),
                    ("min_s_22", self.min_s_22),
                    ("max_s_22", self.max_s_22),
                    ("max_strain_energy", self.max_strain_energy)]
        else:
            rows = [("min_u_1", self.min_u_1), ("max_u_1", self.max_u_1),
                    ("min_u_2", self.min_u_2), ("max_u_2", self.max_u_2),
                    ("max_s_mises", self.max_s_mises),
                    ("min_s_22", self.min_s_22), ("max_s_22", self.max_s_22),
                    ("max_strain_energy", self.max_strain_energy)]
        with open(self.folder / "min_max_values.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerows([[k, float(v)] for k, v in rows])

    # ------------------------------------------------------------- transform
    def _per_sample_bounds(self, idx: np.ndarray):
        """(lo, hi) arrays of shape (B, C) for the per-sample physical
        un-normalization (vddp.py:1322-1324 / 1353-1356)."""
        fr = self.frame_ranges[idx]
        z = np.zeros(len(idx))
        if self.reference_frame == "eulerian":
            lo = np.stack([z, z, fr[:, 1], z], axis=1)
            hi = np.stack([np.ones(len(idx)), fr[:, 0], fr[:, 2], fr[:, 3]],
                          axis=1)
        elif self.num_frames == 1:   # lagrangian 1-frame ablation
            lo = np.stack([z, fr[:, 5]], axis=1)
            hi = np.stack([np.ones(len(idx)), fr[:, 6]], axis=1)
        else:
            lo = np.stack([fr[:, 0], fr[:, 2], z, fr[:, 5]], axis=1)
            hi = np.stack([fr[:, 1], fr[:, 3], fr[:, 4], fr[:, 6]], axis=1)
        return lo, hi

    def _global_bounds(self):
        if self.reference_frame == "eulerian":
            lo = np.array([0.0, 0.0, self.min_s_22, 0.0])
            hi = np.array([1.0, self.max_s_mises, self.max_s_22,
                           self.max_strain_energy])
        elif self.num_frames == 1:
            lo = np.array([0.0, self.min_s_22])
            hi = np.array([1.0, self.max_s_22])
        else:
            lo = np.array([self.min_u_1, self.min_u_2, 0.0, self.min_s_22])
            hi = np.array([self.max_u_1, self.max_u_2, self.max_s_mises,
                           self.max_s_22])
        return lo, hi

    def _masked_channel_slice(self):
        """Which channels get void pixels zeroed (vddp.py:1328-1329 masks
        channels 1..3 eulerian; 1360-1361 masks all lagrangian channels)."""
        if self.reference_frame == "eulerian":
            return slice(1, 4)
        if self.num_frames == 1:
            return slice(1, 2)
        return slice(0, 4)

    def __len__(self) -> int:
        return int(self._cache.shape[0])

    def get_batch(self, indices) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized reference recipe. Returns
        (videos float32 (B, F, H, W, C_sel) in [0,1], labels (B, L))."""
        idx = np.asarray(indices)
        raw = np.asarray(self._cache[idx], dtype=np.float32) / 255.0
        vids, topo = raw[..., :-1], raw[..., -1:]

        lo, hi = self._per_sample_bounds(idx)
        lo = lo[:, None, None, None, :].astype(np.float32)
        hi = hi[:, None, None, None, :].astype(np.float32)
        phys = vids * (hi - lo) + lo                      # un-normalize
        ms = self._masked_channel_slice()
        mask = (topo == 0.0)
        phys[..., ms] = np.where(mask, 0.0, phys[..., ms])  # void pixels -> 0

        glo, ghi = self._global_bounds()
        glo = glo[None, None, None, None, :].astype(np.float32)
        ghi = ghi[None, None, None, None, :].astype(np.float32)
        out = (phys - glo) / (ghi - glo)                  # global renorm

        out = out[..., self.selected_channels]
        if self.horizontal_flip:
            flips = self._flip_rng.random(len(idx)) < 0.5
            out[flips] = out[flips, :, :, ::-1, :]
        return np.ascontiguousarray(out), self.labels[idx]

    def __getitem__(self, index: int):
        v, l = self.get_batch([index])
        return v[0], l[0]
