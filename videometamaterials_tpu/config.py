"""Typed configuration covering the reference's three config tiers.

Reference tiers (SURVEY.md §5.6):
  1. YAML hyperparameters (/root/reference/model.yaml:1-25)
  2. hardcoded user-input block (/root/reference/main.py:11-28)
  3. fixed architecture constants living in code (/root/reference/main.py:62-115)

Here everything is a typed dataclass, YAML round-trippable, snapshot per run
(config immutability contract of /root/reference/main.py:44-60).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from pathlib import Path
from typing import Sequence

import yaml


@dataclass(frozen=True)
class ModelConfig:
    """Mirrors the keys of the reference model.yaml exactly (model.yaml:1-25),
    plus the architecture constants hardwired in main.py (image_size=96,
    num_frames=11, dim_mults, init_kernel_size, loss type)."""

    # training and model configuration (model.yaml:2-10)
    batch_size: int = 4                       # per-device batch size
    learning_rate: float = 1e-4
    selected_channels: Sequence[int] = (0, 1, 3)
    train_timesteps: int = 256
    sampling_timesteps: int = 256             # DDIM iff sampling < train (vddp.py:909-911)
    use_dynamic_thres: bool = True

    # architecture configuration (model.yaml:12-22)
    reference_frame: str = "lagrangian"       # 'lagrangian' | 'eulerian'
    padding_mode: str = "zeros"               # 'zeros' | 'circular_1d' | 'circular'
    unet_dim: int = 64
    unet_attn_dim_head: int = 32
    unet_attn_heads: int = 8
    unet_resnet_groups: int = 8
    unet_cond_attention: str = "self-stacked" # 'none' | 'self-stacked' | 'cross-attention'
    unet_cond_to_time: str = "add"            # 'add' | 'concat'
    unet_temporal_att_cond: bool = True
    unet_use_sparse_linear_attn: bool = True
    per_frame_cond: bool = True

    # ablation-only (model.yaml:24-25)
    unet_cond_att_GRU: bool = False
    unet_cond_attention_tokens: int = 16

    # constants fixed in reference code, configurable here (main.py:62-91)
    image_size: int = 96
    num_frames: int = 11
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    init_kernel_size: int = 7
    loss_type: str = "l1"                     # 'l1' | 'l2'
    dynamic_thres_percentile: float = 0.9
    ddim_sampling_eta: float = 0.0

    # TPU-native additions (no reference counterpart)
    compute_dtype: str = "bfloat16"           # activations; params stay float32
    sample_scan_chunk: int | None = 64        # sampler scan segment length
                                              # (None = one fused scan)
    dynamic_thres_method: str = "bisect"      # 'bisect' | 'sort' (torch-exact)
    cfg_rescale: float = 0.0                  # CFG-rescale phi (Lin et al.
                                              # 2023): per-sample std of the
                                              # guided eps restored to the
                                              # conditional's, blended by phi.
                                              # 0 = off (reference parity)
    cfg_shared_init: bool = True              # run the cond-independent init
                                              # conv + init temporal attn once
                                              # per CFG pair (bit-identical;
                                              # see diffusion/gaussian.py)
    use_fused_linear_block: bool | str | int = False  # Pallas fused spatial
                                              # linear-attention block on TPU:
                                              # False | 'level0' | 'all'/True
                                              # | int N (blocks with dim<=N)
    use_fused_temporal_block: bool | str | int = False  # Pallas fused
                                              # temporal-attention block
                                              # (same tri-state form)
    fused_blocks_in_training: bool = False    # the fused kernels' custom-VJP
                                              # backward RECOMPUTES the XLA
                                              # forward, so inside grad they
                                              # cost kernel_fwd + xla_fwd +
                                              # xla_bwd; by default the train
                                              # step therefore uses the plain
                                              # XLA plans (same param tree)
                                              # and only sampling/eval runs
                                              # the kernels
    temporal_s_tile: int | None = None        # s-tiled XLA temporal plan:
                                              # scan over spatial tiles of
                                              # this size (None = untiled)
    temporal_vjp: str | None = None           # fused temporal backward plan:
                                              # 'recompute' | 'saved' (kernel
                                              # emits softmax weights; XLA bwd
                                              # skips the sim/softmax
                                              # recompute) | 'kernel'; None =
                                              # env VMT_TEMPORAL_VJP/default
    bf16_inference_weights: bool = True       # bf16 weight copies inside the
                                              # sampling scans (bit-identical
                                              # under bf16 compute; halves
                                              # per-step weight HBM reads)
    fused_bwd_kernels: bool = False           # whole-block BACKWARD kernels
                                              # under grad for the fused
                                              # blocks (pairs with
                                              # fused_blocks_in_training)
    remat_blocks: bool = False                # jax.checkpoint the Resnet
                                              # blocks: recompute instead of
                                              # store activations in the bwd
                                              # (math-exact; fits larger
                                              # per-chip batches)

    @property
    def channels(self) -> int:
        return len(self.selected_channels)

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class TrainerConfig:
    """Trainer knobs hardwired in the reference entry point (main.py:96-117,
    vddp.py:1401-1425)."""

    train_num_steps: int = 200_000
    save_and_sample_every: int = 10_000
    ema_decay: float = 0.995
    ema_update_every: int = 10                # vddp.py:1414
    ema_start_step: int = 2000                # vddp.py:1413 (reset before this)
    null_cond_prob: float = 0.1               # main.py:109
    guidance_scale: float = 5.0               # main.py:24
    num_preds: int = 1                        # main.py:21
    num_samples: int = 3                      # main.py:117
    max_grad_norm: float | None = None
    gradient_accumulate_every: int = 1        # micro-batches per optimizer
                                              # step (vddp.py:1620 accumulate)
    horizontal_flip: bool = False             # train-set augmentation
                                              # (vddp.py:1134,1252)
    test_batch_size: int = 2                  # halved vs train (vddp.py:1460)
    seed: int = 0
    log: bool = True
    prob_focus_present: float = 0.0
    checkpoint_backend: str = "msgpack"   # 'msgpack' | 'orbax' (async)
    keep_last_checkpoints: int | None = None  # None = keep every milestone
    # Milestone guided-fidelity probe: guided fidelity wanders ~3x across
    # checkpoints while val loss is flat (BENCH_NOTES rounds 3-4), so every
    # milestone guided-samples a fixed tiny arm (n_targets x n_preds at the
    # shipping guidance scale, traced (w, phi) operands) and logs its
    # best-of-N pixel-curve NRMSE next to the validation loss — checkpoint
    # selection no longer needs a post-hoc sweep (improves on the val-loss-
    # only milestone signal of vddp.py:1674-1753).
    fidelity_probe_targets: str | None = None  # target_responses.csv path
    fidelity_probe_n_targets: int = 2
    fidelity_probe_preds: int = 2

    def replace(self, **kw) -> "TrainerConfig":
        return dataclasses.replace(self, **kw)


# Keys as they appear in the reference model.yaml, in reference order, so a
# saved snapshot is drop-in readable by the reference implementation too.
_REFERENCE_YAML_KEYS = (
    "batch_size",
    "learning_rate",
    "selected_channels",
    "train_timesteps",
    "sampling_timesteps",
    "use_dynamic_thres",
    "reference_frame",
    "padding_mode",
    "unet_dim",
    "unet_attn_dim_head",
    "unet_attn_heads",
    "unet_resnet_groups",
    "unet_cond_attention",
    "unet_cond_to_time",
    "unet_temporal_att_cond",
    "unet_use_sparse_linear_attn",
    "per_frame_cond",
    "unet_cond_att_GRU",
    "unet_cond_attention_tokens",
)


def load_model_yaml(path: str | Path) -> ModelConfig:
    """Load a ModelConfig from YAML. Accepts both the reference's flat
    model.yaml schema and files that include this framework's extra keys."""
    raw = yaml.safe_load(Path(path).read_text()) or {}
    known = {f.name for f in dataclasses.fields(ModelConfig)}
    unknown = set(raw) - known
    if unknown:
        raise ValueError(f"unknown config keys in {path}: {sorted(unknown)}")
    if "selected_channels" in raw:
        raw["selected_channels"] = tuple(raw["selected_channels"])
    if "dim_mults" in raw:
        raw["dim_mults"] = tuple(raw["dim_mults"])
    return ModelConfig(**raw)


def save_model_yaml(cfg: ModelConfig, path: str | Path,
                    reference_compatible: bool = False) -> None:
    """Snapshot a config per run (the contract of main.py:44-60).

    With reference_compatible=True only the original model.yaml keys are
    written so the file can configure the reference implementation as-is."""
    d = dataclasses.asdict(cfg)
    d["selected_channels"] = list(d["selected_channels"])
    d["dim_mults"] = list(d["dim_mults"])
    if reference_compatible:
        d = {k: d[k] for k in _REFERENCE_YAML_KEYS}
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(yaml.safe_dump(d, sort_keys=False))


def snapshot_run_config(cfg: ModelConfig, run_dir: str | Path) -> Path:
    """Create runs/<name>/model/model.yaml once; re-read it on resume.
    Mirrors the per-run immutability behavior of main.py:44-60."""
    run_dir = Path(run_dir)
    yaml_path = run_dir / "model" / "model.yaml"
    if yaml_path.exists():
        return yaml_path
    (run_dir / "training").mkdir(parents=True, exist_ok=True)
    (run_dir / "model").mkdir(parents=True, exist_ok=True)
    save_model_yaml(cfg, yaml_path)
    return yaml_path
