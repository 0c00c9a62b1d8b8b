#!/usr/bin/env python
"""Entry point: train + guided target evaluation.

CLI re-design of the reference main.py:9-121 (which uses a hardcoded
user-input block): run-dir management with per-run config snapshot, model /
diffusion / trainer construction, training, then eval_target on the published
target stress-strain curves.

Usage:
    python main.py --run-name my_run --data-root ./data
    python main.py --run-name pretrained --load-model-step 200000
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import jax

# Persistent XLA compile cache: remote TPU compiles take minutes per
# program; repeat CLI invocations (resume, milestone evals, sweeps) reuse
# them. VMT_COMPILE_CACHE_DIR= (empty) disables.
_cache_dir = os.environ.get("VMT_COMPILE_CACHE_DIR", "/tmp/jax_cache")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from videometamaterials_tpu.config import (
    ModelConfig,
    TrainerConfig,
    load_model_yaml,
    snapshot_run_config,
)


def build(config: ModelConfig, trainer_cfg: TrainerConfig, data_dir: str,
          data_dir_validation: str, run_dir: str, run_name: str,
          profile_dir: str | None = None):
    # imports deferred so --help stays fast
    from videometamaterials_tpu.diffusion import GaussianDiffusion
    from videometamaterials_tpu.models import UNet3D
    from videometamaterials_tpu.training import Trainer

    model = UNet3D.from_config(config)
    diffusion = GaussianDiffusion.from_config(model, config)
    trainer = Trainer(
        diffusion, config, trainer_cfg,
        folder=data_dir, validation_folder=data_dir_validation,
        results_folder=run_dir, run_name=run_name, profile_dir=profile_dir)
    return trainer


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-name", default="pretrained")
    p.add_argument("--load-model-step", type=int, default=None)
    p.add_argument("--num-preds", type=int, default=1)
    p.add_argument("--guidance-scale", type=float, default=5.0)
    p.add_argument("--guidance-arms", default=None,
                   help="comma list of w[:phi] guided-eval arms, e.g. "
                        "'5,2,5:0.7'. Arms run as TRACED operands of one "
                        "shared compiled sampling program (no per-arm "
                        "recompile); overrides --guidance-scale for eval")
    p.add_argument("--cfg-rescale", type=float, default=None,
                   help="CFG-rescale phi (Lin et al. 2023) for sampling; "
                        "overrides the config (incl. a frozen resume "
                        "snapshot). 0 = off = reference parity")
    p.add_argument("--sampling-timesteps", type=int, default=None,
                   help="override sampling_timesteps for eval (DDIM iff "
                        "< train_timesteps, vddp.py:909-911); applies over "
                        "a frozen resume snapshot too")
    p.add_argument("--dynamic-thres-method", default=None,
                   choices=["bisect", "sort"],
                   help="override the dynamic-threshold quantile method "
                        "for sampling (config.py: bisect | torch-exact sort)")
    p.add_argument("--data-root", default="./data")
    p.add_argument("--runs-root", default="./runs")
    p.add_argument("--config", default="model.yaml")
    p.add_argument("--target-labels", default=None,
                   help="CSV of target responses (default data/target_responses.csv)")
    p.add_argument("--train-num-steps", type=int, default=200_000)
    p.add_argument("--save-and-sample-every", type=int, default=10_000)
    p.add_argument("--num-samples", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--test-batch-size", type=int, default=2,
                   help="eval/sampling batch per device (halved like the "
                        "reference, vddp.py:1460)")
    p.add_argument("--fidelity-probe", default=None,
                   help="target_responses.csv path: guided-sample a tiny "
                        "fixed arm at every milestone and log its best-of-N "
                        "pixel-curve NRMSE next to the val loss (checkpoint "
                        "selection signal; see Trainer.fidelity_probe)")
    p.add_argument("--fidelity-probe-targets", type=int, default=2,
                   help="number of probe targets (first N rows)")
    p.add_argument("--fidelity-probe-preds", type=int, default=2,
                   help="predictions per probe target (best-of-N)")
    p.add_argument("--no-log", action="store_true")
    p.add_argument("--skip-train", action="store_true")
    p.add_argument("--skip-eval-target", action="store_true",
                   help="stop after training (for chained resume runs)")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace of a 3-step window")
    p.add_argument("--torch-checkpoint", default=None,
                   help="import reference checkpoint.pt weights before "
                        "running (EMA + online)")
    args = p.parse_args(argv)

    run_dir = Path(args.runs_root) / args.run_name
    cfg_snapshot = run_dir / "model" / "model.yaml"
    if run_dir.exists() and cfg_snapshot.exists():
        if args.load_model_step is None:
            print("Directory already exists, please change run_name to train "
                  "new model or provide load_model_step")
            return 1
        config = load_model_yaml(cfg_snapshot)     # resume with frozen config
    else:
        config = load_model_yaml(args.config)
        snapshot_run_config(config, run_dir)
    sampling_overrides = {}                        # sampling-only knobs
    if args.cfg_rescale is not None:
        sampling_overrides["cfg_rescale"] = args.cfg_rescale
    if args.sampling_timesteps is not None:
        sampling_overrides["sampling_timesteps"] = args.sampling_timesteps
    if args.dynamic_thres_method is not None:
        sampling_overrides["dynamic_thres_method"] = args.dynamic_thres_method
    if sampling_overrides:
        import dataclasses
        config = dataclasses.replace(config, **sampling_overrides)

    trainer_cfg = TrainerConfig(
        train_num_steps=args.train_num_steps,
        save_and_sample_every=args.save_and_sample_every,
        guidance_scale=args.guidance_scale,
        num_preds=args.num_preds,
        num_samples=args.num_samples,
        seed=args.seed,
        log=not args.no_log,
        test_batch_size=args.test_batch_size,
        fidelity_probe_targets=args.fidelity_probe,
        fidelity_probe_n_targets=args.fidelity_probe_targets,
        fidelity_probe_preds=args.fidelity_probe_preds,
    )

    data_root = Path(args.data_root)
    data_dir = data_root / config.reference_frame / "training"
    data_dir_validation = data_root / config.reference_frame / "validation"
    target_labels = args.target_labels or str(data_root /
                                              "target_responses.csv")

    trainer = build(config, trainer_cfg, str(data_dir),
                    str(data_dir_validation), str(run_dir), args.run_name,
                    profile_dir=args.profile_dir)
    if args.torch_checkpoint:
        trainer.load_torch_checkpoint(args.torch_checkpoint)
    if not args.skip_train:
        trainer.train(load_model_step=args.load_model_step,
                      num_samples=args.num_samples, num_preds=args.num_preds)
    elif args.load_model_step is not None:
        trainer.load(args.load_model_step)
    if not args.skip_eval_target:
        if args.guidance_arms:
            # traced (w, phi) operands: every arm reuses the ONE compiled
            # sampling program (GaussianDiffusion.guided_eps doc)
            import jax.numpy as jnp
            for arm in args.guidance_arms.split(","):
                parts = arm.split(":")
                w = float(parts[0])
                phi = float(parts[1]) if len(parts) > 1 else 0.0
                out = trainer.eval_target(
                    target_labels, guidance_scale=jnp.float32(w),
                    num_preds=args.num_preds, cfg_rescale=jnp.float32(phi))
                print(f"guidance arm w={w} phi={phi} -> {out}")
        else:
            trainer.eval_target(target_labels,
                                guidance_scale=args.guidance_scale,
                                num_preds=args.num_preds)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
