#!/usr/bin/env python
"""Validation loss of saved checkpoints (fills the loss curve at final-leg
steps, where the train loop's milestone eval does not run).

Usage: python scripts/val_loss_at.py --runs-root runs_demo --run demo_r3 \
    --data-root data_demo --steps 10000 12000
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--runs-root", required=True)
    p.add_argument("--run", required=True)
    p.add_argument("--data-root", required=True)
    p.add_argument("--steps", type=int, nargs="+", required=True)
    p.add_argument("--test-batch-size", type=int, default=32)
    args = p.parse_args()

    from videometamaterials_tpu.config import (
        TrainerConfig,
        load_model_yaml,
    )
    from videometamaterials_tpu.diffusion import GaussianDiffusion
    from videometamaterials_tpu.models import UNet3D
    from videometamaterials_tpu.training import Trainer

    run_dir = Path(args.runs_root) / args.run
    cfg = load_model_yaml(run_dir / "model" / "model.yaml")
    tcfg = TrainerConfig(test_batch_size=args.test_batch_size, log=False)
    model = UNet3D.from_config(cfg)
    diffusion = GaussianDiffusion.from_config(model, cfg)
    data = Path(args.data_root) / cfg.reference_frame
    trainer = Trainer(diffusion, cfg, tcfg, data / "training",
                      data / "validation", results_folder=run_dir,
                      run_name=args.run)
    for step in args.steps:
        trainer.load(step)
        loss = trainer.validation_loss()
        print(json.dumps({"step": step, "validation loss": loss}),
              flush=True)


if __name__ == "__main__":
    main()
