#!/usr/bin/env python
"""Generate the round-3 quality-demonstration dataset: a few hundred
physically-consistent synthetic GRF samples at the flagship shape
(96x96, 11 frames), plus held-out target curves for guided evaluation.

Layout matches main.py's expectations:
    <root>/lagrangian/training/      (N_train samples)
    <root>/lagrangian/validation/    (N_val samples)
    <root>/target_responses.csv      (held-out 51-point curves)
"""

import argparse
from pathlib import Path

import numpy as np

from videometamaterials_tpu.data.synthetic import (
    make_consistent_dataset,
    make_consistent_dataset_eulerian,
)
from videometamaterials_tpu.fem.grf import generate_geometry


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="data_demo")
    p.add_argument("--train", type=int, default=288)
    p.add_argument("--val", type=int, default=32)
    p.add_argument("--targets", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--frame", default="lagrangian",
                   choices=["lagrangian", "eulerian"])
    args = p.parse_args()

    maker = (make_consistent_dataset_eulerian
             if args.frame == "eulerian" else make_consistent_dataset)
    root = Path(args.root)
    maker(root / args.frame / "training",
          num_samples=args.train, image_size=96,
          num_frames=11, seed=args.seed)
    print(f"training: {args.train} samples")
    maker(root / args.frame / "validation",
          num_samples=args.val, image_size=96,
          num_frames=11, seed=args.seed + 10_000)
    print(f"validation: {args.val} samples")

    # held-out targets drawn from the same (density-linked) curve family
    rng = np.random.default_rng(args.seed + 20_000)
    strains = np.linspace(0, 0.2, 51)
    curves = np.zeros((args.targets, 51))
    for i in range(args.targets):
        quarter = generate_geometry(6.0, 48, 0.1, 0.4, rng=rng)
        rho = quarter.mean()
        k = 2.5 * rho ** 1.5 * (1.0 + rng.uniform(-0.25, 0.25))
        c = rng.uniform(-1.0, 1.5)
        curves[i] = k * strains * (1.0 + c * strains)
    np.savetxt(root / "target_responses.csv", curves, delimiter=",")
    print(f"targets: {args.targets} curves -> {root}/target_responses.csv")


if __name__ == "__main__":
    main()
