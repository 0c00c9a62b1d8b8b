#!/usr/bin/env python
"""Round-4 eulerian fidelity debugging sweep: the single scored eulerian
checkpoint (demo_euler2 step 6000, CFG w=5) overshoots target stress
magnitude by a near-constant ~1.8x with all 10 predictions tightly
clustered — the signature of guidance over-amplification or a bad
milestone (the lagrangian sweep showed 3x fidelity wander across
checkpoints at flat val loss). Ground truth round-trips the eulerian
pixel-estimation recipe exactly (ratio 1.000 +- 0.01), so the corpus and
scorer are sound; the model/guidance combination is what to probe.

One process, all (step, guidance_scale) arms sequential — eval programs
recompile only when w changes (the sample fn is cached per (batch, w));
the persistent cache covers repeats. Scoring happens afterwards on CPU
(scripts/eval_demo_quality.py).

Usage: python scripts/euler_guidance_sweep.py [--run demo_euler2]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

from videometamaterials_tpu.config import TrainerConfig, load_model_yaml


ARMS = [
    (6000, 2.0),
    (6000, 1.0),
    (4000, 5.0),
    (2000, 5.0),
    (4000, 2.0),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", default="demo_euler2")
    p.add_argument("--runs-root", default="runs_demo")
    p.add_argument("--data-root", default="data_demo4x_euler")
    p.add_argument("--num-preds", type=int, default=10)
    p.add_argument("--arms", default=None,
                   help="comma list of step:w pairs, e.g. 6000:2,4000:5")
    args = p.parse_args()

    arms = ARMS
    if args.arms:
        arms = [(int(s), float(w)) for s, w in
                (a.split(":") for a in args.arms.split(","))]

    run_dir = Path(args.runs_root) / args.run
    config = load_model_yaml(run_dir / "model" / "model.yaml")
    tcfg = TrainerConfig(log=False, test_batch_size=16,
                         num_preds=args.num_preds)

    from main import build
    data_root = Path(args.data_root)
    trainer = build(config, tcfg,
                    str(data_root / config.reference_frame / "training"),
                    str(data_root / config.reference_frame / "validation"),
                    str(run_dir), args.run)

    targets = str(data_root / "target_responses.csv")
    loaded = None
    for step, w in arms:
        if loaded != step:
            trainer.load(step)
            loaded = step
        t0 = time.time()
        trainer.eval_target(targets, guidance_scale=w,
                            num_preds=args.num_preds)
        print(f"[sweep] step={step} w={w} done in {time.time()-t0:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
