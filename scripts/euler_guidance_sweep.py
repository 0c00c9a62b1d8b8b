#!/usr/bin/env python
"""Round-4 eulerian fidelity debugging sweep: the single scored eulerian
checkpoint (demo_euler2 step 6000, CFG w=5) overshoots target stress
magnitude by a near-constant ~1.8x with all 10 predictions tightly
clustered — the signature of guidance over-amplification or a bad
milestone (the lagrangian sweep showed 3x fidelity wander across
checkpoints at flat val loss). Ground truth round-trips the eulerian
pixel-estimation recipe exactly (ratio 1.000 +- 0.01), so the corpus and
scorer are sound; the model/guidance combination is what to probe.

One process, all (step, guidance_scale[, cfg_rescale]) arms sequential.
(w, phi) are passed as TRACED operands (jax scalars), so every arm —
any step, any w, any phi — reuses the ONE compiled sampling program;
only the first arm pays a remote compile. Scoring happens afterwards on
CPU (scripts/eval_demo_quality.py).

Also reused for the LAGRANGIAN cfg-rescale quality arms (gaussian.py
cfg_rescale exists precisely because w=5 was measured to overshoot
stress magnitude ~1.5x on the synthetic corpus, but no phi arm was ever
quality-scored):

    python scripts/euler_guidance_sweep.py --run demo4x \
        --data-root data_demo4x --arms 8000:5:0.7,8000:5:0.5,8000:2
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax

# persistent compile cache: arms differing only in (step) reuse programs
# across processes; w/phi changes still pay one remote compile each
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from videometamaterials_tpu.config import TrainerConfig, load_model_yaml


ARMS = [
    (6000, 2.0, 0.0),
    (6000, 1.0, 0.0),
    (4000, 5.0, 0.0),
    (2000, 5.0, 0.0),
    (4000, 2.0, 0.0),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", default="demo_euler2")
    p.add_argument("--runs-root", default="runs_demo")
    p.add_argument("--data-root", default="data_demo4x_euler")
    p.add_argument("--num-preds", type=int, default=10)
    p.add_argument("--arms", default=None,
                   help="comma list of step:w[:phi] triples, "
                        "e.g. 6000:2,8000:5:0.7")
    p.add_argument("--sampling-timesteps", type=int, default=None,
                   help="override sampling_timesteps for every arm (DDIM "
                        "iff < train_timesteps, vddp.py:909-911) — the "
                        "round-5 DDIM-at-tuned-(w,phi) arms")
    args = p.parse_args()

    arms = ARMS
    if args.arms:
        arms = []
        for a in args.arms.split(","):
            parts = a.split(":")
            arms.append((int(parts[0]), float(parts[1]),
                         float(parts[2]) if len(parts) > 2 else 0.0))

    run_dir = Path(args.runs_root) / args.run
    base_config = load_model_yaml(run_dir / "model" / "model.yaml")
    if args.sampling_timesteps is not None:
        base_config = base_config.replace(
            sampling_timesteps=args.sampling_timesteps)
    tcfg = TrainerConfig(log=False, test_batch_size=16,
                         num_preds=args.num_preds)

    from main import build
    data_root = Path(args.data_root)

    import jax.numpy as jnp

    trainer = build(base_config, tcfg,
                    str(data_root / base_config.reference_frame / "training"),
                    str(data_root / base_config.reference_frame
                        / "validation"),
                    str(run_dir), args.run)

    targets = str(data_root / "target_responses.csv")
    steps_tag = (f" steps={args.sampling_timesteps}"
                 if args.sampling_timesteps is not None else "")
    from persist_demo_ckpt import is_cache_restored
    loaded = None
    for step, w, phi in arms:
        if loaded != step:
            # a checkpoint restored from the durable ckpt_cache carries only
            # the EMA tree (no optimizer) -> tolerant restore
            trainer.load(step,
                         strict=not is_cache_restored(run_dir, step))
            loaded = step
        t0 = time.time()
        # jax-scalar knobs = traced operands: EVERY (w, phi) arm reuses the
        # one compiled sampling program (GaussianDiffusion.guided_eps doc)
        out = trainer.eval_target(targets,
                                  guidance_scale=jnp.float32(w),
                                  num_preds=args.num_preds,
                                  cfg_rescale=jnp.float32(phi))
        print(f"[sweep] step={step} w={w} phi={phi}{steps_tag} -> {out} "
              f"in {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
