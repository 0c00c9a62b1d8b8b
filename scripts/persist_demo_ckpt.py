#!/usr/bin/env python
"""Recycle-durable demo checkpoints (VERDICT r4 ask #6).

Trained demo weights live in gitignored run dirs and have twice been lost
to environment recycles — once costing the round's key measurement. This
persists a milestone's EMA tree into the repo itself (git is the only
storage that survives a recycle):

  persist: runs_demo/<run>/model/step_<N>/checkpoint.msgpack
           -> ckpt_cache/<run>_step_<N>.msgpack  (EMA only, matmul/conv
           kernels cast to bf16 via utils.cast_params_for_inference — the
           exact leaves the sampling forward casts anyway, so sampling from
           a restored tree is BIT-IDENTICAL to the original fp32 checkpoint
           under bf16 compute; norm/time/cond leaves stay fp32). ~55% of
           the fp32 payload size, EMA-only (no online params / optimizer).

  restore: recreates runs_demo/<run>/model/step_<N>/{checkpoint.msgpack,
           aux.json} with params := ema := cached tree and NO optimizer
           state; aux carries restored_from_cache=true so loaders know to
           use tolerant (strict=False) restore — continuing TRAINING from a
           restored checkpoint resumes with a fresh optimizer (warned).

Usage:
  python scripts/persist_demo_ckpt.py persist --run-dir runs_demo/demo4x --step 8000
  python scripts/persist_demo_ckpt.py restore --run-dir runs_demo/demo4x --step 8000
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")

from flax import serialization  # noqa: E402


def cache_path(cache: Path, run_name: str, step: int) -> Path:
    return cache / f"{run_name}_step_{step}.msgpack"


def persist(run_dir: Path, step: int, cache: Path) -> Path:
    import jax

    from videometamaterials_tpu.utils import cast_params_for_inference

    src = run_dir / "model" / f"step_{step}" / "checkpoint.msgpack"
    raw = serialization.msgpack_restore(src.read_bytes())
    ema = cast_params_for_inference(raw["ema_params"], jax.numpy.bfloat16)
    ema = jax.tree.map(np.asarray, ema)
    payload = {"step": np.asarray(step, np.int32), "ema_params": ema}
    cache.mkdir(parents=True, exist_ok=True)
    out = cache_path(cache, run_dir.name, step)
    out.write_bytes(serialization.to_bytes(payload))
    aux_src = run_dir / "model" / f"step_{step}" / "aux.json"
    if aux_src.exists():
        out.with_suffix(".aux.json").write_text(aux_src.read_text())
    print(f"persisted {src} -> {out} ({out.stat().st_size / 1e6:.0f} MB)")
    return out


def restore(run_dir: Path, step: int, cache: Path) -> Path:
    src = cache_path(cache, run_dir.name, step)
    raw = serialization.msgpack_restore(src.read_bytes())
    d = run_dir / "model" / f"step_{step}"
    d.mkdir(parents=True, exist_ok=True)
    # params := ema: the cache is for sampling/eval; a resumed TRAINING run
    # restarts its optimizer (trainer.load strict=False warns about it)
    payload = {"step": raw["step"], "params": raw["ema_params"],
               "ema_params": raw["ema_params"]}
    (d / "checkpoint.msgpack").write_bytes(serialization.to_bytes(payload))
    aux = {"step": step, "restored_from_cache": True}
    aux_src = src.with_suffix(".aux.json")
    if aux_src.exists():
        aux = {**json.loads(aux_src.read_text()), **aux}
    (d / "aux.json").write_text(json.dumps(aux))
    print(f"restored {src} -> {d}")
    return d


def is_cache_restored(run_dir: Path, step: int) -> bool:
    aux = run_dir / "model" / f"step_{step}" / "aux.json"
    return aux.exists() and json.loads(aux.read_text()).get(
        "restored_from_cache", False)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("action", choices=["persist", "restore"])
    p.add_argument("--run-dir", required=True)
    p.add_argument("--step", type=int, required=True)
    p.add_argument("--cache", default="ckpt_cache")
    args = p.parse_args()
    fn = persist if args.action == "persist" else restore
    fn(Path(args.run_dir), args.step, Path(args.cache))


if __name__ == "__main__":
    main()
