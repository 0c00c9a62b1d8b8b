#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint.pt into this framework's msgpack
checkpoint so the published pretrained weights can be sampled from directly.

    python scripts/convert_checkpoint.py \
        --torch-checkpoint runs/pretrained/model/step_200000/checkpoint.pt \
        --config model.yaml --out-run-dir runs/pretrained_jax --step 200000
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch-checkpoint", required=True)
    p.add_argument("--config", default="model.yaml")
    p.add_argument("--out-run-dir", required=True)
    p.add_argument("--step", type=int, required=True)
    p.add_argument("--lenient", action="store_true",
                   help="ignore unmapped checkpoint keys")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from videometamaterials_tpu.config import load_model_yaml
    from videometamaterials_tpu.models import UNet3D
    from videometamaterials_tpu.training import checkpoint as ckpt
    from videometamaterials_tpu.training.torch_import import (
        import_state_dict,
        state_dict_to_numpy,
    )

    cfg = load_model_yaml(args.config)
    model = UNet3D.from_config(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, cfg.num_frames, cfg.image_size, cfg.image_size,
                   len(cfg.selected_channels)), jnp.float32)
    cond_len = cfg.num_frames if cfg.per_frame_cond else 51
    template = jax.jit(model.init)(rng, x, jnp.zeros((1,), jnp.int32),
                                   jnp.zeros((1, cond_len)))

    num_res = len(cfg.dim_mults)
    payloads = {}
    for which in ("model", "ema"):
        try:
            state = state_dict_to_numpy(args.torch_checkpoint, which)
        except KeyError:
            print(f"checkpoint has no '{which}' entry, skipping")
            continue
        payloads[which] = import_state_dict(
            state, template, num_resolutions=num_res,
            strict=not args.lenient)
        print(f"imported '{which}' "
              f"({sum(a.size for a in jax.tree.leaves(payloads[which]))} "
              f"parameters)")

    params = payloads.get("model", template)
    ema = payloads.get("ema", params)
    payload = {
        "step": jnp.asarray(args.step, jnp.int32),
        "params": params,
        "opt_state": None,   # fresh optimizer on resume (reference tolerates
                             # the same, vddp.py:1581-1584)
        "ema_params": ema,
    }
    path = ckpt.save_checkpoint(args.out_run_dir, args.step, payload,
                                aux={"step": args.step,
                                     "source": str(args.torch_checkpoint)})
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
