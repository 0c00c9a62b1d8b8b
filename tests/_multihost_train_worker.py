"""Worker for tests/test_multihost.py::test_two_process_train_ckpt_sample.

One of two cooperating processes running the FULL trainer path multi-host:
a few SPMD train steps (gradient psum across processes), bit-identical
replicated state on both processes (the SPMD replacement for the
reference's step-equality assert, vddp.py:1645-1647), process-0-only
checkpointing, cross-process reload, and a multi-process guided sampling
round (device all-gather replacing vddp.py:1837-1868)."""

import hashlib
import json
import os
import sys


def digest(tree):
    import jax
    import numpy as np

    h = hashlib.sha256()
    for leaf in jax.tree.leaves(jax.device_get(tree)):
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()


def main():
    port, pid, data_dir, out_dir = (sys.argv[1], int(sys.argv[2]),
                                    sys.argv[3], sys.argv[4])

    import jax
    jax.config.update("jax_platforms", "cpu")

    from videometamaterials_tpu.parallel.mesh import initialize_distributed

    ok = initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                                num_processes=2, process_id=pid)
    assert ok and jax.process_count() == 2

    import numpy as np
    from jax.experimental import multihost_utils

    from videometamaterials_tpu.config import ModelConfig, TrainerConfig
    from videometamaterials_tpu.diffusion import GaussianDiffusion
    from videometamaterials_tpu.models import UNet3D
    from videometamaterials_tpu.training import Trainer

    img, frames = 16, 3
    mcfg = ModelConfig(batch_size=1, image_size=img, num_frames=frames,
                       train_timesteps=8, sampling_timesteps=8,
                       unet_dim=8, dim_mults=(1, 2), unet_attn_heads=2,
                       unet_attn_dim_head=4, compute_dtype="float32")
    tcfg = TrainerConfig(train_num_steps=3, save_and_sample_every=1000,
                         test_batch_size=2, ema_start_step=1,
                         ema_update_every=1, log=False, seed=0)
    model = UNet3D.from_config(mcfg)
    diffusion = GaussianDiffusion.from_config(model, mcfg)
    trainer = Trainer(diffusion, mcfg, tcfg,
                      os.path.join(data_dir, "train"),
                      os.path.join(data_dir, "val"),
                      results_folder=os.path.join(out_dir, "run"),
                      run_name="mh")

    trainer.train()
    state_digest = digest({"params": trainer.state.params,
                           "ema": trainer.state.ema_params,
                           "step": trainer.state.step})

    # barrier: process 0 must commit the checkpoint before anyone reloads
    multihost_utils.sync_global_devices("checkpoint-written")
    params_before = jax.device_get(trainer.state.params)
    trainer.load(3)
    reloaded = jax.device_get(trainer.state.params)
    reload_ok = all(
        np.array_equal(a, b) for a, b in zip(
            jax.tree.leaves(params_before), jax.tree.leaves(reloaded)))

    # multi-process guided sampling: 3 conditionings (not a multiple of the
    # 4-device mesh -> exercises pad_to_multiple), CFG w=5
    cond = np.linspace(-1, 1, 3 * frames, dtype=np.float32).reshape(3,
                                                                    frames)
    videos = trainer.sample_videos(cond, guidance_scale=5.0)
    assert videos.shape == (3, frames, img, img, 3), videos.shape

    val_loss = trainer.validation_loss()

    # multi-host orbax save: EVERY process must reach the async
    # checkpointer's cross-process barriers (regression: a process-0-only
    # save() deadlocked here); file writes still land on process 0 only
    import dataclasses

    from videometamaterials_tpu.training import checkpoint as ckpt_mod
    trainer.tcfg = dataclasses.replace(trainer.tcfg,
                                       checkpoint_backend="orbax")
    trainer.save(step=77)
    ckpt_mod.wait_for_saves()
    multihost_utils.sync_global_devices("orbax-written")
    orbax_dir = os.path.join(out_dir, "run", "model", "step_77", "orbax")

    with open(os.path.join(out_dir, f"out_{pid}.json"), "w") as f:
        json.dump({"orbax_exists": os.path.isdir(orbax_dir),
                   "state_digest": state_digest,
                   "reload_ok": bool(reload_ok),
                   "videos_digest": hashlib.sha256(
                       np.ascontiguousarray(videos).tobytes()).hexdigest(),
                   "val_loss": float(val_loss),
                   "metrics_exists": os.path.exists(os.path.join(
                       out_dir, "run", "metrics.jsonl"))}, f)


if __name__ == "__main__":
    main()
