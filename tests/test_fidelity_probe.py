"""Round-5 trainer additions: milestone guided-fidelity probe, phi-encoded
eval_target dir names, and recycle-durable checkpoint persist/restore."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

from videometamaterials_tpu.config import ModelConfig, TrainerConfig
from videometamaterials_tpu.diffusion import GaussianDiffusion
from videometamaterials_tpu.models import UNet3D
from videometamaterials_tpu.training import Trainer

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

IMG, FRAMES = 16, 3


@pytest.fixture(scope="module")
def tiny_trainer(tmp_path_factory):
    from videometamaterials_tpu.data.synthetic import make_synthetic_dataset

    root = tmp_path_factory.mktemp("fid")
    make_synthetic_dataset(root / "train", num_samples=4, image_size=IMG,
                           num_frames=FRAMES, seed=0)
    make_synthetic_dataset(root / "val", num_samples=2, image_size=IMG,
                           num_frames=FRAMES, seed=1)
    mcfg = ModelConfig(
        batch_size=1, image_size=IMG, num_frames=FRAMES,
        train_timesteps=8, sampling_timesteps=8,
        unet_dim=8, dim_mults=(1, 2), unet_attn_heads=2,
        unet_attn_dim_head=4, compute_dtype="float32")
    tcfg = TrainerConfig(train_num_steps=2, save_and_sample_every=1000,
                         test_batch_size=2, ema_start_step=1,
                         ema_update_every=1, log=False, seed=0)
    model = UNet3D.from_config(mcfg)
    diffusion = GaussianDiffusion.from_config(model, mcfg)
    trainer = Trainer(diffusion, mcfg, tcfg, root / "train", root / "val",
                      results_folder=root / "runs" / "fid", run_name="fid")
    return trainer, root


def _targets_csv(path: Path, n: int = 2) -> Path:
    targets = np.linspace(0, -1.2, 51)[None, :].repeat(n, axis=0)
    targets *= np.arange(1, n + 1)[:, None]
    np.savetxt(path, targets, delimiter=",")
    return path


def test_eval_target_phi_in_dir_name(tiny_trainer, tmp_path):
    """Nonzero cfg_rescale is encoded in the eval dir name (self-describing
    sweep outputs); phi=0 keeps the reference-exact eval_target_w_<w>_<i>
    contract (vddp.py:1768-1775)."""
    trainer, _ = tiny_trainer
    tfile = _targets_csv(tmp_path / "targets.csv")
    out = trainer.eval_target(tfile, guidance_scale=2.0, num_preds=1,
                              cfg_rescale=0.3)
    assert "eval_target_w_2.0_phi_0.3_0" in str(out)
    out0 = trainer.eval_target(tfile, guidance_scale=2.0, num_preds=1)
    assert "eval_target_w_2.0_0" in str(out0)
    assert "phi" not in str(out0)


def test_eval_target_labels_unleak_float32(tiny_trainer, tmp_path):
    """(w, phi) arriving as float32 jax scalars (the traced-operand sweep
    path) must not leak the f32 repr into dir names — phi=0.7 used to
    produce eval_target_w_5.0_phi_0.699999988079071_0."""
    import jax.numpy as jnp

    trainer, _ = tiny_trainer
    tfile = _targets_csv(tmp_path / "targets32.csv")
    out = trainer.eval_target(tfile, guidance_scale=jnp.float32(1.5),
                              num_preds=1, cfg_rescale=jnp.float32(0.7))
    assert "eval_target_w_1.5_phi_0.7_0" in str(out)


def test_fidelity_probe_logs_nrmse(tiny_trainer, tmp_path, monkeypatch):
    """The milestone probe guided-samples a tiny arm, writes artifacts under
    training/step_<N>/fidelity_probe and logs best-of-N NRMSE to
    metrics.jsonl. Sampling is monkeypatched to contract-shape (96x96)
    videos: the scoring path (save_preds grid -> crop_gif -> pixel curve)
    is the real one."""
    trainer, _ = tiny_trainer
    tfile = _targets_csv(tmp_path / "probe_targets.csv", n=3)
    trainer.tcfg = trainer.tcfg.replace(
        fidelity_probe_targets=str(tfile),
        fidelity_probe_n_targets=2, fidelity_probe_preds=2)

    calls = {}

    def fake_sample(cond, w, cfg_rescale=None, **kw):
        import jax
        calls["n"] = len(cond)
        calls["w"] = w
        calls["traced"] = isinstance(w, jax.Array) \
            and isinstance(cfg_rescale, jax.Array)
        rng = np.random.default_rng(0)
        return rng.uniform(0.3, 0.9,
                           (len(cond), FRAMES, 96, 96, 3)).astype(np.float32)

    monkeypatch.setattr(trainer, "sample_videos", fake_sample)
    nrmse = trainer.fidelity_probe()
    assert np.isfinite(nrmse)
    # 2 targets x 2 preds, traced (w, phi) operands (shared program)
    assert calls["n"] == 4 and calls["traced"]
    step = int(trainer.state.step)
    probe_dir = (trainer.results_folder / "training" / f"step_{step}"
                 / "fidelity_probe")
    assert (probe_dir / "gifs" / "prediction_channel_0.gif").exists()
    records = [json.loads(ln) for ln in
               trainer._metrics_path.read_text().splitlines()]
    probe_recs = [r for r in records if "fidelity probe NRMSE" in r]
    assert probe_recs and probe_recs[-1]["step"] == step
    assert probe_recs[-1]["fidelity probe NRMSE"] == pytest.approx(nrmse)
    assert len(probe_recs[-1]["fidelity probe per target"]) == 2


def test_persist_restore_roundtrip(tiny_trainer, tmp_path):
    """persist -> wipe -> restore -> tolerant load: the EMA tree round-trips
    bit-exactly through the bf16 inference cast (the leaves sampling casts
    anyway), step survives, and the restored checkpoint self-identifies so
    loaders pick strict=False."""
    import jax

    from persist_demo_ckpt import is_cache_restored, persist, restore
    from videometamaterials_tpu.utils import cast_params_for_inference

    trainer, _ = tiny_trainer
    run_dir = trainer.results_folder
    trainer.save(step=1)
    ema_before = jax.device_get(trainer.state.ema_params)

    cache = tmp_path / "cache"
    out = persist(run_dir, 1, cache)
    assert out.exists()

    import shutil
    shutil.rmtree(run_dir / "model" / "step_1")
    restore(run_dir, 1, cache)
    assert is_cache_restored(run_dir, 1)

    with pytest.warns(UserWarning, match="new optimizer"):
        trainer.load(1, strict=False)
    ema_after = jax.device_get(trainer.state.ema_params)
    # restored == bf16-cast(original) upcast to fp32: exact for the cast
    # leaves under bf16 compute, untouched fp32 for the rest
    want = jax.tree.map(
        lambda a: np.asarray(a, np.float32),
        cast_params_for_inference(ema_before, jax.numpy.bfloat16))
    jax.tree.map(np.testing.assert_array_equal, want, ema_after)
    assert int(trainer.state.step) == 1
