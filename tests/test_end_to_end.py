"""Minimum end-to-end slice (SURVEY.md §7.2): synthetic data -> tiny UNet3D ->
GaussianDiffusion -> a few sharded train steps -> guided sampling ->
grid GIFs + geometries.csv through clean_pred. Exercises every layer."""

import json

import numpy as np
import pytest

from videometamaterials_tpu.config import ModelConfig, TrainerConfig
from videometamaterials_tpu.data.synthetic import make_synthetic_dataset
from videometamaterials_tpu.diffusion import GaussianDiffusion
from videometamaterials_tpu.models import UNet3D
from videometamaterials_tpu.training import Trainer

IMG, FRAMES = 16, 3


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    train_dir = root / "train"
    val_dir = root / "val"
    make_synthetic_dataset(train_dir, num_samples=6, image_size=IMG,
                           num_frames=FRAMES, seed=0)
    make_synthetic_dataset(val_dir, num_samples=2, image_size=IMG,
                           num_frames=FRAMES, seed=1)

    mcfg = ModelConfig(
        batch_size=1, image_size=IMG, num_frames=FRAMES,
        train_timesteps=8, sampling_timesteps=8,
        unet_dim=8, dim_mults=(1, 2), unet_attn_heads=2,
        unet_attn_dim_head=4, compute_dtype="float32")
    tcfg = TrainerConfig(train_num_steps=3, save_and_sample_every=1000,
                         test_batch_size=2, ema_start_step=1,
                         ema_update_every=1, log=False, seed=0)
    model = UNet3D.from_config(mcfg)
    diffusion = GaussianDiffusion.from_config(model, mcfg)
    trainer = Trainer(diffusion, mcfg, tcfg, train_dir, val_dir,
                      results_folder=root / "runs" / "tiny", run_name="tiny")
    return trainer, root


def test_train_reduces_or_runs(tiny_run):
    trainer, _ = tiny_run
    trainer.train()
    assert int(trainer.state.step) == trainer.tcfg.train_num_steps
    # metrics were logged
    lines = trainer._metrics_path.read_text().strip().splitlines()
    assert len(lines) >= trainer.tcfg.train_num_steps


def test_checkpoint_roundtrip(tiny_run):
    trainer, _ = tiny_run
    import jax
    step = trainer.tcfg.train_num_steps
    params_before = jax.device_get(trainer.state.params)
    trainer.load(step)
    params_after = jax.device_get(trainer.state.params)
    jax.tree.map(np.testing.assert_allclose, params_before, params_after)


def test_eval_network_and_artifacts(tiny_run):
    trainer, root = tiny_run
    val_loss = trainer.eval_network(num_samples=2, num_preds=2)
    assert np.isfinite(val_loss)
    step = int(trainer.state.step)
    out = root / "runs" / "tiny" / "training" / f"step_{step}"
    gifs = sorted((out / "gifs").glob("prediction_channel_*.gif"))
    assert [g.name for g in gifs] == ["prediction_channel_0.gif",
                                      "prediction_channel_1.gif",
                                      "prediction_channel_3.gif"]
    geoms = np.genfromtxt(out / "geometries.csv", delimiter=",")
    assert geoms.shape == (4, (IMG // 2) ** 2)
    assert set(np.unique(geoms)).issubset({0.0, 1.0})


def test_eval_target(tiny_run, tmp_path):
    trainer, root = tiny_run
    targets = np.linspace(0, -1.5, 51)[None, :].repeat(2, axis=0)
    tfile = tmp_path / "target_responses.csv"
    np.savetxt(tfile, targets, delimiter=",")
    out_dir = trainer.eval_target(tfile, guidance_scale=5.0, num_preds=1)
    assert (out_dir / "geometries.csv").exists()
    # second call increments the eval index (vddp.py:1770-1773)
    out_dir2 = trainer.eval_target(tfile, guidance_scale=5.0, num_preds=1)
    assert out_dir2 != out_dir
    assert "_1" in str(out_dir2.parent)


def test_cfg_batched_equals_sequential(tiny_run):
    """Folded CFG forward must equal the reference's two sequential passes."""
    import jax
    import jax.numpy as jnp
    trainer, _ = tiny_run
    diffusion = trainer.diffusion
    params = trainer.state.ema_params
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, FRAMES, IMG, IMG, 3))
    t = jnp.array([3, 5])
    cond = jax.random.normal(rng, (2, FRAMES))

    fused = diffusion.guided_eps(params, x, t, cond, guidance_scale=5.0)
    b = x.shape[0]
    eps_c = diffusion.model.apply(params, x, t, cond,
                                  null_cond_mask=jnp.zeros((b,), bool))
    eps_n = diffusion.model.apply(params, x, t, cond,
                                  null_cond_mask=jnp.ones((b,), bool))
    want = eps_n + (eps_c - eps_n) * 5.0
    np.testing.assert_allclose(np.asarray(fused), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_orbax_checkpoint_backend(tiny_run, tmp_path):
    """Orbax save/restore round-trips the full train state."""
    import jax
    from videometamaterials_tpu.training import checkpoint as ckpt
    trainer, _ = tiny_run
    payload = jax.device_get({
        "step": trainer.state.step,
        "params": trainer.state.params,
        "opt_state": trainer.state.opt_state,
        "ema_params": trainer.state.ema_params,
    })
    path = ckpt.save_checkpoint(tmp_path, 7, payload, aux={"step": 7},
                                backend="orbax")
    assert path.name == "orbax"
    restored, aux = ckpt.load_checkpoint(tmp_path, 7, payload)
    assert aux["step"] == 7
    jax.tree.map(np.testing.assert_allclose, restored["params"],
                 payload["params"])
    assert ckpt.latest_checkpoint_step(tmp_path) == 7


def test_milestone_path_inside_train_loop(tiny_run, tmp_path):
    """train() itself must trigger the periodic eval+save branch
    (vddp.py:1641-1655): milestone artifacts and a checkpoint appear without
    any direct eval_network/save call."""
    trainer, root = tiny_run
    mcfg = trainer.mcfg
    tcfg = trainer.tcfg.replace(train_num_steps=4, save_and_sample_every=2,
                                num_samples=1, num_preds=1)
    t2 = Trainer(trainer.diffusion, mcfg, tcfg,
                 root / "train", root / "val",
                 results_folder=tmp_path / "mile", run_name="mile")
    t2.train()
    assert (tmp_path / "mile" / "training" / "step_2" / "gifs"
            / "prediction_channel_0.gif").exists()
    assert (tmp_path / "mile" / "model" / "step_2"
            / "checkpoint.msgpack").exists()
    assert (tmp_path / "mile" / "model" / "step_4"
            / "checkpoint.msgpack").exists()
    # the FINAL milestone evals too (the probe/val loss selects checkpoints;
    # the reference loop exits before its last-step eval, vddp.py:1674)
    assert (tmp_path / "mile" / "training" / "step_4" / "gifs"
            / "prediction_channel_0.gif").exists()
    # validation loss was logged by the in-loop eval, incl. the final step
    lines = (tmp_path / "mile" / "metrics.jsonl").read_text().splitlines()
    recs = [json.loads(ln) for ln in lines if "validation loss" in ln]
    assert recs and {r["step"] for r in recs} == {2, 4}


def test_strict_false_tolerates_optimizer_mismatch(tiny_run, tmp_path):
    """Resume after an optimizer-config change: params restore, optimizer
    falls back to fresh state with a warning (vddp.py:1582-1585 semantics);
    strict=True refuses."""
    import jax
    import pytest as _pytest

    trainer, root = tiny_run
    step = trainer.tcfg.train_num_steps
    # a trainer whose optax chain has an extra clip stage -> different
    # opt_state structure than the saved checkpoint
    tcfg2 = trainer.tcfg.replace(max_grad_norm=1.0)
    t2 = Trainer(trainer.diffusion, trainer.mcfg, tcfg2,
                 root / "train", root / "val",
                 results_folder=root / "runs" / "tiny", run_name="tiny")
    fresh_opt = jax.device_get(t2.state.opt_state)

    with _pytest.raises((ValueError, KeyError)):
        t2.load(step, strict=True)

    with _pytest.warns(UserWarning, match="new optimizer"):
        t2.load(step, strict=False)
    # params came from the checkpoint...
    jax.tree.map(np.testing.assert_allclose,
                 jax.device_get(t2.state.params),
                 jax.device_get(trainer.state.params))
    # ...while the optimizer kept its fresh (clip-stage) structure
    assert jax.tree_util.tree_structure(jax.device_get(t2.state.opt_state)) \
        == jax.tree_util.tree_structure(fresh_opt)
    assert int(t2.state.step) == step


def test_keep_last_n_retention(tmp_path):
    from videometamaterials_tpu.training import checkpoint as ckpt

    payload = {"params": {"w": np.ones((2,), np.float32)}, "step": 0}
    for s in (10, 20, 30):
        ckpt.save_checkpoint(tmp_path, s, payload, keep_last=2)
    assert not (tmp_path / "model" / "step_10").exists()
    assert (tmp_path / "model" / "step_20" / "checkpoint.msgpack").exists()
    assert ckpt.latest_checkpoint_step(tmp_path) == 30


def test_strict_false_partial_param_graft(tmp_path):
    """Leaves whose path+shape match graft; the rest keep template values
    with warnings (reference strict=False load, vddp.py:1577-1580)."""
    import pytest as _pytest

    from videometamaterials_tpu.training import checkpoint as ckpt

    saved = {"params": {"a": np.full((3,), 2.0, np.float32),
                        "b": np.full((4,), 3.0, np.float32)}}
    ckpt.save_checkpoint(tmp_path, 1, saved)
    template = {"params": {"a": np.zeros((3,), np.float32),
                           "b": np.zeros((5,), np.float32),   # shape changed
                           "c": np.zeros((2,), np.float32)}}  # new param
    with _pytest.warns(UserWarning):
        restored, _ = ckpt.load_checkpoint(tmp_path, 1, template,
                                           strict=False)
    np.testing.assert_allclose(restored["params"]["a"], 2.0)
    np.testing.assert_allclose(restored["params"]["b"], 0.0)
    np.testing.assert_allclose(restored["params"]["c"], 0.0)
