"""Trainer — the L4 orchestration layer.

Re-design of the reference Trainer (vddp.py:1400-1919) as an SPMD program
over a 1-D data mesh:

  - one jitted, buffer-donated `train_step` fuses loss, backward, Adam and
    the EMA update (reference walks params in Python every 10 steps,
    vddp.py:121-124; here it is a lax-selected tree lerp inside the step —
    zero extra host round-trips);
  - batches are sharded over the mesh; gradients all-reduce over ICI via
    XLA (DDP replacement, SURVEY.md §2.3);
  - EMA semantics preserved: copy-reset before step_start_ema (=2000), lerp
    with beta=0.995 every update_ema_every (=10) steps (vddp.py:1497-1504);
  - eval: full validation loss sweep + EMA-sampled conditioned videos at
    every milestone, guided sampling of target curves (eval_target), artifact
    export via training.artifacts (contract-frozen with the reference);
  - checkpoints at EVERY milestone (reference saves only at the final step,
    vddp.py:1663-1667 — a noted weakness, SURVEY.md §5.3);
  - metrics stream to runs/<name>/metrics.jsonl (+ optional wandb when the
    package is importable; parity with §5.5).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from videometamaterials_tpu.config import ModelConfig, TrainerConfig
from videometamaterials_tpu.data.dataset import VideoDataset, interpolate_labels
from videometamaterials_tpu.data.loader import (
    InfiniteBatchSampler,
    prefetch_batches,
)
from videometamaterials_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicated_sharding,
)
from videometamaterials_tpu.training import checkpoint as ckpt
from videometamaterials_tpu.training.artifacts import save_preds


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray           # int32 scalar
    params: Any
    opt_state: Any
    ema_params: Any


class Trainer:
    def __init__(
        self,
        diffusion,                      # GaussianDiffusion
        model_cfg: ModelConfig,
        trainer_cfg: TrainerConfig,
        folder: str | Path,
        validation_folder: str | Path,
        results_folder: str | Path = "./results",
        run_name: Optional[str] = None,
        mesh=None,
        init_params=None,
        profile_dir: Optional[str | Path] = None,
    ):
        self.diffusion = diffusion
        self.mcfg = model_cfg
        self.tcfg = trainer_cfg
        # Training plan: the fused Pallas kernels pay kernel_fwd + xla_fwd +
        # xla_bwd under grad (their custom-VJP backward recomputes the XLA
        # reference forward), so unless fused_blocks_in_training is set the
        # loss/grad path runs the plain XLA plans. Both plans create the
        # identical parameter tree (models/unet3d.py _RawKernel), so the
        # same state trains unfused and samples fused.
        self._train_diffusion = diffusion
        fused_on = bool(model_cfg.use_fused_linear_block) \
            or bool(model_cfg.use_fused_temporal_block)
        if fused_on and not model_cfg.fused_blocks_in_training:
            import dataclasses

            # Derive the training plan from the PASSED diffusion object
            # (not a from_config rebuild) so caller customizations beyond
            # model_cfg — loss_type, schedule, thresholding — train with
            # the exact objective they configured.
            train_model = diffusion.model.clone(
                use_fused_linear_block=False,
                use_fused_temporal_block=False)
            self._train_diffusion = dataclasses.replace(
                diffusion, model=train_model)
        self.results_folder = Path(results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)
        self.run_name = run_name
        self.mesh = mesh if mesh is not None else make_mesh()
        self.n_devices = int(self.mesh.devices.size)
        # §5.1 upgrade over the reference's wall-clock prints: optional
        # jax.profiler trace of a 3-step training window
        self.profile_dir = Path(profile_dir) if profile_dir else None

        self.selected_channels = list(model_cfg.selected_channels)
        self.per_frame_cond = model_cfg.per_frame_cond
        self.reference_frame = model_cfg.reference_frame
        self.num_frames = model_cfg.num_frames

        # ---- data (val reuses train scaling, vddp.py:1477-1478; flip is a
        # train-only augmentation, vddp.py:1252)
        self.ds = VideoDataset(
            folder, model_cfg.image_size, labels_scaling=None,
            selected_channels=self.selected_channels,
            num_frames=self.num_frames, per_frame_cond=self.per_frame_cond,
            reference_frame=self.reference_frame,
            horizontal_flip=trainer_cfg.horizontal_flip)
        print(f"found {len(self.ds)} videos as gif files in {folder}")
        self.ds_test = VideoDataset(
            validation_folder, model_cfg.image_size,
            labels_scaling=self.ds.labels_scaling,
            selected_channels=self.selected_channels,
            num_frames=self.num_frames, per_frame_cond=self.per_frame_cond,
            reference_frame=self.reference_frame)

        self.global_batch = model_cfg.batch_size * self.n_devices
        self.test_batch = max(trainer_cfg.test_batch_size // 2, 1) \
            * self.n_devices                       # vddp.py:1460
        # per-host stripe of each epoch (multi-host: every process feeds its
        # local shard of the global batch; single host: the whole batch)
        self.sampler = InfiniteBatchSampler(
            len(self.ds),
            self.global_batch // jax.process_count(),
            seed=trainer_cfg.seed,
            process_index=jax.process_index(),
            process_count=jax.process_count())

        # ---- optimizer (Adam, torch defaults; vddp.py:1481)
        chain = []
        if trainer_cfg.max_grad_norm is not None:
            chain.append(optax.clip_by_global_norm(trainer_cfg.max_grad_norm))
        chain.append(optax.adam(model_cfg.learning_rate))
        self.tx = optax.chain(*chain)
        if trainer_cfg.gradient_accumulate_every > 1:
            # gradient accumulation (vddp.py:1620 accelerator.accumulate):
            # grads are averaged over k micro-steps, params/Adam state update
            # on every k-th; the step counter keeps counting micro-steps so
            # EMA/milestone cadence matches the reference loop-iteration
            # semantics
            self.tx = optax.MultiSteps(
                self.tx, every_k_schedule=trainer_cfg.gradient_accumulate_every)

        # ---- state
        self.rng = jax.random.PRNGKey(trainer_cfg.seed)
        if init_params is None:
            init_rng, self.rng = jax.random.split(self.rng)
            dummy_x = jnp.zeros(
                (1, self.num_frames, model_cfg.image_size,
                 model_cfg.image_size, len(self.selected_channels)),
                jnp.float32)
            dummy_t = jnp.zeros((1,), jnp.int32)
            dummy_c = jnp.zeros((1, self.ds.labels.shape[1]), jnp.float32)
            # jitted init: ONE compiled (cacheable) program instead of
            # hundreds of eager dispatches — on the remote-compile relay the
            # eager path alone took ~15 minutes of startup. Init runs the
            # XLA train plan: same param tree as the fused plans, without
            # compiling any Pallas kernel just to create parameters.
            init_params = jax.jit(self._train_diffusion.model.init)(
                init_rng, dummy_x, dummy_t, dummy_c)
        self._repl = replicated_sharding(self.mesh)
        self._bsh = batch_sharding(self.mesh)
        # one jitted program builds the whole initial state directly in the
        # replicated layout (eager per-leaf copies/optimizer init are
        # hundreds of round trips on a remote-dispatch runtime)
        self.state = jax.jit(
            lambda p: TrainState(
                step=jnp.zeros((), jnp.int32), params=p,
                opt_state=self.tx.init(p),
                ema_params=jax.tree.map(lambda a: a + 0, p)),
            out_shardings=self._repl)(init_params)

        self._train_step = self._build_train_step()
        # per-sample validation losses: padded tail rows are masked out on
        # the host and batches size-weighted (vddp.py:1695-1714 gathers true
        # per-batch losses; a plain mean over padded batches would bias small
        # validation sets)
        # replicated output: every process can fetch the whole vector (a
        # batch-sharded output is not fully addressable under multi-host)
        self._loss_fn = jax.jit(
            lambda params, rng, x, c: self._train_diffusion.loss(
                params, rng, x, c,
                null_cond_prob=self.tcfg.null_cond_prob,
                prob_focus_present=self.tcfg.prob_focus_present,
                per_sample=True),
            out_shardings=self._repl)
        # device all-gather so sampled videos are host-fetchable everywhere
        # (replaces the reference's pad_across_processes/gather dance,
        # vddp.py:1837-1868)
        self._gather_for_host = jax.jit(lambda v: v,
                                        out_shardings=self._repl)
        self._sample_fns: dict = {}

        self._metrics_path = self.results_folder / "metrics.jsonl"
        self._wandb = None
        # rank-0-only tracker init (vddp.py:1430-1442 logs via the rank0
        # accelerator; every host opening its own run would fork the stream)
        if trainer_cfg.log and jax.process_index() == 0:
            try:
                import wandb  # optional (§5.5)
                self._wandb = wandb
                wandb.init(project="metamaterial_diffusion", name=run_name)
            except Exception:
                self._wandb = None

    # ------------------------------------------------------------- train step
    def _build_train_step(self):
        tcfg = self.tcfg
        diffusion = self._train_diffusion  # XLA plans under grad (see __init__)
        tx = self.tx

        def train_step(state: TrainState, videos, labels, rng):
            step_rng = jax.random.fold_in(rng, state.step)

            def loss_fn(p):
                return diffusion.loss(
                    p, step_rng, videos, labels,
                    null_cond_prob=tcfg.null_cond_prob,
                    prob_focus_present=tcfg.prob_focus_present)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)

            # EMA: reset before start step, lerp every update period
            # (vddp.py:1497-1504, beta semantics of vddp.py:126-129)
            do = (state.step % tcfg.ema_update_every) == 0
            reset = state.step < tcfg.ema_start_step
            beta = tcfg.ema_decay

            def ema_update(e, p):
                lerped = e * beta + (1.0 - beta) * p
                return jnp.where(do, jnp.where(reset, p, lerped), e)

            ema_params = jax.tree.map(ema_update, state.ema_params, params)
            new_state = TrainState(step=state.step + 1, params=params,
                                   opt_state=opt_state,
                                   ema_params=ema_params)
            return new_state, loss

        return jax.jit(train_step, donate_argnums=(0,),
                       in_shardings=(self._repl, self._bsh, self._bsh, None),
                       out_shardings=(self._repl, None))

    def _put_global(self, host_batch: np.ndarray):
        """Host batch -> globally-sharded device array. Multi-host: each
        process contributes its local stripe (the SPMD replacement for the
        reference's broadcast/shard dance, SURVEY.md §2.3)."""
        if jax.process_count() == 1:
            return jax.device_put(host_batch, self._bsh)
        global_shape = (host_batch.shape[0] * jax.process_count(),
                        *host_batch.shape[1:])
        return jax.make_array_from_process_local_data(
            self._bsh, host_batch, global_shape)

    # ---------------------------------------------------------------- logging
    def _log(self, record: dict):
        if jax.process_index() != 0:       # single metrics stream
            return
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            step = record.pop("step", None)
            self._wandb.log(record, step=step)

    # ----------------------------------------------------------------- train
    def train(self, load_model_step: Optional[int] = None,
              num_samples: Optional[int] = None,
              num_preds: Optional[int] = None):
        tcfg = self.tcfg
        num_samples = num_samples if num_samples is not None \
            else tcfg.num_samples
        num_preds = num_preds if num_preds is not None else tcfg.num_preds

        start_step = 0
        if load_model_step is not None:
            self.load(load_model_step)
            start_step = load_model_step
            if load_model_step >= tcfg.train_num_steps:
                print("training completed")
                return

        # background producer thread assembles the next host batch while the
        # device runs the current step (replaces torch DataLoader workers)
        batch_iter = prefetch_batches(self.ds, self.sampler)
        rng = self.rng
        start_time = time.time()
        pending_loss = None
        pending_step = None

        # runs steps [start_step, train_num_steps); afterwards
        # state.step == train_num_steps, matching checkpoint/eval dir names
        step = start_step
        profiling = False
        while step < tcfg.train_num_steps:
            if self.profile_dir and step == start_step + 10:
                jax.profiler.start_trace(str(self.profile_dir))
                profiling = True
            videos, labels = next(batch_iter)
            videos = self._put_global(videos)
            labels = self._put_global(labels)
            self.state, loss = self._train_step(self.state, videos, labels,
                                                rng)
            # async logging: fetch the *previous* step's loss so the host
            # never blocks on the in-flight step
            if pending_loss is not None:
                self._log({"step": pending_step,
                           "training loss": float(pending_loss)})
            pending_loss, pending_step = loss, step
            step += 1
            if profiling and step >= start_step + 13:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
                profiling = False

            # unlike the reference loop (vddp.py:1674), the FINAL milestone
            if step % tcfg.save_and_sample_every == 0:  # evals+probes too
                elapsed = time.strftime(
                    "%H:%M:%S", time.gmtime(time.time() - start_time))
                print(f"current step: {step}, total time elapsed: {elapsed}")
                t0 = time.time()
                # checkpoint BEFORE the (expensive, samplable) eval so a
                # kill during milestone evaluation never loses the weights
                self.save(step=step)
                self.eval_network(num_samples=num_samples,
                                  num_preds=num_preds)
                print(f"time elapsed for validation: "
                      f"{time.strftime('%H:%M:%S', time.gmtime(time.time() - t0))}")

        if pending_loss is not None:
            self._log({"step": pending_step,
                       "training loss": float(pending_loss)})
        self.save(step=tcfg.train_num_steps)
        ckpt.wait_for_saves()     # join async orbax writes before returning
        print("training completed")

    # ------------------------------------------------------------ validation
    def eval_network(self, guidance_scale: Optional[float] = None,
                     num_samples: int = 1, num_preds: int = 1):
        guidance_scale = guidance_scale if guidance_scale is not None \
            else self.tcfg.guidance_scale
        step = int(self.state.step)
        mode_dir = self.results_folder / "training" / f"step_{step}"
        if jax.process_index() == 0:
            (mode_dir / "gifs").mkdir(parents=True, exist_ok=True)

        val_loss = self.validation_loss()
        self._log({"step": step, "validation loss": val_loss})
        if self.tcfg.fidelity_probe_targets:
            self.fidelity_probe()
        n_val = len(self.ds_test)

        if num_samples > 0:
            rng_np = np.random.default_rng(self.tcfg.seed + step)
            pick = rng_np.choice(n_val, size=min(num_samples, n_val),
                                 replace=False)
            cond = self.ds_test.labels[pick]
            cond_rep = np.repeat(cond, num_preds, axis=0)
            videos = self.sample_videos(cond_rep, guidance_scale)
            if jax.process_index() == 0:   # artifacts written once
                save_preds(videos, mode_dir, self.selected_channels,
                           num_samples=len(pick),
                           reference_frame=self.reference_frame,
                           num_frames=self.num_frames,
                           zero_u_2=self.ds.zero_u_2)
        return val_loss

    def validation_loss(self) -> float:
        """Full validation-set loss sweep (vddp.py:1695-1714): per-sample
        losses with padded tail rows masked out, averaged with true
        size-weighting (sum over real samples / number of real samples)."""
        rng = jax.random.PRNGKey(self.tcfg.seed + 1234)
        n_val = len(self.ds_test)
        bs = min(self.test_batch, n_val) if n_val else 0
        total, count = 0.0, 0
        for i in range(0, n_val, bs if bs else 1):
            v, c = self.ds_test.get_batch(np.arange(i, min(i + bs, n_val)))
            n_real = v.shape[0]
            # pad to a device-count multiple (sharding requires even split);
            # padded rows are excluded from the mean below
            v, _ = pad_to_multiple(v, self.n_devices)
            c, _ = pad_to_multiple(c, self.n_devices)
            rng, sub = jax.random.split(rng)
            per_sample = np.asarray(self._loss_fn(
                self.state.params, sub,
                jax.device_put(v, self._bsh), jax.device_put(c, self._bsh)))
            total += float(per_sample[:n_real].sum())
            count += n_real
        return total / count if count else float("nan")

    # -------------------------------------------------------- fidelity probe
    def fidelity_probe(self):
        """Cheap in-training guided-fidelity signal: guided-sample a fixed
        tiny arm (fidelity_probe_n_targets x fidelity_probe_preds at the
        shipping guidance scale) and log its best-of-N pixel-curve NRMSE to
        metrics.jsonl next to the validation loss. Guided fidelity wanders
        ~3x across milestones at FLAT val loss (BENCH_NOTES rounds 3-4), so
        checkpoint selection needs this signal in-loop, not a post-hoc
        sweep. Uses TRACED (w, phi) operands so all milestones — and any
        later (w, phi) sweep arms at the same batch shape — share ONE
        compiled sampling program."""
        tcfg = self.tcfg
        step = int(self.state.step)
        targets = np.genfromtxt(tcfg.fidelity_probe_targets, delimiter=",")
        if targets.ndim == 1:
            targets = targets[None, :]
        targets = targets[:tcfg.fidelity_probe_n_targets]
        # scoring always compares at frame resolution (the protocol of
        # scripts/eval_demo_quality.py); conditioning takes the model's
        # native label shape (per-frame or the [:, 1:] curve tail)
        if targets.shape[1] != self.num_frames:
            score_targets = interpolate_labels(targets, self.num_frames)
        else:
            score_targets = targets
        cond_src = score_targets if self.per_frame_cond else targets[:, 1:]
        cond = self.ds.labels_scaling.normalize(
            cond_src.astype(np.float32)).astype(np.float32)
        cond_rep = np.repeat(cond, tcfg.fidelity_probe_preds, axis=0)
        t0 = time.time()
        videos = self.sample_videos(
            cond_rep, jnp.float32(tcfg.guidance_scale),
            cfg_rescale=jnp.float32(self.diffusion.cfg_rescale or 0.0))
        if jax.process_index() != 0:
            return None
        mode_dir = (self.results_folder / "training" / f"step_{step}"
                    / "fidelity_probe")
        (mode_dir / "gifs").mkdir(parents=True, exist_ok=True)
        save_preds(videos, mode_dir, self.selected_channels,
                   num_samples=len(targets),
                   reference_frame=self.reference_frame,
                   num_frames=self.num_frames, zero_u_2=self.ds.zero_u_2)
        from videometamaterials_tpu.training.fidelity import score_gifs_dir

        nrmse, per_target = score_gifs_dir(
            mode_dir / "gifs", self.ds.folder / "frame_range_data.csv",
            score_targets, tcfg.fidelity_probe_preds, self.reference_frame)
        self._log({"step": step, "fidelity probe NRMSE": nrmse,
                   "fidelity probe per target": per_target})
        print(f"fidelity probe: best-of-{tcfg.fidelity_probe_preds} NRMSE "
              f"{nrmse:.3f} over {len(targets)} targets "
              f"({time.time() - t0:.0f}s)")
        return nrmse

    # ---------------------------------------------------------- target eval
    def eval_target(self, target_labels_dir: str | Path,
                    guidance_scale=None,
                    num_preds: int = 1, cfg_rescale=None):
        """Guided generation for given target stress-strain curves
        (vddp.py:1755-1845)."""
        guidance_scale = guidance_scale if guidance_scale is not None \
            else self.tcfg.guidance_scale
        step = int(self.state.step)

        w_label = (float(f"{float(guidance_scale):.6g}")
                   if isinstance(guidance_scale, jax.Array) else
                   guidance_scale)
        # phi rides in the directory name so (w, phi) sweep outputs are
        # self-describing; phi=0 keeps the reference-exact name
        # eval_target_w_<w>_<i> (dir contract vddp.py:1768-1775)
        phi_eff = (self.diffusion.cfg_rescale if cfg_rescale is None
                   else cfg_rescale)
        phi_label = float(f"{float(phi_eff):.6g}") if phi_eff is not None else 0.0
        mode = f"eval_target_w_{w_label}"
        if phi_label != 0.0:
            mode += f"_phi_{phi_label}"
        eval_idx = 0
        while (self.results_folder / f"{mode}_{eval_idx}"
               / f"step_{step}").exists():
            eval_idx += 1
        mode_dir = self.results_folder / f"{mode}_{eval_idx}" / f"step_{step}"
        if jax.process_index() == 0:
            (mode_dir / "gifs").mkdir(parents=True, exist_ok=True)

        try:
            targets = np.genfromtxt(target_labels_dir, delimiter=",")
        except OSError:
            print("Could not load target labels.")
            return None
        if targets.ndim == 1:
            targets = targets[None, :]

        if self.per_frame_cond:
            if targets.shape[1] != self.num_frames:
                targets = interpolate_labels(targets, self.num_frames)
        else:
            targets = targets[:, 1:]
        cond = self.ds.labels_scaling.normalize(
            targets.astype(np.float32)).astype(np.float32)
        num_samples = len(cond)
        cond_rep = np.repeat(cond, num_preds, axis=0)

        videos = self.sample_videos(cond_rep, guidance_scale,
                                    cfg_rescale=cfg_rescale)
        if jax.process_index() == 0:       # artifacts written once
            save_preds(videos, mode_dir, self.selected_channels,
                       num_samples=num_samples,
                       reference_frame=self.reference_frame,
                       num_frames=self.num_frames,
                       zero_u_2=self.ds.zero_u_2)
        return mode_dir

    # -------------------------------------------------------------- sampling
    def _get_sample_fn(self, batch: int, guidance_scale, cfg_rescale=None):
        """Jitted sampling fn. Python-float knobs are compiled in (the
        historical programs, byte-identical); jax-scalar knobs become traced
        operands so (w, phi) sweep arms share ONE compiled program."""
        if self.diffusion.scan_chunk_size:
            # chunked sampler drives its own jitted scan segments; an outer
            # jit would fuse them back into one long program
            return lambda p, r, c: self.diffusion.sample(
                p, r, c, guidance_scale=guidance_scale,
                cfg_rescale=cfg_rescale)
        traced = (isinstance(guidance_scale, jax.Array)
                  or isinstance(cfg_rescale, jax.Array))
        if traced:
            key = (batch, "traced")
            if key not in self._sample_fns:
                self._sample_fns[key] = jax.jit(
                    lambda p, r, c, w, phi: self.diffusion.sample(
                        p, r, c, guidance_scale=w, inside_jit=True,
                        cfg_rescale=phi),
                    in_shardings=(self._repl, None, self._bsh, None, None),
                )
            jitted = self._sample_fns[key]
            phi = (self.diffusion.cfg_rescale if cfg_rescale is None
                   else cfg_rescale)
            w_op = jnp.asarray(guidance_scale, jnp.float32)
            phi_op = jnp.asarray(phi, jnp.float32)
            return lambda p, r, c: jitted(p, r, c, w_op, phi_op)
        key = (batch, guidance_scale, cfg_rescale)
        if key not in self._sample_fns:
            fn = jax.jit(
                lambda p, r, c: self.diffusion.sample(
                    p, r, c, guidance_scale=guidance_scale, inside_jit=True,
                    cfg_rescale=cfg_rescale),
                in_shardings=(self._repl, None, self._bsh),
            )
            self._sample_fns[key] = fn
        return self._sample_fns[key]

    def sample_videos(self, cond: np.ndarray,
                      guidance_scale=None,
                      use_ema: bool = True, cfg_rescale=None) -> np.ndarray:
        """EMA-sampled videos for a conditioning batch, device-sharded over
        the mesh; replaces the broadcast/shard/gather dance of
        vddp.py:1722-1753."""
        guidance_scale = guidance_scale if guidance_scale is not None \
            else self.tcfg.guidance_scale
        params = self.state.ema_params if use_ema else self.state.params
        chunk = max(self.test_batch, self.n_devices)
        outs = []
        self.rng, rng = jax.random.split(self.rng)
        padded, n = pad_to_multiple(np.asarray(cond, np.float32), chunk)
        fn = self._get_sample_fn(chunk, guidance_scale, cfg_rescale)
        for i in range(0, len(padded), chunk):
            rng, sub = jax.random.split(rng)
            c = jax.device_put(padded[i:i + chunk], self._bsh)
            outs.append(np.asarray(self._gather_for_host(fn(params, sub, c))))
        return np.concatenate(outs, axis=0)[:n]

    # ------------------------------------------------------------ checkpoint
    def save(self, step: Optional[int] = None):
        step = int(self.state.step) if step is None else step
        if (self.tcfg.checkpoint_backend != "orbax"
                and jax.process_count() > 1 and jax.process_index() != 0):
            # msgpack: state is fully replicated, process 0 alone writes
            # (concurrent writers on a shared filesystem would race).
            # Orbax must NOT be skipped here: its async save/wait calls run
            # cross-process barriers that every process has to reach —
            # save_checkpoint gates the actual file writes on process 0.
            return
        payload = jax.device_get({
            "step": self.state.step,
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "ema_params": self.state.ema_params,
        })
        aux = {"labels_scaling": self.ds.labels_scaling.to_dict(),
               "step": step}
        path = ckpt.save_checkpoint(
            self.results_folder, step, payload, aux,
            backend=self.tcfg.checkpoint_backend,
            keep_last=self.tcfg.keep_last_checkpoints)
        print(f"checkpoint saved to {path}")

    def load_torch_checkpoint(self, path: str | Path, which: str = "both"):
        """Import a reference checkpoint.pt (online + EMA weights) into the
        current state (SURVEY.md §5.4: converter for the published
        pretrained weights)."""
        from videometamaterials_tpu.training.torch_import import (
            import_state_dict,
            state_dict_to_numpy,
        )

        num_res = len(self.mcfg.dim_mults)
        template = jax.device_get(self.state.params)
        new_params, new_ema = None, None
        if which in ("both", "model"):
            new_params = import_state_dict(
                state_dict_to_numpy(path, "model"), template, num_res)
        if which in ("both", "ema"):
            new_ema = import_state_dict(
                state_dict_to_numpy(path, "ema"), template, num_res)
        state = TrainState(
            step=self.state.step,
            params=new_params if new_params is not None else self.state.params,
            opt_state=self.state.opt_state,
            ema_params=new_ema if new_ema is not None else self.state.ema_params,
        )
        self.state = jax.device_put(state, self._repl)
        print(f"imported torch checkpoint from {path}")

    def load(self, step: int, strict: bool = True):
        template = jax.device_get({
            "step": self.state.step,
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "ema_params": self.state.ema_params,
        })
        payload, aux = ckpt.load_checkpoint(self.results_folder, step,
                                            template, strict=strict)
        state = TrainState(
            step=jnp.asarray(payload["step"], jnp.int32),
            params=payload["params"],
            opt_state=payload["opt_state"],
            ema_params=payload["ema_params"],
        )
        self.state = jax.device_put(state, self._repl)
        print(f"checkpoint loaded from step {step}")
