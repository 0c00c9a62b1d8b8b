"""Gaussian diffusion process: forward noising, training loss, DDPM/DDIM
samplers with classifier-free guidance and dynamic thresholding.

Re-design of the reference GaussianDiffusion (vddp.py:841-1067) as a pure
functional layer over a (model, schedule) pair:

  - the T-step ancestral/DDIM loops are single `lax.scan`s under jit — no
    host round-trips between steps (SURVEY.md §7.3 item 3);
  - the CFG pair (conditional + null forward, vddp.py:723-727) is folded into
    ONE batched model call with batch 2B;
  - randomness is explicit: every entry point takes a PRNG key;
  - videos are (B, F, H, W, C) channels-last, [0,1] at the API boundary and
    [-1,1] internally (normalize/unnormalize_img, vddp.py:1109-1113).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videometamaterials_tpu.ops.schedules import (
    DiffusionSchedule,
    extract,
    make_schedule,
)
from videometamaterials_tpu.utils import cast_params_for_inference


def normalize_img(x):
    return x * 2.0 - 1.0


def unnormalize_img(x):
    return (x + 1.0) * 0.5


@dataclass(frozen=True)
class GaussianDiffusion:
    """Static configuration + schedule; all methods are pure and jittable."""

    model: Any                      # UNet3D (flax module, static pytree)
    image_size: int
    num_frames: int
    channels: int = 4
    timesteps: int = 1000
    loss_type: str = "l1"
    use_dynamic_thres: bool = False
    dynamic_thres_percentile: float = 0.9
    dynamic_thres_method: str = "bisect"   # 'bisect' | 'sort'
    sampling_timesteps: Optional[int] = None
    ddim_sampling_eta: float = 0.0
    # split the sampling scan into host-driven segments of this many steps;
    # None = single fused scan. Needed on runtimes that watchdog-kill long
    # single XLA programs; segment boundaries cost only a host dispatch.
    scan_chunk_size: Optional[int] = None
    # bf16 weight copies inside the sampling scans: halves per-step weight
    # HBM reads, bit-identical under bf16 compute (utils.py:
    # cast_params_for_inference). Identity when the model computes in fp32.
    bf16_inference_weights: bool = True
    # TPU-build addition (no reference equivalent): CFG rescale phi of
    # Lin et al. 2023 ("Common Diffusion Noise Schedules and Sample Steps
    # are Flawed", §3.4) — after eps_cfg = null + w*(cond - null), rescale
    # eps_cfg's per-sample std back to eps_cond's and blend:
    # phi*rescaled + (1-phi)*eps_cfg. Counters the systematic guidance
    # overshoot of large w (measured on the synthetic quality corpus:
    # generated stress-strain curves overshoot targets ~1.5x at w=5,
    # BENCH_NOTES.md). 0.0 = off (exact reference parity).
    cfg_rescale: float = 0.0
    # Share the conditioning-independent init stage (init conv + init
    # temporal attention, vddp.py:742-743) across the two identical halves
    # of the CFG-folded batch: guided_eps tiles [x; x], so the init stage
    # runs at batch b and is re-tiled inside the UNet. Exact same math per
    # sample — bit-identical outputs — at ~half the init-stage cost (the
    # init temporal attention is one of the three full-resolution temporal
    # blocks). Off = trace the plain 2b forward.
    cfg_shared_init: bool = True
    # Latency mode: a NamedSharding that partitions the HEIGHT axis of the
    # sampled video across a mesh (parallel/mesh.py:spatial_video_sharding).
    # One video's whole denoising chain then runs SPMD across chips —
    # GSPMD derives conv halo exchanges and attention collectives from this
    # single constraint on the scan carry. Complements batch sharding
    # (throughput) with single-sample latency scaling. XLA plans only (the
    # whole-block Pallas kernels are opaque to GSPMD's spatial partitioner).
    sample_spatial_sharding: Any = None
    schedule: DiffusionSchedule = field(default=None)

    def __post_init__(self):
        if self.schedule is None:
            object.__setattr__(self, "schedule", make_schedule(self.timesteps))
        st = self.sampling_timesteps or self.timesteps
        assert st <= self.timesteps
        object.__setattr__(self, "sampling_timesteps", st)
        object.__setattr__(self, "_jit_cache", {})
        if self.sample_spatial_sharding is not None and (
                bool(getattr(self.model, "use_fused_linear_block", False))
                or bool(getattr(self.model, "use_fused_temporal_block",
                                False))):
            raise ValueError(
                "sample_spatial_sharding requires the XLA plans: the "
                "whole-block Pallas kernels are opaque custom calls that "
                "GSPMD cannot spatially partition (build the model with "
                "use_fused_*_block=False for latency-mode sampling)")

    def _constrain_spatial(self, img, inside_jit: bool = True):
        """Pin the scan carry to the latency-mode height sharding (no-op
        when unset). Re-asserted every step so GSPMD keeps the partitioned
        layout through the whole chain instead of drifting to replicated.
        Under a trace (`inside_jit`, the default — scan bodies are always
        traced) this is a sharding constraint; on the concrete init array of
        the host-driven chunked path it is a device_put."""
        if self.sample_spatial_sharding is None:
            return img
        if inside_jit:
            return jax.lax.with_sharding_constraint(
                img, self.sample_spatial_sharding)
        return jax.device_put(img, self.sample_spatial_sharding)

    # ------------------------------------------------------------------ util
    @property
    def is_ddim_sampling(self) -> bool:
        return self.sampling_timesteps < self.timesteps   # vddp.py:911

    def _video_shape(self, batch):
        return (batch, self.num_frames, self.image_size, self.image_size,
                self.channels)

    # -------------------------------------------------------------- q process
    def q_sample(self, x_start, t, noise):
        """Forward noising q(x_t | x_0) (vddp.py:1036-1042)."""
        s = self.schedule
        nd = x_start.ndim
        return (extract(s.sqrt_alphas_cumprod, t, nd) * x_start
                + extract(s.sqrt_one_minus_alphas_cumprod, t, nd) * noise)

    def q_mean_variance(self, x_start, t):
        """Moments of q(x_t | x_0) (vddp.py:914-918)."""
        s = self.schedule
        nd = x_start.ndim
        mean = extract(s.sqrt_alphas_cumprod, t, nd) * x_start
        variance = extract(1.0 - s.alphas_cumprod, t, nd)
        log_variance = extract(s.log_one_minus_alphas_cumprod, t, nd)
        return mean, variance, log_variance

    def predict_start_from_noise(self, x_t, t, noise):
        s = self.schedule
        nd = x_t.ndim
        return (extract(s.sqrt_recip_alphas_cumprod, t, nd) * x_t
                - extract(s.sqrt_recipm1_alphas_cumprod, t, nd) * noise)

    def q_posterior(self, x_start, x_t, t):
        s = self.schedule
        nd = x_t.ndim
        mean = (extract(s.posterior_mean_coef1, t, nd) * x_start
                + extract(s.posterior_mean_coef2, t, nd) * x_t)
        var = extract(s.posterior_variance, t, nd)
        log_var = extract(s.posterior_log_variance_clipped, t, nd)
        return mean, var, log_var

    # ----------------------------------------------------------------- model
    def guided_eps(self, params, x, t, cond, guidance_scale,
                   cfg_rescale=None):
        """Classifier-free-guided noise prediction. Folds the two forwards of
        vddp.py:715-728 into one model call on a doubled batch.

        `guidance_scale` and `cfg_rescale` accept Python floats (baked into
        the compiled program, exactly the historical behavior) OR jax scalars
        — traced operands, so (w, phi) sweeps share ONE compiled program
        instead of paying a multi-minute remote compile per arm.
        cfg_rescale=None falls back to the config value."""
        phi = self.cfg_rescale if cfg_rescale is None else cfg_rescale
        b = x.shape[0]
        w_static = not isinstance(guidance_scale, jax.Array)
        if w_static and guidance_scale == 1.0:
            # w == 1 makes CFG a no-op and the rescale an identity
            return self.model.apply(
                params, x, t, cond,
                null_cond_mask=jnp.zeros((b,), dtype=bool))
        t2 = jnp.concatenate([t, t], axis=0)
        cond2 = jnp.concatenate([cond, cond], axis=0)
        mask2 = jnp.concatenate(
            [jnp.zeros((b,), dtype=bool), jnp.ones((b,), dtype=bool)], axis=0)
        if self.cfg_shared_init:
            # the UNet tiles x to 2b itself, AFTER its cond-independent
            # init stage (computed once per unique latent; see unet3d.py)
            eps2 = self.model.apply(params, x, t2, cond2,
                                    null_cond_mask=mask2,
                                    cfg_tiled_pair=True)
        else:
            x2 = jnp.concatenate([x, x], axis=0)
            eps2 = self.model.apply(params, x2, t2, cond2,
                                    null_cond_mask=mask2)
        eps_cond, eps_null = jnp.split(eps2, 2, axis=0)
        if not w_static:
            # cast the operand to the result dtype the weak-typed Python
            # float would have produced (bf16*f32 promotion would silently
            # widen every downstream sampling op)
            guidance_scale = guidance_scale.astype(eps_null.dtype)
        eps = eps_null + (eps_cond - eps_null) * guidance_scale
        phi_traced = isinstance(phi, jax.Array)
        if phi_traced or phi > 0.0:
            # Lin et al. 2023 §3.4 (diffusers' guidance_rescale): restore
            # the conditional prediction's per-sample std, blend by phi
            axes = tuple(range(1, eps.ndim))
            std_cond = jnp.std(eps_cond.astype(jnp.float32), axis=axes,
                               keepdims=True)
            std_cfg = jnp.std(eps.astype(jnp.float32), axis=axes,
                              keepdims=True)
            rescaled = eps * (std_cond
                              / jnp.maximum(std_cfg, 1e-8)).astype(eps.dtype)
            if phi_traced:
                phi = phi.astype(eps.dtype)
                one_minus = (1.0 - phi.astype(jnp.float32)).astype(eps.dtype)
            else:
                one_minus = 1.0 - phi
            eps = (phi * rescaled + one_minus * eps).astype(eps.dtype)
        return eps

    def _maybe_threshold(self, x_recon):
        """Static ('clip to [-1,1]') or dynamic (Imagen) thresholding of the
        reconstructed x0 (vddp.py:938-951).

        dynamic_thres_method='bisect' (default) computes the per-sample
        quantile of |x0| by a fixed 12-round bisection on counts — a handful
        of fused compare+sum passes instead of a full sort per diffusion
        step. Sort lowering on TPU is both slow to compile inside a scan and
        slow to run; the bisection is exact to ~max|x0|/4096, far below the
        threshold's effect size. 'sort' reproduces torch.quantile exactly."""
        if not self.use_dynamic_thres:
            return jnp.clip(x_recon, -1.0, 1.0)
        flat = jnp.abs(x_recon.reshape(x_recon.shape[0], -1))
        if self.dynamic_thres_method == "sort":
            s = jnp.quantile(flat, self.dynamic_thres_percentile, axis=-1)
        else:
            q = self.dynamic_thres_percentile
            n = flat.shape[-1]
            lo = jnp.zeros((flat.shape[0],), jnp.float32)
            hi = jnp.max(flat, axis=-1)

            def body(_, carry):
                lo, hi = carry
                mid = 0.5 * (lo + hi)
                frac_below = jnp.sum(
                    (flat <= mid[:, None]).astype(jnp.float32), axis=-1) / n
                take_hi = frac_below < q
                return (jnp.where(take_hi, mid, lo),
                        jnp.where(take_hi, hi, mid))

            lo, hi = jax.lax.fori_loop(0, 12, body, (lo, hi))
            s = 0.5 * (lo + hi)
        s = jnp.maximum(s, 1.0)
        s = s.reshape(-1, *((1,) * (x_recon.ndim - 1)))
        return jnp.clip(x_recon, -s, s) / s

    def p_mean_variance(self, params, x, t, cond, guidance_scale,
                        clip_denoised: bool = True, cfg_rescale=None):
        eps = self.guided_eps(params, x, t, cond, guidance_scale,
                              cfg_rescale=cfg_rescale)
        x_recon = self.predict_start_from_noise(x, t, eps)
        if clip_denoised:
            x_recon = self._maybe_threshold(x_recon)
        return self.q_posterior(x_recon, x, t)

    # --------------------------------------------------------------- samplers
    def p_sample(self, params, rng, x, t, cond, guidance_scale,
                 cfg_rescale=None):
        """One ancestral step (vddp.py:956-963). t: (b,) int array."""
        mean, _, log_var = self.p_mean_variance(params, x, t, cond,
                                                guidance_scale,
                                                cfg_rescale=cfg_rescale)
        noise = jax.random.normal(rng, x.shape, x.dtype)
        nonzero = (t > 0).astype(x.dtype).reshape(-1, *((1,) * (x.ndim - 1)))
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise

    def _inference_params(self, params):
        """bf16 weight copies for the sampling scans (see the field doc).
        Called inside the jitted scan programs so the copies never outlive
        them; XLA hoists the cast out of the scan body, so each chunk pays
        one fp32 read of the weights and every step reads bf16."""
        if not self.bf16_inference_weights:
            return params
        if getattr(self.model, "compute_dtype", "float32") != "bfloat16":
            return params
        return cast_params_for_inference(params)

    def _ddpm_scan(self, params, img, rng, ts, cond, guidance_scale,
                   cfg_rescale=None):
        """Scan the ancestral chain over the given timestep array."""
        params = self._inference_params(params)
        b = img.shape[0]

        def step(carry, t_scalar):
            img, key = carry
            key, sub = jax.random.split(key)
            t_vec = jnp.full((b,), t_scalar, dtype=jnp.int32)
            img = self._constrain_spatial(
                self.p_sample(params, sub, img, t_vec, cond, guidance_scale,
                              cfg_rescale=cfg_rescale))
            return (img, key), None

        (img, rng), _ = jax.lax.scan(step, (img, rng), ts)
        return img, rng

    def _traced_guidance(self, guidance_scale, cfg_rescale):
        """(traced?, w_operand, phi_operand) for the chunked samplers: if
        EITHER knob is a jax array, both become f32 operands of one shared
        compiled chunk program (sweep arms then recompile nothing)."""
        traced = (isinstance(guidance_scale, jax.Array)
                  or isinstance(cfg_rescale, jax.Array))
        if not traced:
            return False, None, None
        phi = self.cfg_rescale if cfg_rescale is None else cfg_rescale
        return (True, jnp.asarray(guidance_scale, jnp.float32),
                jnp.asarray(phi, jnp.float32))

    def p_sample_loop(self, params, rng, shape, cond, guidance_scale,
                      inside_jit: bool = False, cfg_rescale=None):
        """Full T-step ancestral chain (vddp.py:965-975): one lax.scan, or —
        with scan_chunk_size — host-driven segments of a single compiled
        chunk program. Callers that trace this function under an outer jit
        must pass inside_jit=True (host-driven chunking is impossible under
        a trace; the whole chain fuses into the caller's program)."""
        rng, init_rng = jax.random.split(rng)
        img = self._constrain_spatial(
            jax.random.normal(init_rng, shape, jnp.float32), inside_jit)
        ts = jnp.arange(self.timesteps - 1, -1, -1)

        if not self.scan_chunk_size or inside_jit:
            img, _ = self._ddpm_scan(params, img, rng, ts, cond,
                                     guidance_scale, cfg_rescale=cfg_rescale)
            return unnormalize_img(img)

        k = self.scan_chunk_size
        ts_host = np.asarray(ts)
        traced, w_op, phi_op = self._traced_guidance(guidance_scale,
                                                     cfg_rescale)

        def chunk_fn(length):
            if traced:
                key = ("ddpm", shape, "traced", length)
                if key not in self._jit_cache:
                    self._jit_cache[key] = jax.jit(
                        lambda p, i, r, t, c, w, phi: self._ddpm_scan(
                            p, i, r, t, c, w, cfg_rescale=phi),
                        donate_argnums=(1,))
            else:
                key = ("ddpm", shape, guidance_scale, cfg_rescale, length)
                if key not in self._jit_cache:
                    self._jit_cache[key] = jax.jit(
                        lambda p, i, r, t, c: self._ddpm_scan(
                            p, i, r, t, c, guidance_scale,
                            cfg_rescale=cfg_rescale),
                        donate_argnums=(1,))
            return self._jit_cache[key]

        for start in range(0, len(ts_host), k):
            chunk = ts_host[start:start + k]
            extra = (w_op, phi_op) if traced else ()
            img, rng = chunk_fn(len(chunk))(params, img, rng,
                                            jnp.asarray(chunk), cond, *extra)
        return unnormalize_img(img)

    def _ddim_scan(self, params, img, rng, pairs, cond, guidance_scale,
                   cfg_rescale=None):
        params = self._inference_params(params)
        b = img.shape[0]
        eta = self.ddim_sampling_eta
        abar = self.schedule.alphas_cumprod

        def step(carry, pair):
            img, key = carry
            key, sub = jax.random.split(key)
            t_now, t_next = pair[0], pair[1]
            t_vec = jnp.full((b,), t_now, dtype=jnp.int32)
            eps = self.guided_eps(params, img, t_vec, cond, guidance_scale,
                                  cfg_rescale=cfg_rescale)
            x_start = self.predict_start_from_noise(img, t_vec, eps)

            alpha = abar[t_now]
            alpha_next = jnp.where(t_next >= 0, abar[jnp.maximum(t_next, 0)],
                                   1.0)
            sigma = eta * jnp.sqrt((1 - alpha / alpha_next)
                                   * (1 - alpha_next) / (1 - alpha))
            c = jnp.sqrt(jnp.maximum(1.0 - alpha_next - sigma ** 2, 0.0))
            noise = jax.random.normal(sub, img.shape, img.dtype)
            img_next = (x_start * jnp.sqrt(alpha_next) + c * eps
                        + sigma * noise)
            img = self._constrain_spatial(
                jnp.where(t_next < 0, x_start, img_next))
            return (img, key), None

        (img, rng), _ = jax.lax.scan(step, (img, rng), pairs)
        return img, rng

    def ddim_sample(self, params, rng, shape, cond, guidance_scale,
                    inside_jit: bool = False, cfg_rescale=None):
        """DDIM sampler (vddp.py:986-1018), eta-noise optional; chunked like
        p_sample_loop when scan_chunk_size is set (see its inside_jit doc)."""
        total, steps = self.timesteps, self.sampling_timesteps
        times = np.linspace(-1, total - 1, num=steps + 1).astype(np.int64)
        times = list(reversed(times.tolist()))
        pairs = np.asarray(list(zip(times[:-1], times[1:])), dtype=np.int32)

        rng, init_rng = jax.random.split(rng)
        img = self._constrain_spatial(
            jax.random.normal(init_rng, shape, jnp.float32), inside_jit)

        if not self.scan_chunk_size or inside_jit:
            img, _ = self._ddim_scan(params, img, rng, jnp.asarray(pairs),
                                     cond, guidance_scale,
                                     cfg_rescale=cfg_rescale)
            return unnormalize_img(img)

        k = self.scan_chunk_size
        traced, w_op, phi_op = self._traced_guidance(guidance_scale,
                                                     cfg_rescale)

        def chunk_fn(length):
            if traced:
                key = ("ddim", shape, "traced", length)
                if key not in self._jit_cache:
                    self._jit_cache[key] = jax.jit(
                        lambda p, i, r, t, c, w, phi: self._ddim_scan(
                            p, i, r, t, c, w, cfg_rescale=phi),
                        donate_argnums=(1,))
            else:
                key = ("ddim", shape, guidance_scale, cfg_rescale, length)
                if key not in self._jit_cache:
                    self._jit_cache[key] = jax.jit(
                        lambda p, i, r, t, c: self._ddim_scan(
                            p, i, r, t, c, guidance_scale,
                            cfg_rescale=cfg_rescale),
                        donate_argnums=(1,))
            return self._jit_cache[key]

        for start in range(0, len(pairs), k):
            chunk = pairs[start:start + k]
            extra = (w_op, phi_op) if traced else ()
            img, rng = chunk_fn(len(chunk))(params, img, rng,
                                            jnp.asarray(chunk), cond, *extra)
        return unnormalize_img(img)

    def sample(self, params, rng, cond, guidance_scale=1.0,
               batch_size: int = 16, inside_jit: bool = False,
               cfg_rescale=None):
        """Dispatch DDPM vs DDIM by sampling_timesteps (vddp.py:977-984).
        Returns videos in [0, 1], shape (b, F, H, W, C). Pass inside_jit=True
        when tracing this call under an outer jit with scan_chunk_size set —
        the chain then runs as one fused scan instead of host-driven chunks.
        guidance_scale/cfg_rescale: Python floats compile the value in (the
        historical behavior); jax scalars become traced operands of one
        shared chunk program (see guided_eps)."""
        b = cond.shape[0] if cond is not None else batch_size
        shape = self._video_shape(b)
        fn = self.ddim_sample if self.is_ddim_sampling else self.p_sample_loop
        return fn(params, rng, shape, cond, guidance_scale,
                  inside_jit=inside_jit, cfg_rescale=cfg_rescale)

    def interpolate(self, params, rng, x1, x2, t: Optional[int] = None,
                    lam: float = 0.5, guidance_scale: float = 1.0,
                    cond=None):
        """Latent interpolation (vddp.py:1020-1034): noise both inputs to
        step t, mix, then ancestrally denoise t steps."""
        params = self._inference_params(params)
        t = self.timesteps - 1 if t is None else t
        b = x1.shape[0]
        rng, n1, n2 = jax.random.split(rng, 3)
        t_b = jnp.full((b,), t, dtype=jnp.int32)
        xt1 = self.q_sample(x1, t_b, jax.random.normal(n1, x1.shape, x1.dtype))
        xt2 = self.q_sample(x2, t_b, jax.random.normal(n2, x2.shape, x2.dtype))
        img0 = (1 - lam) * xt1 + lam * xt2

        if cond is None:
            cond = jnp.zeros((b, self.num_frames), jnp.float32)

        def step(carry, t_scalar):
            img, key = carry
            key, sub = jax.random.split(key)
            t_vec = jnp.full((b,), t_scalar, dtype=jnp.int32)
            img = self.p_sample(params, sub, img, t_vec, cond, guidance_scale)
            return (img, key), None

        ts = jnp.arange(t - 1, -1, -1)
        (img, _), _ = jax.lax.scan(step, (img0, rng), ts)
        return img

    # ------------------------------------------------------------------ loss
    def p_losses(self, params, rng, x_start, t, cond, null_cond_prob=0.0,
                 focus_present_mask=None, prob_focus_present=0.0,
                 per_sample: bool = False):
        """epsilon-prediction loss (vddp.py:1044-1060).

        per_sample=True returns the (b,) vector of per-sample means instead of
        the batch mean — used by validation so padded rows can be masked out
        and tail batches size-weighted (the reference gathers true per-batch
        losses, vddp.py:1695-1714)."""
        noise_rng, mask_rng, focus_rng = jax.random.split(rng, 3)
        noise = jax.random.normal(noise_rng, x_start.shape, x_start.dtype)
        x_noisy = self.q_sample(x_start, t, noise)

        b = x_start.shape[0]
        null_mask = jax.random.bernoulli(mask_rng, null_cond_prob, (b,))
        if focus_present_mask is None and prob_focus_present > 0:
            focus_present_mask = jax.random.bernoulli(
                focus_rng, prob_focus_present, (b,))

        eps_hat = self.model.apply(params, x_noisy, t, cond,
                                   null_cond_mask=null_mask,
                                   focus_present_mask=focus_present_mask)
        if self.loss_type == "l1":
            err = jnp.abs(noise - eps_hat)
        elif self.loss_type == "l2":
            err = jnp.square(noise - eps_hat)
        else:
            raise NotImplementedError(self.loss_type)
        if per_sample:
            return jnp.mean(err.reshape(b, -1), axis=-1)
        return jnp.mean(err)

    def loss(self, params, rng, x, cond, null_cond_prob=0.0,
             focus_present_mask=None, prob_focus_present=0.0,
             per_sample: bool = False):
        """Training objective on [0,1] videos: draw t ~ U[0,T), map to [-1,1]
        (vddp.py:1062-1067)."""
        b, f, h, w, c = x.shape
        assert (c, f, h, w) == (self.channels, self.num_frames,
                                self.image_size, self.image_size), (
            f"bad video shape {x.shape}")
        t_rng, loss_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (b,), 0, self.timesteps)
        return self.p_losses(params, loss_rng, normalize_img(x), t, cond,
                             null_cond_prob=null_cond_prob,
                             focus_present_mask=focus_present_mask,
                             prob_focus_present=prob_focus_present,
                             per_sample=per_sample)

    @classmethod
    def from_config(cls, model, cfg) -> "GaussianDiffusion":
        """Mirror of main.py:82-91."""
        return cls(
            model=model,
            image_size=cfg.image_size,
            num_frames=cfg.num_frames,
            channels=len(cfg.selected_channels),
            timesteps=cfg.train_timesteps,
            loss_type=cfg.loss_type,
            use_dynamic_thres=cfg.use_dynamic_thres,
            dynamic_thres_percentile=cfg.dynamic_thres_percentile,
            dynamic_thres_method=getattr(cfg, "dynamic_thres_method",
                                         "bisect"),
            sampling_timesteps=cfg.sampling_timesteps,
            ddim_sampling_eta=cfg.ddim_sampling_eta,
            scan_chunk_size=getattr(cfg, "sample_scan_chunk", None),
            bf16_inference_weights=getattr(cfg, "bf16_inference_weights",
                                           True),
            cfg_rescale=getattr(cfg, "cfg_rescale", 0.0),
            cfg_shared_init=getattr(cfg, "cfg_shared_init", True),
        )
