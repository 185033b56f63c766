"""DDPM / LatentDiffusion — the process+network bundles with the reference's
API surface (training_step / sample / q_sample / pred_x0), in functional form.

Mirrors ddm/ddm_const_2.py:43-389 (DDPM) and :393-737 (LatentDiffusion) —
the self-consistent `model=` API that all four reference processes share
(SURVEY.md section 0). Parameters are explicit pytrees; every method is
jit-able and shard-agnostic (the trainer pjits them over the data axis).

Deliberate deviations from the reference (documented, not accidental):
  * the reference's `loss_vlb` multiplies a (B,) per-sample term by a (B,1)
    weight, broadcasting to (B,B) before the final sum/B
    (ddm/ddm_const_2.py:249,566-568). We compute the intended per-sample
    product; scale differs by a factor sum(w)/w_i spread (tests pin ours).
  * samplers run fp32 (TPU fp64 is emulated); reference uses fp64 loops.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from adm_tpu.core import sampling
from adm_tpu.core.processes import get_process

Array = jax.Array
PerceptualFn = Callable[[Array, Array], Array]  # (x, y) -> (B,) distance


def _per_sample_sq(a: Array, b: Array) -> Array:
    """Per-sample summed squared error over all non-batch axes
    (= reference MSE_Loss(reduction='sum'), ddm/loss.py:300-310)."""
    d = (a - b) ** 2
    return jnp.sum(d.reshape(d.shape[0], -1), axis=1)


def _per_sample_abs(a: Array, b: Array) -> Array:
    d = jnp.abs(a - b)
    return jnp.sum(d.reshape(d.shape[0], -1), axis=1)


def _per_sample_abs_mean(a: Array, b: Array) -> Array:
    d = jnp.abs(a - b)
    return jnp.mean(d.reshape(d.shape[0], -1), axis=1)


@dataclasses.dataclass(frozen=True)
class DDPM:
    """Image-space decoupled diffusion (reference ddm/ddm_const_2.py:43)."""

    net: Any  # flax module: (x, sigma, ...) -> (drift_pred, noise_pred)
    process_name: str = "const"
    image_size: Tuple[int, int] = (32, 32)
    channels: int = 3
    sampling_timesteps: int = 10
    eps: float = 1e-4
    sigma_min: float = 1e-2
    sigma_max: float = 1.0
    weighting_loss: bool = False
    use_l1: bool = False
    # main loss on (C, eps): 'l2' (MSE_Loss), 'l1' (MAE_Loss) or 'meadstd'
    # (MEADSTD_TANH_NORM_Loss, depth configs), per the config's loss_main
    # class_name (reference ddm/loss.py:150-226,292-389)
    loss_main: str = "l2"
    loss_main_kwargs: Optional[dict] = None
    perceptual_weight: float = 0.0
    clip_x_start: bool = True
    scale_input: float = 1.0
    start_dist: str = "normal"
    sample_type: str = "deterministic"
    # hooks (host-constructed, jit-traced):
    perceptual_fn: Optional[PerceptualFn] = None
    augment_fn: Optional[Callable] = None  # (x, key) -> (x_aug, aug_labels)
    # conditional models: shape of one cond input (e.g. (H, W, C) for
    # image/mask cond, (ctx_len,) for text tokens); None = unconditional
    cond_shape: Optional[Tuple[int, ...]] = None
    cond_dtype: str = "float32"

    @property
    def process(self):
        return get_process(
            self.process_name,
            eps=self.eps,
            sigma_min=self.sigma_min,
            sigma_max=self.sigma_max,
        )

    # ------------------------------------------------------------------
    def init(self, rng: Array, batch_size: int = 1) -> Any:
        h, w = self.image_size
        x = jnp.zeros((batch_size, h, w, self.channels), jnp.float32)
        t = jnp.full((batch_size,), 0.5, jnp.float32)
        # one compiled init program — hundreds of eager per-param dispatches
        # are pathologically slow on the tunneled single-chip setup
        if self.cond_shape is not None:
            cond = jnp.zeros(
                (batch_size, *self.cond_shape), jnp.dtype(self.cond_dtype)
            )
            return jax.jit(self.net.init)(rng, x, t, cond)
        return jax.jit(self.net.init)(rng, x, t)

    def apply_net(
        self,
        params: Any,
        x: Array,
        t: Array,
        cond: Optional[Array] = None,
        *,
        train: bool = False,
        rngs: Optional[dict] = None,
        augment_labels: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        kwargs = dict(deterministic=not train)
        if augment_labels is not None:
            kwargs["augment_labels"] = augment_labels
        if cond is not None:
            return self.net.apply(params, x, t, cond, rngs=rngs, **kwargs)
        return self.net.apply(params, x, t, rngs=rngs, **kwargs)

    # ------------------------------------------------------------------
    def sample_noise(self, key: Array, shape) -> Array:
        if self.start_dist == "normal":
            return jax.random.normal(key, shape, jnp.float32)
        if self.start_dist == "uniform":
            return 2 * jax.random.uniform(key, shape, jnp.float32) - 1
        raise NotImplementedError(f"start_dist {self.start_dist}")

    # image-space DDPM applies LPIPS directly on x_rec; the latent subclass
    # moves it into the decoded-image branch (reference ddm_const_2.py:248 vs
    # :575-576)
    _main_perceptual = True
    # image-space DDPM's use_l1 term is a per-sample MEAN over pixels
    # (ddm_const.py:345-347, ddm_const_2.py:237-240: .abs().mean([1,2,3]));
    # only the LDM variant sums (ddm_const_2.py:562-563)
    _l1_per_sample = staticmethod(_per_sample_abs_mean)

    def extra_vlb(self, x_rec, x_start, t, extras) -> Array:
        """Subclass hook for additional per-sample vlb terms."""
        del x_rec, x_start, t, extras
        return jnp.zeros(())

    def p_losses(
        self,
        params: Any,
        x_start: Array,
        t: Array,
        key: Array,
        cond: Optional[Array] = None,
        *,
        train: bool = True,
        extras: Optional[dict] = None,
        noise: Optional[Array] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        """Weighted decoupled loss (reference ddm/ddm_const_2.py:199-258).

        noise: optional explicit start-dist draw (twin-training harness,
        tools/twin_train.py, shares one noise stream with the reference
        torch loop); defaults to an internal key-derived draw."""
        proc = self.process
        k_noise, k_drift, k_aug, k_drop = jax.random.split(key, 4)
        if noise is None:
            noise = self.sample_noise(k_noise, x_start.shape)

        augment_labels = None
        if self.augment_fn is not None and train:
            x_start, augment_labels = self.augment_fn(x_start, k_aug)

        drift = proc.drift_targets(x_start, k_drift)
        x_noisy = proc.q_sample(x_start, drift, noise, t)
        rngs = {"dropout": k_drop} if train else None
        drift_pred, noise_pred = self.apply_net(
            params,
            x_noisy,
            t,
            cond,
            train=train,
            rngs=rngs,
            augment_labels=augment_labels,
        )

        if self.process_name == "const":
            # reference ddm_const.py:326: x_rec = -C_pred directly
            x_rec = -drift_pred
        else:
            x_rec = proc.pred_x0(x_noisy, drift_pred, noise_pred, t)

        if self.weighting_loss:
            w1, w2 = proc.loss_weights(t)
        else:
            w1 = w2 = jnp.ones_like(t)

        if self.loss_main == "meadstd":
            from adm_tpu.core.depth_loss import meadstd_tanh_norm_loss

            kw = dict(self.loss_main_kwargs or {})

            def main(a, b):
                return meadstd_tanh_norm_loss(a, b, **kw)

        elif self.loss_main == "l1":
            main = _per_sample_abs
        else:
            main = _per_sample_sq
        loss_simple = w1 * main(drift_pred, drift) + w2 * main(noise_pred, noise)
        if self.use_l1:
            loss_simple = (
                loss_simple
                + w1 * self._l1_per_sample(drift_pred, drift)
                + w2 * self._l1_per_sample(noise_pred, noise)
            ) / 2

        loss_vlb = jnp.zeros_like(loss_simple)
        if (
            self._main_perceptual
            and self.perceptual_weight > 0
            and self.perceptual_fn is not None
        ):
            rec_weight = -jnp.log(t) / 2
            loss_vlb = (
                self.perceptual_fn(x_rec, x_start) * rec_weight * self.perceptual_weight
            )
        loss_vlb = loss_vlb + self.extra_vlb(x_rec, x_start, t, extras)

        batch = x_start.shape[0]
        loss = (jnp.sum(loss_simple) + jnp.sum(loss_vlb)) / batch
        denom = batch * x_start.shape[1] * x_start.shape[2] * x_start.shape[3]
        loss_dict = {
            "train/loss_simple": jnp.sum(loss_simple) / denom,
            "train/loss_vlb": jnp.sum(loss_vlb) / denom,
            # reference logs loss/B/C/H/W where loss is ALREADY sum/B
            # (ddm_const.py:359-364) — the logged metric is total/(B^2*CHW)
            "train/loss": loss / denom,
        }
        return loss, loss_dict

    def training_step(
        self, params: Any, batch: Dict[str, Array], key: Array, *,
        train: bool = True,
        t: Optional[Array] = None, noise: Optional[Array] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        """t ~ U(eps, 1) then p_losses (reference ddm/ddm_const_2.py:157-170).

        The residual process diffuses x - ref where ref comes from the batch
        ('ref' key, falling back to the conditioning image — reference
        ddm/ddm_res.py:839-843,744-753).

        t/noise: optional explicit draws (twin-training dynamics harness)
        overriding the key-derived ones."""
        x = batch["image"]
        cond = batch.get("cond")
        if self.scale_input != 1.0:
            x = x * self.scale_input
        if self.process_name == "res":
            ref = batch.get("ref", cond)
            if ref is None:
                raise ValueError("residual process needs batch['ref'] or ['cond']")
            x = x - ref
        k_t, k_p = jax.random.split(key)
        if t is None:
            t = (
                jax.random.uniform(k_t, (x.shape[0],), jnp.float32)
                * (1.0 - self.eps)
                + self.eps
            )
        return self.p_losses(params, x, t, k_p, cond, train=train, noise=noise)

    # ------------------------------------------------------------------
    def _model_fn(self, params: Any, cond: Optional[Array] = None):
        def fn(x, t):
            return self.apply_net(params, x, t, cond, train=False)

        return fn

    def _cond_cached_fn(self, params: Any, cond: Optional[Array], shape):
        """Sampling model_fn with the cond-only backbone precomputed ONCE.

        CondUnet's backbone + per-level projections depend only on `cond`,
        which is constant across the sampling loop — hoisting them out of
        the scan is EXACT (bit-identical to per-step recomputation; the
        cached values are scan-invariant so XLA evaluates them once per
        sample() call). Text2ImgUnet caches its CLIP text tower the same
        way. Falls back to the plain per-step fn for nets without
        `supports_cond_cache`."""
        if cond is None or not getattr(self.net, "supports_cond_cache", False):
            return self._model_fn(params, cond)
        zeros = jnp.zeros(shape, jnp.float32)
        t_dummy = jnp.ones((shape[0],), jnp.float32)
        cache = self.net.apply(params, zeros, t_dummy, cond,
                               mode="cond_cache")

        def fn(x, t):
            return self.net.apply(params, x, t, cond, mode="main",
                                  cache=cache)

        return fn

    def _enc_dec_fns(self, params: Any):
        """(encode_fn, decode_fn) for encoder-propagation sampling
        ("Faster Diffusion", arXiv 2312.09608 — see sampling.py). Only the
        unconditional EDMPrecond path supports the split today."""

        def enc(x, t):
            return self.net.apply(params, x, t, mode="encode")

        def dec(x, t, cache):
            return self.net.apply(params, x, t, mode="decode", cache=cache)

        return enc, dec

    def _encoder_reuse_kwargs(self, params: Any, cond: Optional[Array],
                              encoder_reuse: int) -> dict:
        """Sampler kwargs for encoder propagation (shared by DDPM and
        LatentDiffusion sample paths; both families accept them)."""
        if encoder_reuse <= 1:
            return {}
        if cond is not None:
            raise NotImplementedError(
                "encoder_reuse supports the unconditional EDMPrecond "
                "path only"
            )
        enc, dec = self._enc_dec_fns(params)
        return dict(encoder_reuse=encoder_reuse, encode_fn=enc,
                    decode_fn=dec)

    def sample(
        self,
        params: Any,
        key: Array,
        batch_size: int = 16,
        cond: Optional[Array] = None,
        *,
        unnormalize: bool = True,
        init_noise: Optional[Array] = None,
        ref: Optional[Array] = None,
        encoder_reuse: int = 1,
        order: int = 1,
    ) -> Array:
        """order=2 (Heun, beyond reference) applies to the deterministic
        sampler families only; the stochastic sampler has no use for it (its
        step noise dominates the discretization term the correction cancels),
        so requesting it on a stochastic-routed model raises instead of
        silently sampling first-order."""
        if order not in (1, 2):
            raise ValueError(f"order must be 1 or 2, got {order}")
        stochastic_route = (
            self.sample_type != "deterministic" or self.process_name == "linear"
        )
        if order != 1 and stochastic_route:
            raise ValueError(
                "order=2 (Heun) applies to the deterministic sampler family "
                f"only; this model routes to the stochastic sampler "
                f"(sample_type={self.sample_type!r}, "
                f"process={self.process_name!r}) — drop order or use a "
                "deterministic sample_type"
            )
        h, w = self.image_size
        if cond is not None:
            batch_size = cond.shape[0]
        shape = (batch_size, h, w, self.channels)
        fn = self._cond_cached_fn(params, cond, shape)
        enc_kw = self._encoder_reuse_kwargs(params, cond, encoder_reuse)
        if self.process_name == "res":
            # sample the residual, then reconstruct ref + residual
            # (reference ddm/ddm_res.py:846+,953-969). Both reference sampler
            # families exist for res: sample_fn_d (euler, :407+) and
            # sample_fn_s (quadratic grid, clamp-rebuild, :356-404).
            ref = ref if ref is not None else cond
            if ref is None:
                raise ValueError("residual sampling needs ref (or cond)")
            if self.sample_type == "deterministic":
                res = sampling.sample_deterministic(
                    self.process, fn, shape, key, self.sampling_timesteps,
                    clip_x_start=self.clip_x_start, scale_input=self.scale_input,
                    unnormalize=False, final_clip=False, init_noise=init_noise,
                    order=order, **enc_kw,
                )
            else:
                res = sampling.sample_stochastic(
                    self.process, fn, shape, key, self.sampling_timesteps,
                    clip_x_start=self.clip_x_start, scale_input=self.scale_input,
                    unnormalize=False, final_clip=False, step_grid="quadratic",
                    start_scale=1.0, init_noise=init_noise,
                    **enc_kw,
                )
            img = jnp.clip(ref + res, -1.0, 1.0)
            return sampling.unnormalize_to_zero_to_one(img) if unnormalize else img
        if self.sample_type == "deterministic" and self.process_name != "linear":
            # linear always routes to the stochastic/euler sampler — the
            # reference ddm_linear ships no deterministic path
            # (ddm/ddm_linear.py:259-271: both sample() branches are euler)
            return sampling.sample_deterministic(
                self.process,
                fn,
                shape,
                key,
                self.sampling_timesteps,
                clip_x_start=self.clip_x_start,
                scale_input=self.scale_input,
                unnormalize=unnormalize,
                init_noise=init_noise,
                order=order,
                **enc_kw,
            )
        # image-space sample_fn_s uses the quadratic (sigma^2-linear) grid
        # (ddm_const.py:384-388); only the linear process keeps the uniform
        # euler grid (ddm_linear.py:275-279)
        return sampling.sample_stochastic(
            self.process,
            fn,
            shape,
            key,
            self.sampling_timesteps,
            clip_x_start=self.clip_x_start,
            scale_input=self.scale_input,
            unnormalize=unnormalize,
            step_grid="uniform" if self.process_name == "linear" else "quadratic",
            # const's init-noise sigma_max scaling is commented out upstream
            # (ddm_const.py:393-394); const2/linear keep it (ddm_const_2.py:646)
            start_scale=1.0 if self.process_name in ("const", "res") else None,
            init_noise=init_noise,
            **enc_kw,
        )


def specify_gradient(x: Array, gt_grad: Array) -> Array:
    """JAX equivalent of the reference's SpecifyGradient autograd.Function
    (ddm/ddm_const_2.py:739-752): contributes a constant to the loss value
    while injecting `gt_grad` (scalar or x-shaped, stop-gradiented) as the
    gradient w.r.t. x."""
    g = jax.lax.stop_gradient(jnp.broadcast_to(gt_grad, x.shape))
    val = jnp.sum(x * g)
    return val - jax.lax.stop_gradient(val)


@dataclasses.dataclass(frozen=True)
class LatentDiffusion(DDPM):
    """Latent-space diffusion with a frozen first-stage VAE
    (reference ddm/ddm_const_2.py:393-737).

    `first_stage` is an object exposing encode(params_fs, x, key) -> z and
    decode(params_fs, z) -> x plus down_ratio; its params ride along frozen.
    """

    first_stage: Any = None
    scale_factor: float = 1.0
    scale_by_std: bool = True
    scale_by_softsign: bool = False
    _main_perceptual = False
    # LDM sums the L1 term over pixels (ddm_const_2.py:562-563)
    _l1_per_sample = staticmethod(_per_sample_abs)
    # LDM loss extras (ddm/ddm_const_2.py:566-578):
    use_disloss: bool = False
    # optional extension hook, e.g. the fork's segmentation loss
    # (ddm/ddm_res.py:774-800 — its SegmentationLoss import is broken in the
    # reference repo): (img_rec, batch) -> per-sample (B,) loss
    aux_loss_fn: Optional[Callable] = None

    def encode_input(
        self, fs_params: Any, x: Array, key: Array,
        scale_factor: Optional[Array] = None,
    ) -> Array:
        sf = self.scale_factor if scale_factor is None else scale_factor
        z = self.first_stage.encode_sample(fs_params, x, key)
        z = jax.lax.stop_gradient(z)
        if self.scale_by_softsign:
            return jax.nn.soft_sign(z)
        if self.scale_by_std:
            return sf * z
        return z

    def calibrate_scale_factor(self, fs_params: Any, x: Array, key: Array) -> Array:
        """1/std of first-batch encodings (reference ddm_const_2.py:473-491)."""
        z = self.first_stage.encode_sample(fs_params, x, key)
        return 1.0 / jnp.std(z.reshape(-1))

    def training_step(self, params, batch, key, *, train=True, fs_params=None,
                      scale_factor: Optional[Array] = None):
        """`scale_factor` (a traced scalar, e.g. TrainState.scale_factor)
        overrides the static dataclass field so the calibrated value persists
        through checkpoints and resume uses the ORIGINAL run's factor —
        matching the reference, which restores it from the checkpoint
        (train_uncond_ldm.py:206-207, ddm/ddm_const_2.py:473-491)."""
        x = batch["image"]
        cond = batch.get("cond")
        k_e, k_r, k_t, k_p = jax.random.split(key, 4)
        z = self.encode_input(fs_params, x, k_e, scale_factor)
        ref_z = None
        if self.process_name == "res":
            # residual LDM trains on the LATENT residual z - ref_z
            # (ddm/ddm_res.py:744-752: residual = x_start - ref, where ref is
            # the encoded reference image from get_input :685-699)
            ref_img = batch.get("ref", cond)
            if ref_img is None:
                raise ValueError(
                    "residual LDM needs batch['ref'] or ['cond']"
                )
            ref_z = self.encode_input(fs_params, ref_img, k_r, scale_factor)
            z = z - ref_z
        t = (
            jax.random.uniform(k_t, (z.shape[0],), jnp.float32) * (1.0 - self.eps)
            + self.eps
        )
        sf = self.scale_factor if scale_factor is None else scale_factor
        extras = {"x": x, "fs_params": fs_params, "batch": batch,
                  "ref_z": ref_z, "scale_factor": sf}
        return self.p_losses(params, z, t, k_p, cond, train=train, extras=extras)

    def extra_vlb(self, z_rec, z_start, t, extras) -> Array:
        """LDM vlb tail (ddm/ddm_const_2.py:566-580): per-sample
        |z_rec - z| * (-log t / 2), plus the optional decoder-distillation
        gradient (SpecifyGradient through a no-grad VAE decode) and the
        fork's aux loss hook."""
        rec_weight = -jnp.log(t) / 2
        vlb = (
            jnp.sum(jnp.abs(z_rec - z_start).reshape(z_rec.shape[0], -1), axis=1)
            * rec_weight
        )
        if (self.use_disloss or self.aux_loss_fn is not None) and extras is not None:
            x = extras["x"]
            fs_params = extras["fs_params"]
            sf = extras.get("scale_factor", self.scale_factor)
            # residual process reconstructs ref_z + residual before decode
            # (ddm/ddm_res.py:752,797: img_rec = decode_first_stage(x_rec))
            ref_z = extras.get("ref_z")
            z_dec = z_rec if ref_z is None else z_rec + ref_z
            if self.use_disloss:
                # decoder distillation: VAE decode under stop_gradient, the
                # image loss re-injected through SpecifyGradient
                # (ddm_const_2.py:566-580)
                img_rec = self.first_stage.decode(
                    fs_params, jax.lax.stop_gradient(z_dec) / sf
                )
                img_rec = jnp.clip(img_rec, -1.0, 1.0)
                # signed sum, per the reference (ddm_const_2.py:574:
                # (img_rec - ori_input).sum([1,2,3]) — NOT abs)
                loss_tmp = (
                    jnp.sum((img_rec - x).reshape(x.shape[0], -1), axis=1)
                    * rec_weight
                )
                if self.perceptual_weight > 0 and self.perceptual_fn is not None:
                    loss_tmp = loss_tmp + self.perceptual_fn(img_rec, x) * rec_weight
                if self.aux_loss_fn is not None:
                    loss_tmp = loss_tmp + self.aux_loss_fn(img_rec, extras["batch"])
                # added once per sample so the sum()/B in p_losses cancels and
                # z_rec receives gradient mean(loss_tmp) per element — the
                # reference's effective coefficient (ddm_const_2.py:577-580)
                vlb = vlb + specify_gradient(z_rec, jnp.mean(loss_tmp))
            else:
                # aux hook alone (fork's segmentation loss, ddm_res.py:797-799:
                # loss += loss_seg): the reference's decode_first_stage is
                # @torch.no_grad (ddm_res.py:828-829), so the seg term is a
                # LOGGED CONSTANT contributing zero gradient — mirror that
                # with stop_gradient on the decoded reconstruction
                img_rec = self.first_stage.decode(
                    fs_params, jax.lax.stop_gradient(z_dec) / sf
                )
                img_rec = jnp.clip(img_rec, -1.0, 1.0)
                vlb = vlb + jax.lax.stop_gradient(
                    self.aux_loss_fn(img_rec, extras["batch"])
                )
        return vlb

    def sample(
        self,
        params,
        key,
        batch_size=16,
        cond=None,
        mask=None,
        *,
        fs_params=None,
        unnormalize: bool = True,
        ref: Optional[Array] = None,
        init_noise: Optional[Array] = None,
        encoder_reuse: int = 1,
        order: int = 1,
    ):
        """`ref` (latent-space) is consumed by the residual process: the
        sampled residual is added to it before decoding, per
        ddm/ddm_res.py:846-870 (x_rec = decode(ref + z), no scale inverse).
        `init_noise` (latent-shaped, unit std) overrides the initial PRNG
        draw — the serving/export path's noise input. `encoder_reuse=k`:
        encoder propagation in the LATENT sampler (uncond LDM only).
        `order=2`: Heun in the latent deterministic sampler (the
        stochastic path ignores it)."""
        h, w = self.image_size
        if cond is not None:
            batch_size = cond.shape[0]
        ratio = self.first_stage.down_ratio
        shape = (batch_size, h // ratio, w // ratio, self.channels)
        fn = self._cond_cached_fn(params, cond, shape)
        enc_kw = self._encoder_reuse_kwargs(params, cond, encoder_reuse)
        if self.sample_type == "deterministic" and self.process_name != "linear":
            z = sampling.sample_deterministic(
                self.process,
                fn,
                shape,
                key,
                self.sampling_timesteps,
                clip_x_start=False,
                unnormalize=False,
                final_clip=False,
                init_noise=init_noise,
                order=order,
                **enc_kw,
            )
        else:
            # LDM stochastic correction (ddm_const_2.py:664-676): softsign
            # first clamp-rebuilds at +-0.987654321, then BOTH paths rebuild
            # C = -pred_x0 unclamped; the std path leaves latents unclamped
            # at the end, softsign clamps at +-0.987654321 (:679-680)
            proc = self.process
            if self.process_name in ("const", "const2", "res"):
                softsign = self.scale_by_softsign

                def _ldm_correct(drift, x, noise, t):
                    if softsign:
                        x0 = proc.pred_x0(x, drift, noise, t)
                        drift = -jnp.clip(x0, -0.987654321, 0.987654321)
                    return -proc.pred_x0(x, drift, noise, t)

                correct_fn = _ldm_correct
            else:
                correct_fn = None
            z = sampling.sample_stochastic(
                self.process,
                fn,
                shape,
                key,
                self.sampling_timesteps,
                clip_x_start=False,
                unnormalize=False,
                correct_fn=correct_fn,
                final_clip=0.987654321 if self.scale_by_softsign else False,
                start_scale=1.0,  # LDM init noise is NOT sigma_max-scaled (:655)
                init_noise=init_noise,
                # res-LDM uses the sigma-grid sampler (ddm_res.py:875-890:
                # t from sigma_max to sigma_min^2); identical to the
                # quadratic grid at the default sigma_max=1
                step_grid="quadratic" if self.process_name == "res" else "uniform",
                **enc_kw,
            )
        if self.process_name == "res":
            if ref is None:
                raise ValueError("residual LDM sampling needs a latent ref")
            # ddm/ddm_res.py:867: decode_first_stage(ref + z), and
            # decode_first_stage divides by scale_factor (:829-837)
            z = (ref + z) / self.scale_factor
        elif self.scale_by_std:
            z = z / self.scale_factor
        elif self.scale_by_softsign:
            z = z / (1 - jnp.abs(z))
        x_rec = self.first_stage.decode(fs_params, z.astype(jnp.float32))
        x_rec = jnp.clip(sampling.unnormalize_to_zero_to_one(x_rec), 0.0, 1.0)
        if mask is not None and cond is not None:
            x_rec = mask * sampling.unnormalize_to_zero_to_one(cond) + (1 - mask) * x_rec
        return x_rec
