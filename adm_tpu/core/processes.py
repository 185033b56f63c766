"""Decoupled diffusion processes as pure JAX functions.

The reference implements four continuous-time "decoupled" forward processes
(image-to-zero drift + zero-to-noise diffusion), one per file:

  const   xt = x0 + C*t + sqrt(t)*eps   C = -x0      (ddm/ddm_const.py:284-287)
  const2  xt = x0 + C*t +      t *eps   C = -x0      (ddm/ddm_const_2.py:173-176)
  linear  xt = x0 + K/2*t^2 + C*t + sqrt(t)*eps,
          K ~ N(0,1).clamp(+-1), C = -x0 - K/2       (ddm/ddm_linear.py:168-171,198-199)
  res     like `const` but on residual = x0 - ref    (ddm/ddm_res.py:744-753)

Each process is a frozen dataclass of pure, jit-able methods:

  q_sample(x0, drift, noise, t)           forward corruption
  pred_x0(xt, drift, noise, t)            analytic inversion
  reverse_mean_sigma(xt, drift, noise, t, s)
                                          posterior mean / sigma of x_{t-s}
  loss_weights(t)                         (w_drift, w_noise) MSE weights
  t_steps(n)                              deterministic sampler time grid
  deterministic_step(xt, drift, noise, t_cur, t_next, clip)

"drift" packs the process-specific drift parameters: C for const/const2/res,
(K, C) stacked on the channel axis for linear (the network also predicts the
stacked pair, reference ddm/ddm_linear.py:202-203).

Everything here is shape-polymorphic: t has shape (B,) (or scalar) and is
broadcast to x's rank. No classes own parameters; networks live in adm_tpu.nn.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def bcast_right(t: Array, x: Array) -> Array:
    """Broadcast a (B,) or scalar time vector against x of shape (B, ...)."""
    t = jnp.asarray(t)
    if t.ndim == 0:
        return t
    return t.reshape(t.shape[0], *((1,) * (x.ndim - 1)))


@dataclasses.dataclass(frozen=True)
class _BaseProcess:
    """Shared machinery for the sqrt(t)-noise family (const / linear / res)."""

    eps: float = 1e-4
    sigma_min: float = 1e-2
    sigma_max: float = 1.0

    # ---- forward ------------------------------------------------------
    def drift_targets(self, x0: Array, key: Array) -> Array:
        """Process drift target(s) computed from the clean image.

        For const-family: C = -x0 (so the drift C*t carries x0 to 0 at t=1).
        """
        del key
        return -x0

    def drift_at(self, drift: Array, t: Array) -> Array:
        """Accumulated drift U(t); const family: C*t."""
        return drift * bcast_right(t, drift)

    def noise_scale(self, t: Array) -> Array:
        """Std multiplier a(t) on the noise term; sqrt(t) for this family."""
        return jnp.sqrt(t)

    def q_sample(self, x0: Array, drift: Array, noise: Array, t: Array) -> Array:
        tb = bcast_right(t, x0)
        return x0 + self.drift_at(drift, t) + self.noise_scale(tb) * noise

    def pred_x0(self, xt: Array, drift: Array, noise: Array, t: Array) -> Array:
        tb = bcast_right(t, xt)
        return xt - self.drift_at(drift, t) - self.noise_scale(tb) * noise

    # ---- reverse (stochastic) ------------------------------------------
    def reverse_mean_sigma(
        self, xt: Array, drift: Array, noise: Array, t: Array, s: Array
    ) -> Tuple[Array, Array]:
        """Mean/std of x_{t-s} given x_t for the sqrt(t)-noise family.

        Reference ddm/ddm_const.py:296-303:
          mean = xt - C*s - s/sqrt(t)*eps ; sigma = sqrt(s*(t-s)/t)
        """
        tb = bcast_right(t, xt)
        sb = bcast_right(s, xt)
        mean = xt - drift * sb - sb / jnp.sqrt(tb) * noise
        sigma = jnp.sqrt(sb * (tb - sb) / tb)
        return mean, sigma

    def stochastic_correct(
        self, drift: Array, xt: Array, noise: Array, t: Array, clip: float | None
    ) -> Array:
        """Mid-loop drift correction in the stochastic sampler.

        const family (ddm/ddm_const_2.py:322-327): invert to x0, clamp, and
        rebuild C = -x0 so the remaining drift aims at the clamped image.
        """
        x0 = self.pred_x0(xt, drift, noise, t)
        if clip is not None:
            x0 = jnp.clip(x0, -clip, clip)
        return -x0

    # ---- training loss weights ----------------------------------------
    def loss_weights(self, t: Array) -> Tuple[Array, Array]:
        """(w_drift, w_noise); reference ddm/ddm_const.py:335-341."""
        w1 = (t**2 - t + 1) / t
        w2 = (t**2 - t + 1) / (1 - t + self.eps)
        return w1, w2

    # ---- deterministic sampler grid ------------------------------------
    def t_steps(self, n: int) -> Array:
        """Linear time grid sigma_max -> t_min, with a trailing 0.

        const family uses t_min = sigma_min**2 (ddm/ddm_const.py:429-436);
        const2 overrides with t_min = 1/n (ddm/ddm_const_2.py:341-349).
        """
        if n < 2:
            raise ValueError(f"t_steps needs n >= 2 sampling steps, got {n}")
        t_min = self.sigma_min**2
        idx = jnp.arange(n, dtype=jnp.float32)
        steps = self.sigma_max + idx / (n - 1) * (t_min - self.sigma_max)
        return jnp.concatenate([steps, jnp.zeros((1,), steps.dtype)])

    def deterministic_step(
        self,
        xt: Array,
        drift: Array,
        noise: Array,
        t_cur: Array,
        t_next: Array,
        clip: float | None = 1.0,
    ) -> Array:
        """One step of the deterministic (Euler/analytic) sampler.

        sqrt(t) family (ddm/ddm_const.py:452-456): invert at t_cur, clamp x0,
        re-noise at t_next with the PREDICTED drift:
          x_next = x0 + C*t_next + noise*sqrt(t_next)
        (clamping affects only x0, not the drift used to re-noise).
        """
        x0 = self.pred_x0(xt, drift, noise, t_cur)
        if clip is not None:
            x0 = jnp.clip(x0, -clip, clip)
        tn = bcast_right(t_next, xt)
        return x0 + drift * tn + self.noise_scale(tn) * noise


@dataclasses.dataclass(frozen=True)
class ConstProcess(_BaseProcess):
    """xt = x0 + C*t + sqrt(t)*eps (ddm/ddm_const.py)."""

    name: str = "const"


@dataclasses.dataclass(frozen=True)
class Const2Process(_BaseProcess):
    """xt = x0 + C*t + t*eps (ddm/ddm_const_2.py)."""

    name: str = "const2"

    def noise_scale(self, t: Array) -> Array:
        return t

    def reverse_mean_sigma(self, xt, drift, noise, t, s):
        """Reference ddm/ddm_const_2.py:185-197:
        mean = xt - C*s - (2st - s^2)/t * eps
        sigma = sqrt(2st - s^2) * (t-s)/t
        """
        tb = bcast_right(t, xt)
        sb = bcast_right(s, xt)
        mean = xt - drift * sb - (2 * sb * tb - sb**2) / tb * noise
        sigma = jnp.sqrt(2 * sb * tb - sb**2) * (tb - sb) / tb
        return mean, sigma

    def loss_weights(self, t):
        """Reference ddm/ddm_const_2.py:227-233."""
        w1 = ((t - 1) / t) ** 2 + 1
        w2 = (t / (1 - t + self.eps)) ** 2 + 1
        return w1, w2

    def t_steps(self, n: int) -> Array:
        if n < 2:
            raise ValueError(f"t_steps needs n >= 2 sampling steps, got {n}")
        t_min = 1.0 / n
        idx = jnp.arange(n, dtype=jnp.float32)
        steps = self.sigma_max + idx / (n - 1) * (t_min - self.sigma_max)
        return jnp.concatenate([steps, jnp.zeros((1,), steps.dtype)])

    def deterministic_step(self, xt, drift, noise, t_cur, t_next, clip=1.0):
        """Reference ddm/ddm_const_2.py:355-368: x0 = xt - (C+eps)*t;
        x_next = x0 + t'*(C+eps). No x0 clamping inside the loop."""
        del clip
        tc = bcast_right(t_cur, xt)
        tn = bcast_right(t_next, xt)
        x0 = xt - drift * tc - noise * tc
        return x0 + tn * drift + tn * noise


@dataclasses.dataclass(frozen=True)
class LinearProcess(_BaseProcess):
    """xt = x0 + K/2*t^2 + C*t + sqrt(t)*eps (ddm/ddm_linear.py).

    `drift` stacks (K, C) along the channel axis (last axis in NHWC),
    mirroring the network's 2x-channel theta output split by chunk
    (ddm/ddm_linear.py:202-203).
    """

    name: str = "linear"

    def drift_targets(self, x0: Array, key: Array) -> Array:
        k = jnp.clip(jax.random.normal(key, x0.shape, x0.dtype), -1.0, 1.0)
        c = -x0 - k / 2
        return jnp.concatenate([k, c], axis=-1)

    @staticmethod
    def split_kc(drift: Array) -> Tuple[Array, Array]:
        k, c = jnp.split(drift, 2, axis=-1)
        return k, c

    def drift_at(self, drift: Array, t: Array) -> Array:
        k, c = self.split_kc(drift)
        tb = bcast_right(t, k)
        return k / 2 * tb**2 + c * tb

    def reverse_mean_sigma(self, xt, drift, noise, t, s):
        """Reference ddm/ddm_linear.py:178-186:
        mean = xt + K/2*s^2 - K*t*s - C*s - s/sqrt(t)*eps
        sigma = sqrt(s*(t-s)/t)
        """
        k, c = self.split_kc(drift)
        tb = bcast_right(t, xt)
        sb = bcast_right(s, xt)
        mean = xt + k / 2 * sb**2 - k * tb * sb - c * sb - sb / jnp.sqrt(tb) * noise
        sigma = jnp.sqrt(sb * (tb - sb) / tb)
        return mean, sigma

    def loss_weights(self, t):
        """Reference ddm/ddm_linear.py:213-216."""
        return 1.0 / t, 1.0 / (1 - t + self.eps)

    def stochastic_correct(self, drift, xt, noise, t, clip):
        """linear family clamps K only (ddm/ddm_linear.py:300-301)."""
        del xt, noise, t, clip
        k, c = self.split_kc(drift)
        return jnp.concatenate([jnp.clip(k, -1.0, 1.0), c], axis=-1)

    def deterministic_step(self, xt, drift, noise, t_cur, t_next, clip=1.0):
        """The reference ddm_linear ships NO deterministic sampler — only the
        euler/stochastic sample_fn via pred_xtms_from_xt (ddm/ddm_linear.py:
        273-310). Sampling a linear-process model routes to the stochastic
        sampler (core/diffusion.py DDPM.sample); reaching this is a bug."""
        raise NotImplementedError(
            "linear process has no reference deterministic sampler; "
            "use the stochastic/euler sampler"
        )


@dataclasses.dataclass(frozen=True)
class ResidualProcess(_BaseProcess):
    """const-family process on residual = x0 - ref (ddm/ddm_res.py:744-753).

    The caller diffuses the residual; reconstruction is ref + pred_x0.
    deterministic_step uses the Euler form d = C + eps/(sqrt(t)+sqrt(t'))
    (ddm/ddm_res.py:960-968).
    """

    name: str = "res"

    def deterministic_step(self, xt, drift, noise, t_cur, t_next, clip=None):
        del clip
        tc = bcast_right(t_cur, xt)
        tn = bcast_right(t_next, xt)
        d = drift + noise / (jnp.sqrt(tc) + jnp.sqrt(tn))
        return xt + (tn - tc) * d


_PROCESSES = {
    "const": ConstProcess,
    "const2": Const2Process,
    "linear": LinearProcess,
    "res": ResidualProcess,
}


def get_process(name: str, **kwargs) -> _BaseProcess:
    """Construct a process by short name or by reference module path.

    Accepts 'const2' as well as the reference class_name strings like
    'ddm.ddm_const_2.DDPM' (utils/config.py maps full names before calling).
    """
    if name not in _PROCESSES:
        raise KeyError(f"unknown process '{name}'; have {sorted(_PROCESSES)}")
    return _PROCESSES[name](**kwargs)
