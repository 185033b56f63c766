"""Probability-flow ODE sampling via an on-device adaptive RK45.

The reference round-trips every ODE step through host numpy with
scipy.integrate.solve_ivp (sample_uncond.py:182-266, a DEVICE<->HOST
boundary per evaluation). Here the Dormand-Prince 5(4) integrator runs
entirely inside one jitted lax.while_loop.

Drift (const family, sample_uncond.py:227-229):
  dx/dt = -(C + eps_pred / sqrt(t)),   integrated from t=1 down to t=eps.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# Dormand-Prince 5(4) tableau
_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_B5 = jnp.array([35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0])
_B4 = jnp.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200, 187 / 2100, 1 / 40]
)


def dopri45(
    f: Callable[[Array, Array], Array],
    y0: Array,
    t0: float,
    t1: float,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    max_steps: int = 1000,
    first_step: float = 0.01,
) -> Tuple[Array, Array]:
    """Integrate dy/dt = f(t, y) from t0 to t1 (t1 < t0 supported).

    Returns (y(t1), nfe). Standard embedded-pair step control with PI-free
    0.9 * err^(-1/5) scaling, clipped to [0.2, 5] like scipy's RK45.
    """
    direction = jnp.sign(jnp.asarray(t1 - t0, jnp.float32))
    h0 = direction * jnp.abs(jnp.asarray(first_step, jnp.float32))

    def cond(state):
        t, y, h, nfe, steps, done = state
        return jnp.logical_and(jnp.logical_not(done), steps < max_steps)

    def body(state):
        t, y, h, nfe, steps, done = state
        # clamp the step so we land exactly on t1
        h = jnp.where(direction * (t + h - t1) > 0, t1 - t, h)

        ks = []
        for i in range(7):
            ti = t + _C[i] * h
            yi = y
            for j, aij in enumerate(_A[i]):
                yi = yi + h * aij * ks[j]
            ks.append(f(ti, yi))
        y5 = y
        y4 = y
        for i in range(7):
            y5 = y5 + h * _B5[i] * ks[i]
            y4 = y4 + h * _B4[i] * ks[i]

        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y5))
        err = jnp.sqrt(jnp.mean(((y5 - y4) / scale) ** 2))
        accept = err <= 1.0
        factor = jnp.clip(0.9 * err ** (-0.2), 0.2, 5.0)
        new_h = h * factor

        new_t = jnp.where(accept, t + h, t)
        new_y = jnp.where(accept, y5, y)
        reached = direction * (new_t - t1) >= -1e-7
        return (
            new_t,
            new_y,
            new_h,
            nfe + 7,
            steps + 1,
            jnp.logical_and(accept, reached),
        )

    state = (
        jnp.asarray(t0, jnp.float32),
        y0,
        h0,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    t, y, h, nfe, steps, done = jax.lax.while_loop(cond, body, state)
    return y, nfe


def rk45_sample(
    process,
    model_fn,
    shape: Tuple[int, ...],
    key: Array,
    *,
    eps: float = 1e-4,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    unnormalize: bool = True,
) -> Tuple[Array, Array]:
    """Probability-flow ODE sample for the const/const2 family."""
    x0 = jax.random.normal(key, shape, jnp.float32)
    batch = shape[0]

    def f(t, x):
        tb = jnp.full((batch,), t, jnp.float32)
        drift_pred, noise_pred = model_fn(x, tb)
        # Probability-flow ODE along the marginal trajectory
        # x_t = x0 + C t + a(t) eps:  dx/dt = C + a'(t) eps
        #   const  (a=sqrt(t)): C + eps/(2 sqrt(t))
        #   const2 (a=t)      : C + eps
        # NOTE: the reference's rk45 drift (sample_uncond.py:227-229) is
        # dead code for its default model_type and uses a different
        # scale; we implement the correct flow for both processes.
        if process.name == "const2":
            return drift_pred + noise_pred
        return drift_pred + noise_pred / (2.0 * jnp.sqrt(t))

    y, nfe = dopri45(f, x0, 1.0, eps, rtol=rtol, atol=atol)
    y = jnp.clip(y, -1.0, 1.0)
    if unnormalize:
        y = (y + 1) / 2
    return y, nfe
