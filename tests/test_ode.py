"""Adaptive RK45: accuracy vs closed form, reverse-time integration,
oracle probability-flow sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from adm_tpu.core.ode import dopri45, rk45_sample
from adm_tpu.core.processes import get_process


def test_exponential_decay():
    y, nfe = dopri45(lambda t, y: -y, jnp.ones((4,)), 0.0, 2.0)
    np.testing.assert_allclose(np.asarray(y), np.exp(-2.0), rtol=1e-4)
    assert int(nfe) > 0


def test_reverse_time_integration():
    """Integrate dy/dt = y backwards from t=1 to t=0: y(0) = y(1)/e."""
    y, _ = dopri45(lambda t, y: y, jnp.full((2,), np.e), 1.0, 0.0)
    np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-4)


def test_nonautonomous():
    """dy/dt = 2t -> y(1) = y(0) + 1."""
    y, _ = dopri45(lambda t, y: jnp.full_like(y, 2 * t), jnp.zeros((3,)), 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-4)


def test_rk45_oracle_sampling(rng):
    """With exact (C, eps) predictions the probability-flow ODE for the
    const process transports noise to the target image."""
    proc = get_process("const")
    target = jnp.tanh(jax.random.normal(rng, (2, 8, 8, 3))) * 0.8

    def oracle(x, t):
        tb = t.reshape(-1, 1, 1, 1)
        c = -target
        noise = (x - target - c * tb) / jnp.sqrt(tb)
        return c, noise

    img, nfe = rk45_sample(proc, oracle, (2, 8, 8, 3), rng)
    err = float(jnp.max(jnp.abs(img - (target + 1) / 2)))
    # the flow is integrated down to t=eps=1e-4, leaving a sqrt(eps)*|eps_n|
    # ~ 1e-2 noise floor (the reference also stops at eps and just clamps)
    assert err < 0.05, (err, int(nfe))
    mean_err = float(jnp.mean(jnp.abs(img - (target + 1) / 2)))
    assert mean_err < 0.01, (mean_err, int(nfe))


def test_rk45_jits(rng):
    proc = get_process("const2")

    def model(x, t):
        return -x, jnp.zeros_like(x)

    fn = jax.jit(lambda k: rk45_sample(proc, model, (1, 4, 4, 3), k)[0])
    out = fn(rng)
    assert out.shape == (1, 4, 4, 3)
    assert bool(jnp.isfinite(out).all())
