"""Algebraic-identity and golden-value tests for the four decoupled processes.

The reference has no test suite; these tests pin the math it implements in
ddm/ddm_const.py, ddm_const_2.py, ddm_linear.py, ddm_res.py (see SURVEY.md
section 2.1 for the formula citations).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.core.processes import (
    Const2Process,
    ConstProcess,
    LinearProcess,
    ResidualProcess,
    get_process,
)
from adm_tpu.nn import precond

PROCESSES = ["const", "const2", "linear", "res"]


def _setup(name, rng, batch=4, hw=8, ch=3):
    p = get_process(name)
    k0, k1, k2, k3 = jax.random.split(rng, 4)
    x0 = jax.random.uniform(k0, (batch, hw, hw, ch), minval=-1, maxval=1)
    noise = jax.random.normal(k1, x0.shape)
    t = jax.random.uniform(k2, (batch,), minval=1e-4, maxval=1.0)
    drift = p.drift_targets(x0, k3)
    return p, x0, noise, t, drift


@pytest.mark.parametrize("name", PROCESSES)
def test_qsample_pred_x0_roundtrip(name, rng):
    """pred_x0(q_sample(x0)) == x0 exactly (analytic inversion)."""
    p, x0, noise, t, drift = _setup(name, rng)
    xt = p.q_sample(x0, drift, noise, t)
    x0_rec = p.pred_x0(xt, drift, noise, t)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)


@pytest.mark.parametrize("name", PROCESSES)
def test_reverse_full_step_lands_on_x0(name, rng):
    """With s = t, the posterior mean is x0 and sigma is 0."""
    p, x0, noise, t, drift = _setup(name, rng)
    xt = p.q_sample(x0, drift, noise, t)
    mean, sigma = p.reverse_mean_sigma(xt, drift, noise, t, t)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(sigma), 0.0, atol=1e-5)


@pytest.mark.parametrize("name", ["const", "const2"])
def test_deterministic_step_perfect_model_reaches_x0(name, rng):
    """One deterministic step with exact (drift, noise) and t_next=0 -> x0."""
    p, x0, noise, t, drift = _setup(name, rng)
    # x0 in [-1,1] so in-loop clipping is a no-op for exact predictions
    xt = p.q_sample(x0, drift, noise, t)
    zero = jnp.zeros_like(t)
    x_end = p.deterministic_step(xt, drift, noise, t, zero)
    np.testing.assert_allclose(np.asarray(x_end), np.asarray(x0), atol=1e-4)


def test_linear_deterministic_step_raises(rng):
    """The reference ddm_linear ships no deterministic sampler
    (ddm/ddm_linear.py:259-271) — reaching deterministic_step is a bug."""
    p, x0, noise, t, drift = _setup("linear", rng)
    xt = p.q_sample(x0, drift, noise, t)
    with pytest.raises(NotImplementedError):
        p.deterministic_step(xt, drift, noise, t, jnp.zeros_like(t))


def test_const2_weights_golden():
    """ddm/ddm_const_2.py:227-233 at t=0.5: w1=((t-1)/t)^2+1=2, w2=(t/(1-t+eps))^2+1."""
    p = Const2Process(eps=1e-4)
    t = jnp.array([0.5])
    w1, w2 = p.loss_weights(t)
    np.testing.assert_allclose(float(w1[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(float(w2[0]), (0.5 / 0.5001) ** 2 + 1, rtol=1e-5)


def test_const_weights_golden():
    """ddm/ddm_const.py:335-341 at t=0.5: w1=(t^2-t+1)/t=1.5, w2=(t^2-t+1)/(1-t+eps)."""
    p = ConstProcess(eps=1e-4)
    t = jnp.array([0.5])
    w1, w2 = p.loss_weights(t)
    np.testing.assert_allclose(float(w1[0]), 0.75 / 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(w2[0]), 0.75 / 0.5001, rtol=1e-5)


def test_linear_weights_golden():
    p = LinearProcess(eps=1e-4)
    t = jnp.array([0.25])
    w1, w2 = p.loss_weights(t)
    np.testing.assert_allclose(float(w1[0]), 4.0, rtol=1e-5)
    np.testing.assert_allclose(float(w2[0]), 1 / 0.7501, rtol=1e-5)


def test_const2_t_steps_grid():
    """Linear grid sigma_max -> 1/n with trailing zero (ddm_const_2.py:341-349)."""
    p = Const2Process()
    ts = np.asarray(p.t_steps(10))
    assert ts.shape == (11,)
    np.testing.assert_allclose(ts[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(ts[9], 0.1, atol=1e-6)
    np.testing.assert_allclose(ts[10], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.diff(ts[:10]), -(1.0 - 0.1) / 9, atol=1e-6)


def test_const_t_steps_grid():
    """const grid ends at sigma_min^2 (ddm_const.py:429-436)."""
    p = ConstProcess(sigma_min=1e-2)
    ts = np.asarray(p.t_steps(10))
    np.testing.assert_allclose(ts[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(ts[9], 1e-4, atol=1e-7)
    np.testing.assert_allclose(ts[10], 0.0, atol=1e-7)


def test_linear_drift_pack_unpack(rng):
    p = LinearProcess()
    x0 = jax.random.normal(rng, (2, 4, 4, 3))
    drift = p.drift_targets(x0, jax.random.PRNGKey(1))
    k, c = p.split_kc(drift)
    assert k.shape == x0.shape and c.shape == x0.shape
    assert float(jnp.max(jnp.abs(k))) <= 1.0
    np.testing.assert_allclose(np.asarray(c), np.asarray(-x0 - k / 2), atol=1e-6)


def test_residual_process_on_residual(rng):
    """res diffuses x0 - ref; q_sample/pred_x0 roundtrip on the residual."""
    p = ResidualProcess()
    k0, k1, k2 = jax.random.split(rng, 3)
    x0 = jax.random.normal(k0, (2, 8, 8, 3))
    ref = jax.random.normal(k1, x0.shape)
    residual = x0 - ref
    noise = jax.random.normal(k2, x0.shape)
    t = jnp.array([0.3, 0.9])
    drift = p.drift_targets(residual, None)
    xt = p.q_sample(residual, drift, noise, t)
    rec = ref + p.pred_x0(xt, drift, noise, t)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-5)


# ---------------------------------------------------------------------------
# Preconditioning tables
# ---------------------------------------------------------------------------


def test_precond_const_golden():
    """unet/uncond_unet.py:621-626 at sigma=0.25."""
    s = 0.25
    c = precond.coeffs_const(jnp.array(s))
    den = s * s - s + 1
    np.testing.assert_allclose(float(c["c_skip1"]), (s - 1) / den, rtol=1e-6)
    np.testing.assert_allclose(float(c["c_skip2"]), np.sqrt(s) / den, rtol=1e-6)
    np.testing.assert_allclose(float(c["c_out1"]), np.sqrt(s / den), rtol=1e-6)
    np.testing.assert_allclose(float(c["c_out2"]), (1 - s) / np.sqrt(den), rtol=1e-6)
    np.testing.assert_allclose(
        float(c["c_in"]), 1 / np.sqrt((1 - s) ** 2 + s), rtol=1e-6
    )
    np.testing.assert_allclose(float(c["c_noise"]), np.log(s), rtol=1e-6)


def test_precond_const2_golden():
    """unet/uncond_unet_2.py:623-626 at sigma=0.6."""
    s = 0.6
    c = precond.coeffs_const2(jnp.array(s))
    den = s * s + (s - 1) ** 2
    np.testing.assert_allclose(float(c["c_skip1"]), (s - 1) / den, rtol=1e-6)
    np.testing.assert_allclose(float(c["c_skip2"]), s / den, rtol=1e-6)
    np.testing.assert_allclose(float(c["c_out1"]), s / np.sqrt(den), rtol=1e-6)
    np.testing.assert_allclose(float(c["c_out2"]), (1 - s) / np.sqrt(den), rtol=1e-6)
    np.testing.assert_allclose(float(c["c_in"]), 1 / np.sqrt(den), rtol=1e-6)


@pytest.mark.parametrize(
    "variant,proc_name",
    [("const", "const"), ("const2", "const2")],
)
def test_single_decoder_derivation_inverts_qsample(variant, proc_name, rng):
    """With a perfect drift prediction D_x = C, the analytic single-decoder
    noise branch recovers eps exactly:
      const : (xt - (t-1)C)/sqrt(t) == eps   (unet/uncond_unet_sd.py:602-605)
      const2: (xt - (t-1)C)/t       == eps   (unet/uncond_unet_sd_2.py:599-607)
    """
    p = get_process(proc_name)
    k0, k1 = jax.random.split(rng)
    x0 = jax.random.uniform(k0, (2, 4, 4, 3), minval=-1, maxval=1)
    noise = jax.random.normal(k1, x0.shape)
    t = jnp.array([0.3, 0.8])
    drift = -x0
    xt = p.q_sample(x0, drift, noise, t)
    sigma = t.reshape(-1, 1, 1, 1)
    eps_rec = precond.derive_noise_branch(variant, xt, drift, sigma)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-4)


def test_precondition_two_decoder_combination(rng):
    """D_x/D_y are the documented affine combinations of x and F_x/F_y."""
    k0, k1, k2 = jax.random.split(rng, 3)
    x = jax.random.normal(k0, (2, 4, 4, 3))
    fx = jax.random.normal(k1, x.shape)
    fy = jax.random.normal(k2, x.shape)
    sigma = jnp.full((2, 1, 1, 1), 0.4)
    dx, dy = precond.precondition("const", x, sigma, fx, fy)
    c = precond.coeffs_const(sigma)
    np.testing.assert_allclose(
        np.asarray(dx), np.asarray(c["c_skip1"] * x + c["c_out1"] * fx), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(dy), np.asarray(c["c_skip2"] * x + c["c_out2"] * fy), atol=1e-6
    )
