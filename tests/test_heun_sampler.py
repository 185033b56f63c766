"""2nd-order (Heun) deterministic sampling (`order=2`, beyond reference).

The reference deterministic step (ddm/ddm_const_2.py:355-368) integrates
the process ODE exactly under FROZEN (drift, noise) estimates — for const2
it IS explicit Euler on dx/dt = C + eps. `order=2` re-evaluates the model
at the Euler landing point and redoes the step with endpoint-averaged
estimates (classic Heun), cancelling the estimate-drift term to 2nd order.
These tests pin:
  * exactness: frozen-coefficient oracles make order=2 == order=1 exactly;
  * convergence: on t-only and x-dependent oracle ODEs the Heun error is
    several times below Euler's at the same 10-step grid;
  * the API: DDPM.sample(order=2) jits and composes with encoder_reuse
    (the correction eval rides the step's encoder cache);
  * order=1 stays the bit-identical reference path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.core import sampling
from adm_tpu.core.diffusion import DDPM
from adm_tpu.core.processes import get_process
from adm_tpu.nn.unets import EDMPrecond

RES = 16
SHAPE = (2, 8, 8, 1)


def _run(model_fn, order, n=10, init=None):
    proc = get_process("const2")
    init = jnp.zeros(SHAPE, jnp.float32) if init is None else init
    return sampling.sample_deterministic(
        proc, model_fn, SHAPE, jax.random.PRNGKey(0), n,
        unnormalize=False, init_noise=init, order=order,
    )


def test_frozen_coefficients_make_heun_equal_euler():
    """With (drift, noise) independent of (x, t), the averaged estimates
    equal the endpoint estimates, so Heun == the reference step exactly."""
    drift = jnp.full(SHAPE, -0.25, jnp.float32)
    noise = jnp.full(SHAPE, 0.125, jnp.float32)

    def oracle(x, t):
        return drift, noise

    np.testing.assert_array_equal(
        np.asarray(_run(oracle, 1)), np.asarray(_run(oracle, 2))
    )


def test_heun_beats_euler_on_t_dependent_ode():
    """const2 step == Euler on dx/dt = C(t); f(t) = 0.3 cos(3t) has the
    exact increment 0.1(sin(3 t1) - sin(3 t0)). Heun at the same 10-step
    grid must land several times closer than Euler."""

    def oracle(x, t):
        f = 0.3 * jnp.cos(3.0 * t)
        return jnp.broadcast_to(
            f[:, None, None, None], x.shape
        ), jnp.zeros_like(x)

    # trajectory starts at x(1) = 0 and integrates down to t = 0
    exact = -(0.1 * np.sin(3.0 * 1.0) - 0.1 * np.sin(0.0))
    e1 = float(jnp.abs(_run(oracle, 1)[0, 0, 0, 0] - exact))
    e2 = float(jnp.abs(_run(oracle, 2)[0, 0, 0, 0] - exact))
    assert e2 < e1 / 3, (e1, e2)
    # Euler itself must be sane: |err| <~ h/2 * int|f'| = 0.045 at h=0.1
    assert e1 < 0.05


def test_heun_beats_euler_on_x_dependent_ode():
    """dx/dt = -x (drift estimate C(x) = -x, noise 0): exact
    x(0) = x(1) * e. The last grid step stays Euler by design (the t=0
    correction is discarded), so the assertion bounds the COMPOSED
    scheme, not an idealized one."""

    def oracle(x, t):
        return -x, jnp.zeros_like(x)

    x1 = jnp.full(SHAPE, 0.1, jnp.float32)
    exact = 0.1 * np.e
    e1 = float(jnp.abs(_run(oracle, 1, init=x1)[0, 0, 0, 0] - exact))
    e2 = float(jnp.abs(_run(oracle, 2, init=x1)[0, 0, 0, 0] - exact))
    assert e2 < e1 / 3, (e1, e2)


def test_order_validated():
    def oracle(x, t):
        return jnp.zeros_like(x), jnp.zeros_like(x)

    with pytest.raises(ValueError, match="order"):
        _run(oracle, 3)


@pytest.fixture(scope="module")
def model_and_params():
    net = EDMPrecond(
        img_resolution=RES, img_channels=3, sigma_data=1.0, variant="const",
        n_decoders=2, dtype=jnp.float32,
        model_kwargs=dict(model_channels=32, channel_mult=(1, 2),
                          num_blocks=1, attn_resolutions=(8,), dropout=0.0),
    )
    model = DDPM(net=net, process_name="const", image_size=(RES, RES),
                 channels=3, sampling_timesteps=10)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_ddpm_sample_order2_jits_and_differs(model_and_params):
    model, params = model_and_params
    noise = jax.random.normal(jax.random.PRNGKey(3), (2, RES, RES, 3))
    euler = jax.jit(
        lambda p, k: model.sample(p, k, batch_size=2, init_noise=noise)
    )(params, jax.random.PRNGKey(2))
    heun = jax.jit(
        lambda p, k: model.sample(p, k, batch_size=2, init_noise=noise,
                                  order=2)
    )(params, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(heun)).all()
    diff = float(jnp.abs(heun - euler).max())
    assert 0 < diff < 0.5, diff  # a correction, not a different sample


@pytest.mark.slow
def test_aot_compile_bakes_order2(model_and_params):
    """The serving warm-start path must lower/compile the Heun sampler
    and produce the same pixels as DDPM.sample(order=2)."""
    from adm_tpu.serve.export import aot_compile_sampler

    model, params = model_and_params
    compiled, _ = aot_compile_sampler(model, params, batch_size=2, order=2)
    noise = jax.random.normal(jax.random.PRNGKey(7), (2, RES, RES, 3))
    served = compiled(params, noise, jnp.uint32(0))
    direct = jax.jit(
        lambda p: model.sample(p, jax.random.PRNGKey(0), batch_size=2,
                               init_noise=noise, order=2)
    )(params)
    np.testing.assert_allclose(
        np.asarray(served), np.asarray(direct), atol=1e-5
    )


def test_order2_composes_with_encoder_reuse(model_and_params):
    """The correction eval decodes over the step's cached encoder state:
    must jit, stay finite, and stay near the plain order=2 sampler."""
    model, params = model_and_params
    noise = jax.random.normal(jax.random.PRNGKey(5), (2, RES, RES, 3))
    plain = jax.jit(
        lambda p, k: model.sample(p, k, batch_size=2, init_noise=noise,
                                  order=2)
    )(params, jax.random.PRNGKey(4))
    fused = jax.jit(
        lambda p, k: model.sample(p, k, batch_size=2, init_noise=noise,
                                  order=2, encoder_reuse=2)
    )(params, jax.random.PRNGKey(4))
    assert np.isfinite(np.asarray(fused)).all()
    assert float(jnp.abs(fused - plain).mean()) < 5e-2


def test_stochastic_route_rejects_order2(model_and_params):
    """DDPM.sample must fail loudly, not silently sample first-order, when
    order=2 is requested on a stochastic-routed model (review r4d): the
    stochastic family has no Heun variant (diffusion.py routing)."""
    import dataclasses

    model, params = model_and_params
    stoch = dataclasses.replace(model, sample_type="stochastic")
    with pytest.raises(ValueError, match="stochastic"):
        stoch.sample(params, jax.random.PRNGKey(0), batch_size=1, order=2)
    # invalid order values are rejected at the DDPM surface too
    with pytest.raises(ValueError, match="order"):
        model.sample(params, jax.random.PRNGKey(0), batch_size=1, order=7)
