"""hw_dropout (TPU hardware-PRNG dropout with recompute-from-seed VJP).

On the CPU test mesh the emulate path runs (pltpu.prng_* has no CPU
lowering); semantics are identical to the TPU kernel: Bernoulli(1-rate)
keep mask from the key alone, 1/(1-rate) scaling, fwd/bwd mask identity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.nn.pallas.dropout import hw_dropout


def test_keep_fraction_and_scaling(rng):
    x = jnp.ones((8, 16, 16, 64), jnp.float32)
    y = np.asarray(hw_dropout(x, rng, 0.25, True))
    kept = y != 0
    assert abs(kept.mean() - 0.75) < 0.02
    np.testing.assert_allclose(y[kept], 1.0 / 0.75, rtol=1e-6)


def test_backward_uses_identical_mask(rng):
    x = jax.random.normal(rng, (4, 8, 8, 32))
    key = jax.random.PRNGKey(7)
    y = np.asarray(hw_dropout(x, key, 0.3, True))
    g = np.asarray(
        jax.grad(lambda v: jnp.sum(hw_dropout(v, key, 0.3, True) * 2.0))(x)
    )
    # grad = 2 * mask/keep: nonzero exactly where the forward kept
    assert ((g != 0) == (y != 0)).all()
    np.testing.assert_allclose(g[g != 0], 2.0 / 0.7, rtol=1e-5)


def test_deterministic_given_key(rng):
    x = jax.random.normal(rng, (2, 8, 8, 16))
    key = jax.random.PRNGKey(3)
    a = np.asarray(hw_dropout(x, key, 0.5, True))
    b = np.asarray(hw_dropout(x, key, 0.5, True))
    assert (a == b).all()
    c = np.asarray(hw_dropout(x, jax.random.PRNGKey(4), 0.5, True))
    assert (a != c).any()


def test_rate_zero_identity(rng):
    x = jax.random.normal(rng, (2, 4, 4, 8))
    y = hw_dropout(x, rng, 0.0, True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_unet_train_step_with_hw_dropout(rng):
    """The flagship block path traces and differentiates with hw dropout."""
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.nn.unets import EDMPrecond

    net = EDMPrecond(
        img_resolution=16, img_channels=3, variant="const", n_decoders=2,
        model_kwargs=dict(model_channels=32, channel_mult=(1, 2), num_blocks=1,
                          attn_resolutions=(8,), dropout=0.2),
    )
    model = DDPM(net=net, process_name="const", image_size=(16, 16), channels=3)
    params = model.init(jax.random.PRNGKey(0))
    batch = {"image": jax.random.uniform(rng, (2, 16, 16, 3), minval=-1, maxval=1)}

    def loss_fn(p):
        return model.training_step(p, batch, jax.random.PRNGKey(2))[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gn = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert gn > 0


def test_vjp_mask_consistency_under_model_sharding(rng):
    """ADVICE r2: grad must equal dy * mask when inputs are 'model'-sharded
    on the mesh (fwd and bwd regenerate the mask from the same seed; the
    cotangent here is explicitly given the forward activation's sharding)."""
    from adm_tpu.parallel.mesh import make_mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(n_data=4, n_model=2)
    sh = NamedSharding(mesh, P(None, None, None, "model"))
    x = jax.device_put(jax.random.normal(rng, (2, 4, 4, 8)), sh)
    key = jax.random.PRNGKey(5)

    f = jax.jit(lambda v: hw_dropout(v, key, 0.3, True))
    y, vjp = jax.vjp(f, x)
    dy = jax.device_put(jnp.ones_like(y), sh)
    (grad,) = vjp(dy)
    # mask from the forward output: y = x * mask / keep
    mask = np.asarray(y) != 0.0
    expect = mask.astype(np.float32) / 0.7
    np.testing.assert_allclose(np.asarray(grad), expect, rtol=1e-6)


def test_layout_sentry_is_mesh_scoped(monkeypatch):
    """Two programs on DIFFERENT meshes sharing (shape, rate) are not a
    fwd/bwd divergence (code-review r4); same-mesh spec changes still
    trip the alarm, and reset_layout_sentry() clears the record."""
    from adm_tpu.nn.pallas.dropout import (
        _layout_sentry,
        reset_layout_sentry,
    )

    reset_layout_sentry()
    monkeypatch.setenv("ADM_TPU_STRICT_DROPOUT", "1")
    m1, m2 = object(), object()  # sentry only needs hashable mesh keys
    _layout_sentry(m1, (8, 16), 0.1, ("data", None))
    _layout_sentry(m2, (8, 16), 0.1, (None, "model"))  # ok: other mesh
    _layout_sentry(m1, (8, 16), 0.1, ("data", None))   # ok: same layout
    with pytest.raises(RuntimeError, match="layout mismatch"):
        _layout_sentry(m1, (8, 16), 0.1, (None, "model"))
    reset_layout_sentry()
    _layout_sentry(m1, (8, 16), 0.1, (None, "model"))  # fresh record: ok
