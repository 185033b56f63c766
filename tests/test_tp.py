"""Tensor parallelism over the 'model' mesh axis (parallel/tp.py).

Beyond-reference capability: the reference is DP-only (SURVEY §2.11); here
a (data, model) mesh shards UNetBlock channels Megatron-style. Tests run on
the 8-virtual-CPU-device mesh and check (a) the rules actually shard the
intended kernels, (b) a TP train step is numerically equivalent to the
pure-DP step, (c) the Pallas ops' SPMD rules preserve TP shardings.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from adm_tpu.core.diffusion import DDPM
from adm_tpu.nn.unets import EDMPrecond
from adm_tpu.parallel.mesh import data_sharding, make_mesh, replicated_sharding
from adm_tpu.parallel.tp import tp_param_shardings, tp_state_shardings
from adm_tpu.train.state import EmaConfig, TrainState
from adm_tpu.train.trainer import make_optimizer, make_train_step


def _tiny_model():
    net = EDMPrecond(
        img_resolution=16,
        img_channels=3,
        sigma_data=1.0,
        variant="const",
        n_decoders=2,
        model_kwargs=dict(
            model_channels=64,
            channel_mult=(1, 2),
            num_blocks=1,
            attn_resolutions=(8,),
            dropout=0.0,
        ),
    )
    return DDPM(
        net=net,
        process_name="const",
        image_size=(16, 16),
        channels=3,
        sampling_timesteps=4,
    )


def test_tp_rules_shard_conv_pairs():
    mesh = make_mesh(n_data=2, n_model=4)
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    sh = tp_param_shardings(params, mesh)
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]
    }
    col = [k for k, s in flat.items()
           if "conv0/kernel" in k and s.spec == P(None, None, None, "model")]
    row = [k for k, s in flat.items()
           if "conv1/kernel" in k and s.spec == P(None, None, "model", None)]
    assert col, "no column-parallel conv0 kernels sharded"
    assert row, "no row-parallel conv1 kernels sharded"
    # tiny net has 1 head -> qkv must stay replicated (guard)
    for k, s in flat.items():
        if "qkv" in k:
            assert s.spec == P(), k


def test_tp_step_matches_dp():
    """One train step under (data=2, model=4) equals the pure-DP step."""
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(1e-3, total_steps=100)
    batch = {
        "image": np.random.RandomState(0)
        .randn(8, 16, 16, 3)
        .astype(np.float32)
    }
    key = jax.random.PRNGKey(42)

    def run(mesh, tp: bool):
        state = TrainState.create(params, optimizer.init(params))
        step = make_train_step(model, optimizer, EmaConfig(), grad_accum=1)
        rep = replicated_sharding(mesh)
        dat = data_sharding(mesh)
        st_sh = tp_state_shardings(state, mesh) if tp else rep
        state = jax.device_put(state, st_sh)
        jitted = jax.jit(
            step, in_shardings=(st_sh, dat, rep), out_shardings=(st_sh, rep)
        )
        b = jax.device_put(batch, dat)
        state, metrics = jitted(state, b, key)
        return float(metrics["loss"]), jax.device_get(state.params)

    loss_dp, p_dp = run(make_mesh(), tp=False)
    loss_tp, p_tp = run(make_mesh(n_data=2, n_model=4), tp=True)
    assert np.isfinite(loss_tp)
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=1e-4)
    flat_dp = jax.tree_util.tree_leaves(p_dp)
    flat_tp = jax.tree_util.tree_leaves(p_tp)
    for a, b in zip(flat_dp, flat_tp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3
        )


def test_pallas_rules_preserve_tp_shardings(rng):
    """hw_dropout and small_seq_attention must not force all-gathers on
    'model'-sharded inputs (their SPMD rules pass shardings through)."""
    from adm_tpu.nn.pallas.attention import small_seq_attention
    from adm_tpu.nn.pallas.dropout import hw_dropout

    mesh = make_mesh(n_data=2, n_model=4)
    # dropout: channels sharded over 'model'
    x = jax.random.normal(rng, (4, 8, 8, 32), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, "model")))

    @jax.jit
    def drop(v):
        return hw_dropout(v, jax.random.PRNGKey(0), 0.5, True)

    y = drop(xs)
    assert y.sharding.is_equivalent_to(
        NamedSharding(mesh, P("data", None, None, "model")), 4
    )

    # attention: heads sharded over 'model'
    q = jax.random.normal(rng, (2, 4, 64, 32), jnp.float32)
    qs = jax.device_put(q, NamedSharding(mesh, P("data", "model")))

    @jax.jit
    def attn(v):
        return small_seq_attention(v, v, v, 0.125, True)

    o = attn(qs)
    assert o.sharding.is_equivalent_to(NamedSharding(mesh, P("data", "model")), 4)


def test_spatial_sharding_forward_matches_replicated(rng):
    """Spatial (H-axis) sharding of the UNet forward over 'model' — the
    SURVEY §5.7 'large image' move (2D-sharded feature maps; XLA inserts
    halo exchanges for the convs). Correctness vs the replicated run."""
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh(n_data=2, n_model=4)
    x = jax.random.normal(rng, (4, 16, 16, 3), jnp.float32)
    t = jnp.full((4,), 0.4, jnp.float32)

    def fwd(p, xv, tv):
        return model.net.apply(p, xv, tv)

    ref = jax.jit(fwd)(params, x, t)
    sp = NamedSharding(mesh, P("data", "model"))
    out = jax.jit(fwd)(params, jax.device_put(x, sp), t)
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )
