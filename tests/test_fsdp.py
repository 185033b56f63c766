"""FSDP (ZeRO-3 style) param/opt/EMA sharding over 'data' (parallel/fsdp.py).

Beyond-reference capability (reference is replicated DDP only). Checks on
the 8-virtual-CPU-device mesh: (a) the rule shards the big kernels and
leaves small leaves replicated, (b) an FSDP train step is numerically
equivalent to the pure-DP step, (c) per-device param bytes actually drop,
(d) composition with tp claims two different dims.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from adm_tpu.parallel.fsdp import (
    fsdp_param_shardings,
    fsdp_spec,
    fsdp_state_shardings,
)
from adm_tpu.parallel.mesh import data_sharding, make_mesh, replicated_sharding
from adm_tpu.train.state import EmaConfig, TrainState
from adm_tpu.train.trainer import make_optimizer, make_train_step

from tests.test_tp import _tiny_model


def test_fsdp_spec_rules():
    # big conv kernel: last divisible dim (Cout) sharded
    assert fsdp_spec((3, 3, 64, 128), 8, min_size=1000) == P(
        None, None, None, "data"
    )
    # Cout not divisible -> falls back to Cin
    assert fsdp_spec((3, 3, 128, 63), 8, min_size=1000) == P(
        None, None, "data", None
    )
    # small leaf stays replicated
    assert fsdp_spec((128,), 8, min_size=65536) == P()
    # nothing divisible -> replicated
    assert fsdp_spec((7, 11, 13, 17), 8, min_size=1) == P()
    # composition: tp already claimed Cout -> fsdp takes Cin
    assert fsdp_spec(
        (3, 3, 64, 128), 8, min_size=1000, base=P(None, None, None, "model")
    ) == P(None, None, "data", "model")


def test_fsdp_shards_params_and_saves_memory():
    mesh = make_mesh(n_data=8)
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    sh = fsdp_param_shardings(params, mesh)
    sharded = jax.device_put(params, sh)

    total = sum(
        int(np.prod(l.shape)) * l.dtype.itemsize
        for l in jax.tree_util.tree_leaves(sharded)
    )
    # device 0's share: every >=64k-element leaf is split 8-way; the tiny
    # model is mostly large leaves -> expect well under half the total
    dev0 = jax.devices()[0]
    per_dev0 = sum(
        next(s.data.nbytes for s in l.addressable_shards if s.device == dev0)
        for l in jax.tree_util.tree_leaves(sharded)
    )
    assert per_dev0 < 0.5 * total, (per_dev0, total)


def test_fsdp_step_matches_dp():
    """One train step under fsdp(data=8) equals the replicated DP step."""
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(1e-3, total_steps=100)
    batch = {
        "image": np.random.RandomState(0)
        .randn(8, 16, 16, 3)
        .astype(np.float32)
    }
    key = jax.random.PRNGKey(42)

    def run(mesh, use_fsdp: bool):
        state = TrainState.create(params, optimizer.init(params))
        step = make_train_step(model, optimizer, EmaConfig(), grad_accum=1)
        rep = replicated_sharding(mesh)
        dat = data_sharding(mesh)
        st_sh = fsdp_state_shardings(state, mesh) if use_fsdp else rep
        state = jax.device_put(state, st_sh)
        jitted = jax.jit(
            step, in_shardings=(st_sh, dat, rep), out_shardings=(st_sh, rep)
        )
        b = jax.device_put(batch, dat)
        state, metrics = jitted(state, b, key)
        return float(metrics["loss"]), jax.device_get(state.params)

    loss_dp, p_dp = run(make_mesh(), use_fsdp=False)
    loss_fs, p_fs = run(make_mesh(n_data=8), use_fsdp=True)
    assert np.isfinite(loss_fs)
    np.testing.assert_allclose(loss_fs, loss_dp, rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_dp), jax.tree_util.tree_leaves(p_fs)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3
        )


def test_fsdp_composes_with_tp():
    """fsdp(with_tp=True) on a (2,4) mesh: tp dims kept, fsdp adds 'data'
    on another dim of the same leaf where divisible."""
    mesh = make_mesh(n_data=2, n_model=4)
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    sh = fsdp_state_shardings(params, mesh, min_size=1000, with_tp=True)
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]
    }
    mixed = [
        k
        for k, s in flat.items()
        if "model" in tuple(s.spec) and "data" in tuple(s.spec)
    ]
    assert mixed, "no leaf carries both tp and fsdp shardings"
