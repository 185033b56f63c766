"""Shared tiny model + deterministic batch for the multi-process test
(tests/test_multiprocess.py and tests/_dist_worker.py)."""

import numpy as np

GLOBAL_BATCH = 16
IMG = 8


def make_model():
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.nn.unets import EDMPrecond

    net = EDMPrecond(
        img_resolution=IMG, img_channels=3, variant="const2", n_decoders=2,
        model_kwargs=dict(model_channels=8, channel_mult=(1,), num_blocks=1,
                          attn_resolutions=(), dropout=0.0),
    )
    return DDPM(net=net, process_name="const", image_size=(IMG, IMG),
                channels=3, weighting_loss=True)


def global_batch():
    rng = np.random.default_rng(42)
    return {
        "image": rng.standard_normal((GLOBAL_BATCH, IMG, IMG, 3)).astype(
            np.float32
        )
    }


def run_one_step(mesh, local_slice):
    """One psum'd train step over `mesh`; returns (loss, grad_norm) floats.

    local_slice: this process's contiguous rows of the global batch
    (the whole batch when single-process).
    """
    import jax

    from adm_tpu.parallel.mesh import (
        data_sharding,
        global_shard_batch,
        replicated_sharding,
    )
    from adm_tpu.train.state import EmaConfig, TrainState
    from adm_tpu.train.trainer import make_optimizer, make_train_step

    model = make_model()
    optimizer, _ = make_optimizer(1e-4, total_steps=10, warmup_steps=1)
    step_fn = make_train_step(model, optimizer, EmaConfig())
    rep, dat = replicated_sharding(mesh), data_sharding(mesh)

    def build_state():
        params = model.init(jax.random.PRNGKey(0))
        return TrainState.create(params, optimizer.init(params))

    state = jax.jit(build_state, out_shardings=rep)()
    batch = global_shard_batch(mesh, local_slice)
    jitted = jax.jit(step_fn, in_shardings=(rep, dat, rep),
                     out_shardings=(rep, rep))
    _, metrics = jitted(state, batch, jax.random.PRNGKey(7))
    return float(metrics["loss"]), float(metrics["grad_norm"])
