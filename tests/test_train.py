"""End-to-end training smoke tests on the virtual 8-device CPU mesh.

This is the multi-device "fake cluster" coverage the reference lacks
(SURVEY.md section 4): data-parallel pjit step, loss decrease, EMA gating,
checkpoint roundtrip, sampler determinism.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.data.loader import batch_iterator
from adm_tpu.data.synthetic import SyntheticImages
from adm_tpu.train.state import EmaConfig, TrainState, ema_decay
from adm_tpu.train.trainer import Trainer
from adm_tpu.utils.config import build_dataset, build_model, load_conf

CFG = os.path.join(os.path.dirname(__file__), "configs", "tiny_uncond.yaml")


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = load_conf(CFG)
    model = build_model(cfg["model"])
    dataset = build_dataset(cfg["data"])
    data_iter = batch_iterator(dataset, cfg["data"]["batch_size"])
    return cfg, model, data_iter


def _make_trainer(cfg, model, data_iter, **overrides):
    t = cfg["trainer"]
    kw = dict(
        train_num_steps=t["train_num_steps"],
        train_lr=float(t["lr"]),
        min_lr=float(t["min_lr"]),
        warmup_steps=5,
        weight_decay=1e-4,
        gradient_accumulate_every=t["gradient_accumulate_every"],
        save_and_sample_every=0,
        log_freq=t["log_freq"],
        results_folder=t["results_folder"],
        ema_cfg=EmaConfig(
            update_after_step=t["ema_update_after_step"],
            update_every=t["ema_update_every"],
        ),
        sample_batch_size=4,
    )
    kw.update(overrides)
    return Trainer(model, data_iter, **kw)


def test_train_loss_decreases(tiny_setup, devices):
    cfg, model, data_iter = tiny_setup
    trainer = _make_trainer(cfg, model, data_iter)
    # record first-step loss then train
    losses = []
    for _ in range(30):
        import numpy as np  # noqa

        batch = next(trainer.data_iter)
        from adm_tpu.parallel.mesh import shard_batch

        b = shard_batch(trainer.mesh, batch)
        trainer.state, metrics = trainer._step(trainer.state, b, trainer.train_key)
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    assert int(trainer.state.step) == 30


def test_ema_gating_and_decay():
    cfg = EmaConfig(update_after_step=10, update_every=2, beta=0.99)
    # before gate: copy-through (decay 0)
    assert float(ema_decay(jnp.asarray(5), cfg)) == 0.0
    # after gate: in (0, beta]
    d = float(ema_decay(jnp.asarray(1000), cfg))
    assert 0.0 < d <= 0.99


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    cfg, model, data_iter = tiny_setup
    trainer = _make_trainer(cfg, model, data_iter, results_folder=str(tmp_path))
    from adm_tpu.parallel.mesh import shard_batch

    for _ in range(3):
        b = shard_batch(trainer.mesh, next(trainer.data_iter))
        trainer.state, _ = trainer._step(trainer.state, b, trainer.train_key)
    trainer.save(1)
    params_before = jax.device_get(trainer.state.params)
    step_before = int(trainer.state.step)
    # perturb then restore
    trainer.state = trainer.state.replace(
        params=jax.tree_util.tree_map(lambda x: x * 0, trainer.state.params)
    )
    trainer.load(1)
    assert int(trainer.state.step) == step_before
    restored = jax.device_get(trainer.state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), params_before, restored
    )


def test_sampler_seed_determinism(tiny_setup):
    cfg, model, data_iter = tiny_setup
    trainer = _make_trainer(cfg, model, data_iter)
    key = jax.random.PRNGKey(7)
    a = trainer._sample(trainer.state.ema_params, key)
    b = trainer._sample(trainer.state.ema_params, key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = trainer._sample(trainer.state.ema_params, jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    assert a.shape == (4, 16, 16, 3)
    assert float(jnp.min(a)) >= 0.0 and float(jnp.max(a)) <= 1.0


def test_batch_sharding_over_mesh(tiny_setup, devices):
    """The batch must actually land sharded over the 'data' axis."""
    cfg, model, data_iter = tiny_setup
    from adm_tpu.parallel.mesh import data_sharding, make_mesh, shard_batch

    mesh = make_mesh()
    batch = next(data_iter)
    b = shard_batch(mesh, batch)
    img = b["image"]
    assert img.sharding == data_sharding(mesh)
    assert len(img.addressable_shards) == 8
    assert img.addressable_shards[0].data.shape[0] == img.shape[0] // 8


def test_run_stats_live_during_training(tiny_setup, tmp_path):
    """Steady-state accounting must be LIVE at milestones, not only at
    Trainer.train return (VERDICT r3 item 6): a watchdog-killed segment's
    last milestone summary still reports the compile/milestone-excluded
    production rate."""
    cfg, model, data_iter = tiny_setup
    seen = []

    def sample_fn(trainer, milestone):
        seen.append(dict(getattr(trainer, "last_run_stats", {})))

    trainer = _make_trainer(
        cfg, model, data_iter, results_folder=str(tmp_path),
        save_and_sample_every=20, log_freq=5,
    )
    trainer.train(num_steps=25, sample_fn=sample_fn)
    assert seen, "milestone sample_fn never ran"
    # the milestone at step 20 has seen log marks at 5/10/15/20
    assert "steady_imgs_per_sec" in seen[0], seen
    assert seen[0]["steady_imgs_per_sec"] > 0
    assert seen[0]["steady_span_steps"] == 15
    # and the end-of-run stats cover the full span
    assert trainer.last_run_stats["steady_span_steps"] == 20


def test_frozen_buffers_optimizer():
    """The 'buffers' collection (e.g. GaussianFourierProjection.W) must be
    excluded from AdamW, weight decay AND the global clip norm — the
    reference registers it requires_grad=False (cond_unet_sd.py:396-405)
    and filters it from the optimizer (train_cond_dpm.py:181,294)."""
    import optax

    from adm_tpu.train.trainer import make_optimizer, with_frozen_buffers

    opt, _ = make_optimizer(1e-2, total_steps=100, warmup_steps=0,
                            weight_decay=1e-1, clip_norm=1.0)
    params = {"params": {"w": jnp.ones((4,))},
              "buffers": {"W": jnp.full((4,), 3.0)}}
    wrapped = with_frozen_buffers(opt)
    st = wrapped.init(params)
    # a huge buffer grad must not shift the clip norm of the real params
    grads = {"params": {"w": jnp.full((4,), 0.5)},
             "buffers": {"W": jnp.full((4,), 1e6)}}
    updates, st = wrapped.update(grads, st, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(new["buffers"]["W"], params["buffers"]["W"])
    assert float(jnp.abs(new["params"]["w"] - 1.0).max()) > 0

    # reference check: identical step from an UNWRAPPED optimizer fed only
    # the trainable leaves (the torch filter(requires_grad) semantics)
    opt2, _ = make_optimizer(1e-2, total_steps=100, warmup_steps=0,
                             weight_decay=1e-1, clip_norm=1.0)
    st2 = opt2.init({"params": params["params"]})
    up2, _ = opt2.update({"params": grads["params"]}, st2,
                         {"params": params["params"]})
    ref = optax.apply_updates({"params": params["params"]}, up2)
    np.testing.assert_allclose(new["params"]["w"], ref["params"]["w"],
                               rtol=1e-6)


def test_ckpt_every_milestones_skips_writes(tiny_setup, tmp_path):
    """ckpt_every_milestones=N writes orbax only at every Nth milestone
    (sample_fn still fires at ALL of them) and ALWAYS persists the final
    milestone of a segment, even when its number is off-cadence. On the
    tunneled axon chip the save is D2H-bound (~160 s for the 3 GB flagship
    state), 85% of milestone overhead — this knob is the long run's
    sustained-throughput lever (tools/train_long.py)."""
    cfg, model, data_iter = tiny_setup
    seen = []

    def sample_fn(trainer, milestone):
        seen.append(milestone)

    trainer = _make_trainer(
        cfg, model, data_iter, results_folder=str(tmp_path),
        save_and_sample_every=2, log_freq=2, ckpt_every_milestones=2,
    )
    # 6 steps -> milestones 1 (skip), 2 (cadence save), 3 (final: forced)
    trainer.train(num_steps=6, sample_fn=sample_fn)
    assert seen == [1, 2, 3]
    assert not (tmp_path / "model-1").exists()
    assert (tmp_path / "model-2").is_dir()
    assert (tmp_path / "model-3").is_dir(), "final milestone must always save"

    # resume from the forced final save continues at the true step
    t2 = _make_trainer(
        cfg, model, data_iter, results_folder=str(tmp_path),
        save_and_sample_every=2, log_freq=2, ckpt_every_milestones=2,
        resume_milestone=3,
    )
    assert int(t2.state.step) == 6
