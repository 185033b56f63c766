"""tools/warmstart.py round trip: orbax milestone -> bf16 npz -> milestone.

Insurance path for VM restores that destroy gitignored orbax dirs
(2026-08-18 incident). The round trip must preserve step and scale_factor
exactly and the EMA tree to bf16 precision, rebuild params FROM the EMA
tree (the snapshot stores only EMA to halve the committable artifact),
and rebuild a milestone train_long's resume path can load. Legacy
two-tree snapshots must keep restoring params from their own tree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tools.warmstart as ws
from adm_tpu.train.state import TrainState


def _tiny_build():
    import optax

    def make_state():
        params = {
            "w": jnp.linspace(-2, 2, 12, dtype=jnp.float32).reshape(3, 4),
            "b": jnp.ones((4,), jnp.float32) * 0.123456789,
            "emb": jnp.arange(6, dtype=jnp.int32),  # non-f32 leaf passes through
        }
        return TrainState.create(params, optax.adamw(1e-4).init(params))

    return make_state


@pytest.fixture()
def milestone_dir(tmp_path, monkeypatch):
    import orbax.checkpoint as ocp

    monkeypatch.setattr(ws, "_build", _tiny_build)
    state = jax.jit(_tiny_build())()
    state = state.replace(
        step=jnp.asarray(4321, jnp.int32),
        scale_factor=jnp.asarray(0.3536, jnp.float32),
        ema_params=jax.tree_util.tree_map(lambda x: x * 2, state.params),
    )
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(str((tmp_path / "model-7").absolute()), state, force=True)
    return tmp_path, state


def test_round_trip(milestone_dir):
    tmp_path, orig = milestone_dir
    npz = tmp_path / "warmstart.npz"
    ws.snapshot(tmp_path, npz)
    assert npz.exists()

    import shutil

    shutil.rmtree(tmp_path / "model-7")
    ws.restore(tmp_path, npz)
    # train_long cadence: milestone = step // 2000
    rebuilt_dir = tmp_path / "model-2"
    assert rebuilt_dir.is_dir()

    import orbax.checkpoint as ocp

    template = jax.eval_shape(_tiny_build())
    with ocp.StandardCheckpointer() as ckptr:
        got = ckptr.restore(str(rebuilt_dir.absolute()), template)
    assert int(got.step) == 4321
    assert float(got.scale_factor) == pytest.approx(0.3536, abs=1e-7)
    # params are rebuilt FROM the snapshot's EMA tree (EMA-only format)
    for tree in (got.params, got.ema_params):
        for a, b in zip(jax.tree_util.tree_leaves(tree),
                        jax.tree_util.tree_leaves(orig.ema_params)):
            if a.dtype == jnp.int32:
                np.testing.assert_array_equal(a, b)  # non-f32 bit-exact
            else:
                np.testing.assert_allclose(a, b, rtol=8e-3, atol=2e-2)


def test_legacy_two_tree_snapshot_restores_params(milestone_dir):
    tmp_path, orig = milestone_dir
    npz = tmp_path / "warmstart.npz"
    # hand-build the pre-2026-08-18T11Z two-tree format
    payload = {"step": np.asarray(orig.step),
               "scale_factor": np.asarray(orig.scale_factor)}
    for tag, tree in (("p", orig.params), ("e", orig.ema_params)):
        leaves = jax.tree_util.tree_leaves(tree)
        payload[f"n_{tag}"] = np.asarray(len(leaves))
        for i, leaf in enumerate(leaves):
            arr = np.asarray(leaf)
            payload[f"{tag}{i}_dtype"] = np.asarray(str(arr.dtype))
            payload[f"{tag}{i}"] = (
                arr.astype(jnp.bfloat16).view(np.uint16)
                if arr.dtype == np.float32 else arr)
    np.savez(npz, **payload)

    ws.restore(tmp_path, npz)
    import orbax.checkpoint as ocp

    template = jax.eval_shape(_tiny_build())
    with ocp.StandardCheckpointer() as ckptr:
        got = ckptr.restore(str((tmp_path / "model-2").absolute()), template)
    for a, b in zip(jax.tree_util.tree_leaves(got.params),
                    jax.tree_util.tree_leaves(orig.params)):
        if a.dtype == jnp.int32:
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=8e-3, atol=8e-3)


def test_restore_rejects_changed_model(milestone_dir, monkeypatch):
    tmp_path, _ = milestone_dir
    npz = tmp_path / "warmstart.npz"
    ws.snapshot(tmp_path, npz)

    def _other_build():
        import optax

        def make_state():
            params = {"w": jnp.zeros((2, 2), jnp.float32)}
            return TrainState.create(params, optax.adamw(1e-4).init(params))

        return make_state

    monkeypatch.setattr(ws, "_build", _other_build)
    with pytest.raises(AssertionError, match="model definition changed"):
        ws.restore(tmp_path, npz)
