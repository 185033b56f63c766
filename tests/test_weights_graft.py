"""Pretrained-subtree grafting (utils/weights.py): the runtime half of the
weight-drop path (converters produce npz; graft injects them at init)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.utils.weights import apply_pretrained, graft, load_npz_tree


def _params():
    return {
        "params": {
            "unet": {
                "conv": {"kernel": jnp.zeros((3, 3, 4, 8)),
                         "bias": jnp.zeros((8,))},
                "cond_net": {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))},
            }
        }
    }


def test_graft_replaces_subtree_and_casts():
    p = _params()
    new = {"w": np.ones((4, 4), np.float64), "b": np.full((4,), 2.0)}
    out = graft(p, "params/unet/cond_net", new)
    np.testing.assert_array_equal(out["params"]["unet"]["cond_net"]["w"], 1.0)
    assert out["params"]["unet"]["cond_net"]["w"].dtype == jnp.float32
    # untouched siblings preserved
    np.testing.assert_array_equal(out["params"]["unet"]["conv"]["bias"], 0.0)
    # input not mutated
    np.testing.assert_array_equal(p["params"]["unet"]["cond_net"]["w"], 0.0)


def test_graft_shape_mismatch_fails():
    with pytest.raises(ValueError, match="shape mismatch"):
        graft(_params(), "params/unet/cond_net",
              {"w": np.ones((5, 5)), "b": np.ones((4,))})


def test_graft_missing_and_extra_leaves_fail():
    with pytest.raises(KeyError, match="missing leaf"):
        graft(_params(), "params/unet/cond_net", {"w": np.ones((4, 4))})
    with pytest.raises(KeyError, match="unexpected leaves"):
        graft(_params(), "params/unet/cond_net",
              {"w": np.ones((4, 4)), "b": np.ones((4,)), "x": np.ones(1)})


def test_graft_bad_scope_fails():
    with pytest.raises(KeyError, match="not found"):
        graft(_params(), "params/unet/nope", {"w": np.ones((4, 4))})


def test_apply_pretrained_npz_roundtrip(tmp_path):
    f = tmp_path / "cond.npz"
    tree = {"w": np.ones((4, 4), np.float32), "b": np.ones((4,), np.float32)}
    np.savez(f, params=np.array(tree, dtype=object))
    loaded = load_npz_tree(str(f))
    assert set(loaded) == {"w", "b"}
    out = apply_pretrained(
        _params(), [{"file": str(f), "scope": "params/unet/cond_net"}]
    )
    np.testing.assert_array_equal(out["params"]["unet"]["cond_net"]["b"], 1.0)
