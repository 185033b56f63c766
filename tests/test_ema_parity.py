"""EMA decay-schedule parity vs the reference torch EMA (ddm/ema.py)."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.train.state import EmaConfig, ema_decay

torch = pytest.importorskip("torch")


def test_ema_decay_schedule_matches_reference():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from ddm.ema import EMA as RefEMA

    model = torch.nn.Linear(2, 2)
    ref = RefEMA(model, beta=0.9996, update_after_step=10000, update_every=8)
    cfg = EmaConfig(beta=0.9996, update_after_step=10000, update_every=8)

    for step in [1, 100, 10000, 10001, 10500, 20000, 100000, 800000]:
        ref.step = torch.tensor(step)
        expected = ref.get_current_decay()
        ours = float(ema_decay(jnp.asarray(step), cfg))
        np.testing.assert_allclose(
            ours, expected, rtol=1e-6,
            err_msg=f"decay mismatch at step {step}",
        )


def test_ema_gating_matches_reference_update_every():
    """Steps where the reference skips (step % update_every != 0) must keep
    the shadow unchanged in our formulation too."""
    cfg = EmaConfig(beta=0.99, update_after_step=0, update_every=8)
    from adm_tpu.train.state import TrainState, ema_update

    import jax

    params = {"w": jnp.ones((4,))}
    state = TrainState.create(params, opt_state=None)
    # move params away from ema
    state = state.replace(params={"w": jnp.zeros((4,))})
    for step in range(1, 17):
        state = state.replace(step=jnp.asarray(step))
        new_ema = ema_update(state, cfg)
        changed = not bool(jnp.allclose(new_ema["w"], state.ema_params["w"]))
        assert changed == (step % 8 == 0), f"step {step}"
        state = state.replace(ema_params=new_ema)
