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

    # min_value > 0: the reference's epoch<=0 early-return happens BEFORE
    # the min clamp, so the epoch-0 call is 0, not min_value (code-review
    # r4 — steps 10001/10002 straddle the epoch-0 boundary)
    ref_mv = RefEMA(model, beta=0.9996, update_after_step=10000,
                    update_every=8, min_value=0.01)
    cfg_mv = EmaConfig(beta=0.9996, update_after_step=10000, update_every=8,
                       min_value=0.01)
    for step in [1, 10000, 10001, 10002, 10100, 20000]:
        ref_mv.step = torch.tensor(step)
        np.testing.assert_allclose(
            float(ema_decay(jnp.asarray(step), cfg_mv)),
            ref_mv.get_current_decay(), rtol=1e-6,
            err_msg=f"min_value decay mismatch at step {step}",
        )


@pytest.mark.parametrize(
    "after,every,min_value",
    [(0, 1, 0.0), (0, 8, 0.0), (10, 4, 0.0), (3, 5, 0.0),
     (8, 4, 0.01), (3, 5, 0.5)],
)
def test_ema_trajectory_matches_reference(after, every, min_value):
    """Full-trajectory equivalence vs the actual reference EMA driven the
    way train_uncond_dpm.py:306-310 drives it (update() AFTER the trainer
    step increments): same gating phase, same warmup copy-through, same
    initted first-post-warmup copy, same decay epoch."""
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from ddm.ema import EMA as RefEMA

    from adm_tpu.train.state import TrainState, ema_update

    torch.manual_seed(0)
    model = torch.nn.Linear(3, 3)
    ref = RefEMA(model, beta=0.9, update_after_step=after,
                 update_every=every, min_value=min_value)
    rng = np.random.RandomState(1)

    params = {
        "w": jnp.asarray(model.weight.detach().numpy()),
        "b": jnp.asarray(model.bias.detach().numpy()),
    }
    state = TrainState.create(params, opt_state=None)

    for k in range(1, 40):
        # "optimizer step": move the online params
        w = rng.randn(3, 3).astype(np.float32)
        b = rng.randn(3).astype(np.float32)
        with torch.no_grad():
            model.weight.copy_(torch.from_numpy(w))
            model.bias.copy_(torch.from_numpy(b))
        ref.update()  # reference order: after the trainer step increments

        state = state.replace(
            step=jnp.asarray(k), params={"w": jnp.asarray(w), "b": jnp.asarray(b)}
        )
        state = state.replace(
            ema_params=ema_update(state, TrainStateCfg(after, every, min_value))
        )

        np.testing.assert_allclose(
            np.asarray(state.ema_params["w"]),
            # atol: torch lerp_ vs our e*eff + p*(1-eff) round differently
            # (measured residual <= 1.2e-7 over 40 steps)
            ref.ema_model.weight.detach().numpy(), rtol=1e-6, atol=1e-6,
            err_msg=f"EMA weight diverged at trainer step {k} "
                    f"(after={after}, every={every}, min={min_value})",
        )


def TrainStateCfg(after, every, min_value=0.0):
    return EmaConfig(beta=0.9, update_after_step=after, update_every=every,
                     min_value=min_value)
