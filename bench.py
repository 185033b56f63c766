"""Benchmark: CIFAR-10 unconditional training throughput (imgs/sec/chip)
plus 10-step sampling rate, on the flagship two-decoder EDMPrecond.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Baseline context (BASELINE.md): the reference publishes no numbers; the
driver target is >= 3x an A100's img/sec/chip for the same config. We use
an estimated reference throughput A100_REF_IMGS_PER_SEC (documented in
BASELINE.md) so vs_baseline = ours / (3 * A100_REF).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp


def quiesce_chip():
    """Quiet the chip for the bench window (VERDICT r3 weak #2).

    Shared protocol lives in tools/quiet_chip.py: a STEADY long-run
    trainer is SIGSTOP'd (heartbeat kept fresh) and resumed after; a
    MID-COMPILE one is killed with its watchdog frozen (pausing a
    mid-compile trainer wedges the axon compile service for new clients
    — measured 2026-08-17) and the watchdog relaunches it from the
    newest milestone when thawed."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))
    from quiet_chip import quiesce

    return quiesce()

# Estimated reference throughput: torch DDP fp16, two-decoder DhariwalUNet
# (~112M params) at 32x32, per A100 chip. See BASELINE.md for derivation.
A100_REF_IMGS_PER_SEC = 310.0

BATCH = 128
TRAIN_STEPS = 20
SAMPLE_BATCH = 128


def main():

    # rbg measured ~9% faster but the axon compile service has crashed on
    # some rbg programs (HTTP 500); the unattended bench defaults to the
    # always-working threefry. Opt in with ADM_TPU_PRNG=rbg.
    jax.config.update(
        "jax_default_prng_impl", os.environ.get("ADM_TPU_PRNG", "threefry2x32")
    )
    from adm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from adm_tpu.core.diffusion import DDPM
    from adm_tpu.parallel.mesh import (
        data_sharding,
        make_mesh,
        replicated_sharding,
        shard_batch,
    )
    from adm_tpu.train.state import EmaConfig, TrainState
    from adm_tpu.train.trainer import make_optimizer, make_train_step
    from __graft_entry__ import _flagship

    n_chips = len(jax.devices())
    net, res = _flagship()
    model = DDPM(
        net=net,
        process_name="const",
        image_size=(res, res),
        channels=3,
        weighting_loss=True,
        sampling_timesteps=10,
    )
    mesh = make_mesh()
    params = model.init(jax.random.PRNGKey(0))
    optimizer, _ = make_optimizer(1e-4, total_steps=800_000)
    state = TrainState.create(params, optimizer.init(params))
    step_fn = make_train_step(model, optimizer, EmaConfig(), grad_accum=1)

    rep = replicated_sharding(mesh)
    dat = data_sharding(mesh)
    state = jax.device_put(state, rep)
    jitted = jax.jit(step_fn, in_shardings=(rep, dat, rep), out_shardings=(rep, rep),
                     donate_argnums=(0,))

    batch = {"image": jnp.zeros((BATCH * n_chips, res, res, 3), jnp.float32)}
    batch = shard_batch(mesh, batch)
    key = jax.random.PRNGKey(1)

    # NOTE: block_until_ready is unreliable over the tunneled axon backend
    # (returns before execution completes); a scalar host transfer is the
    # only trustworthy completion barrier. The step chain is sequentially
    # dependent (state threads through), so one final transfer fences all.
    # warmup/compile
    state, m = jitted(state, batch, key)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(TRAIN_STEPS):
        state, m = jitted(state, batch, key)
    _ = float(m["loss"])
    dt = time.perf_counter() - t0
    train_ips_chip = BATCH * n_chips * TRAIN_STEPS / dt / n_chips

    # 10-step sampling (sum fences each rep with a scalar transfer)
    sample = jax.jit(
        lambda p, k: model.sample(p, k, batch_size=SAMPLE_BATCH, unnormalize=True)
    )
    _ = float(jnp.sum(sample(state.ema_params, key)))
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        _ = float(jnp.sum(sample(state.ema_params, jax.random.PRNGKey(i))))
    sample_ips = SAMPLE_BATCH * reps / (time.perf_counter() - t0)

    result = {
        "metric": "cifar10_train_imgs_per_sec_per_chip",
        "value": round(train_ips_chip, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(train_ips_chip / (3 * A100_REF_IMGS_PER_SEC), 3),
        "sample_imgs_per_sec_10step": round(sample_ips, 2),
        "n_chips": n_chips,
        "batch_per_chip": BATCH,
    }
    print(json.dumps(result))


def wait_for_axon_relay(max_wait_s: float = 3600.0, poll_s: float = 30.0):
    """Bounded wait for the axon loopback relay before first device use.

    The relay (:8083, sandbox infrastructure) can be down for hours
    (measured 2026-08-17 20:05-23:40+); every backend init then burns
    ~25 min before failing UNAVAILABLE. Probing the port first turns that
    into a cheap poll, and waiting (bounded) lets an unattended driver
    bench survive an outage that ends mid-window. Only engages when the
    axon plugin is present (a CPU-only box has no relay and no need).
    """
    import socket
    import sys

    if not Path("/root/.axon_site/axon").exists():
        return
    deadline = time.monotonic() + max_wait_s
    warned = False
    while time.monotonic() < deadline:
        try:
            with socket.create_connection(("127.0.0.1", 8083), timeout=5):
                if warned:
                    print("# bench: relay is back", file=sys.stderr, flush=True)
                return
        except OSError:
            if not warned:
                print("# bench: axon relay :8083 down — waiting up to "
                      f"{max_wait_s:.0f}s before attempting backend init",
                      file=sys.stderr, flush=True)
                warned = True
            time.sleep(poll_s)
    print("# bench: relay still down after the wait budget; attempting "
          "anyway", file=sys.stderr, flush=True)


if __name__ == "__main__":
    wait_for_axon_relay(
        float(os.environ.get("ADM_TPU_BENCH_RELAY_WAIT", "3600")))
    with quiesce_chip():
        main()
