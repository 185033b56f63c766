"""Test harness: force JAX onto a virtual 8-device CPU mesh.

This is the TPU-native analogue of a fake multi-rank cluster — the reference
has no such fixture (SURVEY.md section 4); we test all sharding logic on a
host-platform mesh so `pjit` paths are exercised without real chips.

Must run before any jax import, hence the env mutation at module scope.
"""

import os

# Force CPU even when the session env pins JAX_PLATFORMS to a TPU platform.
# NOTE: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var;
# only jax.config.update("jax_platforms", ...) reliably forces the host
# platform, so we do both.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# The "core" tier (VERDICT r4 weak #6): the full fast tier is 1h+ on a
# loaded box, so regressions need a <10-min subset that covers the spine —
# diffusion processes, samplers, the unified trainer, parity-lite (EMA),
# ops, data, configs, and the driver-bench guard. Whole files, assigned
# here so the membership is one list, not markers scattered over 60 files.
# (The full flagship UNet parity lives in the fast tier, not core — it
# alone costs ~5 min.)
_CORE_FILES = {
    "test_processes.py",
    "test_ode.py",
    "test_heun_sampler.py",
    "test_train.py",
    "test_ops.py",
    "test_data.py",
    "test_ema_parity.py",
    "test_configs.py",
    "test_bench_guard.py",
}


def pytest_collection_modifyitems(config, items):
    import pathlib

    for item in items:
        if pathlib.Path(str(item.fspath)).name in _CORE_FILES:
            item.add_marker(pytest.mark.core)


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
