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


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
