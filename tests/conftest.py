"""Test environment: 8 virtual CPU devices (multi-chip sharding tests without
TPUs — SURVEY.md §4 implications), legacy tf.keras for reference parity
oracles, and deterministic seeds."""
import os

# must run before jax/tf import
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")  # reference zoos are Keras-2
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# the 8-virtual-device flag must actually stick: every sharded test silently
# degrades to 1 device (and stays green) otherwise, so fail loudly here
assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} — "
    "xla_force_host_platform_device_count did not take effect"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_models_path():
    """Path to the reference's vendored zoos; skip when unavailable."""
    path = os.path.join(REFERENCE_DIR, "models")
    if not os.path.isdir(path):
        pytest.skip("reference repo not mounted")
    return path


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
