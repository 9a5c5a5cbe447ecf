"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multi-chip
path).  These env vars must be set before jax initialises its backends.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the real TPU
# tunnel), which must never be grabbed by unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
# x64 so the M=1 (mean-error) strategy matches the reference's C doubles.
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

# pytest plugins may import jax before this conftest runs, in which case the
# env vars above were read too late — force the config directly.
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import json  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="session")
def golden_manifest():
    with open(os.path.join(GOLDEN_DIR, "manifest.json")) as f:
        return json.load(f)


def golden_path(name: str) -> str:
    return os.path.join(GOLDEN_DIR, name)


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR
