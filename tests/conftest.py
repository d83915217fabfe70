"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so sharding/pjit paths are
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).

The axon sitecustomize registers a TPU backend and sets
jax_platforms="axon,cpu" at interpreter boot, so the env var alone is not
enough — override the config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from cortex_tpu.storage import MemoryStorage, SqliteStorage  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on virtual CPU mesh"


@pytest.fixture(params=["memory", "sqlite"])
def storage(request, tmp_path):
    if request.param == "memory":
        yield MemoryStorage()
    else:
        s = SqliteStorage(str(tmp_path / "test.db"))
        yield s
        s.close()


@pytest.fixture
def mem_storage():
    return MemoryStorage()
