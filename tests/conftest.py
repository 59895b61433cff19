"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware, and Pallas kernels run in interpreter mode.

Must set env vars before jax is imported anywhere.
"""

import os
import sys

# The image boots every interpreter with the axon TPU tunnel registered and
# JAX_PLATFORMS=axon (see /root/.axon_site/sitecustomize.py). Force CPU here:
# the env var alone is overridden by the plugin's config update, so set the
# jax config explicitly after import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
