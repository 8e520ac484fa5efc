"""Test configuration: run on CPU with a virtual 8-device mesh.

Mirrors the reference's strategy of exercising the multi-threaded algorithms
on whatever host is available (SURVEY.md §4): we simulate an 8-device TPU
mesh with XLA's host-platform device-count flag so shard_map collectives run
for real, and enable x64 so uint64/f64 keys round-trip through numpy oracles.

Must run before the first ``import jax`` anywhere in the test session.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the image sets JAX_PLATFORMS=axon
# keep the XLA plan paths covered: only tiny sorts take the host-native
# fast path in tests (tests/test_host_sort.py covers it explicitly)
os.environ.setdefault("RDST_TPU_HOST_SORT_MAX", "2048")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize force-registers the TPU tunnel backend and
# overrides jax_platforms; re-override after import so tests run on the
# virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xD51)
