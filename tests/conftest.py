"""Test configuration: force a virtual 8-device CPU mesh.

Real TPU hardware in CI is a single chip behind an experimental plugin; all
unit + sharding tests run against an 8-device CPU mesh
(``xla_force_host_platform_device_count``), per the project driver contract.
The TPU benchmark path is exercised by ``bench.py`` instead.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of which other tests ran before it
    return np.random.default_rng(1234)
