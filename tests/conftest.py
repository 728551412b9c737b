"""Test config: force CPU platform with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §2.6).

Note: the environment's sitecustomize force-registers the axon TPU backend
and pins JAX_PLATFORMS=axon, so env vars alone don't stick — we must update
jax.config after import (before first backend use).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cornell_scene():
    from rtxpt_tpu.scene.procedural import cornell_box
    from rtxpt_tpu.prepare import prepare

    host = cornell_box()
    return host, prepare(host)
