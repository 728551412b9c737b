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

# Fast/slow split (reference: Support/tests/tests.json runs a heavy matrix
# out-of-band). `pytest -m "not slow"` is the <5 min CI gate; the full
# suite (including these modules, ~25 min on CPU) is the nightly gate.
_SLOW_MODULES = {
    "test_integrator.py", "test_dielectrics.py", "test_realtime.py",
    "test_matrix.py", "test_bounce_pallas.py", "test_cluster.py",
    "test_stable_planes.py", "test_sharding.py", "test_harness.py",
    "test_wrs_nee.py", "test_neeat.py", "test_gltf.py",
    "test_omm_alpha.py", "test_restir_gi.py", "test_neeat_topk.py",
    "test_refit.py", "test_denoise_modes.py", "test_nested_priority.py",
    "test_gltf_anim.py", "test_restir_integration.py",
    "test_kitchen_parity.py", "test_sphere_light.py",
    "test_cluster_omm.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def cornell_scene():
    from rtxpt_tpu.scene.procedural import cornell_box
    from rtxpt_tpu.prepare import prepare

    host = cornell_box()
    return host, prepare(host)
