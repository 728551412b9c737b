"""Nested-dielectric priorities + false-hit rejection
(reference: PathTracerNestedDielectrics.hlsli:48,118, InteriorList.hlsli).

Overlapping media along the ray (water [0,1], glass [0.4,1.2], both
ior=1.0/delta so the path stays straight) with an emissive panel behind:
the radiance reaching the camera encodes exactly which medium absorbed
each segment, so Beer-Lambert gives a closed-form check that the
higher-priority glass occludes the water boundary inside the overlap.
"""

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.config import NEEMode, PathTracerConfig
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.pt.integrator import render
from rtxpt_tpu.scene.camera import look_at
from rtxpt_tpu.scene.procedural import _box, _merge, _quad
from rtxpt_tpu.scene.scene import HostScene, Materials, MeshInstance

SW = 0.9   # water sigma_a
SG = 0.4   # glass sigma_a
E = 5.0    # panel radiance


def _overlap_scene(priorities):
    parts = [
        _box([0.0, -1.0, -1.0], [1.0, 1.0, 1.0], 0),        # water
        _box([0.4, -0.9, -0.9], [1.2, 0.9, 0.9], 1),        # glass
        _quad([2.0, -1, -1], [2.0, -1, 1], [2.0, 1, 1], [2.0, 1, -1], 2),
    ]
    pos, nrm, uv, idx, mat = _merge(parts)
    mats = Materials.create(3)
    mats = mats.replace(
        transmission=jnp.asarray([1.0, 1.0, 0.0]),
        ior=jnp.asarray([1.0, 1.0, 1.5]),
        roughness=jnp.zeros((3,)),
        specular_f0_scale=jnp.zeros((3,)),
        base_color=jnp.asarray([[1.0] * 3, [1.0] * 3, [0.0] * 3]),
        emissive=jnp.asarray([[0.0] * 3, [0.0] * 3, [E] * 3]),
        volume_absorption=jnp.asarray(
            [[SW] * 3, [SG] * 3, [0.0] * 3]),
        nested_priority=jnp.asarray(priorities, jnp.int32),
    )
    host = HostScene(
        instances=[MeshInstance(positions=pos, normals=nrm, uvs=uv,
                                indices=idx, material=mat, name="nest")],
        materials=mats)
    return prepare(host)


def _center_radiance(scene):
    cam = look_at([-1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                  10.0, 4, 4)
    cfg = PathTracerConfig(max_bounces=6, nee=NEEMode.OFF,
                           enable_russian_roulette=False)
    hdr, _, _ = render(scene, cam, cfg, 4, 4, spp=1)
    return float(np.asarray(hdr)[2, 2, 0])


def test_priority_occludes_inner_boundary():
    scene = _overlap_scene([1, 2, 0])
    assert scene.has_nested_priorities
    got = _center_radiance(scene)
    want = E * np.exp(-SW * 0.4 - SG * 0.8)    # glass wins in the overlap
    np.testing.assert_allclose(got, want, rtol=5e-3)


def test_without_priorities_boundary_shades():
    """Flat priorities: the water backface inside the glass is a real
    (wrong, but well-defined) event — pops glass early, water absorbs
    [1.0, 1.2]."""
    scene = _overlap_scene([0, 0, 0])
    assert not scene.has_nested_priorities
    got = _center_radiance(scene)
    want = E * np.exp(-SW * 0.4 - SG * 0.6 - SW * 0.2)
    np.testing.assert_allclose(got, want, rtol=5e-3)
