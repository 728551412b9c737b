"""Tangent-space normal mapping in load_surface (reference: material
decode / shading-normal path, PathTracerBridgeDonut.hlsli:612-680)."""

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.accel.traverse import Hit
from rtxpt_tpu.pt.surface import load_surface
from rtxpt_tpu.scene.scene import HostScene, Materials, MeshInstance
from rtxpt_tpu.prepare import prepare


def _nm_scene(n_ts, rotate_uv=False):
    """One +z-facing triangle with a constant normal map encoding n_ts."""
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.asarray([[0, 0, 1]], np.float32), (3, 1))
    if rotate_uv:
        # uv frame rotated 90deg: v runs along +x, u along -y
        uvs = np.asarray([[0, 0], [0, 1], [-1, 0]], np.float32)
    else:
        uvs = np.asarray([[0, 0], [1, 0], [0, 1]], np.float32)
    idx = np.asarray([[0, 1, 2]], np.int32)
    mats = Materials.create(1)
    mats = mats.replace(normal_tex=jnp.asarray([0], jnp.int32))
    pixel = (np.asarray(n_ts, np.float32) + 1.0) * 0.5
    img = np.concatenate([np.tile(pixel, (4, 4, 1)),
                          np.ones((4, 4, 1), np.float32)], axis=-1)
    host = HostScene(
        instances=[MeshInstance(positions=pos, normals=nrm, uvs=uvs,
                                indices=idx, material=np.asarray([0]),
                                name="nm")],
        materials=mats, textures=[img])
    return prepare(host)


def _shade_normal(scene):
    hit = Hit(t=jnp.asarray([1.0]), prim=jnp.asarray([0], jnp.int32),
              bary=jnp.asarray([[0.3, 0.3]]), front=jnp.asarray([True]))
    o = jnp.asarray([[0.3, 0.3, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    surf = load_surface(scene, hit, o, d, jnp.zeros((1,)))
    return np.asarray(surf.sh_n)[0]


def test_normal_map_tilts_shading_normal():
    n = _shade_normal(_nm_scene([0.6, 0.0, 0.8]))
    np.testing.assert_allclose(n, [0.6, 0.0, 0.8], atol=0.02)


def test_normal_map_follows_uv_frame():
    """The SAME texel must tilt along the rotated tangent when the UV
    parameterisation rotates (tangent comes from UVs, not geometry)."""
    n = _shade_normal(_nm_scene([0.6, 0.0, 0.8], rotate_uv=True))
    np.testing.assert_allclose(n, [0.0, -0.6, 0.8], atol=0.02)


def test_flat_map_is_identity():
    n = _shade_normal(_nm_scene([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(n, [0.0, 0.0, 1.0], atol=0.02)
