"""Procedural test scenes (host-side builders).

The reference tests against the `test.kitchen` asset (Support/tests/
tests.json) which is not shipped in-repo; our pytest golden harness uses
these procedural scenes instead (SURVEY.md §4 implication note), matching
BASELINE.json config 1 (Cornell box, simple BSDF + analytic/area lights).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.scene.scene import (
    AnalyticLights, HostScene, Materials, MeshInstance,
    LIGHT_POINT, LIGHT_DIRECTIONAL, LIGHT_SPOT,
)
from rtxpt_tpu.scene.camera import look_at


def _quad(p0, p1, p2, p3, mat: int):
    """Two-triangle quad with consistent winding; normal from geometry."""
    pos = np.asarray([p0, p1, p2, p3], np.float32)
    n = np.cross(pos[1] - pos[0], pos[3] - pos[0])
    n = n / np.linalg.norm(n)
    nrm = np.tile(n[None], (4, 1)).astype(np.float32)
    uv = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    mt = np.asarray([mat, mat], np.int32)
    return pos, nrm, uv, idx, mt


def _merge(parts):
    pos, nrm, uv, idx, mat = [], [], [], [], []
    off = 0
    for p, n, u, i, mt in parts:
        pos.append(p); nrm.append(n); uv.append(u)
        idx.append(i + off); mat.append(mt)
        off += len(p)
    return (np.concatenate(pos), np.concatenate(nrm), np.concatenate(uv),
            np.concatenate(idx), np.concatenate(mat))


def _box(lo, hi, mat: int):
    """Axis-aligned box (outward normals)."""
    x0, y0, z0 = lo; x1, y1, z1 = hi
    return _merge([
        _quad([x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1], mat),  # +z
        _quad([x1, y0, z0], [x0, y0, z0], [x0, y1, z0], [x1, y1, z0], mat),  # -z
        _quad([x1, y0, z1], [x1, y0, z0], [x1, y1, z0], [x1, y1, z1], mat),  # +x
        _quad([x0, y0, z0], [x0, y0, z1], [x0, y1, z1], [x0, y1, z0], mat),  # -x
        _quad([x0, y1, z1], [x1, y1, z1], [x1, y1, z0], [x0, y1, z0], mat),  # +y
        _quad([x0, y0, z0], [x1, y0, z0], [x1, y0, z1], [x0, y0, z1], mat),  # -y
    ])


def _materials(rows) -> Materials:
    """rows: list of dicts with material fields."""
    n = len(rows)
    mats = Materials.create(n)
    def col(key, default, width=None):
        out = []
        for r in rows:
            v = r.get(key, default)
            out.append(v)
        a = np.asarray(out, np.float32)
        return jnp.asarray(a)
    return mats.replace(
        base_color=col("base_color", [0.5, 0.5, 0.5]),
        metallic=col("metallic", 0.0),
        roughness=col("roughness", 0.5),
        ior=col("ior", 1.5),
        transmission=col("transmission", 0.0),
        diffuse_transmission=col("diffuse_transmission", 0.0),
        emissive=col("emissive", [0.0, 0.0, 0.0]),
        thin=col("thin", 0.0),
        volume_absorption=col("volume_absorption", [0.0, 0.0, 0.0]),
        specular_f0_scale=col("specular", 0.5),
    )


def cornell_box(light_emission=(17.0, 12.0, 4.0), boxes: bool = True,
                sphere_specular: bool = False) -> HostScene:
    """The classic Cornell box in [0,1]^3 (open toward +z camera).

    Materials: 0 white, 1 red, 2 green, 3 emissive, 4 tall-box (optionally
    GGX metal), 5 glass-ish (unused unless sphere_specular).
    """
    WHITE, RED, GREEN, LIGHT, TALL = 0, 1, 2, 3, 4
    # All quads wound so geometric normals face the box interior.
    parts = [
        _quad([0, 0, 1], [1, 0, 1], [1, 0, 0], [0, 0, 0], WHITE),   # floor +y
        _quad([0, 1, 0], [1, 1, 0], [1, 1, 1], [0, 1, 1], WHITE),   # ceiling -y
        _quad([0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0], WHITE),   # back +z
        _quad([0, 0, 1], [0, 0, 0], [0, 1, 0], [0, 1, 1], RED),     # left +x
        _quad([1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0], GREEN),   # right -x
        # area light slightly below ceiling, emitting down (-y)
        _quad([0.35, 0.9985, 0.35], [0.65, 0.9985, 0.35],
              [0.65, 0.9985, 0.65], [0.35, 0.9985, 0.65], LIGHT),
    ]
    if boxes:
        parts.append(_box([0.12, 0.0, 0.08], [0.47, 0.60, 0.43], TALL))
        parts.append(_box([0.55, 0.0, 0.50], [0.85, 0.30, 0.80], WHITE))
    pos, nrm, uv, idx, mat = _merge(parts)

    mats = _materials([
        dict(base_color=[0.730, 0.735, 0.729], roughness=1.0),
        dict(base_color=[0.611, 0.0555, 0.062], roughness=1.0),
        dict(base_color=[0.117, 0.4125, 0.115], roughness=1.0),
        dict(base_color=[0.0, 0.0, 0.0], emissive=list(light_emission)),
        dict(base_color=[0.85, 0.85, 0.88],
             metallic=1.0 if sphere_specular else 0.0,
             roughness=0.15 if sphere_specular else 1.0),
    ])
    scene = HostScene(
        instances=[MeshInstance(positions=pos, normals=nrm, uvs=uv,
                                indices=idx, material=mat, name="cornell")],
        materials=mats,
    )
    scene.camera = dict(position=[0.5, 0.5, 2.45], target=[0.5, 0.5, 0.0],
                        up=[0.0, 1.0, 0.0], fov_y_deg=28.0)
    return scene


def furnace_box(albedo: float = 1.0, emission: float = 0.5) -> HostScene:
    """Closed uniform box: every surface has albedo `a` and emission `e`.

    Analytic fixed point: radiance everywhere L = e / (1 - a) — the classic
    furnace test for integrator energy conservation.
    """
    pos, nrm, uv, idx, mat = _box([0, 0, 0], [1, 1, 1], 0)
    # flip normals inward by swapping winding
    idx = idx[:, ::-1].copy()
    nrm = -nrm
    mats = _materials([
        # specular=0: pure Lambert so the analytic fixed point is exact.
        dict(base_color=[albedo] * 3, roughness=1.0, specular=0.0,
             emissive=[emission] * 3),
    ])
    scene = HostScene(
        instances=[MeshInstance(positions=pos, normals=nrm, uvs=uv,
                                indices=idx, material=mat, name="furnace")])
    scene.materials = mats
    scene.camera = dict(position=[0.5, 0.5, 0.5], target=[0.5, 0.5, 0.0],
                        up=[0.0, 1.0, 0.0], fov_y_deg=60.0)
    return scene


def single_triangle(light_kind: str = "point") -> HostScene:
    """One diffuse triangle + one analytic light — for analytic direct
    lighting validation."""
    pos = np.asarray([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    nrm = np.tile(np.asarray([[0, 0, 1]], np.float32), (3, 1))
    uv = np.asarray([[0, 0], [1, 0], [0.5, 1]], np.float32)
    idx = np.asarray([[0, 1, 2]], np.int32)
    mat = np.asarray([0], np.int32)
    mats = _materials([dict(base_color=[0.8, 0.6, 0.4], roughness=1.0)])

    if light_kind == "point":
        lights = AnalyticLights(
            kind=jnp.asarray([LIGHT_POINT], jnp.int32),
            position=jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32),
            direction=jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32),
            intensity=jnp.asarray([[10.0, 10.0, 10.0]], jnp.float32),
            angular_size=jnp.zeros((1,), jnp.float32),
            cos_inner=jnp.ones((1,), jnp.float32) * -2.0,
            cos_outer=jnp.ones((1,), jnp.float32) * -2.0,
        )
    else:
        lights = AnalyticLights(
            kind=jnp.asarray([LIGHT_DIRECTIONAL], jnp.int32),
            position=jnp.zeros((1, 3), jnp.float32),
            direction=jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32),
            intensity=jnp.asarray([[2.0, 2.0, 2.0]], jnp.float32),
            angular_size=jnp.zeros((1,), jnp.float32),
            cos_inner=jnp.ones((1,), jnp.float32) * -2.0,
            cos_outer=jnp.ones((1,), jnp.float32) * -2.0,
        )
    scene = HostScene(
        instances=[MeshInstance(positions=pos, normals=nrm, uvs=uv,
                                indices=idx, material=mat, name="tri")],
        materials=mats, analytic_lights=lights)
    scene.camera = dict(position=[0, 0, 3.0], target=[0, 0, 0],
                        up=[0, 1, 0], fov_y_deg=45.0)
    return scene


def random_triangles(n: int, seed: int = 0, extent: float = 10.0) -> HostScene:
    """Random triangle soup for BVH stress tests."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    edges = rng.normal(0, 0.5, (n, 2, 3)).astype(np.float32)
    v0 = centers
    v1 = centers + edges[:, 0]
    v2 = centers + edges[:, 1]
    pos = np.stack([v0, v1, v2], axis=1).reshape(-1, 3)
    fn = np.cross(v1 - v0, v2 - v0)
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    nrm = np.repeat(fn, 3, axis=0)
    uv = np.zeros((3 * n, 2), np.float32)
    idx = np.arange(3 * n, dtype=np.int32).reshape(-1, 3)
    mat = np.zeros((n,), np.int32)
    mats = _materials([dict(base_color=[0.7, 0.7, 0.7], roughness=1.0)])
    scene = HostScene(
        instances=[MeshInstance(positions=pos, normals=nrm, uvs=uv,
                                indices=idx, material=mat, name="soup")],
        materials=mats)
    scene.camera = dict(position=[0, 0, 3 * extent], target=[0, 0, 0],
                        up=[0, 1, 0], fov_y_deg=45.0)
    return scene


def default_camera(scene: HostScene, width: int, height: int):
    c = scene.camera or dict(position=[0, 1, 3], target=[0, 0, 0],
                             up=[0, 1, 0], fov_y_deg=45.0)
    return look_at(c["position"], c["target"], c["up"], c["fov_y_deg"],
                   width, height)
