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
    elif light_kind == "sphere":
        # radius 0.05 @ radiance L with L*pi*r^2 == the point light's
        # intensity 10, so far-field images match the point variant
        r = 0.05
        L = 10.0 / (np.pi * r * r)
        from rtxpt_tpu.scene.scene import LIGHT_SPHERE
        lights = AnalyticLights(
            kind=jnp.asarray([LIGHT_SPHERE], jnp.int32),
            position=jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32),
            direction=jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32),
            intensity=jnp.asarray([[L, L, L]], jnp.float32),
            angular_size=jnp.full((1,), r, jnp.float32),
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


def _quad_grid(p0, p1, p2, p3, nx: int, ny: int, mat: int):
    """Subdivided quad (2*nx*ny triangles), bilinear interpolation of the
    corners; normal from geometry (planar quads assumed)."""
    p0, p1, p2, p3 = (np.asarray(p, np.float32) for p in (p0, p1, p2, p3))
    us = np.linspace(0.0, 1.0, nx + 1, dtype=np.float32)
    vs = np.linspace(0.0, 1.0, ny + 1, dtype=np.float32)
    uu, vv = np.meshgrid(us, vs, indexing="ij")        # [nx+1, ny+1]
    pos = ((1 - uu)[..., None] * (1 - vv)[..., None] * p0
           + uu[..., None] * (1 - vv)[..., None] * p1
           + uu[..., None] * vv[..., None] * p2
           + (1 - uu)[..., None] * vv[..., None] * p3)
    pos = pos.reshape(-1, 3)
    n = np.cross(p1 - p0, p3 - p0)
    n = n / max(np.linalg.norm(n), 1e-12)
    nrm = np.tile(n[None], (len(pos), 1)).astype(np.float32)
    uvc = np.stack([uu, vv], axis=-1).reshape(-1, 2).astype(np.float32)
    i0 = (np.arange(nx)[:, None] * (ny + 1) + np.arange(ny)[None, :])
    i0 = i0.reshape(-1)
    a, b, c, d = i0, i0 + (ny + 1), i0 + (ny + 1) + 1, i0 + 1
    idx = np.concatenate([np.stack([a, b, c], -1),
                          np.stack([a, c, d], -1)]).astype(np.int32)
    mt = np.full((len(idx),), mat, np.int32)
    return pos, nrm, uvc, idx, mt


def _box_grid(lo, hi, s: int, mat: int):
    """Axis-aligned box with each face subdivided s x s (12*s^2 tris)."""
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    g = _quad_grid
    return _merge([
        g([x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1], s, s, mat),
        g([x1, y0, z0], [x0, y0, z0], [x0, y1, z0], [x1, y1, z0], s, s, mat),
        g([x1, y0, z1], [x1, y0, z0], [x1, y1, z0], [x1, y1, z1], s, s, mat),
        g([x0, y0, z0], [x0, y0, z1], [x0, y1, z1], [x0, y1, z0], s, s, mat),
        g([x0, y1, z1], [x1, y1, z1], [x1, y1, z0], [x0, y1, z0], s, s, mat),
        g([x0, y0, z0], [x1, y0, z0], [x1, y0, z1], [x0, y0, z1], s, s, mat),
    ])


def city_scene(tri_budget: int = 350_000, seed: int = 0,
               blocks: int = 8, textured: bool = False,
               with_env: bool = False) -> HostScene:
    """Programmer-art 'bistro-class' large scene: a blocks x blocks grid
    of subdivided tower boxes on a subdivided ground plane, lit by a few
    emissive street panels. Deterministic in (tri_budget, seed, blocks).

    Exercises the clustered large-scene path (accel/cluster.py) at the
    scale of the reference's Bistro configs (BASELINE.json configs 4-5);
    triangle count lands within ~5% of tri_budget.
    """
    rng = np.random.default_rng(seed)
    nb = blocks * blocks
    # tris: ground 2*g^2 + nb * 12*s^2 + lights; solve s for the budget.
    g = 24
    s = max(1, int(np.sqrt(max(tri_budget - 2 * g * g, 12) / (12 * nb))))
    GROUND, EMISSIVE, GLASS = 0, 5, 6
    palette = [1, 2, 3, 4]
    parts = [_quad_grid([0, 0, 0], [blocks * 10.0, 0, 0],
                        [blocks * 10.0, 0, blocks * 10.0],
                        [0, 0, blocks * 10.0], g, g, GROUND)]
    for bi in range(blocks):
        for bj in range(blocks):
            cx = bi * 10.0 + 5.0
            cz = bj * 10.0 + 5.0
            w = rng.uniform(2.5, 4.0)
            dpt = rng.uniform(2.5, 4.0)
            h = rng.uniform(4.0, 22.0)
            mat = palette[int(rng.integers(0, len(palette)))]
            if rng.uniform() < 0.12:
                mat = GLASS
            parts.append(_box_grid([cx - w, 0.0, cz - dpt],
                                   [cx + w, h, cz + dpt], s, mat))
    # Street lamps: single-quad emissive panels (2 tris each -> one
    # polymorphic light per tri; stays under the 128-light table cap).
    lamps = min(24, nb)
    for k in range(lamps):
        bi = (k * 7) % blocks
        bj = (k * 3 + 1) % blocks
        cx = bi * 10.0 + 1.2
        cz = bj * 10.0 + 1.2
        y = 4.5
        parts.append(_quad([cx - 0.6, y, cz - 0.6], [cx + 0.6, y, cz - 0.6],
                           [cx + 0.6, y, cz + 0.6], [cx - 0.6, y, cz + 0.6],
                           EMISSIVE))
    pos, nrm, uv, idx, mat = _merge(parts)

    mats = _materials([
        dict(base_color=[0.45, 0.43, 0.40], roughness=0.9),     # ground
        dict(base_color=[0.65, 0.55, 0.45], roughness=0.8),
        dict(base_color=[0.55, 0.60, 0.65], roughness=0.5),
        dict(base_color=[0.70, 0.35, 0.25], roughness=0.85),
        dict(base_color=[0.75, 0.75, 0.78], metallic=1.0, roughness=0.25),
        dict(base_color=[0.0, 0.0, 0.0], emissive=[400.0, 340.0, 220.0]),
        dict(base_color=[0.9, 0.95, 1.0], roughness=0.05,
             transmission=1.0, ior=1.5),                        # glass
    ])
    # Late-afternoon sun: a delta directional light keeps the scene
    # NEE-lit at benchmark scale without an envmap (the clustered fast
    # path excludes env lights — see bounce_clustered eligibility).
    sun_d = np.asarray([0.45, -0.72, 0.3], np.float32)
    sun_d /= np.linalg.norm(sun_d)
    sun = AnalyticLights(
        kind=jnp.asarray([LIGHT_DIRECTIONAL], jnp.int32),
        position=jnp.zeros((1, 3), jnp.float32),
        direction=jnp.asarray(sun_d[None], jnp.float32),
        intensity=jnp.asarray([[3.0, 2.7, 2.2]], jnp.float32),
        angular_size=jnp.zeros((1,), jnp.float32),
        cos_inner=jnp.full((1,), -2.0, jnp.float32),
        cos_outer=jnp.full((1,), -2.0, jnp.float32),
    )
    scene = HostScene(
        instances=[MeshInstance(positions=pos, normals=nrm, uvs=uv,
                                indices=idx, material=mat, name="city")],
        materials=mats, analytic_lights=sun,
    )
    if textured:
        scene.textures = [
            checker_texture(64, (0.95, 0.92, 0.88), (0.55, 0.52, 0.5)),
            checker_texture(64, (0.85, 0.88, 0.95), (0.35, 0.4, 0.5),
                            cells=16),
        ]
        bt = np.full((7,), -1, np.int32)
        bt[0] = 0                       # ground
        bt[1] = 1                       # facade family 1
        bt[3] = 1
        scene.materials = scene.materials.replace(
            base_color_tex=jnp.asarray(bt))
    if with_env:
        from rtxpt_tpu.lighting.sky import make_sky
        scene.envmap_image = make_sky(
            128, 64, sun_dir=(0.45, 0.72, -0.3), sun_intensity=40.0,
            bake_sun=True)
        scene.envmap_scale = 0.5
    c = blocks * 5.0
    scene.camera = dict(position=[c - 18.0, 6.0, c + 26.0],
                        target=[c, 4.0, c],
                        up=[0.0, 1.0, 0.0], fov_y_deg=55.0)
    return scene


def checker_texture(n: int = 64, c0=(0.9, 0.9, 0.9), c1=(0.25, 0.25, 0.3),
                    cells: int = 8) -> np.ndarray:
    """[n,n,4] checkerboard (pow2 n — the kernel texture path requires
    power-of-two dims for exact MIP halving)."""
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    m = ((xx * cells // n + yy * cells // n) % 2).astype(np.float32)
    img = np.empty((n, n, 4), np.float32)
    img[..., :3] = (np.asarray(c0, np.float32)[None, None] * (1 - m[..., None])
                    + np.asarray(c1, np.float32)[None, None] * m[..., None])
    img[..., 3] = 1.0
    return img


def textured_cornell(with_env: bool = True, with_mr: bool = False,
                     light_emission=(17.0, 12.0, 4.0)) -> HostScene:
    """Cornell box + checker base-color texture on the white material and
    (optionally) a procedural-sky environment — the minimal scene that
    exercises the fused kernel's in-kernel texturing + env sampling
    (VERDICT r2 gap: BASELINE configs 2+ demand textures/envmap on the
    hot path)."""
    host = cornell_box(light_emission=light_emission)
    host.textures = [checker_texture(64),
                     checker_texture(32, (0.8, 0.8, 0.8), (0.4, 0.4, 0.4),
                                     cells=4)]
    bt = np.full((len(np.asarray(host.materials.base_color)),), -1, np.int32)
    bt[0] = 0                   # white walls/boxes get the checker
    host.materials = host.materials.replace(
        base_color_tex=jnp.asarray(bt))
    if with_mr:
        mr = np.full_like(bt, -1)
        mr[4] = 1
        host.materials = host.materials.replace(
            metal_rough_tex=jnp.asarray(mr))
    if with_env:
        from rtxpt_tpu.lighting.sky import make_sky
        host.envmap_image = make_sky(128, 64, sun_dir=(0.4, 0.5, 0.3),
                                     sun_intensity=30.0, bake_sun=True)
        host.envmap_scale = 0.4
    return host


def default_camera(scene: HostScene, width: int, height: int):
    c = scene.camera or dict(position=[0, 1, 3], target=[0, 0, 0],
                             up=[0, 1, 0], fov_y_deg=45.0)
    return look_at(c["position"], c["target"], c["up"], c["fov_y_deg"],
                   width, height)


def wood_texture(n: int = 64, base=(0.45, 0.30, 0.17),
                 dark=(0.30, 0.18, 0.09), rings: int = 10) -> np.ndarray:
    """[n,n,4] deterministic wood-ish ring texture (pow2 n)."""
    yy, xx = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n),
                         indexing="ij")
    r = np.sqrt((xx - 0.3) ** 2 + 4.0 * (yy - 0.5) ** 2)
    w = 0.5 + 0.5 * np.sin(2 * np.pi * rings * r
                           + 2.0 * np.sin(6.0 * xx))
    img = np.empty((n, n, 4), np.float32)
    img[..., :3] = (np.asarray(base, np.float32)[None, None]
                    * (1 - w[..., None])
                    + np.asarray(dark, np.float32)[None, None]
                    * w[..., None])
    img[..., 3] = 1.0
    return img


def kitchen_scene(panel_grid: int = 16, subdiv: int = 3,
                  with_env: bool = True) -> HostScene:
    """'Kitchen-class' interior benchmark scene (the reference test
    matrix's kitchen.json analog, /root/reference/Support/tests/
    tests.json:2-52): a closed room with a window opening, textured
    floor/counters, mixed materials (diffuse / metal / glass /
    ceramic), and a panel_grid^2 grid of emissive ceiling panels —
    2*panel_grid^2 emissive triangles (>=512 at the default 16), the
    many-light workload NEE-AT exists for. Deterministic; ~3-4k tris at
    the default subdiv.

    Materials: 0 wall, 1 floor(checker tex), 2 counter(wood tex),
    3 metal, 4 glass, 5 panel(emissive), 6 ceramic, 7 dark accent.
    """
    WALL, FLOOR, WOOD, METAL, GLASS, PANEL, CERAMIC, DARK = range(8)
    W, H, D = 6.0, 3.0, 6.0
    s = subdiv
    g = _quad_grid
    parts = [
        # floor (+y normal), subdivided for light-cache locality
        g([0, 0, D], [W, 0, D], [W, 0, 0], [0, 0, 0], 4 * s, 4 * s, FLOOR),
        # ceiling (-y)
        g([0, H, 0], [W, H, 0], [W, H, D], [0, H, D], 2 * s, 2 * s, WALL),
        # back wall (+z normal, at z=0)
        g([0, 0, 0], [W, 0, 0], [W, H, 0], [0, H, 0], 2 * s, s, WALL),
        # front wall (-z, at z=D)
        g([W, 0, D], [0, 0, D], [0, H, D], [W, H, D], 2 * s, s, WALL),
        # right wall (-x, at x=W)
        g([W, 0, 0], [W, 0, D], [W, H, D], [W, H, 0], 2 * s, s, WALL),
    ]
    # left wall (x=0) with a window opening [z 2..4, y 1..2.2]:
    # four quads around the hole (env light enters through it)
    z0, z1, y0, y1 = 2.0, 4.0, 1.0, 2.2
    parts += [
        g([0, 0, D], [0, 0, 0], [0, y0, 0], [0, y0, D], 2 * s, 1, WALL),
        g([0, y1, D], [0, y1, 0], [0, H, 0], [0, H, D], 2 * s, 1, WALL),
        g([0, y0, z0], [0, y0, 0], [0, y1, 0], [0, y1, z0], s, 1, WALL),
        g([0, y0, D], [0, y0, z1], [0, y1, z1], [0, y1, D], s, 1, WALL),
    ]
    # emissive ceiling panel grid (each panel slightly below the ceiling,
    # emitting down): 2*panel_grid^2 triangle lights
    m = panel_grid
    px0, pz0, pw = 0.8, 0.8, (W - 1.6)
    cell = pw / m
    for i in range(m):
        for j in range(m):
            x = px0 + i * cell
            z = pz0 + j * cell
            e = 0.22 * cell
            parts.append(_quad([x + e, H - 0.02, z + e],
                               [x + cell - e, H - 0.02, z + e],
                               [x + cell - e, H - 0.02, z + cell - e],
                               [x + e, H - 0.02, z + cell - e], PANEL))
    # counters along the back + right walls, wood tops, dark bases
    parts += [
        _box([0.2, 0.0, 0.2], [W - 0.2, 0.85, 0.85], DARK),
        g([0.2, 0.86, 0.85], [W - 0.2, 0.86, 0.85],
          [W - 0.2, 0.86, 0.2], [0.2, 0.86, 0.2], 4, 2, WOOD),
        _box([W - 0.85, 0.0, 0.85], [W - 0.2, 0.85, D - 1.2], DARK),
        g([W - 0.85, 0.86, D - 1.2], [W - 0.2, 0.86, D - 1.2],
          [W - 0.2, 0.86, 0.85], [W - 0.85, 0.86, 0.85], 2, 4, WOOD),
    ]
    # fridge (metal), table (wood top, metal legs), glass splash panel,
    # ceramic pots
    parts += [
        _box([0.25, 0.0, D - 1.5], [1.15, 2.0, D - 0.6], METAL),
        g([2.2, 1.05, 4.2], [3.8, 1.05, 4.2],
          [3.8, 1.05, 2.8], [2.2, 1.05, 2.8], 3, 3, WOOD),
        _box([2.25, 0.0, 2.85], [2.4, 1.03, 3.0], METAL),
        _box([3.6, 0.0, 2.85], [3.75, 1.03, 3.0], METAL),
        _box([2.25, 0.0, 4.0], [2.4, 1.03, 4.15], METAL),
        _box([3.6, 0.0, 4.0], [3.75, 1.03, 4.15], METAL),
        _box([1.7, 0.86, 0.25], [2.9, 1.75, 0.33], GLASS),
        _box([4.6, 0.86, 0.4], [4.95, 1.25, 0.75], CERAMIC),
        _box([5.1, 0.86, 0.45], [5.35, 1.1, 0.7], CERAMIC),
    ]
    pos, nrm, uv, idx, mat = _merge(parts)

    mats = _materials([
        dict(base_color=[0.78, 0.77, 0.74], roughness=1.0),
        dict(base_color=[1.0, 1.0, 1.0], roughness=0.8),
        dict(base_color=[1.0, 1.0, 1.0], roughness=0.55),
        dict(base_color=[0.9, 0.9, 0.92], metallic=1.0, roughness=0.25),
        dict(base_color=[1.0, 1.0, 1.0], transmission=1.0, roughness=0.0,
             ior=1.5, thin=1.0),
        dict(base_color=[0.0, 0.0, 0.0], emissive=[22.0, 20.0, 17.0]),
        dict(base_color=[0.92, 0.90, 0.86], roughness=0.12),
        dict(base_color=[0.13, 0.12, 0.12], roughness=0.6),
    ])
    scene = HostScene(
        instances=[MeshInstance(positions=pos, normals=nrm, uvs=uv,
                                indices=idx, material=mat, name="kitchen")],
        materials=mats,
        material_names=["wall", "floor", "counter", "metal", "glass",
                        "panel", "ceramic", "accent"],
    )
    scene.textures = [checker_texture(64, (0.92, 0.92, 0.9),
                                      (0.2, 0.22, 0.26), cells=12),
                      wood_texture(64)]
    bt = np.full((8,), -1, np.int32)
    bt[FLOOR] = 0
    bt[WOOD] = 1
    scene.materials = scene.materials.replace(base_color_tex=jnp.asarray(bt))
    if with_env:
        from rtxpt_tpu.lighting.sky import make_sky
        scene.envmap_image = make_sky(
            128, 64, sun_dir=(-0.6, 0.5, 0.4), sun_intensity=60.0,
            bake_sun=True)
        scene.envmap_scale = 1.0
    scene.camera = dict(position=[4.9, 1.7, 5.3], target=[2.2, 1.1, 1.8],
                        up=[0.0, 1.0, 0.0], fov_y_deg=55.0)
    return scene


def rooms_scene(n_rooms: int = 12, subdiv: int = 2) -> HostScene:
    """Occlusion-heavy many-light benchmark: a row of n_rooms closed
    cells, each lit ONLY by its own emissive ceiling panel (full-height
    divider walls). The workload NEE-AT's per-tile adaptation exists
    for: the power pmf spreads samples over all panels while each
    surface sees exactly one — a visibility-dominated scene class the
    uniform-panel kitchen cannot represent (reference motivation:
    Lighting/LightsBaker.h NEE-AT)."""
    WALL, FLOOR, PANEL0 = 0, 1, 2
    Wr, H, D = 2.0, 2.4, 3.0
    g = _quad_grid
    s = subdiv
    parts = []
    for r in range(n_rooms):
        x0, x1 = r * Wr, (r + 1) * Wr
        parts += [
            # floor (+y) / ceiling (-y)
            g([x0, 0, D], [x1, 0, D], [x1, 0, 0], [x0, 0, 0], s, s, FLOOR),
            g([x0, H, 0], [x1, H, 0], [x1, H, D], [x0, H, D], s, s, WALL),
            # back wall only: the front stays open (dollhouse cut)
            # so one outside camera sees every room interior
            g([x0, 0, 0], [x1, 0, 0], [x1, H, 0], [x0, H, 0], s, s, WALL),
            # per-room emissive panel (distinct material -> its own light)
            g([x0 + 0.5, H - 0.05, 1.0], [x1 - 0.5, H - 0.05, 1.0],
              [x1 - 0.5, H - 0.05, 2.0], [x0 + 0.5, H - 0.05, 2.0],
              1, 1, PANEL0 + r),
        ]
    # divider walls incl. the two ends (full height: rooms are isolated)
    for r in range(n_rooms + 1):
        x = r * Wr
        parts.append(g([x, 0, 0], [x, 0, D], [x, H, D], [x, H, 0],
                       s, s, WALL))
    pos, nrm, uv, idx, mat = _merge(parts)
    mdefs = [dict(base_color=[0.75, 0.74, 0.72], roughness=1.0),
             dict(base_color=[0.6, 0.62, 0.66], roughness=0.9)]
    rng = np.random.default_rng(5)
    for r in range(n_rooms):
        tint = 0.6 + 0.4 * rng.random(3)
        mdefs.append(dict(base_color=[0, 0, 0],
                          emissive=(18.0 * tint).tolist()))
    scene = HostScene(
        instances=[MeshInstance(positions=pos, normals=nrm, uvs=uv,
                                indices=idx, material=mat, name="rooms")],
        materials=_materials(mdefs),
    )
    # frontal view through the open cut: every room interior visible,
    # each image tile dominated by exactly one room's panel
    cx = n_rooms * Wr * 0.5
    scene.camera = dict(position=[cx, H * 0.55, D + n_rooms * Wr * 0.42],
                        target=[cx, H * 0.45, 0.0],
                        up=[0, 1, 0], fov_y_deg=46.0)
    return scene
