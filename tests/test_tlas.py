"""Two-level BVH (TLAS analog, accel/tlas.py) — VERDICT r2 #7.

Covers: exact closest-hit vs a numpy all-pairs oracle, image parity vs
the flattened single-level path, node-pool reuse across instances
(the BLAS-sharing memory win), O(instances) rigid-animation refit
matching a from-scratch rebuild, and the v1 emissive restriction
fallback. Reference: Sample.cpp:1088-1242 (CreateTlas/BuildTLAS),
:1170-1198 (per-frame BLAS/TLAS update).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from rtxpt_tpu.config import NEEMode, PathTracerConfig
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.scene.scene import (AnalyticLights, HostScene, Materials,
                                   MeshInstance, LIGHT_POINT)


def _box_mesh(size=0.4):
    s = size
    v = np.array([[-s, -s, -s], [s, -s, -s], [s, s, -s], [-s, s, -s],
                  [-s, -s, s], [s, -s, s], [s, s, s], [-s, s, s]],
                 np.float32)
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                  [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                  [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]], np.int32)
    n = np.zeros_like(v)
    for tri in f:
        e1 = v[tri[1]] - v[tri[0]]
        e2 = v[tri[2]] - v[tri[0]]
        fn = np.cross(e1, e2)
        n[tri] += fn
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    uv = np.zeros((len(v), 2), np.float32)
    return v, n, uv, f


def _xform(tx, ty, tz, scale=1.0, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                         np.float32) * scale
    m[:3, 3] = [tx, ty, tz]
    return m


def _instanced_scene(grid=3, force=True):
    """grid x grid boxes sharing ONE prototype + a single-instance floor
    + a single-instance emissive panel; point light for NEE."""
    v, n, uv, f = _box_mesh()
    mats = Materials.create(3)
    mats = mats.replace(
        base_color=jnp.asarray([[0.7, 0.3, 0.3], [0.6, 0.6, 0.6],
                                [0.9, 0.9, 0.9]], jnp.float32),
        roughness=jnp.asarray([0.4, 0.8, 0.5], jnp.float32),
        emissive=jnp.asarray([[0, 0, 0], [0, 0, 0], [4, 4, 4]],
                             jnp.float32))
    insts = []
    rng = np.random.default_rng(7)
    for i in range(grid):
        for j in range(grid):
            insts.append(MeshInstance(
                positions=v, normals=n, uvs=uv, indices=f,
                material=np.zeros((len(f),), np.int32),
                transform=_xform(i * 1.2 - grid * 0.6, 0.4,
                                 j * 1.2 - grid * 0.6,
                                 scale=0.6 + 0.3 * rng.random(),
                                 yaw=float(rng.random()) * 2.0),
                mesh_key="box"))
    # floor (single instance, own prototype)
    fv = np.array([[-4, 0, -4], [4, 0, -4], [4, 0, 4], [-4, 0, 4]],
                  np.float32)
    ff = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    fn = np.tile(np.array([[0, 1, 0]], np.float32), (4, 1))
    insts.append(MeshInstance(
        positions=fv, normals=fn, uvs=np.zeros((4, 2), np.float32),
        indices=ff, material=np.ones((2,), np.int32)))
    # emissive panel (single instance)
    ev = fv * 0.25 + np.array([[0, 3.0, 0]], np.float32)
    insts.append(MeshInstance(
        positions=ev, normals=-fn, uvs=np.zeros((4, 2), np.float32),
        indices=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        material=np.full((2,), 2, np.int32)))
    lights = AnalyticLights(
        kind=jnp.asarray([LIGHT_POINT], jnp.int32),
        position=jnp.asarray([[0.0, 2.5, 0.0]], jnp.float32),
        direction=jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32),
        intensity=jnp.asarray([[20.0, 20.0, 18.0]], jnp.float32),
        angular_size=jnp.zeros((1,), jnp.float32),
        cos_inner=jnp.ones((1,), jnp.float32) * -2.0,
        cos_outer=jnp.ones((1,), jnp.float32) * -2.0)
    return HostScene(instances=insts, materials=mats,
                     analytic_lights=lights, force_instancing=force)


def _world_tris(host):
    out = []
    for it in host.instances:
        m = it.transform
        p = it.positions @ m[:3, :3].T + m[:3, 3]
        out.append(p[it.indices])          # [t,3,3]
    return np.concatenate(out)


def _oracle_closest(tris, o, d, tmax):
    """Numpy Möller–Trumbore over all world triangles."""
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    best_t = np.full(len(o), tmax, np.float64)
    best_p = np.full(len(o), -1, np.int64)
    for k in range(len(o)):
        pvec = np.cross(d[k], e2)
        det = np.einsum("ij,ij->i", e1, pvec)
        ok = np.abs(det) > 1e-9
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tvec = o[k] - v0
        u = np.einsum("ij,ij->i", tvec, pvec) * inv
        qvec = np.cross(tvec, e1)
        v = np.einsum("j,ij->i", d[k], qvec) * inv
        t = np.einsum("ij,ij->i", e2, qvec) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-4) \
            & (t < best_t[k])
        if hit.any():
            i = np.argmin(np.where(hit, t, np.inf))
            best_t[k] = t[i]
            best_p[k] = i
    return best_t, best_p


@pytest.fixture(scope="module")
def scene_pair():
    host = _instanced_scene()
    sd_tl = prepare(host, instancing="force")
    sd_fl = prepare(host, instancing="off")
    return host, sd_tl, sd_fl


def test_builds_two_level(scene_pair):
    host, sd_tl, sd_fl = scene_pair
    assert sd_tl.tlas is not None
    assert sd_fl.tlas is None
    # node-pool reuse: instances share ONE mesh subtree; the flattened
    # BVH carries every duplicated triangle
    n_shared = sd_tl.tlas.num_nodes
    n_flat = sd_fl.bvh.num_nodes
    assert n_shared < n_flat * 0.45, (n_shared, n_flat)
    # geometry pool holds prototypes, not copies
    t_pool = sd_tl.geometry.num_triangles
    t_flat = sd_fl.geometry.num_triangles
    assert t_pool == 12 + 2 + 2
    assert t_flat == 12 * 9 + 4


def test_closest_hit_matches_oracle(scene_pair):
    from rtxpt_tpu.accel.tlas import intersect_closest_tlas
    host, sd_tl, _ = scene_pair
    tris = _world_tris(host)
    rng = np.random.default_rng(3)
    n = 256
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.1, 3.0, n)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = intersect_closest_tlas(
        sd_tl.tlas, jnp.asarray(o), jnp.asarray(d),
        jnp.full((n,), 1e-4, jnp.float32), jnp.full((n,), 1e3, jnp.float32))
    t_ref, p_ref = _oracle_closest(tris.astype(np.float64),
                                   o.astype(np.float64),
                                   d.astype(np.float64), 1e3)
    t_got = np.asarray(hit.t)
    miss_got = np.asarray(hit.miss)
    assert (miss_got == (p_ref < 0)).all()
    h = p_ref >= 0
    assert np.allclose(t_got[h], t_ref[h], rtol=2e-4, atol=2e-4)


def test_any_hit_matches_oracle(scene_pair):
    from rtxpt_tpu.accel.tlas import intersect_any_tlas
    host, sd_tl, _ = scene_pair
    tris = _world_tris(host)
    rng = np.random.default_rng(5)
    n = 128
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 2.5, n)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dist = rng.uniform(0.3, 4.0, n).astype(np.float32)
    occ = np.asarray(intersect_any_tlas(
        sd_tl.tlas, jnp.asarray(o), jnp.asarray(d),
        jnp.full((n,), 1e-4, jnp.float32), jnp.asarray(dist)))
    t_ref, p_ref = _oracle_closest(tris.astype(np.float64),
                                   o.astype(np.float64),
                                   d.astype(np.float64), 1e9)
    ref_occ = (p_ref >= 0) & (t_ref < dist)
    # disagreements only at the t==dist boundary
    edge = (p_ref >= 0) & (np.abs(t_ref - dist) < 1e-3)
    assert (occ == ref_occ)[~edge].all()


def test_render_parity_with_flatten(scene_pair):
    from rtxpt_tpu.pt.integrator import render
    from rtxpt_tpu.scene.camera import look_at
    host, sd_tl, sd_fl = scene_pair
    cam = look_at([4.5, 3.5, 4.5], [0, 0.5, 0], [0, 1, 0], 45.0, 96, 96)
    cfg = PathTracerConfig(max_bounces=3, nee=NEEMode.POWER)
    img_tl, _, _ = render(sd_tl, cam, cfg, 96, 96, spp=4)
    img_fl, _, _ = render(sd_fl, cam, cfg, 96, 96, spp=4)
    a, b = np.asarray(img_tl), np.asarray(img_fl)
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    assert np.isfinite(a).all()
    assert rmse < 2e-3, rmse


def test_refit_matches_rebuild():
    from rtxpt_tpu.accel.tlas import intersect_closest_tlas, refit_tlas
    host = _instanced_scene(grid=3)
    sd = prepare(host, instancing="force")
    # move every box instance (rigid animation frame)
    rng = np.random.default_rng(11)
    new_tf = []
    for k, it in enumerate(host.instances):
        m = np.array(it.transform, np.float32)
        if it.mesh_key == "box":
            m = _xform(*(rng.uniform(-2, 2, 2).tolist() + [0.7]),
                       scale=0.5 + 0.4 * rng.random(),
                       yaw=float(rng.random()) * 3.0)
            m[:3, 3][1] = 0.4
            it.transform = m
        new_tf.append(m)
    tl_refit = refit_tlas(sd.tlas, jnp.asarray(np.stack(new_tf)))
    sd2 = prepare(host, instancing="force")      # from-scratch rebuild

    n = 256
    o = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.1, 3.0, n)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    args = (jnp.asarray(o), jnp.asarray(d),
            jnp.full((n,), 1e-4, jnp.float32),
            jnp.full((n,), 1e3, jnp.float32))
    h1 = intersect_closest_tlas(tl_refit, *args)
    h2 = intersect_closest_tlas(sd2.tlas, *args)
    assert (np.asarray(h1.miss) == np.asarray(h2.miss)).all()
    hh = ~np.asarray(h1.miss)
    assert np.allclose(np.asarray(h1.t)[hh], np.asarray(h2.t)[hh],
                       rtol=1e-5, atol=1e-5)
    # the refit reused the mesh node pool: same shape, mesh rows untouched
    n_tlas_rows = int(np.asarray(sd.tlas.int_rows).shape[0]
                      + sd.tlas.n_instances)
    a = np.asarray(tl_refit.nodes[n_tlas_rows:])
    b = np.asarray(sd.tlas.nodes[n_tlas_rows:])
    assert a.shape == b.shape
    assert np.array_equal(a, b)


def _emissive_shared_host():
    host = _instanced_scene()
    # make the SHARED box prototype emissive (v2: no longer a fallback)
    em = np.asarray(host.materials.emissive).copy()
    em[0] = [5.0, 5.0, 5.0]
    host.materials = host.materials.replace(emissive=jnp.asarray(em))
    return host


def test_emissive_on_shared_prototype_builds_v2():
    """TLAS v2 (VERDICT r3 #6): emissive on a multi-instance prototype
    builds the two-level path — one light per (instance, emissive pool
    tri) pair, hits mapped via inst_light_base + em_rank."""
    from rtxpt_tpu.accel.tlas import build_two_level
    host = _emissive_shared_host()
    built = build_two_level(host, min_sharing=1.0)
    assert built is not None
    sd = prepare(host, instancing="force")
    assert sd.tlas is not None
    # 9 box instances x 12 emissive tris + 1 single-instance panel x 2
    n_box_tris = len(host.instances[0].indices)
    want = 9 * n_box_tris + 2
    n_tri_lights = int((np.asarray(sd.lights.kind) == 0).sum())
    assert n_tri_lights == want, (n_tri_lights, want)
    # expansion mapping covers every instance run: 9 boxes of 12, the
    # floor adds none, the panel starts at 108
    base = np.asarray(sd.tlas.inst_light_base)
    assert list(base[:3]) == [0, n_box_tris, 2 * n_box_tris]
    assert base[-1] == 9 * n_box_tris
    rank = np.asarray(sd.tlas.em_rank)
    assert rank.max() == n_box_tris - 1


def test_emissive_shared_render_parity_with_flatten():
    """Instanced emissive scene renders like its flattened twin (both
    NEE sampling of per-instance lights and MIS at emissive hits)."""
    from rtxpt_tpu.pt.integrator import render
    from rtxpt_tpu.scene.camera import look_at
    host = _emissive_shared_host()
    sd_tl = prepare(host, instancing="force")
    sd_fl = prepare(host, instancing="off")
    cam = look_at([4.5, 3.5, 4.5], [0, 0.5, 0], [0, 1, 0], 45.0, 96, 96)
    cfg = PathTracerConfig(max_bounces=3, nee=NEEMode.POWER)
    img_tl, _, _ = render(sd_tl, cam, cfg, 96, 96, spp=4)
    img_fl, _, _ = render(sd_fl, cam, cfg, 96, 96, spp=4)
    a, b = np.asarray(img_tl), np.asarray(img_fl)
    assert np.isfinite(a).all()
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    assert rmse < 2e-2, rmse
