"""Instanced clustered tier (VERDICT r4 #9: BLAS-reuse on the hot path).

Large instanced scenes used to demote to the XLA TLAS walk because
cluster tables were only built on the flatten path. The instanced
builder (accel/cluster.py build_cluster_tables_instanced) bakes
OBJECT-space prototype blocks shared across instances and expands only
the cull metadata per (instance, cluster); the flat A1/B1 kernels DMA
each candidate's instance transform tile alongside its block and re-base
the ray into the prototype frame with one MXU pass
(pt/bounce_clustered._xform_od). Reference analog: BLAS reuse across
TLAS instances, Sample.cpp:1088-1242.
"""

import dataclasses
import os

import numpy as np
import jax.numpy as jnp

os.environ.setdefault("RTXPT_TPU_PALLAS_INTERPRET", "1")

from rtxpt_tpu.config import NEEMode, PathTracerConfig
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.pt import dispatch
from rtxpt_tpu.pt.integrator import render_sample_jit
from rtxpt_tpu.scene.procedural import _box_grid, default_camera
from rtxpt_tpu.scene.scene import (AnalyticLights, HostScene, Materials,
                                   MeshInstance)
from rtxpt_tpu.lighting.lights_baker import LIGHT_POINT

W = H = 24


def _xform(tx, ty, tz, scale=1.0, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                         np.float32) * scale
    m[:3, 3] = [tx, ty, tz]
    return m


def _instanced_city(grid=3, subdiv=6):
    """grid x grid towers sharing ONE dense prototype + a dense floor;
    point light (no emissive — the instanced tier's v1 restriction)."""
    pos, nrm, uv, idx, _m = _box_grid([-0.4, 0.0, -0.4], [0.4, 1.6, 0.4],
                                      subdiv, 0)
    mats = Materials.create(2)
    mats = mats.replace(
        base_color=jnp.asarray([[0.7, 0.4, 0.3], [0.6, 0.6, 0.65]],
                               jnp.float32),
        roughness=jnp.asarray([0.5, 0.9], jnp.float32))
    rng = np.random.default_rng(11)
    insts = []
    for i in range(grid):
        for j in range(grid):
            insts.append(MeshInstance(
                positions=pos, normals=nrm, uvs=uv, indices=idx,
                material=np.zeros((len(idx),), np.int32),
                transform=_xform(i * 1.6 - grid * 0.8, 0.0,
                                 j * 1.6 - grid * 0.8,
                                 scale=0.7 + 0.5 * rng.random(),
                                 yaw=float(rng.random()) * 2.0),
                mesh_key="tower"))
    fpos, fnrm, fuv, fidx, _fm = _box_grid([-4.0, -0.2, -4.0],
                                           [4.0, 0.0, 4.0], 10, 1)
    insts.append(MeshInstance(
        positions=fpos, normals=fnrm, uvs=fuv, indices=fidx,
        material=np.ones((len(fidx),), np.int32)))
    lights = AnalyticLights(
        kind=jnp.asarray([LIGHT_POINT], jnp.int32),
        position=jnp.asarray([[0.0, 4.0, 1.0]], jnp.float32),
        direction=jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32),
        intensity=jnp.asarray([[40.0, 38.0, 35.0]], jnp.float32),
        angular_size=jnp.zeros((1,), jnp.float32),
        cos_inner=jnp.ones((1,), jnp.float32) * -2.0,
        cos_outer=jnp.ones((1,), jnp.float32) * -2.0)
    return HostScene(instances=insts, materials=mats,
                     analytic_lights=lights, force_instancing=True)


def test_xform_operand_map_exact():
    """The 10x10 world->object ray-operand map (ClusterTables.xf) is the
    algebraic identity it claims: for random affine instance transforms
    and rays, M10 @ [d, oxd, o, 1] == [d_o, o_o x d_o, o_o, 1]."""
    rng = np.random.default_rng(3)
    for _ in range(20):
        A = rng.normal(size=(3, 3)) + np.eye(3) * 2.0
        if np.linalg.det(A) <= 0:
            A = -A
        t = rng.normal(size=3) * 5.0
        Ainv = np.linalg.inv(A)
        t_o = -Ainv @ t
        M = np.zeros((10, 10))
        M[0:3, 0:3] = Ainv
        tx = np.array([[0, -t_o[2], t_o[1]],
                       [t_o[2], 0, -t_o[0]],
                       [-t_o[1], t_o[0], 0]])
        M[3:6, 0:3] = tx @ Ainv
        M[3:6, 3:6] = (1.0 / np.linalg.det(A)) * A.T
        M[6:9, 6:9] = Ainv
        M[6:9, 9] = t_o
        M[9, 9] = 1.0
        o = rng.normal(size=3) * 3.0
        d = rng.normal(size=3)
        base = np.concatenate([d, np.cross(o, d), o, [1.0]])
        out = M @ base
        o_o = Ainv @ o + t_o
        d_o = Ainv @ d
        want = np.concatenate([d_o, np.cross(o_o, d_o), o_o, [1.0]])
        np.testing.assert_allclose(out, want, rtol=1e-9, atol=1e-9)


def test_instanced_clustered_matches_tlas_path():
    host = _instanced_city()
    sd = prepare(host)
    tbl = sd.cluster_tables
    assert tbl is not None and tbl.instanced
    # O(prototype) geometry: the block pool stores only the 2 prototypes
    # (n_tris = POOL triangles), while the world candidate list expands
    # over all 10 instances
    n_world = sum(len(i.indices) for i in host.instances)
    assert tbl.n_tris < n_world // 3
    assert int(tbl.blocks.shape[0]) < tbl.n_clusters
    assert tbl.xf.shape[0] == len(host.instances)

    cam = default_camera(host, W, H)
    base = PathTracerConfig(max_bounces=2, nee=NEEMode.POWER,
                            enable_russian_roulette=False)
    r = dispatch.resolve(sd, base)
    assert r.kernel_tier == "clustered", r.kernel_tier

    out = render_sample_jit(sd, cam, r, W, H, jnp.uint32(0))
    a = np.asarray(out["L"])
    assert np.isfinite(a).all()

    xla = dataclasses.replace(r, kernel_tier="xla")
    b = np.asarray(render_sample_jit(sd, cam, xla, W, H,
                                     jnp.uint32(0))["L"])
    bad = np.abs(a - b) > 1e-3 + 1e-2 * np.abs(b)
    assert bad.mean() < 2e-2, (bad.mean(), float(np.abs(a - b).max()))
    # and the image is non-trivial (lit geometry, shadows)
    assert a.mean() > 1e-3
