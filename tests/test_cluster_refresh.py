"""Device-side cluster-table refresh for animated frames (VERDICT r2 #9).

accel/cluster.refresh_cluster_tables must (a) be the identity on
unchanged geometry, (b) produce intersection coefficients consistent
with the moved triangles, and (c) keep animated scenes eligible for the
clustered tier (scene/animation.py no longer invalidates the tables).
Reference analog: skinned/rigid BLAS update, Sample.cpp:1170-1198.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.scene.procedural import city_scene
from rtxpt_tpu.accel.cluster import (ATTR_BASE, AT_GIDX, AT_VALID, CT,
                                     refresh_cluster_tables)


@pytest.fixture(scope="module")
def small_city():
    host = city_scene(tri_budget=20_000)
    sd = prepare(host)
    assert sd.cluster_tables is not None
    return sd


def test_refresh_identity(small_city):
    sd = small_city
    tbl = sd.cluster_tables
    out = refresh_cluster_tables(tbl, sd.geometry.positions,
                                 sd.geometry.normals, sd.geometry.indices)
    a, b = np.asarray(out.blocks), np.asarray(tbl.blocks)
    # XLA's bf16 split rounds the lo limb one ulp differently from the
    # numpy emulation in spots; 3e-4 abs is ~1e-5 relative on the
    # coefficients — far inside the kernel's 2e-3*|det| admission margin
    assert np.allclose(a, b, atol=3e-4), float(np.abs(a - b).max())
    assert np.allclose(np.asarray(out.aabb_lo), np.asarray(tbl.aabb_lo),
                       atol=1e-5)


def test_refresh_moved_coefficients(small_city):
    """After a rigid move, block coefficients must reproduce exact
    Moller-Trumbore u/v/t for random (ray, triangle) pairs — the same
    oracle as tests/test_cluster.py::test_cluster_block_coefficients."""
    sd = small_city
    delta = np.asarray([1.5, -0.3, 0.7], np.float32)
    scale = 1.1
    pos2 = np.asarray(sd.geometry.positions) * scale + delta
    tbl = refresh_cluster_tables(sd.cluster_tables, jnp.asarray(pos2),
                                 sd.geometry.normals, sd.geometry.indices)
    from rtxpt_tpu.accel.cluster import CENTER_ROW
    blocks = np.asarray(tbl.blocks)
    offsets = np.asarray(tbl.offsets)
    idx = np.asarray(sd.geometry.indices)
    rng = np.random.default_rng(2)
    for _ in range(16):
        tri = int(rng.integers(0, tbl.n_tris))
        c = int(np.searchsorted(offsets, tri, side="right")) - 1
        j = tri - int(offsets[c])
        o = rng.uniform(0, 20, 3).astype(np.float32)
        d = rng.standard_normal(3).astype(np.float32)
        d /= np.linalg.norm(d)
        center = np.array([blocks[c, CENTER_ROW, a * CT]
                           for a in range(3)])
        oc = o - center
        ray = np.concatenate([d, np.cross(oc, d), oc, [1.0]]
                             ).astype(np.float32)
        coefs = blocks[c, 0:10] + blocks[c, 10:20]    # split-bf16 hi+lo
        got = [float(ray @ coefs[:, q * CT + j]) for q in range(4)]
        v0, v1, v2 = pos2[idx[tri, 0]], pos2[idx[tri, 1]], pos2[idx[tri, 2]]
        e1, e2 = v1 - v0, v2 - v0
        n = np.cross(e1, e2)
        det = -d @ n
        u_num = (o - v0) @ np.cross(d, e2)
        v_num = d @ np.cross(o - v0, e1)
        t_num = o @ n - v0 @ n
        ref = [det, u_num, v_num, t_num]
        sc = max(1.0, max(abs(x) for x in ref))
        assert np.allclose(got, ref, atol=5e-3 * sc), (tri, got, ref)


def test_static_rows_untouched(small_city):
    sd = small_city
    pos2 = np.asarray(sd.geometry.positions) + 2.0
    tbl = refresh_cluster_tables(sd.cluster_tables, jnp.asarray(pos2),
                                 sd.geometry.normals, sd.geometry.indices)
    for logical in (AT_GIDX, AT_VALID):
        r, cblk = ATTR_BASE + logical // 4, logical % 4
        a = np.asarray(tbl.blocks[:, r, cblk * CT:(cblk + 1) * CT])
        b = np.asarray(sd.cluster_tables.blocks[:, r,
                                                cblk * CT:(cblk + 1) * CT])
        assert np.array_equal(a, b)


def test_animation_keeps_clustered_tier(small_city):
    from rtxpt_tpu.config import PathTracerConfig
    from rtxpt_tpu.pt.dispatch import resolve
    import os
    sd = small_city
    # simulate the animation.update outcome: refreshed (not None) tables
    tbl = refresh_cluster_tables(sd.cluster_tables,
                                 sd.geometry.positions + 0.5,
                                 sd.geometry.normals, sd.geometry.indices)
    sd2 = sd.replace(cluster_tables=tbl)
    prev = os.environ.get("RTXPT_TPU_PALLAS_INTERPRET")
    os.environ["RTXPT_TPU_PALLAS_INTERPRET"] = "1"
    try:
        cfg = resolve(sd2, PathTracerConfig(max_bounces=2))
    finally:
        # restore, don't delete: other modules set this at import and an
        # unconditional del leaks order-dependence into later files
        if prev is None:
            del os.environ["RTXPT_TPU_PALLAS_INTERPRET"]
        else:
            os.environ["RTXPT_TPU_PALLAS_INTERPRET"] = prev
    assert cfg.kernel_tier == "clustered", cfg.kernel_tier
