"""Large-scene clustered path: culling, tables, and end-to-end parity.

Runs the Pallas kernels in interpret mode on the CPU mesh (conftest
forces the cpu platform; bounce_clustered honors
RTXPT_TPU_PALLAS_INTERPRET=1).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

os.environ.setdefault("RTXPT_TPU_PALLAS_INTERPRET", "1")


def _small_city(budget=4000):
    from rtxpt_tpu.scene.procedural import city_scene
    return city_scene(tri_budget=budget, seed=1, blocks=2)


@pytest.fixture(scope="module")
def city():
    from rtxpt_tpu.prepare import prepare
    host = _small_city()
    sd = prepare(host)
    assert sd.cluster_tables is not None, "expected clustered path"
    return host, sd


def test_city_scene_size():
    from rtxpt_tpu.scene.procedural import city_scene
    host = city_scene(tri_budget=350_000, seed=0)
    t = sum(len(i.indices) for i in host.instances)
    assert t >= 300_000, t


def test_cull_conservative():
    """No truly-hit cluster may ever be culled (when kslots is large)."""
    from rtxpt_tpu.accel.cull import cull_candidates
    rng = np.random.default_rng(0)
    C = 40
    lo = rng.uniform(-10, 9, (C, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.2, 2.0, (C, 3)).astype(np.float32)
    G, R = 2, 8
    o = rng.uniform(-12, 12, (3, G, R, 128)).astype(np.float32)
    d = rng.standard_normal((3, G, R, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    active = rng.uniform(size=(G, R, 128)) < 0.9
    tmax = 40.0
    cand, overflow = cull_candidates(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(active),
        jnp.float32(tmax), jnp.asarray(lo), jnp.asarray(hi), kslots=C)
    cand = np.asarray(cand)
    assert int(overflow) == 0

    # exact per-ray slab reference
    for g in range(G):
        ids = set(cand[g, 0, 1:1 + C][:cand[g, 0, 0]].tolist())
        for r in range(R):
            for l in range(0, 128, 17):
                if not active[g, r, l]:
                    continue
                oo = o[:, g, r, l]
                dd = d[:, g, r, l]
                with np.errstate(divide="ignore", invalid="ignore"):
                    t0 = (lo - oo) / dd
                    t1 = (hi - oo) / dd
                tn = np.minimum(t0, t1).max(axis=1)
                tf = np.maximum(t0, t1).min(axis=1)
                hit = (tn <= tf) & (tf >= 0) & (tn <= tmax)
                for c in np.nonzero(hit)[0]:
                    assert c in ids, (g, r, l, c)


def test_cluster_block_coefficients(city):
    """Block coefficient rows reproduce Moller-Trumbore quantities."""
    from rtxpt_tpu.accel.cluster import CT, ClusterTables
    host, sd = city
    tbl: ClusterTables = sd.cluster_tables
    blocks = np.asarray(tbl.blocks)
    pos = np.asarray(sd.geometry.positions)
    idx = np.asarray(sd.geometry.indices)
    offsets = np.asarray(tbl.offsets)
    rng = np.random.default_rng(1)
    for _ in range(20):
        tri = int(rng.integers(0, tbl.n_tris))
        c = int(np.searchsorted(offsets, tri, side="right")) - 1
        j = tri - int(offsets[c])
        o = rng.uniform(0, 20, 3).astype(np.float32)
        d = rng.standard_normal(3).astype(np.float32)
        d /= np.linalg.norm(d)
        from rtxpt_tpu.accel.cluster import CENTER_ROW
        center = np.array([blocks[c, CENTER_ROW, a * CT] for a in range(3)])
        oc = o - center
        ray = np.concatenate([d, np.cross(oc, d), oc, [1.0]]
                             ).astype(np.float32)
        coefs = blocks[c, 0:10] + blocks[c, 10:20]    # split-bf16 hi+lo
        got = [float(ray @ coefs[:, q * CT + j]) for q in range(4)]
        v0, v1, v2 = pos[idx[tri, 0]], pos[idx[tri, 1]], pos[idx[tri, 2]]
        e1, e2 = v1 - v0, v2 - v0
        n = np.cross(e1, e2)
        det = -d @ n
        u_num = (o - v0) @ np.cross(d, e2)
        v_num = d @ np.cross(o - v0, e1)
        t_num = o @ n - v0 @ n
        ref = [det, u_num, v_num, t_num]
        sc = max(1.0, max(abs(x) for x in ref))
        assert np.allclose(got, ref, atol=5e-3 * sc), (tri, got, ref)


def test_clustered_parity_with_xla(city):
    """End-to-end radiance parity: clustered kernels (interpret) vs the
    XLA wavefront + BVH on the same scene, same sampler."""
    from rtxpt_tpu.config import PathTracerConfig, NEEMode
    from rtxpt_tpu.pt.integrator import render
    from rtxpt_tpu.scene.procedural import default_camera
    host, sd = city
    cam = default_camera(host, 48, 32)
    cfg = PathTracerConfig(max_bounces=3, nee=NEEMode.POWER)
    import dataclasses

    from rtxpt_tpu.pt import dispatch
    assert dispatch.resolve(sd, cfg).kernel_tier == "clustered"
    img = np.asarray(render(sd, cam, cfg, 48, 32, spp=4)[0])

    # The reference render pins the XLA wavefront via the STATIC tier
    # field — a different jit cache key, so this is guaranteed not to be
    # the round-2 self-vs-self comparison (ADVICE r2 high: the env-var
    # flip was invisible to the jit cache and compared clustered to
    # itself).
    cfg_ref = dataclasses.replace(cfg, kernel_tier="xla")
    ref = np.asarray(render(sd, cam, cfg_ref, 48, 32, spp=4)[0])
    assert not np.array_equal(img, ref), "tiers produced bitwise-identical images; reference path did not run"

    assert np.isfinite(img).all()
    rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
    assert rmse < 2e-2, rmse
    # mean energy agreement (tighter than per-pixel noise)
    assert abs(img.mean() - ref.mean()) < 5e-3, (img.mean(), ref.mean())
