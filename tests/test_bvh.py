"""BVH build + traversal correctness vs brute force (LBVH validity tests
the reference lacks — SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rtxpt_tpu.accel import build_bvh, intersect_closest, intersect_any
from rtxpt_tpu.scene.procedural import random_triangles


def _brute_force(pos, idx, o, d, tmin=1e-3, tmax=1e9):
    v0 = pos[idx[:, 0]]
    e1 = pos[idx[:, 1]] - v0
    e2 = pos[idx[:, 2]] - v0
    pv = np.cross(d[:, None, :], e2[None])
    det = np.einsum("tj,ntj->nt", e1, pv)
    inv = np.where(np.abs(det) > 1e-9, 1 / np.where(np.abs(det) > 1e-9, det, 1), 0)
    tv = o[:, None, :] - v0[None]
    u = np.einsum("ntj,ntj->nt", tv, pv) * inv
    qv = np.cross(tv, e1[None])
    v = np.einsum("nj,ntj->nt", d, qv) * inv
    t = np.einsum("tj,ntj->nt", e2, qv) * inv
    ok = (np.abs(det) > 1e-9) & (u >= 0) & (v >= 0) & (u + v <= 1) \
        & (t > tmin) & (t < tmax)
    t = np.where(ok, t, np.inf)
    ti = np.argmin(t, axis=1)
    tb = t[np.arange(len(o)), ti]
    return np.where(np.isfinite(tb), ti, -1), np.where(np.isfinite(tb), tb, tmax)


@pytest.mark.parametrize("ntri,seed", [(1, 0), (2, 1), (33, 2), (1000, 3)])
def test_closest_hit_matches_brute_force(ntri, seed):
    sc = random_triangles(ntri, seed=seed).flatten()
    pos = np.asarray(sc.positions if hasattr(sc, "positions")
                     else sc.geometry.positions)
    idx = np.asarray(sc.geometry.indices)
    bvh = build_bvh(pos, idx)
    assert bvh.num_nodes == 2 * ntri - 1

    rng = np.random.default_rng(seed + 100)
    n = 256
    targets = pos[idx[rng.integers(0, ntri, n), 0]] + rng.normal(0, 0.2, (n, 3))
    o = rng.uniform(-25, 25, (n, 3)).astype(np.float32)
    d = (targets - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    bp, bt = _brute_force(pos, idx, o, d)
    hit = intersect_closest(bvh, jnp.asarray(o), jnp.asarray(d),
                            jnp.full((n,), 1e-3), jnp.full((n,), 1e9))
    hp = np.asarray(hit.prim)
    ht = np.asarray(hit.t)
    assert (hp == bp).all()
    mask = bp >= 0
    if mask.any():
        np.testing.assert_allclose(ht[mask], bt[mask], rtol=1e-4, atol=1e-4)


def test_any_hit_agrees_with_closest():
    sc = random_triangles(500, seed=7).flatten()
    pos = np.asarray(sc.geometry.positions)
    idx = np.asarray(sc.geometry.indices)
    bvh = build_bvh(pos, idx)
    rng = np.random.default_rng(8)
    n = 512
    o = rng.uniform(-15, 15, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmin = jnp.full((n,), 1e-3)
    tmax = jnp.full((n,), 1e9)
    closest = intersect_closest(bvh, jnp.asarray(o), jnp.asarray(d), tmin, tmax)
    occ = intersect_any(bvh, jnp.asarray(o), jnp.asarray(d), tmin, tmax)
    np.testing.assert_array_equal(np.asarray(occ), ~np.asarray(closest.miss))


def test_tmax_respected():
    sc = random_triangles(200, seed=9).flatten()
    pos = np.asarray(sc.geometry.positions)
    idx = np.asarray(sc.geometry.indices)
    bvh = build_bvh(pos, idx)
    rng = np.random.default_rng(10)
    n = 256
    targets = pos[idx[rng.integers(0, 200, n), 0]]
    o = rng.uniform(-15, 15, (n, 3)).astype(np.float32)
    d = (targets - o).astype(np.float32)
    dist = np.linalg.norm(d, axis=-1, keepdims=True)
    d /= dist
    # tmax shorter than the distance to the aimed-at triangle region
    short = jnp.asarray(dist[:, 0] * 0.01)
    hit = intersect_closest(bvh, jnp.asarray(o), jnp.asarray(d),
                            jnp.full((n,), 1e-3), short)
    ht = np.asarray(hit.t)
    hp = np.asarray(hit.prim)
    assert ((hp < 0) | (ht <= np.asarray(short) + 1e-5)).all()


def test_degenerate_identical_centroids():
    """All triangles share a centroid cell -> Morton ties broken by index."""
    n = 64
    base = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    pos = np.concatenate([base + i * 1e-7 for i in range(n)])
    idx = np.arange(3 * n, dtype=np.int32).reshape(-1, 3)
    bvh = build_bvh(pos, idx)
    assert bvh.num_nodes == 2 * n - 1
    o = jnp.asarray([[0.2, 0.2, 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    hit = intersect_closest(bvh, o, d, jnp.asarray([1e-3]), jnp.asarray([1e9]))
    assert int(hit.prim[0]) >= 0


def test_brute_ray_chunking(monkeypatch):
    """Force the brute intersector's multi-chunk path (big NxT footprint)
    and compare against the single-chunk result."""
    from rtxpt_tpu.accel import brute as brute_mod

    sc = random_triangles(300, seed=21).flatten()
    pos = np.asarray(sc.geometry.positions)
    idx = np.asarray(sc.geometry.indices)
    tris = brute_mod.build_brute(pos, idx)
    rng = np.random.default_rng(22)
    n = 1000
    targets = pos[idx[rng.integers(0, 300, n), 0]]
    o = jnp.asarray(rng.uniform(-15, 15, (n, 3)), jnp.float32)
    d = jnp.asarray(targets, jnp.float32) - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 1e9)

    ref = brute_mod.intersect_closest_brute(tris, o, d, tmin, tmax)
    monkeypatch.setattr(brute_mod, "_MAX_PAIRS", 300 * 128)  # 128 rays/chunk
    chunked = brute_mod.intersect_closest_brute(tris, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(ref.prim),
                                  np.asarray(chunked.prim))
    np.testing.assert_allclose(np.asarray(ref.t), np.asarray(chunked.t),
                               rtol=1e-5)


def test_traversal_path_large_scene():
    """>BRUTE_MAX_TRIS forces the skip-link BVH traversal path; verify it
    against numpy brute force (the suite's small scenes all dispatch to
    the MXU brute intersector otherwise)."""
    from rtxpt_tpu.accel.brute import BRUTE_MAX_TRIS

    ntri = BRUTE_MAX_TRIS + 1000
    sc = random_triangles(ntri, seed=31, extent=20.0).flatten()
    pos = np.asarray(sc.geometry.positions)
    idx = np.asarray(sc.geometry.indices)
    bvh = build_bvh(pos, idx)
    assert bvh.brute is None  # traversal path active

    rng = np.random.default_rng(32)
    n = 128
    # jitter off the exact vertices: an exact-vertex aim sits on the
    # u=v=0 boundary where f32 vs f64 rounding legitimately disagree
    targets = pos[idx[rng.integers(0, ntri, n), 0]] \
        + rng.normal(0, 0.1, (n, 3))
    o = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    d = (targets - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    bp, bt = _brute_force(pos, idx, o, d)
    hit = intersect_closest(bvh, jnp.asarray(o), jnp.asarray(d),
                            jnp.full((n,), 1e-3), jnp.full((n,), 1e9))
    assert (np.asarray(hit.prim) == bp).all()
    mask = bp >= 0
    assert mask.mean() > 0.3
    np.testing.assert_allclose(np.asarray(hit.t)[mask], bt[mask],
                               rtol=1e-4, atol=1e-4)
