"""ReGIR grid light sampling tests."""

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.lighting import regir
from rtxpt_tpu.pt import restir
from rtxpt_tpu.scene.procedural import default_camera
from rtxpt_tpu.utils import math as m, rng
from rtxpt_tpu.pt import bsdf as B
from rtxpt_tpu.pt.surface import ray_offset
from rtxpt_tpu.accel.traverse import intersect_any

W = H = 24


def _direct_via(sampler_fn, scene, gb, n_samples):
    n = gb.pos.shape[0]
    bsdf = restir._surface_bsdf(gb)
    wo_l = m.to_local(gb.view, gb.normal)
    px = jnp.arange(n, dtype=jnp.uint32)
    acc = jnp.zeros((n, 3))
    for s in range(n_samples):
        seed = rng.hash_combine(px, jnp.uint32(991 + s))
        ls = sampler_fn(seed)
        wi_l = m.to_local(ls["wi"], gb.normal)
        f = B.bsdf_eval(bsdf, wo_l, wi_l)
        o = ray_offset(gb.pos, gb.geo_normal, ls["wi"])
        do = gb.valid & ls["valid"]
        occ = intersect_any(scene.bvh, o, ls["wi"],
                            jnp.zeros((n,), jnp.float32),
                            jnp.where(do, ls["dist"] * (1 - 1e-4), 0.0))
        c = f * ls["Li"] / jnp.maximum(ls["pdf"], 1e-12)[..., None]
        acc = acc + jnp.where((do & ~occ)[..., None], c, 0.0)
    return np.asarray(acc) / n_samples


def test_regir_unbiased_vs_power(cornell_scene):
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    gb, _ = restir.gbuffer_from_primary(scene, cam, W, H)

    pos = np.asarray(scene.geometry.positions)
    grid = regir.build_grid(scene.lights, pos.min(0), pos.max(0),
                            dims=(4, 4, 4), k_slots=4, n_candidates=16)

    from rtxpt_tpu.lighting.lights_baker import sample_light

    def power_sampler(seed):
        return sample_light(scene.lights, scene.envmap, gb.pos,
                            rng.uniform_sample(seed, 0),
                            rng.uniform_sample(seed, 1),
                            rng.uniform_sample(seed, 2))

    def regir_sampler(seed):
        return regir.sample_from_grid(grid, scene.lights, scene.envmap,
                                      gb.pos,
                                      rng.uniform_sample(seed, 0),
                                      rng.uniform_sample(seed, 1),
                                      rng.uniform_sample(seed, 2))

    a = _direct_via(power_sampler, scene, gb, 48)
    b = _direct_via(regir_sampler, scene, gb, 48)
    sel = np.asarray(gb.valid) & (a.sum(-1) > 1e-4)
    rel = abs(a[sel].mean() - b[sel].mean()) / a[sel].mean()
    assert rel < 0.1, f"power {a[sel].mean()} vs regir {b[sel].mean()}"


def test_grid_cells_cover_scene(cornell_scene):
    host, scene = cornell_scene
    pos = np.asarray(scene.geometry.positions)
    grid = regir.build_grid(scene.lights, pos.min(0), pos.max(0))
    cells = regir.cell_of(grid, jnp.asarray(pos[:32]))
    assert (np.asarray(cells) >= 0).all()
    nx, ny, nz = grid.dims
    assert (np.asarray(cells) < nx * ny * nz).all()
    # slots reference real lights
    slots = np.asarray(grid.slots)
    assert (slots < int(scene.lights.count)).all()
