"""Where does the city stage's compile time go? (round 5: the driver
bench lost the city number in r4 and r5-early because the COLD compile
of the clustered 4-bounce program exceeds the 900s stage budget, and the
persistent compile cache cannot serialize executables on this backend.)

Times first-call (compile+run) and second-call (run) for configs that
isolate the compile-cost axes: bounce count (the chain is Python-
unrolled), wavefront sorting (two 25-operand lax.sort networks per
bounce), NEE (kernel B + its sort).

Usage: python scripts/profile_city_compile.py [variant ...]
Variants: b1 b2 b4 b4_nosort b4_nonee b2_nosort
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rtxpt_tpu.config import PathTracerConfig, NEEMode
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.pt.integrator import render_sample_jit
from rtxpt_tpu.scene.procedural import city_scene, default_camera

VARIANTS = {
    "b1": dict(max_bounces=1),
    "b1_nosort": dict(max_bounces=1, sort_rays=False),
    "b1_nonee": dict(max_bounces=1, nee=NEEMode.OFF),
    "b2": dict(max_bounces=2),
    "b4": dict(max_bounces=4),
    "b2_nosort": dict(max_bounces=2, sort_rays=False),
    "b4_nosort": dict(max_bounces=4, sort_rays=False),
    "b4_nonee": dict(max_bounces=4, nee=NEEMode.OFF),
}


def main():
    names = sys.argv[1:] or ["b1", "b2"]
    width, height = 1920, 1080
    host = city_scene(tri_budget=350_000, seed=0)
    scene = prepare(host)
    cam = default_camera(host, width, height)
    for name in names:
        over = dict(VARIANTS[name])
        cfg = PathTracerConfig(nee=over.pop("nee", NEEMode.POWER),
                               ray_chunk=1 << 30, **over)
        t0 = time.perf_counter()
        out = render_sample_jit(scene, cam, cfg, width, height,
                                jnp.uint32(0))
        jax.block_until_ready(out["L"])
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = render_sample_jit(scene, cam, cfg, width, height,
                                jnp.uint32(1))
        jax.block_until_ready(out["L"])
        t_run = time.perf_counter() - t0
        print(f"{name:10s} first {t_first:7.1f}s  run {t_run * 1e3:8.1f}ms"
              f"  (compile ~{t_first - t_run:7.1f}s)", flush=True)


if __name__ == "__main__":
    main()
