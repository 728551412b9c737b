"""Fused-tier ablation profiler (VERDICT r4 next #2): time the Cornell
1080p headline under config ablations that isolate the VPU cost centers
identified in docs/PERF_NOTES.md round-4b — RNG (low_discrepancy flag),
NEE + shadow pass (nee flag), MIS, RR. Each variant is its own jit cache
entry; run with the persistent compile cache enabled so re-runs are fast.

Usage: python scripts/profile_fused.py [variant ...]
Variants: base ld_off nee_off mis_off rr_off all_off
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
from rtxpt_tpu.scene.procedural import cornell_box, default_camera

CACHE_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/root/repo/.jax_cache")

VARIANTS = {
    "base": {},
    "ld_off": dict(low_discrepancy=False),
    "nee_off": dict(nee=NEEMode.OFF),
    "mis_off": dict(enable_mis=False),
    "rr_off": dict(enable_russian_roulette=False),
    "all_off": dict(low_discrepancy=False, nee=NEEMode.OFF,
                    enable_mis=False, enable_russian_roulette=False),
    "b1": dict(max_bounces=1),
    "b2": dict(max_bounces=2),
}


def main():
    os.makedirs(CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    names = sys.argv[1:] or ["base", "ld_off", "nee_off", "all_off"]
    width, height = 1920, 1080
    host = cornell_box()
    scene = prepare(host)
    cam = default_camera(host, width, height)
    for name in names:
        over = VARIANTS[name]
        cfg = PathTracerConfig(max_bounces=over.pop("max_bounces", 4),
                               nee=over.pop("nee", NEEMode.POWER),
                               ray_chunk=1 << 18, **over)
        t0 = time.perf_counter()
        out = render_sample_jit(scene, cam, cfg, width, height,
                                jnp.uint32(0))
        jax.block_until_ready(out["L"])
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_rep = 3
        rays = 0
        acc = None
        for s in range(1, 1 + n_rep):
            out = render_sample_jit(scene, cam, cfg, width, height,
                                    jnp.uint32(s))
            acc = out["L"] if acc is None else acc + out["L"]
            rays += int(out["ray_count"])
        jax.block_until_ready(acc)
        dt = (time.perf_counter() - t0) / n_rep
        print(f"{name:10s} {dt * 1e3:8.2f} ms/frame "
              f"{rays / n_rep / dt / 1e6:7.2f} Mrays/s "
              f"(first call {t_compile:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
