"""Benchmark: Mrays/s of the wavefront path tracer on real hardware.

Protocol mirrors the reference's in-app measurement (avg over frames with
warmup excluded, Sample.cpp:1430-1440) on the BASELINE.json ladder scene
class: Cornell-style interior at 1080p, reference mode.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 200 (the BASELINE.md >=200 Mrays/s v5e-8 target,
scaled by nothing — single-chip numbers count against the same bar).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: the clustered city kernels take many minutes
# of XLA/Mosaic compile on first build — cache them so repeat bench runs
# (and the driver's end-of-round run) skip straight to execution.
try:
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/root/repo/.jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass


def main():
    from rtxpt_tpu.config import PathTracerConfig, NEEMode
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt.integrator import render_sample_jit
    from rtxpt_tpu.scene.procedural import cornell_box, default_camera

    width, height = 1920, 1080
    spp_timed = 4

    host = cornell_box()
    scene = prepare(host)
    cam = default_camera(host, width, height)
    cfg = PathTracerConfig(max_bounces=4, nee=NEEMode.POWER,
                           ray_chunk=1 << 18)

    # Warmup (compile) — excluded from timing; also warms the
    # accumulation add (its first dispatch would otherwise compile
    # inside the timed loop and cost ~30% of the measurement).
    out = render_sample_jit(scene, cam, cfg, width, height, jnp.uint32(0))
    jax.block_until_ready(out["L"] + out["L"])

    t0 = time.perf_counter()
    total_rays = 0
    acc = None
    for s in range(1, 1 + spp_timed):
        out = render_sample_jit(scene, cam, cfg, width, height,
                                jnp.uint32(s))
        acc = out["L"] if acc is None else acc + out["L"]
        total_rays += int(out["ray_count"])
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0

    mrays = total_rays / dt / 1e6
    ms_per_frame = dt / spp_timed * 1e3

    # Second bench scene ABOVE the VMEM-resident cap: the 340k-tri city
    # exercises the clustered streamed path (accel/cluster.py +
    # pt/bounce_clustered.py) — the path any Bistro-class scene takes.
    city = None
    try:
        from rtxpt_tpu.scene.procedural import city_scene
        chost = city_scene(tri_budget=350_000, seed=0)
        cscene = prepare(chost)
        ccam = default_camera(chost, width, height)
        ccfg = PathTracerConfig(max_bounces=4, nee=NEEMode.POWER,
                                ray_chunk=1 << 30)
        out = render_sample_jit(cscene, ccam, ccfg, width, height,
                                jnp.uint32(0))
        jax.block_until_ready(out["L"] + out["L"])
        t0 = time.perf_counter()
        crays = 0
        cacc = None
        for s in range(1, 3):
            out = render_sample_jit(cscene, ccam, ccfg, width, height,
                                    jnp.uint32(s))
            cacc = out["L"] if cacc is None else cacc + out["L"]
            crays += int(out["ray_count"])
        jax.block_until_ready(cacc)
        cdt = time.perf_counter() - t0
        city = {
            "scene": "city_340k_tris",
            "mrays_per_s": round(crays / cdt / 1e6, 3),
            "ms_per_frame_1spp": round(cdt / 2 * 1e3, 2),
            "clustered_path": cscene.cluster_tables is not None,
        }
    except Exception as e:                      # report, never hard-fail
        city = {"error": str(e)[:200]}

    result = {
        "metric": "pathtrace_throughput",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 200.0, 4),
        "detail": {
            "scene": "cornell_box", "res": f"{width}x{height}",
            "spp_timed": spp_timed, "bounces": cfg.max_bounces,
            "rays": total_rays, "ms_per_frame_1spp": round(ms_per_frame, 2),
            "device": str(jax.devices()[0]),
            "city": city,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
