"""TPU perf check for the clustered large-scene path.

Usage: python scripts/bench_cluster.py [tri_budget] [width] [height] [spp]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 350_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1080
    spp = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    from rtxpt_tpu.config import NEEMode, PathTracerConfig
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt import bounce_clustered as bc
    from rtxpt_tpu.pt.integrator import render_sample_jit
    from rtxpt_tpu.scene.procedural import city_scene, default_camera

    print("backend:", jax.default_backend())
    t0 = time.perf_counter()
    host = city_scene(tri_budget=budget)
    sd = prepare(host)
    print(f"prepare: {time.perf_counter()-t0:.1f}s  "
          f"tris={len(np.asarray(sd.geometry.indices))} "
          f"clusters={sd.cluster_tables.n_clusters if sd.cluster_tables else 0}")
    assert sd.cluster_tables is not None
    cam = default_camera(host, w, h)
    cfg = PathTracerConfig(max_bounces=4, nee=NEEMode.POWER,
                           ray_chunk=1 << 30)
    assert bc.eligible(sd, cfg, None)

    t0 = time.perf_counter()
    out = render_sample_jit(sd, cam, cfg, w, h, jnp.uint32(0))
    out["L"].block_until_ready()
    print(f"compile+first: {time.perf_counter()-t0:.1f}s")
    print("overflow:", int(out.get("cull_overflow", 0)),
          "rays:", int(out["ray_count"]),
          "occupancy:", np.asarray(out["occupancy"]).tolist())

    t0 = time.perf_counter()
    reps = max(spp, 2)
    rays = 0
    for s in range(1, reps + 1):
        out = render_sample_jit(sd, cam, cfg, w, h, jnp.uint32(s))
        rays += int(out["ray_count"])
    out["L"].block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"{dt*1e3:.1f} ms/frame/spp  "
          f"{rays/reps/dt/1e6:.2f} Mrays/s  mean={float(out['L'].mean()):.4f}")


if __name__ == "__main__":
    main()
