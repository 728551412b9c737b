"""TPU timing for the device-side BVH refit (VERDICT r1 #5 gate:
per-frame scene update < 5 ms @ 200k tris)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 70_000   # tris = ~3n/..
    from rtxpt_tpu.accel.lbvh import build_bvh
    from rtxpt_tpu.accel.refit import build_refit_tables, refit_bvh

    rng = np.random.default_rng(0)
    c = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    e = rng.normal(0, 0.3, (n, 2, 3)).astype(np.float32)
    pos = np.stack([c, c + e[:, 0], c + e[:, 1]], 1).reshape(-1, 3)
    idx = np.arange(3 * n, dtype=np.int32).reshape(-1, 3)

    print("backend:", jax.default_backend(), "tris:", n)
    t0 = time.perf_counter()
    bvh = build_bvh(pos, idx)
    print(f"full build: {(time.perf_counter()-t0)*1e3:.1f} ms "
          f"(levels via tables below)")
    t0 = time.perf_counter()
    tab = build_refit_tables(bvh)
    print(f"refit tables: {(time.perf_counter()-t0)*1e3:.1f} ms, "
          f"levels={tab.levels}")

    posj = jnp.asarray(pos)
    idxj = jnp.asarray(idx)
    refit_j = jax.jit(lambda p: refit_bvh(bvh, tab, p, idxj))
    out = refit_j(posj + 0.01)
    jax.block_until_ready(out.node_min)
    t0 = time.perf_counter()
    reps = 20
    for k in range(reps):
        out = refit_j(posj + 0.001 * k)
    jax.block_until_ready(out.node_min)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"device refit: {dt:.2f} ms/frame @ {n} tris")


if __name__ == "__main__":
    main()
