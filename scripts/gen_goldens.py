"""Generate the out-of-band goldens (Support/tests/generate_golden.ps1
analog): the converged kitchen reference the parity tests compare
against. Run on CPU so CI comparisons are platform-identical:

    JAX_PLATFORMS=cpu python scripts/gen_goldens.py [spp]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

# goldens are platform-pinned to CPU; the env's sitecustomize pins the
# axon TPU backend, so force it here (env vars alone don't stick)
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from rtxpt_tpu.config import PathTracerConfig
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt.integrator import render
    from rtxpt_tpu.scene.procedural import default_camera, kitchen_scene

    host = kitchen_scene()
    scene = prepare(host)
    cam = default_camera(host, 256, 256)
    t0 = time.time()
    img, _, rays = render(scene, cam, PathTracerConfig(max_bounces=5),
                          256, 256, spp=spp)
    img = np.asarray(img)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens",
        f"kitchen.reference.{spp}spp.npy")
    np.save(out, img.astype(np.float32))
    print(f"{out}: {img.shape} mean {img.mean():.4f} "
          f"({time.time()-t0:.0f}s, {int(rays)} rays)")


if __name__ == "__main__":
    main()
