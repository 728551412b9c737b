"""rtxpt_tpu — a TPU-native real-time path tracing framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of NVIDIA's
RTX Path Tracing sample (RTXPT, surveyed in /root/repo/SURVEY.md): reference
(progressive accumulation) and real-time (stable-plane + denoise) modes over
glTF 2.0 scenes, Falcor-class StandardBSDF materials, Owen-scrambled Sobol'
sampling, NEE with adaptive light importance sampling, ReSTIR DI/GI and
ReLAX-class denoising — designed TPU-first:

  * wavefront (ray-stream) integration instead of a megakernel raygen loop
  * threaded (skip-link) LBVH traversal — branchless, gather-only, no
    per-ray stacks — instead of DXR TLAS/BLAS + RayQuery
  * sort-by-material wavefront reordering instead of hardware SER
  * pixel-tile / sample sharding over a TPU mesh via jax collectives (ICI)
"""

__version__ = "0.1.0"

from rtxpt_tpu import config as config


def __getattr__(name):
    """Lazy public API surface (avoids importing jax at package import)."""
    import importlib

    api = {
        "prepare": ("rtxpt_tpu.prepare", "prepare"),
        "render": ("rtxpt_tpu.pt.integrator", "render"),
        "render_sample": ("rtxpt_tpu.pt.integrator", "render_sample"),
        "render_adaptive": ("rtxpt_tpu.pt.integrator", "render_adaptive"),
        "load_gltf": ("rtxpt_tpu.scene.gltf", "load_gltf"),
        "look_at": ("rtxpt_tpu.scene.camera", "look_at"),
        "tonemap": ("rtxpt_tpu.render.postprocess", "tonemap"),
        "denoise": ("rtxpt_tpu.render.denoise", "denoise"),
        "make_sky": ("rtxpt_tpu.lighting.sky", "make_sky"),
    }
    if name in api:
        mod, attr = api[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
