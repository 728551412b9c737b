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
