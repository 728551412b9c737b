"""Real-time rendering mode: 1 spp path trace -> denoise -> TAA.

TPU realization of the reference's real-time pipeline (SURVEY.md §3.3:
BUILD_STABLE_PLANES -> FILL -> RTXDI -> NRD denoise -> TAA; Sample.cpp:
2438-2639). Round-1 scope: a single stable plane (the primary surface)
with demodulated-albedo spatiotemporal denoising (render/denoise.py) and
camera-motion TAA; the 3-plane path-space decomposition (delta chains into
separate denoise layers) extends this module — see pt/stable_planes.py.

Per frame:
  1. trace 1 spp with guide buffers (albedo, normal, depth, world pos)
  2. motion vectors from previous camera (camera-only round 1;
     per-instance motion once animation lands)
  3. denoise illumination (temporal accum + a-trous), remodulate albedo,
     re-add primary emission
  4. TAA resolve, bloom, tonemap
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rtxpt_tpu.config import PathTracerConfig, RenderConfig
from rtxpt_tpu.pt.integrator import render_sample_jit
from rtxpt_tpu.render import denoise as dn
from rtxpt_tpu.render.postprocess import tonemap
from rtxpt_tpu.render.taa import bloom, taa_resolve
from rtxpt_tpu.scene.camera import Camera, project
from rtxpt_tpu.scene.scene import SceneData


class RealtimeState(NamedTuple):
    denoiser: dn.DenoiserState
    taa_history: Optional[jnp.ndarray]
    prev_camera: Optional[Camera]
    frame_index: int


def init_state(height: int, width: int) -> RealtimeState:
    return RealtimeState(denoiser=dn.init_state(height, width),
                         taa_history=None, prev_camera=None, frame_index=0)


def motion_vectors(prev_cam: Optional[Camera], wpos, depth, width, height):
    """Pixel-space motion (prev = cur + motion) from the previous camera.
    Static geometry assumption (camera motion only)."""
    if prev_cam is None:
        return jnp.zeros((*depth.shape, 2), jnp.float32)
    px_prev, py_prev, behind = project(prev_cam, wpos)
    h, w = depth.shape
    cur_x = jnp.arange(w, dtype=jnp.float32)[None, :]
    cur_y = jnp.arange(h, dtype=jnp.float32)[:, None]
    mx = px_prev - cur_x
    my = py_prev - cur_y
    valid = (depth > 0.0) & ~behind
    return jnp.where(valid[..., None],
                     jnp.stack([mx, my], -1), 0.0)


def render_frame(scene: SceneData, cam: Camera, pt_cfg: PathTracerConfig,
                 rc: RenderConfig, state: RealtimeState):
    """One real-time frame. Returns (display_image, hdr, new_state)."""
    out = render_sample_jit(scene, cam, pt_cfg, rc.width, rc.height,
                            jnp.uint32(state.frame_index), True)
    radiance = out["L"]
    albedo = out["albedo"]
    normal = out["normal"]
    depth = out["depth"]
    wpos = out["wpos"]
    emission = out["emission"]

    motion = motion_vectors(state.prev_camera, wpos, depth,
                            rc.width, rc.height)

    if rc.denoiser.value:
        # denoise indirect+direct illumination; primary emission re-added
        denoised, dstate = dn.denoise(radiance - emission, albedo, normal,
                                      depth, motion, state.denoiser)
        hdr = denoised + emission
    else:
        hdr, dstate = radiance, state.denoiser

    if rc.enable_taa:
        hdr, taa_hist = taa_resolve(hdr, motion, state.taa_history)
    else:
        taa_hist = state.taa_history

    if rc.enable_bloom:
        hdr = bloom(hdr)

    img = tonemap(hdr, rc.exposure, rc.tonemap)
    new_state = RealtimeState(denoiser=dstate, taa_history=taa_hist,
                              prev_camera=cam,
                              frame_index=state.frame_index + 1)
    return img, hdr, new_state
