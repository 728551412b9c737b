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

import dataclasses

from rtxpt_tpu.config import DenoiserMode, PathTracerConfig, RenderConfig
from rtxpt_tpu.pt.integrator import render_sample_jit
from rtxpt_tpu.render import denoise as dn
from rtxpt_tpu.render.postprocess import tonemap
from rtxpt_tpu.render.taa import bloom, taa_resolve
from rtxpt_tpu.scene.camera import Camera, project
from rtxpt_tpu.scene.scene import SceneData


class RealtimeState(NamedTuple):
    denoiser: dn.DenoiserState
    denoiser_p1: Optional[dn.DenoiserState]   # stable-plane 1 instance
    taa_history: Optional[jnp.ndarray]
    prev_camera: Optional[Camera]
    frame_index: int
    neeat: Optional[object] = None            # lighting.neeat.NEEATState
    denoiser_p2: Optional[dn.DenoiserState] = None  # stable-plane 2
    denoiser_spec: Optional[dn.DenoiserState] = None  # split spec channel
    restir_di: Optional[object] = None        # pt.restir.ReSTIRState
    restir_gi: Optional[object] = None        # pt.restir_gi.GIState
    regir: Optional[object] = None            # lighting.regir.ReGIRGrid
    motion: Optional[jnp.ndarray] = None      # display-res motion of the
    #                                           last frame (framegen input)


def init_state(height: int, width: int,
               scene: Optional[SceneData] = None,
               pt_cfg: Optional[PathTracerConfig] = None) -> RealtimeState:
    neeat = None
    if (scene is not None and pt_cfg is not None
            and pt_cfg.nee.name == "NEEAT" and scene.lights is not None):
        from rtxpt_tpu.lighting import neeat as na
        neeat = na.init_state(width, height, int(scene.lights.count),
                              lights_power=scene.lights.power)
    return RealtimeState(denoiser=dn.init_state(height, width),
                         denoiser_p1=dn.init_state(height, width),
                         denoiser_p2=dn.init_state(height, width),
                         denoiser_spec=dn.init_state(height, width),
                         taa_history=None, prev_camera=None, frame_index=0,
                         neeat=neeat)


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


def _upscale_bilinear(img, height: int, width: int):
    """Bilinear resize [h,w,C] -> [height,width,C] (upscaler base; the
    temporal part comes from TAA at display resolution)."""
    h, w = img.shape[:2]
    yy = (jnp.arange(height, dtype=jnp.float32) + 0.5) * h / height - 0.5
    xx = (jnp.arange(width, dtype=jnp.float32) + 0.5) * w / width - 0.5
    from rtxpt_tpu.render.denoise import _bilinear_sample
    yg = jnp.tile(yy[:, None], (1, width))
    xg = jnp.tile(xx[None, :], (height, 1))
    if img.ndim == 2:
        return _bilinear_sample(img[..., None], yg, xg)[..., 0]
    return _bilinear_sample(img, yg, xg)


def _halton(i, base):
    f, r = 1.0, 0.0
    while i > 0:
        f /= base
        r += f * (i % base)
        i //= base
    return r


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("pt_cfg", "width", "height", "mode"))
def _restir_frame_impl(scene, envmap, cam, prev_cam, pt_cfg, width, height,
                       frame_index, jitter, di_state, gi_state, regir_grid,
                       mode):
    """One resampled-lighting frame: primary G-buffer -> ReSTIR DI
    (replacing NEE for the primary surface) -> optional ReSTIR GI
    one-bounce indirect -> guide buffers for the denoiser. The TPU
    analog of RtxdiPass::Execute inside PathTrace (reference:
    Sample.cpp:2526-2539, RTXDI/RtxdiPass.cpp:354,519,544)."""
    from rtxpt_tpu.pt.restir import gbuffer_from_primary, restir_di
    from rtxpt_tpu.pt.restir_gi import restir_gi

    gb, emissive = gbuffer_from_primary(scene, cam, width, height,
                                        jitter=(jitter[0], jitter[1]))
    depth_img = gb.depth.reshape(height, width)
    wpos_img = gb.pos.reshape(height, width, 3)
    motion = motion_vectors(prev_cam, wpos_img, depth_img, width, height)
    motion_flat = motion.reshape(-1, 2)

    direct, di_state = restir_di(
        gb, scene.lights, envmap, scene.bvh, width, height, frame_index,
        di_state, motion_flat=motion_flat, regir_grid=regir_grid)
    L = direct + emissive
    if mode == "digi":
        indirect, gi_state = restir_gi(
            scene, gb, pt_cfg, width, height, frame_index, gi_state,
            motion_flat=motion_flat)
        L = L + indirect
    else:
        gi_state = None

    albedo = gb.diffuse + gb.specular_f0
    out = dict(
        L=L.reshape(height, width, 3),
        albedo=albedo.reshape(height, width, 3),
        normal=gb.normal.reshape(height, width, 3),
        depth=depth_img,
        wpos=wpos_img,
        emission=emissive.reshape(height, width, 3),
    )
    return out, motion, di_state, gi_state


def render_frame(scene: SceneData, cam: Camera, pt_cfg: PathTracerConfig,
                 rc: RenderConfig, state: RealtimeState):
    """One real-time frame. Returns (display_image, hdr, new_state).

    With rc.render_scale < 1 the wavefront runs at the reduced render
    resolution and the frame is upscaled to display resolution before TAA
    (temporal upscaling — the DLSS-SR substitute)."""
    rw = max(int(rc.width * rc.render_scale), 8)
    rh = max(int(rc.height * rc.render_scale), 8)
    use_restir = rc.restir != "none"
    split = (rc.split_denoise and rc.denoiser != DenoiserMode.NONE
             and not use_restir)
    if split and not pt_cfg.split_channels:
        pt_cfg = dataclasses.replace(pt_cfg, split_channels=True)
    render_cam = cam
    if (rw, rh) != (rc.width, rc.height):
        render_cam = cam.replace(width=jnp.float32(rw),
                                 height=jnp.float32(rh))
    new_regir = state.regir
    if use_restir:
        envmap = scene.envmap
        if envmap is None:
            from rtxpt_tpu.lighting.envmap import bake_envmap
            envmap = bake_envmap(None)
        if rc.restir_regir and new_regir is None and scene.lights is not None:
            import numpy as _np
            from rtxpt_tpu.lighting.regir import build_grid
            pos = _np.asarray(scene.geometry.positions)
            new_regir = build_grid(scene.lights, pos.min(0), pos.max(0))
        jit2 = _halton(state.frame_index % 64 + 1, 2) - 0.5
        jit3 = _halton(state.frame_index % 64 + 1, 3) - 0.5
        out, motion, di_state, gi_state = _restir_frame_impl(
            scene, envmap, render_cam, state.prev_camera, pt_cfg, rw, rh,
            jnp.uint32(state.frame_index),
            jnp.asarray([0.5 + jit2, 0.5 + jit3], jnp.float32),
            state.restir_di, state.restir_gi, new_regir, rc.restir)
    else:
        di_state, gi_state = state.restir_di, state.restir_gi
        out = render_sample_jit(scene, render_cam, pt_cfg, rw, rh,
                                jnp.uint32(state.frame_index), True,
                                state.neeat)
    radiance = out["L"]
    albedo = out["albedo"]
    normal = out["normal"]
    depth = out["depth"]
    wpos = out["wpos"]
    emission = out["emission"]

    if not use_restir:
        motion = motion_vectors(state.prev_camera, wpos, depth,
                                rc.width, rc.height)

    new_neeat = state.neeat
    if state.neeat is not None and "neeat_hist" in out:
        from rtxpt_tpu.lighting import neeat as na
        # feedback history follows the surfaces it was learned on
        # (ProcessFeedbackHistory reprojection, LightsBaker.cpp:1331-1408)
        new_neeat = na.update(state.neeat, out["neeat_hist"],
                              motion=motion)

    den_fn = (dn.denoise_reblur if rc.denoiser == DenoiserMode.REBLUR
              else dn.denoise)
    dstate_spec = state.denoiser_spec
    if rc.denoiser.value and split:
        # per-channel denoise (split NRD instances, Sample.cpp:2570-2573)
        den_d, dstate = den_fn(out["L_diff"], out["albedo_diff"], normal,
                               depth, motion, state.denoiser)
        den_s, dstate_spec = den_fn(out["L_spec"], out["albedo_spec"],
                                    normal, depth, motion,
                                    state.denoiser_spec)
        hdr = den_d + den_s + emission
    elif rc.denoiser.value:
        # denoise indirect+direct illumination; primary emission re-added
        denoised, dstate = den_fn(radiance - emission, albedo, normal,
                                  depth, motion, state.denoiser)
        hdr = denoised + emission
    else:
        hdr, dstate = radiance, state.denoiser

    if (rw, rh) != (rc.width, rc.height):
        scale_y = rc.height / rh
        scale_x = rc.width / rw
        hdr = _upscale_bilinear(hdr, rc.height, rc.width)
        motion = _upscale_bilinear(motion, rc.height, rc.width) \
            * jnp.asarray([scale_x, scale_y])

    if rc.enable_taa:
        hdr, taa_hist = taa_resolve(hdr, motion, state.taa_history)
    else:
        taa_hist = state.taa_history

    if rc.enable_bloom:
        hdr = bloom(hdr)

    img = tonemap(hdr, rc.exposure, rc.tonemap)
    # Store the RENDER-resolution camera: wpos/depth (and therefore next
    # frame's motion vectors) live in render space; projecting with the
    # display-res camera would mix display-space pixel coords with
    # render-space indices (~8 px of phantom motion at 0.5x scale).
    new_state = RealtimeState(denoiser=dstate,
                              denoiser_p1=state.denoiser_p1,
                              denoiser_p2=state.denoiser_p2,
                              denoiser_spec=dstate_spec,
                              taa_history=taa_hist, prev_camera=render_cam,
                              frame_index=state.frame_index + 1,
                              neeat=new_neeat,
                              restir_di=di_state, restir_gi=gi_state,
                              regir=new_regir, motion=motion)
    return img, hdr, new_state


def render_frame_stable_planes(scene: SceneData, cam: Camera,
                               pt_cfg: PathTracerConfig, rc: RenderConfig,
                               state: RealtimeState):
    """Real-time frame with path-space decomposition: delta chains are
    resolved deterministically (pt/stable_planes.py BUILD), each plane's
    noisy fill is denoised by its own denoiser instance, and the planes
    composite by throughput (the reference's BUILD/FILL + per-plane NRD,
    Sample.cpp:2561-2618)."""
    import jax.numpy as jnp
    from rtxpt_tpu.pt.integrator import _pixel_grid, trace_paths
    from rtxpt_tpu.pt.stable_planes import decompose
    from rtxpt_tpu.scene.camera import camera_ray
    from rtxpt_tpu.utils import rng
    from rtxpt_tpu.pt.integrator import EFFECT_LENS, _lds

    w, h = rc.width, rc.height
    px, py = _pixel_grid(w, h)
    n = px.shape[0]
    sidx = jnp.uint32(state.frame_index)
    seed_lens = rng.pixel_seed(px, py, 0, EFFECT_LENS)
    u1, u2 = _lds(pt_cfg, sidx, seed_lens, (0, 1))
    o, d, spread = camera_ray(cam, px, py, u1, u2)

    planes, background = decompose(scene, o, d)

    # ReSTIR DI on the dominant stable plane's base surface: resampled
    # direct light replaces the fill's first-vertex NEE, and the fill
    # (first_direct=False) supplies GI — composited in ONE final shade
    # before the plane's denoiser (the reference's fused DI+GI final
    # shade over the stable-plane G-buffer, RtxdiPass.cpp:544-550).
    use_restir = rc.restir != "none" and scene.lights is not None
    di_state = state.restir_di
    restir_direct = None
    if use_restir:
        from rtxpt_tpu.pt.restir import gbuffer_from_hit, restir_di
        hit0 = planes[0].vbuffer(pt_cfg.max_ray_travel)
        gb0, _gb_em = gbuffer_from_hit(scene, planes[0].o, planes[0].d,
                                       hit0)
        mv_gb = motion_vectors(state.prev_camera,
                               gb0.pos.reshape(h, w, 3),
                               gb0.depth.reshape(h, w), w, h)
        restir_direct, di_state = restir_di(
            gb0, scene.lights, scene.envmap, scene.bvh, w, h,
            jnp.uint32(state.frame_index), di_state,
            motion_flat=mv_gb.reshape(-1, 2))

    hdr = jnp.zeros((n, 3), jnp.float32)
    dstates = [state.denoiser, state.denoiser_p1, state.denoiser_p2]
    new_dstates = []
    mv0 = None
    for i, plane in enumerate(planes):
        # decorrelate the per-plane fills
        sidx_p = sidx + jnp.uint32(i * 0x632BE59B)
        # V-buffer restart: the BUILD pass prepaid this plane's first
        # traversal (FirstHitFromVBuffer, PathTracerSample.hlsl:34-94).
        budget = jnp.where(plane.valid,
                           jnp.maximum(pt_cfg.max_bounces - plane.nverts,
                                       0), 0)
        ext_di = use_restir and i == 0
        out = trace_paths(scene, pt_cfg, plane.o, plane.d, spread, px, py,
                          sidx_p, want_aux=True,
                          first_hit=plane.vbuffer(pt_cfg.max_ray_travel),
                          bounce_budget=budget,
                          first_direct=not ext_di)
        radiance = out["L"]
        if ext_di:
            radiance = radiance + jnp.where(plane.valid[:, None],
                                            restir_direct, 0.0)
        if rc.denoiser.value:
            # per-plane motion from the plane's own base surface
            motion = motion_vectors(state.prev_camera,
                                    out["wpos"].reshape(h, w, 3),
                                    out["depth"].reshape(h, w), w, h)
            if i == 0:
                mv0 = motion
            den, ds = dn.denoise(
                (radiance - out["emission"]).reshape(h, w, 3),
                out["albedo"].reshape(h, w, 3),
                out["normal"].reshape(h, w, 3),
                out["depth"].reshape(h, w),
                motion.reshape(h, w, 2), dstates[i])
            plane_l = den.reshape(n, 3) + out["emission"]
        else:
            plane_l, ds = radiance, dstates[i]
        new_dstates.append(ds)
        hdr = hdr + jnp.where(plane.valid[:, None],
                              plane.thp * plane_l, 0.0)

    # background pixels: environment directly
    if scene.envmap is not None:
        from rtxpt_tpu.lighting.envmap import env_eval
        hdr = hdr + jnp.where(background[:, None], env_eval(scene.envmap, d),
                              0.0)

    hdr = hdr.reshape(h, w, 3)
    if rc.enable_taa:
        # dominant-plane motion drives the display-TAA reprojection
        mv = mv0 if mv0 is not None else jnp.zeros((h, w, 2), jnp.float32)
        hdr, taa_hist = taa_resolve(hdr, mv, state.taa_history)
    else:
        taa_hist = state.taa_history
    if rc.enable_bloom:
        hdr = bloom(hdr)
    img = tonemap(hdr, rc.exposure, rc.tonemap)
    new_state = RealtimeState(denoiser=new_dstates[0],
                              denoiser_p1=new_dstates[1],
                              denoiser_p2=new_dstates[2],
                              taa_history=taa_hist, prev_camera=cam,
                              frame_index=state.frame_index + 1,
                              restir_di=di_state, motion=mv0)
    return img, hdr, new_state
