"""Hybrid (IntroSample-analog) renderer: ray-traced G-buffer + deferred
lighting + screen-space AO + IBL.

Analog of the reference's IntroSample pipeline (reference: IntroSample.cpp
:72-130 — PopulateGBuffer RT pass, GTAO, local cubemap GGX prefilter + SH
irradiance, hierarchical SSR, RasterDeferredLighting with split-sum IBL;
SURVEY.md §3.5). TPU version:

  * G-buffer: one primary-ray wavefront (pt/restir.gbuffer_from_primary)
  * AO: horizon-free screen-space AO from depth+normal (GTAO-class,
    cosine-weighted multi-direction visibility estimate)
  * direct: NEE with shadow rays (exact, replacing shadow maps)
  * ambient: split-sum-style IBL — diffuse from the env map's irradiance
    estimate, specular from the env at the reflected direction with
    roughness-driven MIP-free blur approximation
  * SSR: reflection rays traced for smooth surfaces (ray-traced, better
    than screen-space; the reference falls back to a local cubemap)
"""

from __future__ import annotations

import jax.numpy as jnp

from rtxpt_tpu.accel.traverse import intersect_any, intersect_closest
from rtxpt_tpu.lighting.envmap import env_eval
from rtxpt_tpu.lighting.lights_baker import sample_light
from rtxpt_tpu.pt import bsdf as B
from rtxpt_tpu.pt.restir import gbuffer_from_primary, _surface_bsdf
from rtxpt_tpu.pt.surface import ray_offset
from rtxpt_tpu.utils import math as m
from rtxpt_tpu.utils import rng


def ssao(depth, normal, pos, width: int, height: int, radius: float = 0.15,
         n_dirs: int = 8):
    """Screen-space AO (GTAO-class): horizon sampling in image space using
    world positions; returns [N] occlusion in [0,1] (1 = open)."""
    n = depth.shape[0]
    px = jnp.arange(n, dtype=jnp.int32) % width
    py = jnp.arange(n, dtype=jnp.int32) // width
    occ = jnp.zeros((n,), jnp.float32)
    cnt = 0.0
    for k in range(n_dirs):
        ang = 2.0 * jnp.pi * (k + 0.5) / n_dirs
        for step in (2, 5, 9):
            qx = jnp.clip(px + jnp.int32(round(float(jnp.cos(ang)) * step)),
                          0, width - 1)
            qy = jnp.clip(py + jnp.int32(round(float(jnp.sin(ang)) * step)),
                          0, height - 1)
            qi = qy * width + qx
            dpos = jnp.take(pos, qi, axis=0) - pos
            dist = jnp.sqrt(jnp.maximum(m.dot(dpos, dpos, False), 1e-12))
            cos_h = m.dot(dpos, normal, False) / dist
            w = jnp.clip(1.0 - dist / radius, 0.0, 1.0)
            occ = occ + jnp.clip(cos_h, 0.0, 1.0) * w
            cnt += 1.0
    ao = jnp.clip(1.0 - occ / cnt * 2.0, 0.0, 1.0)
    return jnp.where(depth > 0.0, ao, 1.0)


def _env_irradiance(envmap, normal, n_samples: int = 8):
    """Cosine-hemisphere irradiance estimate from the env map (the SH
    irradiance analog, sampled instead of projected)."""
    n = normal.shape[0]
    acc = jnp.zeros((n, 3), jnp.float32)
    for k in range(n_samples):
        u1 = (k + 0.5) / n_samples
        u2 = (k * 0.618034) % 1.0
        d_local, _ = m.sample_cosine_hemisphere(
            jnp.full((n,), u1, jnp.float32), jnp.full((n,), u2, jnp.float32))
        d = m.to_world(d_local, normal)
        acc = acc + env_eval(envmap, d)
    return acc / n_samples


def render_hybrid(scene, cam, width: int, height: int, frame_index: int = 0,
                  ao_strength: float = 1.0, ssr: bool = True, probe=None,
                  use_probe: bool = True):
    """One hybrid frame. Returns linear HDR [H,W,3].

    `probe`: a lighting.probe.LocalProbe (ray-traced local radiance
    probe). None + use_probe bakes one at the scene center — callers
    running frame loops should bake once and re-pass it every few frames
    (the reference amortizes its local cubemap over 3 frames,
    IntroSample.cpp:110)."""
    if probe is None and use_probe:
        from rtxpt_tpu.lighting.probe import bake_probe
        probe = bake_probe(scene, frame_index=frame_index)
    gb, emissive = gbuffer_from_primary(scene, cam, width, height)
    n = gb.pos.shape[0]
    f32 = jnp.float32

    # direct lighting: one NEE sample + shadow ray (exact shadows)
    seed = rng.hash_combine(jnp.arange(n, dtype=jnp.uint32),
                            jnp.uint32(frame_index + 0x1234))
    ls = sample_light(scene.lights, scene.envmap, gb.pos,
                      rng.uniform_sample(seed, 0),
                      rng.uniform_sample(seed, 1),
                      rng.uniform_sample(seed, 2))
    bsdf = _surface_bsdf(gb)
    wo_l = m.to_local(gb.view, gb.normal)
    wi_l = m.to_local(ls["wi"], gb.normal)
    f = B.bsdf_eval(bsdf, wo_l, wi_l)
    o = ray_offset(gb.pos, gb.geo_normal, ls["wi"])
    do = gb.valid & ls["valid"]
    occl = intersect_any(scene.bvh, o, ls["wi"], jnp.zeros((n,), f32),
                         jnp.where(do, ls["dist"] * (1 - 1e-4), 0.0))
    direct = jnp.where((do & ~occl)[:, None],
                       f * ls["Li"] / jnp.maximum(ls["pdf"], 1e-9)[:, None],
                       0.0)

    # ambient: AO-modulated split-sum IBL from the LOCAL probe (the
    # reference's GGX-prefiltered cubemap + SH irradiance,
    # CubemapProcessing.hlsl) — falls back to the distant env map
    ao = ssao(gb.depth, gb.normal, gb.pos, width, height)
    ao = 1.0 - ao_strength * (1.0 - ao)
    ambient = jnp.zeros((n, 3), f32)
    ndv = jnp.clip(m.dot(gb.view, gb.normal, False), 0.0, 1.0)
    refl = m.reflect(gb.view, gb.normal)
    if probe is not None:
        from rtxpt_tpu.lighting.probe import (env_brdf_approx,
                                              probe_irradiance,
                                              probe_specular)
        irr = probe_irradiance(probe, gb.normal)
        ambient = gb.diffuse * irr * ao[:, None]
        spec = probe_specular(probe, refl, gb.roughness)
        ambient = ambient + spec * env_brdf_approx(
            gb.specular_f0, gb.roughness, ndv) * ao[:, None]
    elif scene.envmap is not None:
        irr = _env_irradiance(scene.envmap, gb.normal)
        ambient = gb.diffuse * irr * ao[:, None]
        # specular IBL at the reflected direction (split-sum-lite)
        spec_env = env_eval(scene.envmap, refl)
        fres = B.fresnel_schlick(gb.specular_f0, ndv)
        gloss = jnp.clip(1.0 - gb.roughness, 0.0, 1.0)[:, None]
        ambient = ambient + spec_env * fres * gloss * ao[:, None]

    # ray-traced reflections for smooth surfaces (SSR substitute)
    refl_col = jnp.zeros((n, 3), f32)
    if ssr:
        refl = m.reflect(gb.view, gb.normal)
        smooth = gb.valid & (gb.roughness < 0.35) \
            & (m.luminance(gb.specular_f0) > 0.02)
        ro = ray_offset(gb.pos, gb.geo_normal, refl)
        rhit = intersect_closest(scene.bvh, ro, refl, jnp.zeros((n,), f32),
                                 jnp.where(smooth, 1e30, 0.0))
        from rtxpt_tpu.pt.surface import load_surface
        rsurf = load_surface(scene, rhit, ro, refl, jnp.zeros((n,), f32))
        # shade the reflection hit with one NEE sample (single bounce)
        ls2 = sample_light(scene.lights, scene.envmap, rsurf.pos,
                           rng.uniform_sample(seed, 10),
                           rng.uniform_sample(seed, 11),
                           rng.uniform_sample(seed, 12))
        wo2 = m.to_local(-refl, rsurf.sh_n)
        wi2 = m.to_local(ls2["wi"], rsurf.sh_n)
        f2 = B.bsdf_eval(rsurf.bsdf, wo2, wi2)
        o2 = ray_offset(rsurf.pos, rsurf.geo_n, ls2["wi"])
        do2 = smooth & ~rhit.miss & ls2["valid"]
        occ2 = intersect_any(scene.bvh, o2, ls2["wi"], jnp.zeros((n,), f32),
                             jnp.where(do2, ls2["dist"] * (1 - 1e-4), 0.0))
        lit2 = jnp.where((do2 & ~occ2)[:, None],
                         f2 * ls2["Li"]
                         / jnp.maximum(ls2["pdf"], 1e-9)[:, None], 0.0)
        refl_rad = rsurf.emissive + lit2
        if scene.envmap is not None:
            refl_rad = jnp.where(rhit.miss[:, None],
                                 env_eval(scene.envmap, refl), refl_rad)
        ndv = jnp.clip(m.dot(gb.view, gb.normal, False), 0.0, 1.0)
        fres = B.fresnel_schlick(gb.specular_f0, ndv)
        refl_col = jnp.where(smooth[:, None], refl_rad * fres, 0.0)

    hdr = emissive + direct + ambient + refl_col
    hdr = jnp.where(gb.valid[:, None], hdr, 0.0)
    if scene.envmap is not None:
        # background
        px = jnp.arange(n, dtype=jnp.int32) % width
        py = jnp.arange(n, dtype=jnp.int32) // width
        from rtxpt_tpu.scene.camera import camera_ray
        _, d, _ = camera_ray(cam, px, py, jnp.full((n,), 0.5, f32),
                             jnp.full((n,), 0.5, f32))
        hdr = hdr + jnp.where(gb.valid[:, None], 0.0, env_eval(scene.envmap,
                                                               d))
    return hdr.reshape(height, width, 3)
