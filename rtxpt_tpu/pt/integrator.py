"""Wavefront path-tracing integrator (reference mode).

TPU-native re-design of the reference's megakernel raygen loop + HandleHit/
HandleMiss core (reference: Shaders/PathTracerSample.hlsl:200-250 raygen
loop, Shaders/PathTracer/PathTracer.hlsli:505-762 HandleHit, :407-503
HandleMiss, :217-345 GenerateScatterRay, :182-208 russian roulette,
PathTracerNEE.hlsli:303-346 HandleNEE).

Instead of a per-pixel `while(path.isActive())` megakernel, the whole ray
wavefront advances bounce-by-bounce in lockstep (statically unrolled bounce
loop -> one traced program, XLA fuses all shading math between the two
traversal while_loops per bounce). Terminated lanes carry a False active
mask; ray sorting / compaction between bounces lives in ops/.

Path state matches the reference's PathState payload semantically
(PathState.hlsli:83-267): origin/dir, thp, L, flags (active, delta-only),
prev-bounce BSDF pdf for MIS, interior-medium info, ray cone.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from rtxpt_tpu.accel.traverse import intersect_closest, intersect_any
from rtxpt_tpu.config import NEEMode, PathTracerConfig
from rtxpt_tpu.lighting.envmap import env_eval, env_pdf
from rtxpt_tpu.lighting.lights_baker import (
    env_select_pdf, light_pdf_for_tri_hit, sample_light,
)
from rtxpt_tpu.pt import bsdf as B
from rtxpt_tpu.pt.surface import load_surface, ray_offset
from rtxpt_tpu.scene.camera import Camera, camera_ray
from rtxpt_tpu.scene.scene import SceneData
from rtxpt_tpu.utils import math as m
from rtxpt_tpu.utils import rng

# Effect seeds (SampleGenerators effect decorrelation)
EFFECT_LENS = 17
EFFECT_SCATTER = 29
EFFECT_NEE = 31
EFFECT_RR = 37
EFFECT_STF = 41
# Bounded false-hit skips per bounce for nested-dielectric priorities
# (reference rejects in the traversal loop; 2 covers e.g. ice-in-water
# where both interfaces of the occluded medium overlap the segment).
MAX_FALSE_HIT_SKIPS = 2


def _ld(cfg: PathTracerConfig, sample_idx, seed, dim: int):
    if cfg.low_discrepancy:
        return rng.ld_sample(sample_idx, seed, dim)
    return rng.uniform_sample(seed, rng.hash_combine(sample_idx, dim))


def _lds(cfg: PathTracerConfig, sample_idx, seed, dims):
    if cfg.low_discrepancy:
        return rng.ld_samples(sample_idx, seed, dims)
    return tuple(rng.uniform_sample(seed, rng.hash_combine(sample_idx, d))
                 for d in dims)


def trace_paths(scene: SceneData, cfg: PathTracerConfig, o, d, cone_spread,
                px, py, sample_idx, want_aux: bool = False,
                neeat_state=None, first_emissive: bool = True,
                first_hit=None, bounce_budget=None,
                first_direct: bool = True):
    """Trace a wavefront of paths to completion.

    Args: o,d [N,3] camera rays; cone_spread [N]; px,py [N] i32;
          sample_idx traced scalar/[] uint32. `first_hit` (accel Hit):
          V-buffer restart — skip bounce 0's traversal and shade the
          stored hit directly (stable-planes FILL,
          PathTracerSample.hlsl:34-94 FirstHitFromVBuffer analog).
          `bounce_budget` [N] i32: per-lane remaining bounces — lanes
          stop scattering once bounce >= budget (the BUILD chain already
          consumed path vertices; StablePlanes vertex-index bookkeeping).
          `first_direct=False`: skip ALL direct lighting at the first
          vertex (NEE at bounce 0 plus BSDF-sampled emissive/env hits at
          bounce 1) — the caller shades it externally, e.g. ReSTIR DI on
          the stable-plane base surface (the reference's RTXDI final
          shade replacing the primary NEE, RTXDI/RtxdiPass.cpp:544-550).
          XLA tier only; dispatch forces the wavefront for such calls.
    Returns dict(L [N,3], aux guide buffers when want_aux, ray_count []).
    """
    # Kernel-tier dispatch: purely on the STATIC cfg.kernel_tier (resolved
    # outside jit by pt/dispatch.resolve — env vars / backend state are
    # never read at trace time, so the jit cache key owns the decision).
    # "auto" here means an eager / third-party caller skipped resolution;
    # resolving inline is then safe because nothing caches the trace.
    # V-buffer restarts ride the fused kernel via hit injection; the
    # clustered tier still takes the XLA path for them.
    from rtxpt_tpu.pt import dispatch
    if cfg.kernel_tier == "auto":
        cfg = dispatch.resolve(scene, cfg, neeat_state)
    if not first_direct and cfg.kernel_tier == "clustered":
        # external-DI fills (ReSTIR x stable planes) carry V-buffer
        # restarts, which the clustered tier doesn't serve — wavefront
        import dataclasses as _dc
        cfg = _dc.replace(cfg, kernel_tier="xla")
    if cfg.kernel_tier == "fused":
        from rtxpt_tpu.pt import bounce_pallas as bp
        return bp.trace_paths_pallas(scene, cfg, o, d, cone_spread, px, py,
                                     sample_idx, want_aux=want_aux,
                                     first_emissive=first_emissive,
                                     first_hit=first_hit,
                                     bounce_budget=bounce_budget,
                                     neeat_state=neeat_state,
                                     first_direct=first_direct)
    if first_hit is None and cfg.kernel_tier == "clustered":
        from rtxpt_tpu.pt import bounce_clustered as bc
        return bc.trace_paths_clustered(scene, cfg, o, d, cone_spread,
                                        px, py, sample_idx,
                                        want_aux=want_aux,
                                        first_emissive=first_emissive,
                                        neeat_state=neeat_state)
    n = o.shape[0]
    f32 = jnp.float32
    L = jnp.zeros((n, 3), f32)
    thp = jnp.ones((n, 3), f32)
    active = jnp.ones((n,), bool)
    prev_pdf = jnp.zeros((n,), f32)        # BSDF pdf of previous scatter
    prev_delta = jnp.ones((n,), bool)      # prev bounce was delta (or camera)
    # Interior list: 2-slot medium stack of material ids (-1 = air), the
    # InteriorList analog (Rendering/Materials/InteriorList.hlsli, 2 packed
    # slots; priority rules deferred).
    med0 = jnp.full((n,), -1, jnp.int32)   # top (current medium)
    med1 = jnp.full((n,), -1, jnp.int32)
    cone_width = jnp.zeros((n,), f32)
    ray_count = jnp.zeros((), jnp.int32)
    # wavefront occupancy: active-lane count per bounce round (the
    # occupancy metric of SURVEY §7 step 6)
    occupancy = []

    aux = dict(
        albedo=jnp.zeros((n, 3), f32), normal=jnp.zeros((n, 3), f32),
        depth=jnp.zeros((n,), f32), wpos=jnp.zeros((n, 3), f32),
        emission=jnp.zeros((n, 3), f32),
    ) if want_aux else None

    # Diffuse/specular radiance partition for per-channel denoising
    # (NrdConfig.cpp:25-27): primary-vertex NEE splits by exact lobe
    # evaluation; every later contribution follows the lobe of the FIRST
    # scatter. L_diff + L_spec == L - primary emission.
    split = bool(getattr(cfg, "split_channels", False)) and want_aux
    L_diff = jnp.zeros((n, 3), f32) if split else None
    L_spec = jnp.zeros((n, 3), f32) if split else None
    first_spec = jnp.zeros((n,), bool)
    pend_cdiff = jnp.zeros((n, 3), f32)

    sample_idx = jnp.asarray(sample_idx).astype(jnp.uint32)

    # OMM-analog alpha testing: MIXED triangles re-trace on alpha failure
    # (scene/omm.py); scenes without alpha-tested geometry use the raw
    # queries.
    if scene.tri_opacity is not None and scene.textures is not None:
        from rtxpt_tpu.scene.omm import (
            intersect_any_alpha, intersect_closest_alpha)
        closest_fn = lambda o_, d_, tn_, tx_: intersect_closest_alpha(
            scene, o_, d_, tn_, tx_)
        any_fn = lambda o_, d_, tn_, tx_: intersect_any_alpha(
            scene, o_, d_, tn_, tx_)
    else:
        from rtxpt_tpu.accel.traverse import scene_any, scene_closest
        closest_fn = lambda o_, d_, tn_, tx_: scene_closest(
            scene, o_, d_, tn_, tx_)
        any_fn = lambda o_, d_, tn_, tx_: scene_any(
            scene, o_, d_, tn_, tx_)

    use_nee = cfg.nee != NEEMode.OFF and scene.lights is not None
    nee_uniform = cfg.nee == NEEMode.UNIFORM
    use_neeat = (cfg.nee == NEEMode.NEEAT and neeat_state is not None
                 and scene.lights is not None)
    firefly = cfg.firefly_clamp
    neeat_hist = None
    if use_neeat:
        from rtxpt_tpu.lighting import neeat as na
        neeat_hist = na.zero_hist(neeat_state)

    # Deferred NEE resolution: the shadow ray of bounce k rides in the SAME
    # intersect dispatch as bounce k+1's scatter rays (one 2N-wide query
    # instead of two N-wide — traversal dominates the frame; the occlusion
    # decision is identical since closest-hit-within-dist == any-hit).
    fuse_shadows = (scene.bvh is not None and scene.bvh.brute is not None
                    and use_nee)
    pend_contrib = jnp.zeros((n, 3), f32)
    pend_o = jnp.zeros((n, 3), f32)
    pend_d = jnp.ones((n, 3), f32)
    pend_dist = jnp.zeros((n,), f32)
    pend_mask = jnp.zeros((n,), bool)
    pend_tile = None
    pend_li = None

    def resolve_pending(L, occluded, neeat_hist):
        nonlocal L_diff, L_spec
        ok = pend_mask & ~occluded
        Lr = L + jnp.where(ok[..., None], pend_contrib, 0.0)
        if split:
            L_diff = L_diff + jnp.where(ok[..., None], pend_cdiff, 0.0)
            L_spec = L_spec + jnp.where(ok[..., None],
                                        pend_contrib - pend_cdiff, 0.0)
        if use_neeat:
            neeat_hist = na.accumulate_feedback(
                neeat_state, neeat_hist, pend_tile, pend_li,
                m.luminance(pend_contrib), ok)
        return Lr, neeat_hist

    for bounce in range(cfg.max_bounces + 1):
        # ----- closest hit (+ fused shadow resolution) -----
        occupancy.append(jnp.sum(active.astype(jnp.int32)))
        ray_count = ray_count + jnp.sum(active.astype(jnp.int32)) \
            + jnp.sum(pend_mask.astype(jnp.int32))
        if fuse_shadows and bounce > 0:
            hit2 = closest_fn(
                jnp.concatenate([o, pend_o]),
                jnp.concatenate([d, pend_d]),
                jnp.zeros((2 * n,), f32),
                jnp.concatenate([jnp.full((n,), cfg.max_ray_travel, f32),
                                 pend_dist]))
            hit = jax.tree.map(lambda x: x[:n], hit2)
            occluded = ~hit2.miss[n:]
            L, neeat_hist = resolve_pending(L, occluded, neeat_hist)
            pend_mask = jnp.zeros((n,), bool)
        elif bounce == 0 and first_hit is not None:
            hit = first_hit          # V-buffer restart: traversal prepaid
        else:
            hit = closest_fn(o, d, jnp.zeros((n,), f32),
                             jnp.full((n,), cfg.max_ray_travel, f32))

        # ----- nested-dielectric priorities: false-hit rejection -----
        # (PathTracerNestedDielectrics.hlsli:48,118 / InteriorList.hlsli:
        # 26-32). While inside a medium, boundaries of LOWER-priority
        # media are false intersections: the interior list is updated but
        # the surface is skipped (bounded retrace past it). Statically
        # gated so priority-free scenes pay nothing.
        if scene.has_nested_priorities:
            mats_ = scene.materials
            prio_tab = mats_.nested_priority
            for _ in range(MAX_FALSE_HIT_SKIPS):
                mh = jnp.take(scene.geometry.tri_material,
                              jnp.maximum(hit.prim, 0))
                boundary = ((jnp.take(mats_.thin, mh) < 0.5)
                            & (jnp.take(mats_.transmission, mh) > 0.0))
                p_hit = jnp.take(prio_tab, mh)
                p_cur = jnp.where(med0 >= 0,
                                  jnp.take(prio_tab, jnp.maximum(med0, 0)),
                                  -1)
                false_enter = boundary & hit.front & (p_hit < p_cur)
                false_exit = boundary & ~hit.front & (mh != med0)
                fh = active & ~hit.miss & (false_enter | false_exit)
                # interior-list bookkeeping for the skipped boundary:
                # entering tracks the occluded medium in the lower slot;
                # exiting removes it from wherever it sits below the top.
                p_m1 = jnp.where(med1 >= 0,
                                 jnp.take(prio_tab, jnp.maximum(med1, 0)),
                                 -1)
                med1 = jnp.where(
                    fh & false_enter & ((med1 < 0) | (p_hit > p_m1)), mh,
                    jnp.where(fh & false_exit & (mh == med1), -1, med1))
                tmin2 = jnp.where(fh, hit.t * (1.0 + 1e-4) + 1e-5, 0.0)
                hit2 = closest_fn(o, d, tmin2,
                                  jnp.where(fh, cfg.max_ray_travel, 0.0))
                hit = jax.tree.map(
                    lambda a, b: jnp.where(
                        fh.reshape(fh.shape + (1,) * (a.ndim - 1)), b, a),
                    hit, hit2)
        hit_mask = active & ~hit.miss
        miss_mask = active & hit.miss

        # ----- HandleMiss: environment (PathTracer.hlsli:407-503) -----
        if scene.envmap is not None and (first_emissive or bounce > 0) \
                and (first_direct or bounce != 1):
            env_L = env_eval(scene.envmap, d)
            if cfg.enable_mis and use_nee:
                if use_neeat:
                    # NEE-AT samples the env light via the per-tile mixture
                    # selection and a UNIFORM-uv direction (eval_light_sample
                    # jacobian 1/(2*pi^2*sin(theta))) — the MIS counterpart
                    # here must match that strategy, not the global
                    # power-CDF * texel-CDF pdf (else weights don't sum to 1
                    # and env lighting biases; mirrors the triangle-hit
                    # rescale below).
                    from rtxpt_tpu.lighting.envmap import _dir_to_uv
                    tile0 = na.tile_of(neeat_state, px, py)
                    if scene.lights.env_quad_grid is not None:
                        # quad mode: MIS against the containing quad's
                        # mixture selection x uniform-rect jacobian
                        from rtxpt_tpu.lighting.lights_baker import \
                            env_quad_of_dir
                        li_e, area_e, sin_t = env_quad_of_dir(
                            scene.lights, scene.envmap, d)
                        sel_mix = na.select_pdf(neeat_state, scene.lights,
                                                tile0, li_e)
                        p_env = sel_mix / (area_e * 2.0 * jnp.pi
                                           * jnp.pi * sin_t)
                    else:
                        env_li = jnp.maximum(scene.lights.env_light, 0)
                        sel_mix = na.select_pdf(neeat_state, scene.lights,
                                                tile0, env_li)
                        _, v_env = _dir_to_uv(scene.envmap, d)
                        sin_t = jnp.maximum(jnp.sin(v_env * jnp.pi), 1e-4)
                        p_env = jnp.where(
                            scene.lights.env_light >= 0,
                            sel_mix / (2.0 * jnp.pi * jnp.pi * sin_t), 0.0)
                else:
                    from rtxpt_tpu.lighting.lights_baker import env_dir_pdf
                    p_env = env_dir_pdf(scene.lights, scene.envmap, d,
                                        nee_uniform)
                w_env = jnp.where(prev_delta, 1.0,
                                  m.power_heuristic(prev_pdf, p_env))
            else:
                w_env = jnp.ones((n,), f32)
            contrib = thp * env_L * w_env[..., None]
            L = L + jnp.where(miss_mask[..., None], contrib, 0.0)
            if split:
                cd = jnp.where(first_spec[:, None], 0.0, contrib)
                L_diff = L_diff + jnp.where(miss_mask[..., None], cd, 0.0)
                L_spec = L_spec + jnp.where(miss_mask[..., None],
                                            contrib - cd, 0.0)
        active = active & ~hit.miss
        if bounce == cfg.max_bounces:
            break
        if bounce_budget is not None:
            active = active & (bounce < bounce_budget)
            hit_mask = hit_mask & active

        # ----- surface + volume transmittance (Beer-Lambert,
        #       HomogeneousVolumeSampler.hlsli; PathTracer.hlsli:538-547) ----
        cone_width = cone_width + cone_spread * hit.t
        in_medium = med0 >= 0
        medium_sigma = jnp.take(scene.materials.volume_absorption,
                                jnp.maximum(med0, 0), axis=0)
        cur_ior = jnp.where(in_medium,
                            jnp.take(scene.materials.ior,
                                     jnp.maximum(med0, 0)), 1.0)
        below_ior = jnp.where(med1 >= 0,
                              jnp.take(scene.materials.ior,
                                       jnp.maximum(med1, 0)), 1.0)
        stf_u = None
        if cfg.stochastic_texture_filtering and scene.textures is not None:
            seed_tx = rng.pixel_seed(px, py, bounce, EFFECT_STF)
            su1, su2 = _lds(cfg, sample_idx, seed_tx, (0, 1))
            stf_u = jnp.stack([su1, su2], axis=-1)
        surf = load_surface(scene, hit, o, d, cone_width,
                            cur_ior=cur_ior, below_ior=below_ior,
                            stf_u=stf_u)
        thp = thp * jnp.where(in_medium[..., None],
                              jnp.exp(-medium_sigma * hit.t[..., None]), 1.0)

        # ----- emissive hit + MIS (PathTracer.hlsli:592-674) -----
        em = surf.emissive
        if cfg.enable_mis and use_nee and bounce > 0:
            cos_l = jnp.abs(m.dot(-d, surf.geo_n, False))
            # instanced (TLAS v2) scenes: map (prim, inst) -> expanded
            # light-bake triangle id (lights_baker.emissive_prim_index)
            from rtxpt_tpu.lighting.lights_baker import emissive_prim_index
            eprim = emissive_prim_index(scene, hit.prim,
                                        getattr(hit, "inst", None))
            p_light = light_pdf_for_tri_hit(scene.lights, eprim, hit.t,
                                            cos_l, nee_uniform)
            if use_neeat:
                # rescale the discrete selection part to the NEE-AT mixture
                li_hit = jnp.take(scene.lights.tri_light,
                                  jnp.maximum(eprim, 0))
                tile = na.tile_of(neeat_state, px, py)
                sel_mix = na.select_pdf(neeat_state, scene.lights, tile,
                                        jnp.maximum(li_hit, 0))
                sel_pow = jnp.take(scene.lights.power,
                                   jnp.maximum(li_hit, 0))
                p_light = p_light * sel_mix / jnp.maximum(sel_pow, 1e-12)
            w_em = jnp.where(prev_delta, 1.0,
                             m.power_heuristic(prev_pdf, p_light))
        else:
            w_em = jnp.ones((n,), f32)
        if (first_emissive or bounce > 0) and (first_direct
                                               or bounce != 1):
            L = L + jnp.where(hit_mask[..., None],
                              thp * em * w_em[..., None], 0.0)
            if split and bounce > 0:
                em_c = thp * em * w_em[..., None]
                cd = jnp.where(first_spec[:, None], 0.0, em_c)
                L_diff = L_diff + jnp.where(hit_mask[..., None], cd, 0.0)
                L_spec = L_spec + jnp.where(hit_mask[..., None],
                                            em_c - cd, 0.0)

        if want_aux and bounce == 0:
            alb = surf.bsdf.diffuse + surf.bsdf.specular_f0
            aux["albedo"] = jnp.where(hit_mask[..., None], alb, 1.0)
            if split:
                aux["albedo_diff"] = jnp.where(
                    hit_mask[..., None], surf.bsdf.diffuse, 1.0)
                aux["albedo_spec"] = jnp.where(
                    hit_mask[..., None], surf.bsdf.specular_f0 + 0.04, 1.0)
            aux["normal"] = jnp.where(hit_mask[..., None], surf.sh_n, 0.0)
            aux["depth"] = jnp.where(hit_mask, hit.t, 0.0)
            aux["wpos"] = jnp.where(hit_mask[..., None], surf.pos, 0.0)
            aux["emission"] = jnp.where(hit_mask[..., None], em, 0.0)

        wo = m.to_local(-d, surf.sh_n)

        # ----- NEE (PathTracerNEE.hlsli:303 HandleNEE; WRS over candidates
        #       :54-85 when nee_candidates > 1: K light samples stream into
        #       a reservoir by unshadowed target weight, ONE shadow ray) ---
        if use_nee and (first_direct or bounce > 0):
            seed_nee = rng.pixel_seed(px, py, bounce, EFFECT_NEE)

            def _light_candidate(ci):
                base = 8 * ci
                u_sel, u1, u2, u_mix = _lds(
                    cfg, sample_idx, seed_nee,
                    (base, base + 2, base + 3, base + 4))
                if use_neeat:
                    lsc = na.sample_adaptive(neeat_state, scene.lights,
                                             scene.envmap, surf.pos, px, py,
                                             u_mix, u_sel, u1, u2)
                else:
                    lsc = sample_light(scene.lights, scene.envmap, surf.pos,
                                       u_sel, u1, u2, uniform=nee_uniform)
                wi_lc = m.to_local(lsc["wi"], surf.sh_n)
                f_lc = B.bsdf_eval(surf.bsdf, wo, wi_lc)
                return lsc, wi_lc, f_lc

            k_cand = max(int(cfg.nee_candidates), 1)
            if k_cand == 1:
                ls, wi_l, f_l = _light_candidate(0)
                pdf_b = B.bsdf_pdf(surf.bsdf, wo, wi_l)
            else:
                w_sum = jnp.zeros((n,), f32)
                ls = wi_l = f_l = None
                p_hat_sel = jnp.zeros((n,), f32)
                for ci in range(k_cand):
                    lsc, wi_lc, f_lc = _light_candidate(ci)
                    p_hat = m.luminance(f_lc * lsc["Li"]) \
                        / jnp.maximum(lsc["pdf"], 1e-12)
                    p_hat = jnp.where(lsc["valid"], p_hat, 0.0)
                    w_sum = w_sum + p_hat
                    u_acc = _ld(cfg, sample_idx, seed_nee, 8 * ci + 5)
                    if ls is None:
                        accept = p_hat > 0.0
                        ls, wi_l, f_l = lsc, wi_lc, f_lc
                        p_hat_sel = p_hat
                    else:
                        accept = (u_acc * jnp.maximum(w_sum, 1e-20)) < p_hat
                        ls = jax.tree.map(
                            lambda a_, b_: jnp.where(
                                accept.reshape(accept.shape + (1,) * (
                                    b_.ndim - 1)), b_, a_), ls, lsc)
                        wi_l = jnp.where(accept[:, None], wi_lc, wi_l)
                        f_l = jnp.where(accept[:, None], f_lc, f_l)
                        p_hat_sel = jnp.where(accept, p_hat, p_hat_sel)
                # RIS: contribution uses W = w_sum/(K*p_hat_sel); fold into
                # an effective pdf so the downstream math is unchanged.
                eff = jnp.where(p_hat_sel > 1e-12,
                                k_cand * p_hat_sel
                                / jnp.maximum(w_sum, 1e-12), 0.0)
                ls = dict(ls)
                ls["pdf"] = ls["pdf"] * eff
                ls["valid"] = ls["valid"] & (eff > 0.0)
                pdf_b = B.bsdf_pdf(surf.bsdf, wo, wi_l)
            do_nee = (hit_mask & ls["valid"]
                      & (m.luminance(f_l) > 0.0))
            shadow_o = ray_offset(surf.pos, surf.geo_n, ls["wi"])
            if cfg.enable_mis:
                # Known approximation with nee_candidates > 1: this side
                # uses the realized RIS effective pdf while the emissive-hit
                # side (light_pdf_for_tri_hit) uses the single-candidate
                # pdf — the same approximation the reference makes for
                # WRS+MIS (PathTracerNEE.hlsli "approximate" MIS mode);
                # exact K-candidate marginals are intractable per hit.
                w_nee = jnp.where(ls["is_delta"], 1.0,
                                  m.power_heuristic(ls["pdf"], pdf_b))
            else:
                w_nee = jnp.ones((n,), f32)
            contrib = thp * f_l * ls["Li"] * (
                w_nee / jnp.maximum(ls["pdf"], 1e-12))[..., None]
            if firefly > 0.0:
                lum = m.luminance(contrib)
                scale = jnp.minimum(1.0, firefly / jnp.maximum(lum, 1e-12))
                contrib = contrib * scale[..., None]
            if split:
                if bounce == 0:
                    wi_sel = m.to_local(ls["wi"], surf.sh_n)
                    f_dp, _f_sp = B.bsdf_eval_split(surf.bsdf, wo, wi_sel)
                    cdiff = contrib * f_dp / jnp.maximum(f_l, 1e-12)
                else:
                    cdiff = jnp.where(first_spec[:, None], 0.0, contrib)
            # Occlusion distance measured from the OFFSET origin: the
            # self-intersection offset shifts the origin toward the light,
            # so using the raw surface-to-light distance makes the sampled
            # light's own triangle fall inside the (1-1e-4) window for
            # distant surfaces and silently kills its NEE contribution.
            sdist_eff = ls["dist"] - m.dot(shadow_o - surf.pos, ls["wi"],
                                           False)
            if fuse_shadows:
                # defer: the shadow ray joins the next bounce's dispatch
                pend_contrib = jnp.where(do_nee[..., None], contrib, 0.0)
                if split:
                    pend_cdiff = jnp.where(do_nee[..., None], cdiff, 0.0)
                pend_o = shadow_o
                pend_d = ls["wi"]
                pend_dist = jnp.where(do_nee, sdist_eff * (1.0 - 1e-4),
                                      0.0)
                pend_mask = do_nee
                if use_neeat:
                    pend_tile = ls["tile"]
                    pend_li = ls["light_index"]
            else:
                ray_count = ray_count + jnp.sum(do_nee.astype(jnp.int32))
                occluded = any_fn(
                    shadow_o, ls["wi"], jnp.zeros((n,), f32),
                    jnp.where(do_nee, sdist_eff * (1.0 - 1e-4), 0.0))
                nee_ok = do_nee & ~occluded
                L = L + jnp.where(nee_ok[..., None], contrib, 0.0)
                if split:
                    L_diff = L_diff + jnp.where(nee_ok[..., None], cdiff,
                                                0.0)
                    L_spec = L_spec + jnp.where(nee_ok[..., None],
                                                contrib - cdiff, 0.0)
                if use_neeat:
                    # feedback: luminance of the realized contribution
                    neeat_hist = na.accumulate_feedback(
                        neeat_state, neeat_hist, ls["tile"],
                        ls["light_index"], m.luminance(contrib), nee_ok)

        # ----- scatter (GenerateScatterRay, PathTracer.hlsli:217-345) -----
        seed_sc = rng.pixel_seed(px, py, bounce, EFFECT_SCATTER)
        u_lobe, su1, su2 = _lds(cfg, sample_idx, seed_sc, (0, 2, 3))
        bs = B.bsdf_sample(surf.bsdf, wo, u_lobe, su1, su2)
        wi_world = m.to_world(bs["wi"], surf.sh_n)
        if split and bounce == 0:
            first_spec = ((bs["lobe"] == B.LOBE_SPECULAR_REFL)
                          | (bs["lobe"] == B.LOBE_SPECULAR_TRANS))
        # Reject samples that leak through the geometric surface.
        same_side_sh = bs["wi"][..., 2] > 0.0
        same_side_geo = m.dot(wi_world, surf.geo_n, False) > 0.0
        leak = same_side_sh != same_side_geo
        active = active & bs["valid"] & ~leak \
            & (m.luminance(bs["weight"]) > 0.0)

        thp = thp * bs["weight"]
        prev_pdf = bs["pdf"]
        prev_delta = bs["is_delta"]

        # Medium transitions: push on entering, pop on exiting (2-slot
        # InteriorList analog).
        transmitted = bs["wi"][..., 2] < 0.0
        mid = surf.mat_id
        thin = jnp.take(scene.materials.thin, mid) > 0.5
        entering = transmitted & surf.front & ~thin
        exiting = transmitted & ~surf.front & ~thin
        new_med0 = jnp.where(entering, mid, jnp.where(exiting, med1, med0))
        new_med1 = jnp.where(entering, med0, jnp.where(exiting, -1, med1))
        med0, med1 = new_med0, new_med1

        # Ray cone spread growth by lobe roughness (TexLODHelpers.hlsli use
        # at PathTracer.hlsli:284-293).
        cone_spread = cone_spread + jnp.sqrt(surf.bsdf.alpha) * 0.25 \
            * (~bs["is_delta"]).astype(f32)

        # ----- russian roulette (PathTracer.hlsli:182-208) -----
        if cfg.enable_russian_roulette and bounce >= cfg.min_bounces_before_rr:
            seed_rr = rng.pixel_seed(px, py, bounce, EFFECT_RR)
            u_rr = _ld(cfg, sample_idx, seed_rr, 0)
            p_cont = jnp.clip(jnp.max(thp, axis=-1), 0.05, 1.0)
            kill = u_rr >= p_cont
            active = active & ~kill
            thp = thp / p_cont[..., None]

        o = ray_offset(surf.pos, surf.geo_n, wi_world)
        d = wi_world

    out = dict(L=L, ray_count=ray_count,
               occupancy=jnp.stack(occupancy))
    if split:
        out["L_diff"] = L_diff
        out["L_spec"] = L_spec
    if use_neeat:
        out["neeat_hist"] = neeat_hist
    if want_aux:
        out.update(aux)
    return out


# ---------------------------------------------------------------------------
# Frame drivers
# ---------------------------------------------------------------------------


def _pixel_grid(width: int, height: int):
    px = jnp.tile(jnp.arange(width, dtype=jnp.int32)[None, :], (height, 1))
    py = jnp.tile(jnp.arange(height, dtype=jnp.int32)[:, None], (1, width))
    return px.reshape(-1), py.reshape(-1)


def render_sample(scene: SceneData, cam: Camera, cfg: PathTracerConfig,
                  width: int, height: int, sample_idx,
                  want_aux: bool = False, chunk: Optional[int] = None,
                  neeat_state=None):
    """One sample per pixel over the full frame. Returns dict of [H,W,...]
    buffers (L, optional aux) + scalar ray_count (+ neeat_hist)."""
    px, py = _pixel_grid(width, height)
    npix = px.shape[0]
    chunk = chunk or cfg.ray_chunk
    chunk = min(chunk, npix)

    sample_idx = jnp.asarray(sample_idx).astype(jnp.uint32)

    def run(px_c, py_c):
        seed_lens = rng.pixel_seed(px_c, py_c, 0, EFFECT_LENS)
        u1, u2 = _lds(cfg, sample_idx, seed_lens, (0, 1))
        o, d, spread = camera_ray(cam, px_c, py_c, u1, u2)
        return trace_paths(scene, cfg, o, d, spread, px_c, py_c,
                           sample_idx, want_aux=want_aux,
                           neeat_state=neeat_state)

    if npix % chunk != 0:
        pad = chunk - npix % chunk
        px = jnp.concatenate([px, jnp.zeros((pad,), jnp.int32)])
        py = jnp.concatenate([py, jnp.zeros((pad,), jnp.int32)])
    nchunks = px.shape[0] // chunk

    if nchunks == 1:
        out = run(px, py)
    else:
        px = px.reshape(nchunks, chunk)
        py = py.reshape(nchunks, chunk)
        out = jax.lax.map(lambda ab: run(ab[0], ab[1]), (px, py))
        hist = out.pop("neeat_hist", None)
        occ = out.pop("occupancy")
        out = jax.tree.map(
            lambda x: (x.reshape(-1, *x.shape[2:])
                       if x.ndim >= 2 else jnp.sum(x)), out)
        out["occupancy"] = jnp.sum(occ, axis=0)
        if hist is not None:
            from rtxpt_tpu.lighting import neeat as na
            out["neeat_hist"] = na.merge_hists(neeat_state, hist)

    ray_count = out.pop("ray_count")
    hist = out.pop("neeat_hist", None)
    ovf = out.pop("cull_overflow", None)
    occ = out.pop("occupancy")
    ray_count = jnp.sum(ray_count)
    imgs = {k: v[:npix].reshape(height, width, *v.shape[1:])
            for k, v in out.items()}
    imgs["ray_count"] = ray_count
    imgs["occupancy"] = occ
    if ovf is not None:
        imgs["cull_overflow"] = jnp.sum(ovf)
    if hist is not None:
        imgs["neeat_hist"] = hist
    return imgs


@partial(jax.jit, static_argnames=("cfg", "width", "height", "want_aux"))
def _render_sample_jit_inner(scene, cam, cfg, width, height, sample_idx,
                             want_aux=False, neeat_state=None):
    return render_sample(scene, cam, cfg, width, height, sample_idx,
                         want_aux=want_aux, neeat_state=neeat_state)


def render_sample_jit(scene, cam, cfg, width, height, sample_idx,
                      want_aux=False, neeat_state=None):
    """Jitted render_sample. Resolves the kernel tier OUTSIDE the jit
    boundary (pt/dispatch.py) so the dispatch decision is part of the
    static cache key; the out-of-band `kernel_tier` entry reports which
    tier served the frame (VERDICT r2: silent tier cliffs)."""
    from rtxpt_tpu.pt import dispatch
    cfg = dispatch.resolve(scene, cfg, neeat_state)
    try:
        out = dict(_render_sample_jit_inner(scene, cam, cfg, width, height,
                                            sample_idx, want_aux,
                                            neeat_state))
    except ValueError as e:  # pragma: no cover - jax 0.9 cache bug
        # jax 0.9 argument-pruning bug: the jit prunes unused scene
        # leaves per executable, and with xla_force_host_platform_device
        # _count set, switching between scenes whose pruned signatures
        # differ can leave the C++ fastpath with a stale kept-argument
        # set ("Execution supplied N buffers but compiled program
        # expected M buffers"). Clearing the caches and retrying
        # recompiles with a consistent kept set.
        if "buffers but compiled program expected" not in str(e):
            raise
        jax.clear_caches()
        out = dict(_render_sample_jit_inner(scene, cam, cfg, width, height,
                                            sample_idx, want_aux,
                                            neeat_state))
    out["kernel_tier"] = cfg.kernel_tier
    return out


def render_adaptive(scene: SceneData, cam: Camera, cfg: PathTracerConfig,
                    width: int, height: int, spp: int,
                    first_sample: int = 0):
    """Progressive render with the NEE-AT feedback loop: each sample's
    light-contribution histogram updates the per-tile sampler before the
    next sample (LightsBaker UpdateBegin/UpdateEnd cadence)."""
    from rtxpt_tpu.lighting import neeat as na

    state = na.init_state(width, height, int(scene.lights.count))
    acc = None
    total_rays = 0
    for s in range(first_sample, first_sample + spp):
        out = render_sample_jit(scene, cam, cfg, width, height,
                                jnp.uint32(s), False, state)
        total_rays += int(out["ray_count"])
        acc = out["L"] if acc is None else acc + out["L"]
        state = na.update(state, out["neeat_hist"])
    return acc / spp, state, total_rays


def render(scene: SceneData, cam: Camera, cfg: PathTracerConfig,
           width: int, height: int, spp: int, first_sample: int = 0,
           want_aux: bool = False):
    """Progressive accumulation over `spp` samples (AccumulationPass analog,
    reference ProcessingPasses/AccumulationPass.*: weight = 1/(N+1)).

    Returns (hdr [H,W,3], aux dict, total_ray_count)."""
    acc = None
    aux_acc = {}
    total_rays = 0
    for s in range(first_sample, first_sample + spp):
        out = render_sample_jit(scene, cam, cfg, width, height,
                                jnp.uint32(s), want_aux)
        total_rays += int(out["ray_count"])
        acc = out["L"] if acc is None else acc + out["L"]
        if want_aux:
            for k in ("albedo", "normal", "depth", "wpos", "emission"):
                aux_acc[k] = out[k] if k not in aux_acc else aux_acc[k] + out[k]
    hdr = acc / spp
    aux = {k: v / spp for k, v in aux_acc.items()}
    return hdr, aux, total_rays
