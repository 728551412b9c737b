"""External NEE: XLA-side light selection/eval for the Pallas hot tiers.

The round-3 hot tiers refused NEE-AT, >128 lights and WRS K>1 because
the in-kernel light machinery is VMEM-table bound (128 columns) and the
NEE-AT per-tile state (32k tiles x up to 2k lights) can never live in
VMEM. This module is the TPU answer: the bounce kernel keeps the
expensive parts (intersect, surface+textures, scatter, RR) and EXPORTS
the shaded surface (bounce_pallas SF_* rows); light selection, candidate
WRS, MIS and the NEE-AT feedback/mixture run here in XLA on the flat
wavefront — the same code shapes as the XLA reference tier, so the two
paths stay in semantic lockstep. The shadow ray goes back to a Pallas
occlusion kernel.

Reference analog: LightSampler.hlsli SampleLocal/SampleGlobal read
host-baked per-tile buffers (LightsBaker.cpp:1331-1408 feedback chain);
splitting selection (memory-bound, table-driven) from shading
(compute-bound) mirrors that host/device split, TPU-style.

Memory: NEE-AT tile-CDF gathers materialize [lanes, L]; at 1080p that is
2M x 513 floats — far beyond HBM comfort in one op. The block therefore
runs as a lax.map over lane chunks (bounded working set, sequential in
one XLA while loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rtxpt_tpu.config import NEEMode
from rtxpt_tpu.lighting.lights_baker import sample_light
from rtxpt_tpu.pt import bsdf as B
from rtxpt_tpu.pt.bounce_pallas import (
    EFFECT_NEE, SF_BASE, SF_EMIT, SF_ETA, SF_GN, SF_LID, SF_METAL, SF_MID,
    SF_PGEO, SF_POS, SF_ROUGH, SF_SHN, SF_THP)
from rtxpt_tpu.pt.surface import ray_offset
from rtxpt_tpu.utils import math as m
from rtxpt_tpu.utils import rng


def _chunk_size(npad: int) -> int:
    """Largest divisor of npad/1024 that is <= 64 groups, in lanes
    (bounds the [lanes, n_lights] gather working set to ~64k x L)."""
    groups = max(npad // 1024, 1)
    best = 1
    for c in range(1, 65):
        if groups % c == 0:
            best = c
    return best * 1024


def _rebuild_bsdf(scene, surf_c):
    """BSDFData from kernel-exported (textured) surface rows — same
    construction as pt/bsdf.make_bsdf_data / wide.make_bsdf_w, with eta
    already resolved by the kernel's interior list."""
    mats = scene.materials
    n_mats = len(jnp.asarray(mats.base_color))
    mid = jnp.clip(surf_c[SF_MID].astype(jnp.int32), 0, n_mats - 1)
    base = surf_c[SF_BASE:SF_BASE + 3].T                   # [CH,3]
    metal = surf_c[SF_METAL]
    rough = surf_c[SF_ROUGH]
    spec_scale = jnp.take(mats.specular_f0_scale, mid)
    trans = jnp.take(mats.transmission, mid)
    dtrans = jnp.take(mats.diffuse_transmission, mid)
    f0_dielec = (0.08 * spec_scale * (1.0 - metal))[..., None]
    specular_f0 = f0_dielec + base * metal[..., None]
    diffuse = base * (1.0 - metal[..., None])
    alpha = jnp.clip(rough * rough, 0.0, 1.0)
    return B.BSDFData(
        diffuse=diffuse, specular_f0=specular_f0, alpha=alpha,
        transmission=trans * (1.0 - metal),
        diffuse_transmission=dtrans * (1.0 - metal),
        eta=surf_c[SF_ETA],
        transmission_color=jnp.ones_like(diffuse))


def external_nee(scene, cfg, neeat_state, surf, d_in, hit_mask,
                 prev_pdf_in, prev_delta_in, px, py, sample_idx, bounce,
                 first_emissive: bool = True, first_spec=None,
                 lb=None, first_direct: bool = True):
    """NEE selection + eval + MIS for a kernel-exported wavefront.

    surf [SF_ROWS, npad] f32 (bounce_pallas SF_*); d_in [3, npad]
    incident ray directions; hit_mask [npad] bool; prev_pdf_in /
    prev_delta_in [npad]: incoming-ray MIS state (for the emissive MIS
    the kernel deferred in NEE-AT mode); px/py [npad] i32.

    Returns dict(em_add [npad,3], shadow_o [npad,3], shadow_d [npad,3],
    sdist [npad], contrib [npad,3] (already masked by do_nee),
    do_nee [npad] bool, li [npad] i32, tile [npad] i32). The caller
    resolves occlusion with a Pallas kernel, adds contrib * ~occ, and
    feeds (tile, li, luminance, ok) to neeat.accumulate_feedback.
    """
    from rtxpt_tpu.lighting import neeat as na

    npad = surf.shape[1]
    ch = _chunk_size(npad)
    nc = npad // ch
    f32 = jnp.float32
    use_neeat = cfg.nee == NEEMode.NEEAT and neeat_state is not None
    nee_uniform = cfg.nee == NEEMode.UNIFORM
    k_cand = max(int(cfg.nee_candidates), 1)
    split = first_spec is not None
    # per-lane LOGICAL bounce: with pass-through iterations on the Pallas
    # tiers the loop index over-counts; lb restores the per-lane bounce
    # semantics (and the per-vertex RNG keying) exactly as the XLA
    # retrace would see them (bounce_pallas IS_LBOUNCE). With lb given,
    # `bounce` may be a TRACED scalar (the clustered tier's scanned
    # bounce chain) — every bounce-static decision must then ride lb.
    per_lane_lb = lb is not None
    em_gate = bool(first_emissive) or per_lane_lb or bounce > 0

    def body(ops):
        if per_lane_lb:
            *ops, lb_c = ops
            lb0_c = lb_c == 0
        else:
            lb_c = None
            lb0_c = None
        if split:
            surf_c, d_c, hmask, ppdf, pdelta, px_c, py_c, fspec_c = ops
        else:
            surf_c, d_c, hmask, ppdf, pdelta, px_c, py_c = ops
        n = px_c.shape[0]
        pos = surf_c[SF_POS:SF_POS + 3].T
        sh_n = surf_c[SF_SHN:SF_SHN + 3].T
        gn = surf_c[SF_GN:SF_GN + 3].T
        thp = surf_c[SF_THP:SF_THP + 3].T
        bsdf = _rebuild_bsdf(scene, surf_c)
        wo = m.to_local(-d_c.T, sh_n)

        # --- deferred emissive MIS (NEE-AT mixture selection pmf) ---
        em3 = surf_c[SF_EMIT:SF_EMIT + 3].T
        lid = surf_c[SF_LID].astype(jnp.int32)
        p_geo = surf_c[SF_PGEO]
        if use_neeat and cfg.enable_mis:
            tile0 = na.tile_of(neeat_state, px_c, py_c)
            sel_mix = na.select_pdf(neeat_state, scene.lights, tile0,
                                    jnp.maximum(lid, 0))
            p_light = jnp.where(lid >= 0, sel_mix * p_geo, 0.0)
            lb0_w = lb0_c if lb0_c is not None else \
                jnp.full((n,), bounce == 0, bool)
            w_em = jnp.where(pdelta | lb0_w, 1.0,
                             m.power_heuristic(ppdf, p_light))
        else:
            w_em = jnp.ones((n,), f32)
        em_add = em3 * w_em[..., None] if em_gate else jnp.zeros_like(em3)
        if per_lane_lb and not first_emissive:
            # the em gate is per-lane: primary emission suppressed only
            # where the lane is genuinely at its first real surface
            em_add = jnp.where(lb0_c[:, None], 0.0, em3 * w_em[..., None])

        # --- candidate selection (integrator.py WRS semantics) ---
        seed_nee = rng.pixel_seed(
            px_c, py_c, lb_c if per_lane_lb else bounce, EFFECT_NEE)

        def lds(dims):
            if cfg.low_discrepancy:
                return rng.ld_samples(sample_idx, seed_nee, dims)
            return tuple(rng.uniform_sample(
                seed_nee, rng.hash_combine(sample_idx, dd)) for dd in dims)

        def _light_candidate(ci):
            base = 8 * ci
            u_sel, u1, u2, u_mix = lds(
                (base, base + 2, base + 3, base + 4))
            if use_neeat:
                lsc = na.sample_adaptive(neeat_state, scene.lights,
                                         scene.envmap, pos, px_c, py_c,
                                         u_mix, u_sel, u1, u2)
            else:
                lsc = dict(sample_light(scene.lights, scene.envmap, pos,
                                        u_sel, u1, u2,
                                        uniform=nee_uniform))
                lsc.setdefault("tile", jnp.zeros((n,), jnp.int32))
            wi_lc = m.to_local(lsc["wi"], sh_n)
            f_lc = B.bsdf_eval(bsdf, wo, wi_lc)
            return lsc, wi_lc, f_lc

        if k_cand == 1:
            ls, wi_l, f_l = _light_candidate(0)
            pdf_b = B.bsdf_pdf(bsdf, wo, wi_l)
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
                (u_acc,) = lds((8 * ci + 5,))
                if ls is None:
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
            eff = jnp.where(p_hat_sel > 1e-12,
                            k_cand * p_hat_sel
                            / jnp.maximum(w_sum, 1e-12), 0.0)
            ls = dict(ls)
            ls["pdf"] = ls["pdf"] * eff
            ls["valid"] = ls["valid"] & (eff > 0.0)
            pdf_b = B.bsdf_pdf(bsdf, wo, wi_l)

        do_nee = hmask & ls["valid"] & (m.luminance(f_l) > 0.0)
        if not first_direct:
            # primary direct light is shaded externally (ReSTIR DI —
            # integrator.py:405 gate, per-lane on the Pallas tiers)
            do_nee = do_nee & ((lb_c > 0) if per_lane_lb else
                               jnp.full((n,), bounce > 0, bool))
        shadow_o = ray_offset(pos, gn, ls["wi"])
        if cfg.enable_mis:
            w_nee = jnp.where(ls["is_delta"], 1.0,
                              m.power_heuristic(ls["pdf"], pdf_b))
        else:
            w_nee = jnp.ones((n,), f32)
        contrib = thp * f_l * ls["Li"] * (
            w_nee / jnp.maximum(ls["pdf"], 1e-12))[..., None]
        if cfg.firefly_clamp > 0.0:
            lum = m.luminance(contrib)
            contrib = contrib * jnp.minimum(
                1.0, cfg.firefly_clamp / jnp.maximum(lum, 1e-12)
            )[..., None]
        sdist_eff = ls["dist"] - m.dot(shadow_o - pos, ls["wi"], False)
        sdist = jnp.where(do_nee, sdist_eff * (1.0 - 1e-4), 0.0)
        li = ls.get("light_index", jnp.zeros((n,), jnp.int32))
        tile = ls.get("tile", jnp.zeros((n,), jnp.int32))
        if split:
            f_dp, _f_sp = B.bsdf_eval_split(bsdf, wo, wi_l)
            ratio = f_dp / jnp.maximum(f_l, 1e-12)
            if per_lane_lb:
                cdiff = jnp.where(lb0_c[:, None], contrib * ratio,
                                  jnp.where(fspec_c[:, None], 0.0,
                                            contrib))
            elif bounce == 0:
                cdiff = contrib * ratio
            else:
                cdiff = jnp.where(fspec_c[:, None], 0.0, contrib)
        else:
            cdiff = jnp.zeros_like(contrib)
        return (em_add, shadow_o, ls["wi"], sdist,
                jnp.where(do_nee[..., None], contrib, 0.0), do_nee,
                li.astype(jnp.int32), tile.astype(jnp.int32),
                jnp.where(do_nee[..., None], cdiff, 0.0))

    ops = (surf.reshape(-1, nc, ch).swapaxes(0, 1),
           d_in.reshape(3, nc, ch).swapaxes(0, 1),
           hit_mask.reshape(nc, ch),
           prev_pdf_in.reshape(nc, ch),
           prev_delta_in.reshape(nc, ch),
           px.reshape(nc, ch), py.reshape(nc, ch))
    if split:
        ops = ops + (first_spec.reshape(nc, ch),)
    if per_lane_lb:
        ops = ops + (lb.reshape(nc, ch),)
    if nc == 1:
        outs = jax.tree.map(lambda x: x[None],
                            body(jax.tree.map(lambda x: x[0], ops)))
    else:
        outs = jax.lax.map(body, ops)
    (em_add, shadow_o, shadow_d, sdist, contrib, do_nee, li, tile,
     cdiff) = outs

    def flat(x):
        return x.reshape((npad,) + x.shape[2:])

    return dict(em_add=flat(em_add), shadow_o=flat(shadow_o),
                shadow_d=flat(shadow_d), sdist=flat(sdist),
                contrib=flat(contrib), do_nee=flat(do_nee),
                li=flat(li), tile=flat(tile), cdiff=flat(cdiff))
