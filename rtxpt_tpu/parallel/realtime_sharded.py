"""Sharded real-time frame over a device mesh (ICI-resident pipeline).

The reference's real-time frame is a single-GPU pass chain
(Sample.cpp:2438-2639: PathTrace -> denoise -> TAA -> bloom -> tonemap).
Its TPU-native scaling axis is pixel-row tiles over the mesh (SURVEY.md
§2.6: "tile+sample sharding over ICI ... first-class component"):

  * trace + guide buffers: embarrassingly parallel over pixels — GSPMD
    over row-sharded pixel arrays; the scene is replicated; XLA inserts
    the NEE-AT feedback-histogram psum from the replicated out-sharding
    (the cross-device analog of the LightsBaker feedback accumulation,
    LightsBaker.cpp:1331-1408).
  * denoiser / TAA / bloom: row-stencil + bounded-motion gathers — run
    under `jax.shard_map` on row blocks extended by an exchanged halo
    (`ppermute` chains to the neighbours), computed once per frame. The
    halo covers the full receptive field of the ReLAX/REBLUR pipeline,
    so the sharded result is BIT-EXACT vs the single-device denoiser
    whenever |motion_y| <= motion_clamp (temporal reuse across rows is
    bounded — the tile-local-reuse tradeoff every tiled denoiser makes).
  * tonemap autoexposure: a global 256-bin log-luminance histogram —
    left to GSPMD, which lowers the reduction to a psum.

Receptive field of render/denoise.py (4 a-trous iterations):
  temporal bilinear gather  <= motion_clamp + 1
  variance 3x3 estimate      = 1
  a-trous it k: 5x5 taps at dilation 2^k (+-2*2^k) + 3x3 variance
  prefilter (+-1)            = sum_k (2*2^k + 1) = 34 for k=0..3
  -> 35 + motion_clamp + 1; REBLUR variant (two Poisson passes of
  radius <=16 px + bilinear) is smaller. HALO = 56 covers both at the
  default motion_clamp = 16.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rtxpt_tpu.config import DenoiserMode, PathTracerConfig, RenderConfig
from rtxpt_tpu.pt.integrator import EFFECT_LENS, _lds, _pixel_grid, trace_paths
from rtxpt_tpu.pt.realtime import RealtimeState, motion_vectors
from rtxpt_tpu.render import denoise as dn
from rtxpt_tpu.render.postprocess import tonemap
from rtxpt_tpu.render.taa import bloom
from rtxpt_tpu.scene.camera import camera_ray
from rtxpt_tpu.utils import rng

HALO = 56            # rows exchanged each side; see module docstring
MOTION_CLAMP = 16.0  # max |motion_y| rows of cross-row temporal reuse


# ---------------------------------------------------------------------------
# Halo exchange
# ---------------------------------------------------------------------------


def _from_prev(x, axis: str, n_dev: int):
    """Each device receives the previous device's block (zeros on dev 0)."""
    return jax.lax.ppermute(x, axis, [(i, i + 1) for i in range(n_dev - 1)])


def _from_next(x, axis: str, n_dev: int):
    return jax.lax.ppermute(x, axis, [(i + 1, i) for i in range(n_dev - 1)])


def _halo_pad(x, halo: int, axis: str, n_dev: int, height: int,
              fill=None):
    """Extend a row block [hb, ...] to [hb + 2*halo, ...] with neighbour
    rows fetched over ICI (`ppermute` chains; ceil(halo/hb) hops each way).

    Rows that fall outside the global image are edge-clamped (fill=None;
    matching `_shift2d`'s clamp semantics so the sharded stencils equal
    the unsharded ones) or set to `fill` (history poisoning: a depth fill
    of -1e9 makes the denoiser's depth-consistency test reject the
    reprojection exactly where the unsharded `inside` test would)."""
    hb = x.shape[0]
    if n_dev == 1:
        ext = x
        ext_lo = 0
        k = 0
    else:
        k = -(-halo // hb)           # neighbour blocks needed per side
        above = []
        cur = x
        for _ in range(k):
            cur = _from_prev(cur, axis, n_dev)
            above.insert(0, cur)
        below = []
        cur = x
        for _ in range(k):
            cur = _from_next(cur, axis, n_dev)
            below.append(cur)
        ext = jnp.concatenate(above + [x] + below, axis=0)
        ext_lo = -k * hb             # ext[0] is my_start + ext_lo
    my_start = jax.lax.axis_index(axis) * hb if n_dev > 1 else 0
    # global row of each padded output row
    g = jnp.arange(-halo, hb + halo, dtype=jnp.int32) + my_start
    inside = (g >= 0) & (g < height)
    idx = jnp.clip(g, 0, height - 1) - (my_start + ext_lo)
    idx = jnp.clip(idx, 0, ext.shape[0] - 1)
    out = jnp.take(ext, idx, axis=0)
    if fill is not None:
        shape = (1,) * (out.ndim - 1)
        out = jnp.where(inside.reshape(-1, *shape), out,
                        jnp.asarray(fill, out.dtype))
    return out


# ---------------------------------------------------------------------------
# Sharded pass bodies (inside shard_map; arrays are [hb, W, ...] blocks)
# ---------------------------------------------------------------------------


def _denoise_block(radiance, albedo, normal, depth, motion, dstate,
                   axis: str, n_dev: int, height: int, reblur: bool):
    """Full-fidelity denoise of one row block: pad every input by HALO,
    run the unmodified single-device pipeline, slice the centre. Exact vs
    unsharded for |motion_y| <= MOTION_CLAMP (see module docstring)."""
    pad = partial(_halo_pad, halo=HALO, axis=axis, n_dev=n_dev,
                  height=height)
    motion = jnp.concatenate(
        [motion[..., :1],
         jnp.clip(motion[..., 1:], -MOTION_CLAMP, MOTION_CLAMP)], -1)
    state_p = dn.DenoiserState(
        color=pad(dstate.color, fill=0.0),
        moments=pad(dstate.moments, fill=0.0),
        depth=pad(dstate.depth, fill=-1e9),   # poison -> disocclusion
        normal=pad(dstate.normal, fill=0.0),
        history_len=pad(dstate.history_len, fill=0.0))
    # clamp window of the GLOBAL image in padded-block coordinates: the
    # iterated stencils must edge-clamp at the true frame border, not at
    # the halo border (replicate-pad diverges from per-iteration clamp
    # from the 2nd a-trous sweep on)
    my_start = (jax.lax.axis_index(axis) * radiance.shape[0]
                if n_dev > 1 else 0)
    bounds = (HALO - my_start, HALO - my_start + height - 1)
    fn = dn.denoise_reblur if reblur else dn.denoise
    den_p, ns_p = fn(pad(radiance), pad(albedo), pad(normal), pad(depth),
                     pad(motion), state_p, row_bounds=bounds)
    sl = lambda a: a[HALO:-HALO]
    return sl(den_p), jax.tree.map(sl, ns_p)


def _taa_block(color, motion, hist, axis: str, n_dev: int, height: int,
               alpha: float = 0.1):
    """TAA resolve on a row block: history gather through a halo pad; the
    `inside` validity test runs on GLOBAL coordinates so frame-edge
    fallback matches render/taa.py exactly."""
    hb, w = color.shape[:2]
    halo = int(MOTION_CLAMP) + 2
    pad = partial(_halo_pad, halo=halo, axis=axis, n_dev=n_dev,
                  height=height)
    my_start = jax.lax.axis_index(axis) * hb if n_dev > 1 else 0
    m_y = jnp.clip(motion[..., 1], -MOTION_CLAMP, MOTION_CLAMP)
    yy_l = jnp.arange(hb, dtype=jnp.float32)[:, None] + m_y
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] + motion[..., 0]
    yy_g = yy_l + my_start
    prev = dn._bilinear_sample(pad(hist, fill=0.0), yy_l + halo, xx)

    cp = pad(color)     # edge-clamped 3x3 neighbourhood bounds
    cmin = cp
    cmax = cp
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nb = dn._shift2d(cp, dy, dx)
            cmin = jnp.minimum(cmin, nb)
            cmax = jnp.maximum(cmax, nb)
    prev = jnp.clip(prev, cmin[halo:-halo], cmax[halo:-halo])
    inside = ((yy_g >= 0) & (yy_g <= height - 1)
              & (xx >= 0) & (xx <= w - 1))
    a = jnp.where(inside, alpha, 1.0)[..., None]
    out = prev * (1.0 - a) + color * a
    return out, out


def _bloom_block(hdr, axis: str, n_dev: int, height: int):
    halo = 16                              # blur reach: radius 7 * 2 + 2
    p = _halo_pad(hdr, halo, axis, n_dev, height)
    return bloom(p)[halo:-halo]


# ---------------------------------------------------------------------------
# Frame driver
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "width", "height", "axis",
                                   "n_dev", "mesh", "denoiser", "split",
                                   "enable_taa", "enable_bloom",
                                   "tonemap_curve", "exposure"))
def _frame_impl(scene, cam, prev_cam, cfg, px, py, sidx, dstate,
                dstate_spec, taa_hist, neeat_state, width, height, axis,
                n_dev, mesh, denoiser, split, enable_taa, enable_bloom,
                tonemap_curve, exposure):
    # ---- trace (GSPMD over the row-sharded pixel arrays) ----
    seed_lens = rng.pixel_seed(px, py, 0, EFFECT_LENS)
    u1, u2 = _lds(cfg, sidx, seed_lens, (0, 1))
    o, d, spread = camera_ray(cam, px, py, u1, u2)
    out = trace_paths(scene, cfg, o, d, spread, px, py, sidx,
                      want_aux=True, neeat_state=neeat_state)
    img = {k: v.reshape(height, width, *v.shape[1:])
           for k, v in out.items()
           if hasattr(v, "ndim") and v.ndim >= 1
           and v.shape[0] == px.shape[0]}
    shard2d = NamedSharding(mesh, P(axis))
    img = {k: jax.lax.with_sharding_constraint(v, shard2d)
           for k, v in img.items()}

    motion = motion_vectors(prev_cam, img["wpos"], img["depth"],
                            width, height)

    # ---- NEE-AT feedback (histogram accumulation psum'd by GSPMD) ----
    new_neeat = neeat_state
    if neeat_state is not None and "neeat_hist" in out:
        from rtxpt_tpu.lighting import neeat as na
        new_neeat = na.update(neeat_state, out["neeat_hist"],
                              motion=motion)

    # ---- denoise (+TAA, +bloom) on row blocks with halo exchange ----
    smap = partial(jax.shard_map, mesh=mesh,
                   in_specs=P(axis), out_specs=P(axis))
    reblur = denoiser == DenoiserMode.REBLUR

    if denoiser != DenoiserMode.NONE and split:
        def body(ld, ad, ls, as_, nrm, dep, mot, ds, ss):
            dd, nds = _denoise_block(ld, ad, nrm, dep, mot, ds,
                                     axis, n_dev, height, reblur)
            sd_, nss = _denoise_block(ls, as_, nrm, dep, mot, ss,
                                      axis, n_dev, height, reblur)
            return dd, sd_, nds, nss
        den_d, den_s, ndstate, nsstate = smap(body)(
            img["L_diff"], img["albedo_diff"], img["L_spec"],
            img["albedo_spec"], img["normal"], img["depth"], motion,
            dstate, dstate_spec)
        hdr = den_d + den_s + img["emission"]
    elif denoiser != DenoiserMode.NONE:
        def body(rad, alb, nrm, dep, mot, ds):
            return _denoise_block(rad, alb, nrm, dep, mot, ds,
                                  axis, n_dev, height, reblur)
        den, ndstate = smap(body)(
            img["L"] - img["emission"], img["albedo"], img["normal"],
            img["depth"], motion, dstate)
        hdr = den + img["emission"]
        nsstate = dstate_spec
    else:
        hdr, ndstate, nsstate = img["L"], dstate, dstate_spec

    if enable_taa:
        if taa_hist is None:
            new_taa = hdr
        else:
            hdr, new_taa = smap(
                lambda c, m, hh: _taa_block(c, m, hh, axis, n_dev, height)
            )(hdr, motion, taa_hist)
    else:
        new_taa = taa_hist

    if enable_bloom:
        hdr = smap(lambda x: _bloom_block(x, axis, n_dev, height))(hdr)

    # autoexposure histogram: a global reduction GSPMD lowers to a psum
    disp = tonemap(hdr, exposure, tonemap_curve)
    return disp, hdr, ndstate, nsstate, new_taa, new_neeat, \
        out.get("ray_count", jnp.int32(0))


def init_state_sharded(height: int, width: int, mesh: Mesh,
                       scene=None, pt_cfg=None) -> RealtimeState:
    """RealtimeState with row-sharded image buffers (NEE-AT state
    replicated — its tables are per-light, not per-pixel)."""
    from rtxpt_tpu.pt.realtime import init_state
    axis = mesh.axis_names[0]
    st = init_state(height, width, scene=scene, pt_cfg=pt_cfg)
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    put = lambda t: jax.tree.map(lambda a: jax.device_put(a, shard), t)
    return st._replace(
        denoiser=put(st.denoiser),
        denoiser_p1=put(st.denoiser_p1),
        denoiser_p2=put(st.denoiser_p2),
        denoiser_spec=put(st.denoiser_spec),
        neeat=(jax.device_put(st.neeat, repl)
               if st.neeat is not None else None))


def render_frame_sharded(scene, cam, pt_cfg: PathTracerConfig,
                         rc: RenderConfig, state: RealtimeState,
                         mesh: Mesh):
    """One real-time frame sharded over `mesh` (render_scale==1 path).
    Same contract as pt/realtime.render_frame: (display, hdr, state)."""
    from rtxpt_tpu.pt.dispatch import resolve

    h, w = rc.height, rc.width
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if h % n_dev != 0:
        raise ValueError(f"height {h} must divide the {n_dev}-device mesh")
    split = rc.split_denoise and rc.denoiser != DenoiserMode.NONE
    if split and not pt_cfg.split_channels:
        pt_cfg = dataclasses.replace(pt_cfg, split_channels=True)
    cfg = resolve(scene, pt_cfg, state.neeat)

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    px, py = _pixel_grid(w, h)
    px = jax.device_put(px, shard)
    py = jax.device_put(py, shard)
    scene = jax.device_put(scene, repl)
    cam_d = jax.device_put(cam, repl)
    prev = state.prev_camera
    prev_d = jax.device_put(prev, repl) if prev is not None else None

    disp, hdr, nds, nss, ntaa, nneeat, rays = _frame_impl(
        scene, cam_d, prev_d, cfg, px, py,
        jnp.uint32(state.frame_index), state.denoiser,
        state.denoiser_spec, state.taa_history, state.neeat,
        w, h, axis, n_dev, mesh, rc.denoiser, split, rc.enable_taa,
        rc.enable_bloom, rc.tonemap, rc.exposure)

    new_state = state._replace(
        denoiser=nds, denoiser_spec=nss, taa_history=ntaa,
        prev_camera=cam, frame_index=state.frame_index + 1,
        neeat=nneeat)
    return disp, hdr, new_state
