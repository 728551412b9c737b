"""NEE-AT: feedback-adaptive per-tile light importance sampling.

TPU re-design of the reference's NEE-AT pipeline (reference: Lighting/
LightsBaker.{h,cpp} + LightsBaker.hlsl — per-8x8-tile local sampling
buffers built from reprojected temporal feedback, defensively mixed with
the global power-proportional sampler; LightSampler.hlsli SampleLocal/
SampleGlobal; LightingConfig.h:28-31 tile size 8, 128 local proxies).

TPU-first shape: instead of proxy arrays + GPU sort jobs, each screen tile
keeps an EMA luminance histogram over the (bounded) light list —
a dense [n_tiles, n_lights] array updated by one scatter-add per frame and
turned into per-tile CDFs. Sampling defensively mixes the tile CDF with
the global power CDF (mix weight ALPHA_GLOBAL) so unseen lights stay
reachable and the estimator stays unbiased (pdf is the exact mixture).
The 512k-light proxy/compression tier of the reference maps to a future
top-K compaction of the same histogram.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from rtxpt_tpu.lighting.envmap import EnvMap
from rtxpt_tpu.lighting.lights_baker import LightList, sample_light
from rtxpt_tpu.utils import rng

TILE = 8                 # pixels per tile side (LightingConfig.h:28)
ALPHA_GLOBAL = 0.5       # defensive mixture weight for the global sampler
EMA = 0.9                # temporal feedback smoothing
MAX_DENSE_LIGHTS = 2048  # dense-histogram capacity


@struct.dataclass
class NEEATState:
    tile_pdf: jnp.ndarray    # [T, L] per-tile selection pmf (normalized)
    tile_cdf: jnp.ndarray    # [T, L] inclusive CDF of tile_pdf
    ema: jnp.ndarray         # [T, L] raw EMA histogram
    n_tiles_x: int = struct.field(pytree_node=False, default=0)
    n_tiles_y: int = struct.field(pytree_node=False, default=0)


def init_state(width: int, height: int, n_lights: int) -> NEEATState:
    ntx = (width + TILE - 1) // TILE
    nty = (height + TILE - 1) // TILE
    t = ntx * nty
    uniform = jnp.full((t, n_lights), 1.0 / n_lights, jnp.float32)
    return NEEATState(tile_pdf=uniform, tile_cdf=jnp.cumsum(uniform, -1),
                      ema=jnp.zeros((t, n_lights), jnp.float32),
                      n_tiles_x=ntx, n_tiles_y=nty)


def tile_of(state: NEEATState, px, py):
    tx = jnp.clip(px // TILE, 0, state.n_tiles_x - 1)
    ty = jnp.clip(py // TILE, 0, state.n_tiles_y - 1)
    return ty * state.n_tiles_x + tx


def select_pdf(state: NEEATState, lights: LightList, tile, li):
    """Mixture selection pmf for light `li` at tile `tile` (for MIS)."""
    local = state.tile_pdf[tile, li]
    global_ = jnp.take(lights.power, li)
    return ALPHA_GLOBAL * global_ + (1.0 - ALPHA_GLOBAL) * local


def sample_adaptive(state: NEEATState, lights: LightList, envmap: EnvMap,
                    shade_pos, px, py, u_mix, u_sel, u1, u2):
    """NEE-AT light sample: defensive mixture of tile CDF and power CDF.

    Same contract as lights_baker.sample_light; pdf is the exact mixture
    pmf (solid-angle converted per kind inside)."""
    tile = tile_of(state, px, py)
    use_global = u_mix < ALPHA_GLOBAL

    # global branch
    gs = sample_light(lights, envmap, shade_pos, u_sel, u1, u2)

    # local branch: searchsorted per row of the tile CDF
    cdf_rows = jnp.take(state.tile_cdf, tile, axis=0)       # [N, L]
    u = jnp.clip(u_sel, 0.0, 1.0 - 1e-7)
    li_local = jnp.clip(
        jnp.sum((cdf_rows < u[..., None]).astype(jnp.int32), axis=-1),
        0, lights.count - 1).astype(jnp.int32)

    li = jnp.where(use_global, gs["light_index"], li_local)
    # Re-evaluate the chosen light deterministically (index + uv) so both
    # branches share one shading path.
    from rtxpt_tpu.pt.restir import eval_light_sample
    wi, dist, Li, src_pdf = eval_light_sample(lights, envmap, li,
                                              jnp.stack([u1, u2], -1),
                                              shade_pos)
    # mixture selection pmf -> full pdf: scale the per-kind solid-angle
    # jacobian which eval_light_sample folded in for sel_pdf = power[li].
    sel_global = jnp.take(lights.power, li)
    sel_mix = select_pdf(state, lights, tile, li)
    pdf = src_pdf * sel_mix / jnp.maximum(sel_global, 1e-12)

    kind = jnp.take(lights.kind, li)
    from rtxpt_tpu.lighting.lights_baker import (
        KIND_DIRECTIONAL, KIND_POINT, KIND_SPOT)
    is_delta = (kind == KIND_POINT) | (kind == KIND_SPOT) \
        | (kind == KIND_DIRECTIONAL)
    valid = (pdf > 1e-12) & (jnp.max(jnp.abs(Li), -1) >= 0.0)
    return dict(wi=wi, dist=dist, Li=Li, pdf=pdf, is_delta=is_delta,
                valid=valid, light_index=li, tile=tile)


def accumulate_feedback(state: NEEATState, tile, li, weight, valid):
    """Scatter contribution luminance into the tile histogram (the analog
    of the reference's NEE-AT feedback buffer writes + ProcessFeedback
    passes, LightsBaker.cpp:1331-1408)."""
    t, l = state.ema.shape
    w = jnp.where(valid, weight, 0.0)
    hist = jnp.zeros((t, l), jnp.float32).at[tile, li].add(w)
    return hist


def update(state: NEEATState, frame_hist: jnp.ndarray) -> NEEATState:
    """Temporal EMA + per-tile CDF rebuild (UpdateEnd analog)."""
    ema = state.ema * EMA + frame_hist * (1.0 - EMA)
    total = jnp.sum(ema, -1, keepdims=True)
    l = ema.shape[-1]
    pdf = jnp.where(total > 1e-9, ema / jnp.maximum(total, 1e-9),
                    jnp.full_like(ema, 1.0 / l))
    cdf = jnp.cumsum(pdf, -1)
    cdf = cdf / jnp.maximum(cdf[..., -1:], 1e-9)
    return NEEATState(tile_pdf=pdf, tile_cdf=cdf, ema=ema,
                      n_tiles_x=state.n_tiles_x, n_tiles_y=state.n_tiles_y)
