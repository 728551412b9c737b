"""ReLAX-class spatiotemporal denoiser (SVGF-family), pure JAX.

TPU-native replacement for the NRD integration (reference: Rtxpt/NRD/*
wrapping RELAX_DIFFUSE_SPECULAR / REBLUR graphs, Sample.cpp:2561-2618
Denoise: per stable plane prepare-inputs -> denoiser -> merge). The filter
family here follows the public SVGF/ReLAX structure:

  1. temporal accumulation with reprojection + disocclusion rejection
     (depth/normal consistency), exponential moving average, moment
     history for variance,
  2. variance-guided edge-aware a-trous wavelet iterations with
     normal/depth/luminance stopping weights,
  3. albedo (de)modulation happens in the caller (pt aux buffers).

Everything is [H,W,...] image-space math — elementwise + static shifts —
which XLA fuses well on the VPU. No reference code consulted; algorithm per
Schied et al. 2017 (SVGF) and the public ReLAX presentation.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rtxpt_tpu.utils import math as m


class DenoiserState(NamedTuple):
    color: jnp.ndarray      # [H,W,3] accumulated illumination
    moments: jnp.ndarray    # [H,W,2] first/second luminance moments
    depth: jnp.ndarray      # [H,W]
    normal: jnp.ndarray     # [H,W,3]
    history_len: jnp.ndarray  # [H,W] frames accumulated


def init_state(height: int, width: int) -> DenoiserState:
    return DenoiserState(
        color=jnp.zeros((height, width, 3), jnp.float32),
        moments=jnp.zeros((height, width, 2), jnp.float32),
        depth=jnp.zeros((height, width), jnp.float32),
        normal=jnp.zeros((height, width, 3), jnp.float32),
        history_len=jnp.zeros((height, width), jnp.float32),
    )


def _bilinear_sample(img, y, x):
    """Bilinear fetch of img [H,W,C] at float coords (y,x) [H,W]."""
    h, w = img.shape[:2]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = (y - y0)[..., None]
    fx = (x - x0)[..., None]

    def at(yy, xx):
        yy = jnp.clip(yy.astype(jnp.int32), 0, h - 1)
        xx = jnp.clip(xx.astype(jnp.int32), 0, w - 1)
        return img[yy, xx]

    c00 = at(y0, x0)
    c01 = at(y0, x0 + 1)
    c10 = at(y0 + 1, x0)
    c11 = at(y0 + 1, x0 + 1)
    return ((c00 * (1 - fx) + c01 * fx) * (1 - fy)
            + (c10 * (1 - fx) + c11 * fx) * fy)


def temporal_accumulate(radiance, depth, normal, motion,
                        state: DenoiserState,
                        max_history: float = 32.0,
                        depth_tol: float = 0.05,
                        normal_tol: float = 0.8):
    """Reproject history by `motion` [H,W,2] (pixels, prev = cur + motion)
    and blend. Returns (illum, moments, history_len, new_state)."""
    h, w = depth.shape
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] + motion[..., 1]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] + motion[..., 0]

    prev_color = _bilinear_sample(state.color, yy, xx)
    prev_moments = _bilinear_sample(state.moments, yy, xx)
    prev_depth = _bilinear_sample(state.depth[..., None], yy, xx)[..., 0]
    prev_normal = _bilinear_sample(state.normal, yy, xx)
    prev_hist = _bilinear_sample(state.history_len[..., None], yy, xx)[..., 0]

    inside = ((yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1))
    depth_ok = jnp.abs(prev_depth - depth) <= depth_tol * jnp.maximum(
        depth, 1e-3)
    normal_ok = jnp.sum(prev_normal * normal, -1) >= normal_tol
    valid = inside & depth_ok & normal_ok & (depth > 0.0)

    hist = jnp.where(valid, jnp.minimum(prev_hist + 1.0, max_history), 1.0)
    alpha = 1.0 / hist

    lum = m.luminance(radiance)
    new_moments = jnp.stack([lum, lum * lum], -1)
    illum = (1.0 - alpha[..., None]) * jnp.where(valid[..., None],
                                                 prev_color, 0.0) \
        + alpha[..., None] * radiance
    moments = (1.0 - alpha[..., None]) * jnp.where(valid[..., None],
                                                   prev_moments, 0.0) \
        + alpha[..., None] * new_moments

    new_state = DenoiserState(color=illum, moments=moments, depth=depth,
                              normal=normal, history_len=hist)
    return illum, moments, hist, new_state


def _shift2d(x, dy: int, dx: int, row_bounds=None):
    """Shift with edge clamp (static offsets). `row_bounds=(lo, hi)`
    overrides the row-clamp window — the sharded denoiser
    (parallel/realtime_sharded.py) runs on halo-extended row blocks and
    passes the GLOBAL image window so every iteration clamps exactly
    where the unsharded filter would."""
    h, w = x.shape[:2]
    lo, hi = (0, h - 1) if row_bounds is None else row_bounds
    ys = jnp.clip(jnp.arange(h) + dy, lo, hi)
    xs = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return x[ys][:, xs]


_ATROUS_W = [1.0 / 16, 1.0 / 4, 3.0 / 8, 1.0 / 4, 1.0 / 16]


def estimate_variance(moments, hist, illum, depth, row_bounds=None):
    """Temporal variance; falls back to a 3x3 spatial estimate for young
    pixels (SVGF section 4.2)."""
    var_t = jnp.maximum(moments[..., 1] - moments[..., 0] ** 2, 0.0)
    lum = m.luminance(illum)
    s1 = jnp.zeros_like(lum)
    s2 = jnp.zeros_like(lum)
    cnt = 0.0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            l = _shift2d(lum, dy, dx, row_bounds)
            s1 += l
            s2 += l * l
            cnt += 1.0
    var_s = jnp.maximum(s2 / cnt - (s1 / cnt) ** 2, 0.0)
    return jnp.where(hist >= 4.0, var_t, var_s)


def atrous_iteration(illum, variance, normal, depth, step: int,
                     sigma_z: float = 1.0, sigma_n: float = 128.0,
                     sigma_l: float = 4.0, row_bounds=None):
    """One edge-aware a-trous sweep with dilation 2^step (5x5 taps)."""
    lum = m.luminance(illum)
    # 3x3 gaussian prefilter of variance for the luminance weight (SVGF)
    gvar = jnp.zeros_like(variance)
    gw = 0.0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            wgt = [[1, 2, 1], [2, 4, 2], [1, 2, 1]][dy + 1][dx + 1] / 16.0
            gvar = gvar + wgt * _shift2d(variance, dy, dx, row_bounds)
            gw += wgt
    gvar = gvar / gw
    denom_l = sigma_l * jnp.sqrt(jnp.maximum(gvar, 1e-10)) + 1e-6

    # depth gradient for adaptive depth weight
    dzdx = (_shift2d(depth, 0, 1, row_bounds)
            - _shift2d(depth, 0, -1, row_bounds)) * 0.5
    dzdy = (_shift2d(depth, 1, 0, row_bounds)
            - _shift2d(depth, -1, 0, row_bounds)) * 0.5

    dil = 1 << step
    sum_c = jnp.zeros_like(illum)
    sum_v = jnp.zeros_like(variance)
    sum_w = jnp.zeros_like(variance)
    for iy, wy in enumerate(_ATROUS_W):
        for ix, wx in enumerate(_ATROUS_W):
            dy = (iy - 2) * dil
            dx = (ix - 2) * dil
            h_k = wy * wx
            c_q = _shift2d(illum, dy, dx, row_bounds)
            v_q = _shift2d(variance, dy, dx, row_bounds)
            l_q = _shift2d(lum, dy, dx, row_bounds)
            n_q = _shift2d(normal, dy, dx, row_bounds)
            z_q = _shift2d(depth, dy, dx, row_bounds)

            w_n = jnp.power(jnp.maximum(jnp.sum(normal * n_q, -1), 0.0),
                            sigma_n)
            z_grad = jnp.abs(dzdx * dx + dzdy * dy) + 1e-6
            w_z = jnp.exp(-jnp.abs(depth - z_q) / (sigma_z * z_grad))
            w_l = jnp.exp(-jnp.abs(lum - l_q) / denom_l)
            w = h_k * w_n * w_z * w_l
            # keep center tap stable
            if dy == 0 and dx == 0:
                w = jnp.maximum(w, h_k)
            sum_c = sum_c + w[..., None] * c_q
            sum_v = sum_v + w * w * v_q
            sum_w = sum_w + w
    inv = 1.0 / jnp.maximum(sum_w, 1e-8)
    return sum_c * inv[..., None], sum_v * inv * inv


def denoise(radiance, albedo, normal, depth, motion,
            state: Optional[DenoiserState] = None,
            iterations: int = 4, row_bounds=None):
    """Full pipeline: demodulate albedo -> temporal -> a-trous -> remodulate.

    radiance/albedo [H,W,3], normal [H,W,3], depth [H,W], motion [H,W,2].
    Returns (denoised [H,W,3], new_state)."""
    h, w = depth.shape
    if state is None:
        state = init_state(h, w)
    safe_albedo = jnp.maximum(albedo, 1e-3)
    illum = radiance / safe_albedo

    illum, moments, hist, new_state = temporal_accumulate(
        illum, depth, normal, motion, state)
    variance = estimate_variance(moments, hist, illum, depth, row_bounds)

    out = illum
    for it in range(iterations):
        out, variance = atrous_iteration(out, variance, normal, depth, it,
                                         row_bounds=row_bounds)
        if it == 0:
            # feed the first filtered result back as the temporal color
            # history (ReLAX "fast history" style stabilization)
            new_state = new_state._replace(color=out)

    return out * safe_albedo, new_state


# ---------------------------------------------------------------------------
# REBLUR-class recurrent blur (second denoiser variant)
# ---------------------------------------------------------------------------

# Poisson-disk offsets (unit disk, 8 taps) for the recurrent blur
_POISSON8 = [
    (-0.4706069, -0.4427112), (-0.9057375, +0.3003471),
    (-0.3487388, +0.4037880), (+0.1023042, +0.9231500),
    (+0.3451990, -0.1186735), (+0.5337331, +0.3813070),
    (+0.8642891, -0.3302780), (+0.1564815, -0.8280689),
]


def _reblur_pass(illum, normal, depth, radius_px, base_rot: float,
                 row_bounds=None):
    """One rotated-Poisson-disk blur with dynamic per-pixel radius and
    normal/depth edge weights (the REBLUR 'blur/post-blur' shape)."""
    h, w = depth.shape
    lo, hi = (0, h - 1) if row_bounds is None else row_bounds
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1))
    ca, sa = jnp.cos(base_rot), jnp.sin(base_rot)

    sum_c = illum
    sum_w = jnp.ones_like(depth)
    for ox, oy in _POISSON8:
        dx = (ca * ox - sa * oy) * radius_px
        dy = (sa * ox + ca * oy) * radius_px
        sy = jnp.clip(yy + dy, lo * 1.0, hi * 1.0)
        sx = jnp.clip(xx + dx, 0.0, w - 1.0)
        c_q = _bilinear_sample(illum, sy, sx)
        n_q = _bilinear_sample(normal, sy, sx)
        z_q = _bilinear_sample(depth[..., None], sy, sx)[..., 0]
        w_n = jnp.power(jnp.maximum(jnp.sum(normal * n_q, -1), 0.0), 16.0)
        w_z = jnp.exp(-3.0 * jnp.abs(depth - z_q)
                      / jnp.maximum(depth, 1e-3))
        wgt = w_n * w_z
        sum_c = sum_c + wgt[..., None] * c_q
        sum_w = sum_w + wgt
    return sum_c / jnp.maximum(sum_w, 1e-6)[..., None]


def denoise_reblur(radiance, albedo, normal, depth, motion,
                   state: Optional[DenoiserState] = None,
                   base_radius: float = 16.0, row_bounds=None):
    """REBLUR-class recurrent blur (the second NRD denoiser variant,
    NrdConfig.cpp REBLUR graphs): temporal accumulation followed by two
    rotated-Poisson-disk blurs whose per-pixel radius SHRINKS with
    accumulated history (new/disoccluded pixels blur wide, converged
    pixels keep detail) — instead of ReLAX's variance-guided a-trous.
    Same contract as `denoise`."""
    h, w = depth.shape
    if state is None:
        state = init_state(h, w)
    safe_albedo = jnp.maximum(albedo, 1e-3)
    illum = radiance / safe_albedo

    illum, moments, hist, new_state = temporal_accumulate(
        illum, depth, normal, motion, state)

    # history-driven radius (REBLUR's accumulation-speed scaling)
    radius = base_radius / (1.0 + hist)
    out = _reblur_pass(illum, normal, depth, radius, 0.0, row_bounds)
    new_state = new_state._replace(color=out)      # recurrent feedback
    out = _reblur_pass(out, normal, depth, radius * 0.5, 0.7853982,
                       row_bounds)
    return out * safe_albedo, new_state
