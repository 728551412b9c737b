"""Frame generation: motion-vector frame interpolation (DLSS-FG analog).

The reference exposes DLSS Frame Generation / Multi-Frame Generation
through Streamline (reference: README.md DLSS-FG/MFG rows, Sample.cpp
Streamline feature wiring) — an optical-flow network synthesizes frames
between rendered ones. The TPU-native redesign needs no flow network:
the renderer already produces EXACT per-pixel motion vectors
(pt/realtime.motion_vectors, prev = cur + motion), so an intermediate
frame at t in (0,1) is a pair of bilinear warps along the known motion
and a disocclusion-aware blend — pure elementwise + gather math that XLA
fuses into a couple of kernels.

Geometry: a scene point visible at pixel x_c in the current frame was at
x_p = x_c + m(x_c) in the previous frame; linear motion puts it at
x(t) = x_c + (1 - t) * m at time t (t=0 -> previous, t=1 -> current).
For an output pixel x of the generated frame:
  * current-frame contribution: sample cur at x - (1 - t) * m(x)
  * previous-frame contribution: sample prev at x + t * m(x)
using m(x) as the motion of whichever point crosses x at time t (the
small-motion approximation every MV-based interpolator makes).
Disocclusions (the two warps disagree) fall back to the nearer-in-time
frame, clamped to the other warp's 3x3 neighborhood — the same
variance-bounding trick as TAA history clamping (render/taa.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from rtxpt_tpu.render.denoise import _bilinear_sample, _shift2d


def _warp(img, motion, scale):
    h, w = img.shape[:2]
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] \
        + motion[..., 1] * scale
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] \
        + motion[..., 0] * scale
    inside = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
    return _bilinear_sample(img, yy, xx), inside


def interpolate_frame(prev_hdr, cur_hdr, motion, t: float = 0.5):
    """Synthesize the frame at time t between prev_hdr (t=0) and cur_hdr
    (t=1). motion [H,W,2] is the current frame's pixel-space motion
    (prev = cur + motion). Returns [H,W,3] hdr."""
    prev_w, prev_in = _warp(prev_hdr, motion, t)
    cur_w, cur_in = _warp(cur_hdr, motion, -(1.0 - t))

    # disocclusion guard: clamp each warp into the other's 3x3 range;
    # where a warp sampled out of bounds, trust the other one fully
    cmin = cur_w
    cmax = cur_w
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nb = _shift2d(cur_w, dy, dx)
            cmin = jnp.minimum(cmin, nb)
            cmax = jnp.maximum(cmax, nb)
    prev_c = jnp.clip(prev_w, cmin, cmax)

    w_prev = jnp.where(prev_in, 1.0 - t, 0.0)[..., None]
    w_cur = jnp.where(cur_in, t, 0.0)[..., None]
    total = w_prev + w_cur
    safe = jnp.maximum(total, 1e-6)
    out = (prev_c * w_prev + cur_w * w_cur) / safe
    # both warps out of bounds (screen edge + inward motion): plain blend
    fallback = prev_hdr * (1.0 - t) + cur_hdr * t
    return jnp.where(total > 1e-6, out, fallback)


def generate_frames(prev_hdr, cur_hdr, motion, n: int = 1):
    """Multi-frame generation (DLSS-MFG analog): n evenly spaced
    intermediate frames between prev and cur."""
    return [interpolate_frame(prev_hdr, cur_hdr, motion,
                              (k + 1) / (n + 1))
            for k in range(n)]
