"""Camera model.

Semantics of the reference's BridgeCamera / PathTracerCameraData
(Rtxpt/Shaders/PathTracerShared.h:108, filled in Sample.cpp:2039-2053,
ray generation in Bridge::computeCameraRay, PathTracerBridgeDonut.hlsli):
pinhole projection with subpixel jitter + optional thin-lens depth of field.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from rtxpt_tpu.utils import math as m


@struct.dataclass
class Camera:
    position: jnp.ndarray      # [3]
    # Pre-scaled pixel basis: dir(px,py) = normalize(forward + sx*right + sy*up)
    forward: jnp.ndarray       # [3] unit view direction
    right: jnp.ndarray         # [3] unit right * tan(fovx/2)
    up: jnp.ndarray            # [3] unit up * tan(fovy/2)
    width: jnp.ndarray         # [] f32
    height: jnp.ndarray        # [] f32
    aperture_radius: jnp.ndarray  # [] f32 (0 = pinhole)
    focal_distance: jnp.ndarray   # [] f32


def look_at(position, target, up, fov_y_deg: float, width: int, height: int,
            aperture_radius: float = 0.0, focal_distance: float = 1.0) -> Camera:
    position = np.asarray(position, np.float32)
    target = np.asarray(target, np.float32)
    up = np.asarray(up, np.float32)
    fwd = target - position
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    cup = np.cross(right, fwd)
    tan_y = np.tan(np.deg2rad(fov_y_deg) * 0.5)
    tan_x = tan_y * (width / height)
    return Camera(
        position=jnp.asarray(position),
        forward=jnp.asarray(fwd),
        right=jnp.asarray(right * tan_x),
        up=jnp.asarray(cup * tan_y),
        width=jnp.float32(width), height=jnp.float32(height),
        aperture_radius=jnp.float32(aperture_radius),
        focal_distance=jnp.float32(focal_distance),
    )


def camera_ray(cam: Camera, px, py, u1, u2, u_lens1=None, u_lens2=None):
    """Primary ray for pixel (px,py) with subpixel jitter (u1,u2) in [0,1).

    Returns (origin [...,3], direction [...,3], cone_spread_angle []).
    The spread angle seeds RayCone texture LOD (reference:
    TexLODHelpers.hlsli:57; computeRayDirectionAndTexLOD).
    """
    sx = ((px.astype(jnp.float32) + u1) / cam.width) * 2.0 - 1.0
    sy = 1.0 - ((py.astype(jnp.float32) + u2) / cam.height) * 2.0
    d = (cam.forward + sx[..., None] * cam.right + sy[..., None] * cam.up)
    d = m.normalize(d)
    o = jnp.broadcast_to(cam.position, d.shape)

    if u_lens1 is not None:
        # Thin-lens DoF: jitter origin on aperture disk, refocus at focal plane.
        r = cam.aperture_radius * jnp.sqrt(u_lens1)
        phi = 2.0 * jnp.pi * u_lens2
        ru = m.normalize(cam.right)
        uu = m.normalize(cam.up)
        focus_t = cam.focal_distance / jnp.maximum(
            m.dot(d, jnp.broadcast_to(cam.forward, d.shape), False), 1e-6)
        focus_p = o + d * focus_t[..., None]
        offset = (r * jnp.cos(phi))[..., None] * ru + (r * jnp.sin(phi))[..., None] * uu
        o = o + jnp.where(cam.aperture_radius > 0.0, offset, 0.0)
        d = m.normalize(focus_p - o)

    # Pixel cone spread: angle subtended by one pixel vertically.
    spread = 2.0 * jnp.abs(m.length(cam.up, False)) / cam.height
    return o, d, jnp.broadcast_to(spread, px.shape)


def project(cam: Camera, world_pos):
    """World position [...,3] -> (px, py, behind) pixel coordinates.

    Inverse of camera_ray (pinhole only); used for motion vectors
    (Bridge::computeMotionVectors analog, PathTracerBridgeDonut.hlsli)."""
    rel = world_pos - cam.position
    fwd = cam.forward
    rlen2 = m.dot(cam.right, cam.right, False)
    ulen2 = m.dot(cam.up, cam.up, False)
    z = m.dot(rel, jnp.broadcast_to(fwd, rel.shape), False)
    behind = z <= 1e-6
    zs = jnp.where(behind, 1.0, z)
    sx = m.dot(rel, jnp.broadcast_to(cam.right, rel.shape), False) / (
        rlen2 * zs)
    sy = m.dot(rel, jnp.broadcast_to(cam.up, rel.shape), False) / (
        ulen2 * zs)
    px = (sx + 1.0) * 0.5 * cam.width - 0.5
    py = (1.0 - sy) * 0.5 * cam.height - 0.5
    return px, py, behind
