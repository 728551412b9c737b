"""Vector math / sampling / packing helpers (device code).

TPU-native analog of the reference's device math utils
(Rtxpt/Shaders/PathTracer/Utils/** ~3.4k LoC: packing, oct normals, sphere &
triangle solid-angle sampling, hashes, format conversion — SURVEY.md §2.3).
All functions are shape-polymorphic over leading batch dims; vectors are
[..., 3] float32 unless noted.
"""

from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32
EPS = 1e-8
ONE_MINUS_EPS = float(jnp.nextafter(jnp.float32(1.0), jnp.float32(0.0)))


def dot(a, b, keepdims=True):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def length(v, keepdims=True):
    return jnp.sqrt(jnp.maximum(dot(v, v, keepdims), 0.0))


def normalize(v):
    return v * jax_rsqrt(jnp.maximum(dot(v, v), EPS * EPS))


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(x)


def cross(a, b):
    return jnp.cross(a, b)


def reflect(wi, n):
    """Reflect direction `wi` (pointing away from surface) about normal."""
    return 2.0 * dot(wi, n) * n - wi


def refract(wi, n, eta):
    """Refract `wi` (away from surface, same side as n) with relative IoR eta
    (n_i/n_t). Returns (wt, total_internal_reflection_mask)."""
    cos_i = dot(wi, n)
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = (sin2_t >= 1.0)
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    wt = -eta * wi + (eta * cos_i - cos_t) * n
    return normalize(wt), tir[..., 0]


def luminance(c):
    """Rec.709 luminance of linear RGB [...,3] -> [...]."""
    return c[..., 0] * 0.2126 + c[..., 1] * 0.7152 + c[..., 2] * 0.0722


def orthonormal_basis(n):
    """Branchless ONB from a unit normal (Duff et al. 2017). Returns (t, b)."""
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack([1.0 + sign * n[..., 0] * n[..., 0] * a,
                   sign * b,
                   -sign * n[..., 0]], axis=-1)
    bt = jnp.stack([b,
                    sign + n[..., 1] * n[..., 1] * a,
                    -n[..., 1]], axis=-1)
    return t, bt


def to_local(v, n):
    """World->tangent space: returns [...,3] with z along n."""
    t, b = orthonormal_basis(n)
    return jnp.stack([dot(v, t, False), dot(v, b, False), dot(v, n, False)],
                     axis=-1)


def to_world(v, n):
    t, b = orthonormal_basis(n)
    return (v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n)


# ---------------------------------------------------------------------------
# Sampling primitives
# ---------------------------------------------------------------------------


def sample_cosine_hemisphere(u1, u2):
    """Cosine-weighted hemisphere (local frame, z up). Returns (dir, pdf)."""
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u1))
    d = jnp.stack([x, y, z], axis=-1)
    pdf = jnp.maximum(z, EPS) / jnp.pi
    return d, pdf


def sample_uniform_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * jnp.pi * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_triangle_barycentrics(u1, u2):
    """Low-distortion uniform triangle sampling (Heitz 2019 square-root-free
    mapping). Returns (b0, b1, b2)."""
    b0 = u1 * 0.5
    b1 = u2 * 0.5
    offset = b1 - b0
    b0 = jnp.where(offset > 0.0, b0, b0 - offset)
    b1 = jnp.where(offset > 0.0, b1 + offset, b1)
    return 1.0 - b0 - b1, b0, b1


def power_heuristic(pdf_a, pdf_b):
    """MIS power heuristic (beta=2) weight for strategy a."""
    a2 = pdf_a * pdf_a
    return jnp.where(pdf_a > 0.0, a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-30), 0.0)


def spherical_to_dir(theta, phi):
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)],
                     axis=-1)


# ---------------------------------------------------------------------------
# Octahedral normal packing (reference: Utils/Math packing helpers)
# ---------------------------------------------------------------------------


def oct_encode(n):
    """Unit vector -> octahedral [-1,1]^2."""
    d = jnp.sum(jnp.abs(n), axis=-1, keepdims=True)
    p = n[..., :2] / jnp.maximum(d, EPS)
    sgn = jnp.where(p >= 0.0, 1.0, -1.0)
    wrapped = (1.0 - jnp.abs(p[..., ::-1])) * sgn
    return jnp.where(n[..., 2:3] >= 0.0, p, wrapped)


def oct_decode(e):
    x, y = e[..., 0], e[..., 1]
    z = 1.0 - jnp.abs(x) - jnp.abs(y)
    t = jnp.maximum(-z, 0.0)
    x = x - jnp.where(x >= 0.0, t, -t)
    y = y - jnp.where(y >= 0.0, t, -t)
    return normalize(jnp.stack([x, y, z], axis=-1))


# ---------------------------------------------------------------------------
# Color
# ---------------------------------------------------------------------------


def linear_to_srgb(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c <= 0.0031308, c * 12.92,
                     1.055 * jnp.power(jnp.maximum(c, 1e-7), 1.0 / 2.4) - 0.055)


def srgb_to_linear(c):
    return jnp.where(c <= 0.04045, c / 12.92,
                     jnp.power((c + 0.055) / 1.055, 2.4))
