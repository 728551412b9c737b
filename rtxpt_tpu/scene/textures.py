"""Texture atlas: MIP-mapped bilinear texture fetches from flat HBM arrays.

TPU-native replacement for bindless filtered texture units (reference:
Donut TextureCache + `t_BindlessTextures` fetches in
PathTracerBridgeDonut.hlsli:275; TexLOD-aware sampling in
Shaders/PathTracer/Scene/Material/*). There is no texture hardware to bind,
so all textures live in ONE flat [texels,4] array with a per-texture/per-MIP
offset table; a fetch = offset arithmetic + 4 gathers (bilinear) at the
ray-cone-selected MIP.
"""

from __future__ import annotations

from typing import List

import numpy as np
import jax.numpy as jnp
from flax import struct

MAX_MIPS = 14


@struct.dataclass
class TextureAtlas:
    data: jnp.ndarray        # [texels, 4] f32 RGBA (linear)
    mip_offset: jnp.ndarray  # [T, MAX_MIPS] i32 start texel of each MIP
    width: jnp.ndarray       # [T] i32 base width
    height: jnp.ndarray      # [T] i32 base height
    n_mips: jnp.ndarray      # [T] i32

    @property
    def count(self) -> int:
        return self.width.shape[0]


def _build_mips(img: np.ndarray) -> List[np.ndarray]:
    """Box-filtered MIP chain down to 1x1 (even-size halving, numpy)."""
    mips = [img]
    cur = img
    while max(cur.shape[0], cur.shape[1]) > 1:
        h, w = cur.shape[:2]
        nh, nw = max(h // 2, 1), max(w // 2, 1)
        # pad to even for clean 2x2 averaging
        ph, pw = nh * 2, nw * 2
        pad = cur[:ph, :pw]
        if pad.shape[0] < ph or pad.shape[1] < pw:
            pad = np.pad(cur, ((0, ph - cur.shape[0]), (0, pw - cur.shape[1]),
                               (0, 0)), mode="edge")
        nxt = pad.reshape(nh, 2, nw, 2, 4).mean((1, 3))
        mips.append(nxt.astype(np.float32))
        cur = nxt
        if len(mips) >= MAX_MIPS:
            break
    return mips


def bake_textures(images: List[np.ndarray]) -> TextureAtlas:
    """images: list of [h,w,3|4] float (linear, 0..1-ish) or uint8 arrays."""
    datas = []
    offsets = np.zeros((len(images), MAX_MIPS), np.int64)
    widths, heights, nmips = [], [], []
    cursor = 0
    for t, img in enumerate(images):
        img = np.asarray(img)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        img = img.astype(np.float32)
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        if img.shape[-1] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], -1)
        mips = _build_mips(img)
        widths.append(img.shape[1])
        heights.append(img.shape[0])
        nmips.append(len(mips))
        for k, mp in enumerate(mips):
            offsets[t, k] = cursor
            datas.append(mp.reshape(-1, 4))
            cursor += mp.shape[0] * mp.shape[1]
        for k in range(len(mips), MAX_MIPS):
            offsets[t, k] = offsets[t, len(mips) - 1]
    data = (np.concatenate(datas) if datas
            else np.zeros((1, 4), np.float32))
    return TextureAtlas(
        data=jnp.asarray(data),
        mip_offset=jnp.asarray(offsets.astype(np.int32)),
        width=jnp.asarray(np.asarray(widths, np.int32)),
        height=jnp.asarray(np.asarray(heights, np.int32)),
        n_mips=jnp.asarray(np.asarray(nmips, np.int32)),
    )


def sample_texture_stochastic(atlas: TextureAtlas, tex_id, uv, lod, u_jitter):
    """Stochastic filtering (RTXTF analog, reference Config.h:95
    RTXPT_STOCHASTIC_TEXTURE_FILTERING_ENABLE): ONE texel fetch with the
    bilinear/trilinear footprint realized by jittering the sample position —
    unbiased in expectation, 4x fewer gathers; the resulting noise folds
    into the denoiser like any other estimator noise.

    u_jitter: [N,2] uniforms."""
    tid = jnp.clip(tex_id, 0, atlas.count - 1)
    nm = jnp.take(atlas.n_mips, tid)
    # stochastic trilinear: jitter the lod by +-0.5 as well
    level = jnp.clip(jnp.floor(lod + u_jitter[..., 0]).astype(jnp.int32),
                     0, nm - 1)
    w0 = jnp.take(atlas.width, tid)
    h0 = jnp.take(atlas.height, tid)
    wl = jnp.maximum(w0 >> level, 1)
    hl = jnp.maximum(h0 >> level, 1)
    off = jnp.take_along_axis(jnp.take(atlas.mip_offset, tid, axis=0),
                              level[..., None], axis=-1)[..., 0]
    # jittered nearest = bilinear in expectation
    u = (uv[..., 0] + (u_jitter[..., 0] - 0.5) / wl.astype(jnp.float32)) % 1.0
    v = (uv[..., 1] + (u_jitter[..., 1] - 0.5) / hl.astype(jnp.float32)) % 1.0
    xi = jnp.clip((u * wl).astype(jnp.int32), 0, wl - 1)
    yi = jnp.clip((v * hl).astype(jnp.int32), 0, hl - 1)
    col = jnp.take(atlas.data, off + yi * wl + xi, axis=0)
    return jnp.where((tex_id >= 0)[..., None], col, 1.0)


def sample_texture(atlas: TextureAtlas, tex_id, uv, lod):
    """Bilinear fetch at the nearest MIP. tex_id [N] (-1 -> white), uv [N,2]
    (repeat wrap), lod [N] float. Returns [N,4]."""
    tid = jnp.clip(tex_id, 0, atlas.count - 1)
    nm = jnp.take(atlas.n_mips, tid)
    level = jnp.clip(jnp.round(lod).astype(jnp.int32), 0, nm - 1)
    w0 = jnp.take(atlas.width, tid)
    h0 = jnp.take(atlas.height, tid)
    wl = jnp.maximum(w0 >> level, 1)
    hl = jnp.maximum(h0 >> level, 1)
    off = jnp.take_along_axis(jnp.take(atlas.mip_offset, tid, axis=0),
                              level[..., None], axis=-1)[..., 0]

    u = uv[..., 0] % 1.0
    v = uv[..., 1] % 1.0
    x = u * wl.astype(jnp.float32) - 0.5
    y = v * hl.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]

    def fetch(xi, yi):
        xi = jnp.mod(xi.astype(jnp.int32), wl)
        yi = jnp.mod(yi.astype(jnp.int32), hl)
        return jnp.take(atlas.data, off + yi * wl + xi, axis=0)

    c00 = fetch(x0, y0)
    c10 = fetch(x0 + 1, y0)
    c01 = fetch(x0, y0 + 1)
    c11 = fetch(x0 + 1, y0 + 1)
    col = ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
           + (c01 * (1 - fx) + c11 * fx) * fy)
    return jnp.where((tex_id >= 0)[..., None], col, 1.0)
