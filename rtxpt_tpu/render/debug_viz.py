"""Debug visualization modes.

Analog of the reference's debug view taxonomy (SampleUI.h:209 debug views;
stable-plane viz in PostProcess.hlsl; delta-tree visualizer Config.h:64):
renders guide buffers and decomposition state as display images.
"""

from __future__ import annotations

import jax.numpy as jnp

from rtxpt_tpu.utils import math as m

MODES = ("albedo", "normal", "depth", "motion", "emission", "plane_id",
         "plane_throughput", "history_len", "variance", "ao")


def visualize(mode: str, **buffers):
    """Map a named buffer set to a display image [H,W,3] in [0,1].

    buffers: albedo/normal [H,W,3], depth [H,W], motion [H,W,2],
    emission [H,W,3], plane_valid (list of [H,W]), plane_thp (list),
    history_len [H,W], variance [H,W], ao [H,W]."""
    if mode == "albedo":
        return jnp.clip(buffers["albedo"], 0.0, 1.0)
    if mode == "normal":
        return buffers["normal"] * 0.5 + 0.5
    if mode == "depth":
        d = buffers["depth"]
        dmax = jnp.maximum(jnp.max(d), 1e-6)
        g = jnp.clip(d / dmax, 0.0, 1.0)
        return jnp.stack([g, g, g], -1)
    if mode == "motion":
        mv = buffers["motion"]
        r = jnp.clip(mv[..., 0] * 0.1 + 0.5, 0.0, 1.0)
        g = jnp.clip(mv[..., 1] * 0.1 + 0.5, 0.0, 1.0)
        return jnp.stack([r, g, jnp.full_like(r, 0.5)], -1)
    if mode == "emission":
        return jnp.clip(buffers["emission"], 0.0, 1.0)
    if mode == "plane_id":
        # color-code which stable plane is dominant per pixel
        colors = jnp.asarray([[0.2, 0.5, 1.0], [1.0, 0.5, 0.2],
                              [0.3, 1.0, 0.3]])
        img = jnp.zeros((*buffers["plane_valid"][0].shape, 3))
        for i, v in enumerate(buffers["plane_valid"]):
            img = jnp.where(v[..., None], colors[i % 3], img)
        return img
    if mode == "plane_throughput":
        img = jnp.zeros((*buffers["plane_thp"][0].shape[:2], 3))
        for thp, v in zip(buffers["plane_thp"], buffers["plane_valid"]):
            img = img + jnp.where(v[..., None], thp, 0.0)
        return jnp.clip(img, 0.0, 1.0)
    if mode == "history_len":
        h = buffers["history_len"]
        g = jnp.clip(h / 32.0, 0.0, 1.0)
        return jnp.stack([1.0 - g, g, jnp.zeros_like(g)], -1)
    if mode == "variance":
        v = jnp.sqrt(jnp.maximum(buffers["variance"], 0.0))
        g = jnp.clip(v * 4.0, 0.0, 1.0)
        return jnp.stack([g, jnp.zeros_like(g), 1.0 - g], -1)
    if mode == "ao":
        g = jnp.clip(buffers["ao"], 0.0, 1.0)
        return jnp.stack([g, g, g], -1)
    raise ValueError(f"unknown debug mode '{mode}' (choose from {MODES})")
