"""Debug instrumentation: NaN canaries, pixel probe, validation.

Analog of the reference's debug stack (SURVEY.md §5): the ShaderDebug
ring-buffer printf + right-click pixel pick filling DebugFeedbackStruct
(Misc/ShaderDebug.h:34-90, Sample.cpp:2259-2291) and the in-shader NaN
sanitizer (PathTracerSample.hlsl:170-198 ValidateNaNs). In JAX the
equivalents are host-side: jit-compatible canary reductions, a re-trace of
one pixel with per-bounce state capture, and jax's own nan-debugging mode.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def nan_canary(img, name: str = "image") -> Dict[str, float]:
    """Count non-finite pixels (the ValidateNaNs analog). Host-side."""
    a = np.asarray(img)
    nan = int(np.isnan(a).sum())
    inf = int(np.isinf(a).sum())
    neg = int((a < 0).sum()) if a.dtype.kind == "f" else 0
    return {"name": name, "nan": nan, "inf": inf, "negative": neg,
            "ok": nan == 0 and inf == 0}


def paint_nan_markers(img, marker=(1.0, 0.0, 1.0)):
    """Replace non-finite pixels with a magenta marker (display parity with
    the reference's NaN paint-over)."""
    bad = ~jnp.isfinite(img).all(-1, keepdims=True)
    return jnp.where(bad, jnp.asarray(marker), img)


def probe_pixel(scene, cam, cfg, px: int, py: int, sample_idx: int = 0,
                max_bounces: int = None) -> List[dict]:
    """Re-trace one pixel and record per-bounce state (the pixel-pick
    DebugFeedbackStruct analog). Returns a list of per-vertex dicts."""
    from rtxpt_tpu.accel.traverse import scene_closest
    from rtxpt_tpu.pt import bsdf as B
    from rtxpt_tpu.pt.integrator import EFFECT_LENS, EFFECT_SCATTER, _lds
    from rtxpt_tpu.pt.surface import load_surface, ray_offset
    from rtxpt_tpu.scene.camera import camera_ray
    from rtxpt_tpu.utils import math as m
    from rtxpt_tpu.utils import rng

    mb = max_bounces if max_bounces is not None else cfg.max_bounces
    pxa = jnp.asarray([px], jnp.int32)
    pya = jnp.asarray([py], jnp.int32)
    sidx = jnp.uint32(sample_idx)
    seed = rng.pixel_seed(pxa, pya, 0, EFFECT_LENS)
    u1, u2 = _lds(cfg, sidx, seed, (0, 1))
    o, d, _ = camera_ray(cam, pxa, pya, u1, u2)

    records = []
    thp = jnp.ones((1, 3))
    for bounce in range(mb + 1):
        hit = scene_closest(scene, o, d, jnp.zeros((1,)),
                                jnp.full((1,), 1e30))
        rec = {
            "bounce": bounce,
            "origin": np.asarray(o[0]).tolist(),
            "direction": np.asarray(d[0]).tolist(),
            "hit": bool(~hit.miss[0]),
            "t": float(hit.t[0]),
            "prim": int(hit.prim[0]),
            "throughput": np.asarray(thp[0]).tolist(),
        }
        if hit.miss[0]:
            records.append(rec)
            break
        surf = load_surface(scene, hit, o, d, jnp.zeros((1,)))
        rec.update({
            "position": np.asarray(surf.pos[0]).tolist(),
            "normal": np.asarray(surf.sh_n[0]).tolist(),
            "material": int(surf.mat_id[0]),
            "front": bool(surf.front[0]),
            "emissive": np.asarray(surf.emissive[0]).tolist(),
            "albedo": np.asarray(surf.bsdf.diffuse[0]).tolist(),
            "alpha": float(surf.bsdf.alpha[0]),
        })
        records.append(rec)
        seed_sc = rng.pixel_seed(pxa, pya, bounce, EFFECT_SCATTER)
        ul, s1, s2 = _lds(cfg, sidx, seed_sc, (0, 2, 3))
        wo = m.to_local(-d, surf.sh_n)
        bs = B.bsdf_sample(surf.bsdf, wo, ul, s1, s2)
        thp = thp * bs["weight"]
        d = m.to_world(bs["wi"], surf.sh_n)
        o = ray_offset(surf.pos, surf.geo_n, d)
    return records


def enable_nan_checks():
    """Global jax nan debugging (the --debug validation-layer analog)."""
    jax.config.update("jax_debug_nans", True)


def disable_nan_checks():
    jax.config.update("jax_debug_nans", False)
