"""End-to-end TPU parity: clustered flat tier vs XLA wavefront (city)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax.numpy as jnp
import numpy as np

from rtxpt_tpu.config import NEEMode, PathTracerConfig
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.pt.dispatch import resolve
from rtxpt_tpu.pt.integrator import render_sample
from rtxpt_tpu.scene.procedural import city_scene, default_camera

w, h = 320, 192
host = city_scene(tri_budget=80000)
sd = prepare(host)
cam = default_camera(host, w, h)
base = PathTracerConfig(max_bounces=3, nee=NEEMode.POWER)
imgs = {}
for tier in ("clustered", "xla"):
    cfg = resolve(sd, dataclasses.replace(base, kernel_tier=tier))
    print("tier:", cfg.kernel_tier)
    out = render_sample(sd, cam, cfg, w, h, sample_idx=jnp.uint32(1))
    imgs[tier] = np.asarray(out["L"]).reshape(h, w, 3)

a, b = imgs["clustered"], imgs["xla"]
assert np.isfinite(a).all(), "clustered NaN/inf"
rmse = float(np.sqrt(np.mean((a - b) ** 2)))
rel = rmse / max(float(np.sqrt(np.mean(b ** 2))), 1e-9)
print(f"rmse={rmse:.5f} rel={rel:.5f} mean_ref={b.mean():.4f}")
assert rel < 0.02, rel
print("PASS")
