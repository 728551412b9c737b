"""Compare clustered-path primary hits vs the XLA BVH path on TPU."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rtxpt_tpu.config import NEEMode, PathTracerConfig
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.pt.integrator import render_sample_jit
from rtxpt_tpu.scene.procedural import city_scene, default_camera

host = city_scene(tri_budget=4000, seed=1, blocks=2)
sd = prepare(host)
print("tris:", len(np.asarray(sd.geometry.indices)),
      "clusters:", sd.cluster_tables.n_clusters)
cam = default_camera(host, 64, 48)
cfg = PathTracerConfig(max_bounces=2, nee=NEEMode.POWER, ray_chunk=1 << 30)

out = render_sample_jit(sd, cam, cfg, 64, 48, jnp.uint32(0), True)
depth_c = np.asarray(out["depth"])
L_c = np.asarray(out["L"])
print("clustered: depth mean", depth_c.mean(), "hit frac",
      (depth_c > 0).mean(), "L mean", L_c.mean(),
      "overflow", int(out.get("cull_overflow", -1)))

import dataclasses
cfg_ref = dataclasses.replace(cfg, kernel_tier="xla")
out2 = render_sample_jit(sd, cam, cfg_ref, 64, 48, jnp.uint32(0), True)
depth_r = np.asarray(out2["depth"])
L_r = np.asarray(out2["L"])
print("reference: depth mean", depth_r.mean(), "hit frac",
      (depth_r > 0).mean(), "L mean", L_r.mean())
print("depth rmse:", float(np.sqrt(np.mean((depth_c - depth_r) ** 2))),
      "maxdiff:", float(np.abs(depth_c - depth_r).max()))
bad = np.abs(depth_c - depth_r) > 0.05
print("bad-depth frac:", bad.mean())
