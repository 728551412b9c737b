"""Micro-parity: old per-row kernel A/B vs flat A1+A2/B1 on one bounce
(CPU interpret mode). Isolates the flat-tier rework from the driver."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("RTXPT_TPU_PALLAS_INTERPRET", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from rtxpt_tpu.config import NEEMode, PathTracerConfig
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.pt import bounce_clustered as bc
from rtxpt_tpu.pt.bounce_pallas import (FS_D, FS_O, IS_ACTIVE, NF, NI,
                                        _cfg_key, _R)
from rtxpt_tpu.accel.cull import cull_candidates
from rtxpt_tpu.pt.dispatch import resolve
from rtxpt_tpu.pt.integrator import _pixel_grid, EFFECT_LENS, _lds
from rtxpt_tpu.scene.camera import camera_ray
from rtxpt_tpu.scene.procedural import city_scene, default_camera
from rtxpt_tpu.utils import rng

w, h = 160, 96
host = city_scene(tri_budget=20000)
sd = prepare(host)
tbl = sd.cluster_tables
assert tbl is not None
cam = default_camera(host, w, h)
cfg = resolve(sd, PathTracerConfig(max_bounces=2, nee=NEEMode.POWER,
                                   kernel_tier="clustered",
                                   pallas_interpret=True))
key = _cfg_key(cfg)
kslots = min(64, tbl.n_clusters)

px, py = _pixel_grid(w, h)
n = px.shape[0]
sidx = jnp.uint32(1)
seed = rng.pixel_seed(px, py, 0, EFFECT_LENS)
u1, u2 = _lds(cfg, sidx, seed, (0, 1))
o, d, spread = camera_ray(cam, px, py, u1, u2)

lanes = _R * 128
npad = -(-max(n, lanes) // lanes) * lanes
nrows = npad // 128
n_groups = nrows // _R


def pad1(x, fill=0.0):
    return jnp.concatenate(
        [x, jnp.full((npad - n, *x.shape[1:]), fill, x.dtype)]) \
        if npad != n else x


fs = jnp.concatenate([
    pad1(o).T.reshape(3, nrows, 128), pad1(d, 1.0).T.reshape(3, nrows, 128),
    jnp.ones((3, nrows, 128), jnp.float32),
    jnp.zeros((3, nrows, 128), jnp.float32),
    jnp.zeros((3, nrows, 128), jnp.float32),
], axis=0)
is_ = jnp.concatenate([
    pad1(jnp.ones((n,), jnp.int32)).reshape(1, nrows, 128),
    jnp.ones((1, nrows, 128), jnp.int32),
    jnp.full((2, nrows, 128), -1, jnp.int32),
    pad1(px).reshape(1, nrows, 128),
    pad1(py).reshape(1, nrows, 128),
    jnp.full((1, nrows, 128), 0x3FFFFFFF, jnp.int32),
        jnp.zeros((1, nrows, 128), jnp.int32),   # logical bounce
], axis=0)
assert fs.shape[0] == NF and is_.shape[0] == NI

g4 = lambda x3: x3.reshape(3, n_groups, _R, 128)
act = (is_[IS_ACTIVE] > 0).reshape(n_groups, _R, 128)
cand, ovf = cull_candidates(
    g4(fs[FS_O:FS_O + 3]), g4(fs[FS_D:FS_D + 3]), act,
    jnp.float32(cfg.max_ray_travel), tbl.aabb_lo, tbl.aabb_hi, kslots)
print("overflow", int(ovf))
scal = jnp.stack([sidx, jnp.uint32(0)]).reshape(1, 2)

# old path
fs_o, is_o, sh_o, hit_o = bc._kernel_a_call(
    scal, cand, fs, is_, tbl.mat_rows, tbl.light_rows, tbl.env_rows,
    None, None, tbl.blocks, key, kslots, tbl.n_lights, tbl.tr, True,
    interpret=True)

# flat path
f32 = jnp.float32
of = fs[FS_O:FS_O + 3].reshape(3, npad)
df = fs[FS_D:FS_D + 3].reshape(3, npad)
from rtxpt_tpu.pt import wide as W

od = jnp.concatenate([
    df, W.cross3(of, df), of,
    (is_[IS_ACTIVE] > 0).reshape(1, npad).astype(f32)], axis=0)
ha = bc._kernel_a1_call(
    cand, bc._to_flat_groups(od, n_groups), tbl.blocks, kslots,
    float(cfg.max_ray_travel), noprune=False, interpret=True)
ha_t = bc._from_flat_groups(ha, bc.HA_ROWS, nrows)
fs_f, is_f, sh_f, hit_f, _surf_f, _fs2_f = bc._kernel_a2_call(
    scal, ha_t, fs, is_, tbl.mat_rows, tbl.light_rows, tbl.env_rows,
    None, None, key, tbl.n_lights, tbl.tr, True, interpret=True)

for name, a, b in (("hit.t", hit_o[0], hit_f[0]),
                   ("hit.prim", hit_o[1], hit_f[1]),
                   ("hit.u", hit_o[2], hit_f[2]),
                   ("hit.front", hit_o[4], hit_f[4]),
                   ("fs", fs_o, fs_f), ("is", is_o, is_f),
                   ("sh", sh_o, sh_f)):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    diff = np.abs(a - b)
    print(f"{name}: maxdiff={diff.max():.3e} "
          f"nmismatch={(diff > 1e-5).sum()} / {a.size}")

# ---- shadow kernel B vs B1 vs XLA ground truth on do lanes ----
do = sh_o[bc.SH_DO] > 0.5
cand_s, ovf2 = cull_candidates(
    sh_o[bc.SH_O:bc.SH_O + 3].reshape(3, n_groups, _R, 128),
    sh_o[bc.SH_D:bc.SH_D + 3].reshape(3, n_groups, _R, 128),
    do.reshape(n_groups, _R, 128),
    sh_o[bc.SH_DIST].reshape(n_groups, _R, 128),
    tbl.aabb_lo, tbl.aabb_hi, kslots)
occ_old = bc._kernel_b_call(cand_s, sh_o, tbl.blocks, kslots,
                            interpret=True)
sh_f = bc._to_flat_groups(sh_o.reshape(bc.SH_ROWS, npad), n_groups)
occ_f = bc._kernel_b1_call(cand_s, sh_f, tbl.blocks, kslots,
                           interpret=True).reshape(nrows, 128)
dom = np.asarray(do)
a = np.asarray(occ_old)
b = np.asarray(occ_f)
print("B-vs-B1 diff on do lanes:", int((np.abs(a - b) > 0.5)[dom].sum()),
      "/", int(dom.sum()))
print("B-vs-B1 diff on ~do lanes:", int((np.abs(a - b) > 0.5)[~dom].sum()))

