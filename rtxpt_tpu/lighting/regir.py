"""ReGIR: grid-based reservoir light sampling.

Analog of the reference's ReGIR presampling tier inside RTXDI (reference:
RtxdiPass::BeginFrame presamples lights/env/ReGIR, RtxdiPass.cpp:327-351).
A world-space grid over the scene bounds holds per-cell reservoir sets:
each frame, every cell RIS-selects K lights proportional to their
unshadowed contribution at the cell center; shading points then draw NEE
candidates from their cell's set (cheap, locally importance-sampled) with
the exact per-cell selection pmf for unbiased MIS.

TPU shape: the whole build is one [cells, samples] vectorized RIS — no
scatter, no sort; cell lookup at shading time is index arithmetic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rtxpt_tpu.lighting.lights_baker import LightList
from rtxpt_tpu.utils import math as m
from rtxpt_tpu.utils import rng


class ReGIRGrid(NamedTuple):
    origin: jnp.ndarray      # [3]
    cell_size: jnp.ndarray   # [3]
    dims: tuple              # (nx, ny, nz) static
    slots: jnp.ndarray       # [cells, K] i32 light indices
    slot_w: jnp.ndarray      # [cells, K] RIS weights (W per slot)
    slot_pmf: jnp.ndarray    # [cells, K] in-cell selection pmf


def _cell_centers(origin, cell_size, dims):
    nx, ny, nz = dims
    ii = np.stack(np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                              indexing="ij"), -1).reshape(-1, 3)
    return origin[None] + (ii + 0.5) * cell_size[None]


def build_grid(lights: LightList, scene_lo, scene_hi, dims=(8, 8, 8),
               k_slots: int = 8, n_candidates: int = 32,
               frame_index: int = 0) -> ReGIRGrid:
    """Per-frame ReGIR build: RIS per cell toward the cell center."""
    origin = np.asarray(scene_lo, np.float32)
    extent = np.maximum(np.asarray(scene_hi, np.float32) - origin, 1e-5)
    cell = extent / np.asarray(dims, np.float32)
    centers = jnp.asarray(_cell_centers(origin, cell, dims), jnp.float32)
    n_cells = centers.shape[0]

    base = rng.hash_combine(jnp.arange(n_cells, dtype=jnp.uint32),
                            jnp.uint32(frame_index * 2654435761 % (1 << 31)))

    def target(li, cell_pos):
        """Unshadowed scalar importance of light li at cell_pos."""
        kind = jnp.take(lights.kind, li)
        p0 = jnp.take(lights.p0, li, axis=0)
        em = jnp.take(lights.emission, li, axis=0)
        ex = jnp.take(lights.extra, li, axis=0)
        to_l = p0 - cell_pos
        d2 = jnp.maximum(m.dot(to_l, to_l, False), 1e-6)
        lum = m.luminance(em)
        area = jnp.maximum(ex[..., 0], 1e-6)
        # tri: radiance*area/d2 ; point/spot: intensity/d2 ; dir/env: lum
        p_tri = lum * area / d2
        p_pnt = lum / d2
        return jnp.where(kind == 0, p_tri,
                         jnp.where((kind == 1) | (kind == 3), p_pnt, lum))

    slots = jnp.full((n_cells, k_slots), -1, jnp.int32)
    slot_wsum = jnp.zeros((n_cells, k_slots), jnp.float32)
    slot_phat = jnp.zeros((n_cells, k_slots), jnp.float32)

    # K independent reservoir streams per cell (stratified slots)
    for c in range(n_candidates):
        u_sel = rng.uniform_sample(base, jnp.uint32(2 * c))
        li = jnp.clip(jnp.searchsorted(lights.cdf,
                                       jnp.clip(u_sel, 0.0, 1.0 - 1e-7)),
                      0, lights.count - 1).astype(jnp.int32)
        src = jnp.maximum(jnp.take(lights.power, li), 1e-12)
        p = target(li, centers)
        w = (p / src)[:, None]
        slot = c % k_slots
        u_acc = rng.uniform_sample(base, jnp.uint32(2 * c + 1))[:, None]
        wsum_new = slot_wsum.at[:, slot].add(w[:, 0])
        accept = (u_acc[:, 0] * jnp.maximum(wsum_new[:, slot], 1e-20)) \
            < w[:, 0]
        slots = slots.at[:, slot].set(
            jnp.where(accept, li, slots[:, slot]))
        slot_phat = slot_phat.at[:, slot].set(
            jnp.where(accept, p, slot_phat[:, slot]))
        slot_wsum = wsum_new

    m_per_slot = n_candidates / k_slots
    slot_w = jnp.where(slot_phat > 1e-12,
                       slot_wsum / (m_per_slot * jnp.maximum(slot_phat,
                                                             1e-12)),
                       0.0)
    pmf = slot_wsum / jnp.maximum(slot_wsum.sum(-1, keepdims=True), 1e-12)
    return ReGIRGrid(origin=jnp.asarray(origin), cell_size=jnp.asarray(cell),
                     dims=dims, slots=slots, slot_w=slot_w, slot_pmf=pmf)


def cell_of(grid: ReGIRGrid, pos):
    nx, ny, nz = grid.dims
    q = (pos - grid.origin) / grid.cell_size
    ix = jnp.clip(q[..., 0].astype(jnp.int32), 0, nx - 1)
    iy = jnp.clip(q[..., 1].astype(jnp.int32), 0, ny - 1)
    iz = jnp.clip(q[..., 2].astype(jnp.int32), 0, nz - 1)
    return (ix * ny + iy) * nz + iz


def sample_from_grid(grid: ReGIRGrid, lights: LightList, envmap, shade_pos,
                     u_slot, u1, u2):
    """Draw a light through the shading point's cell reservoirs. Returns
    the same contract as lights_baker.sample_light; pdf folds the slot pmf
    and the slot's RIS weight so the estimator stays unbiased."""
    from rtxpt_tpu.pt.restir import eval_light_sample

    cell = cell_of(grid, shade_pos)
    k = grid.slots.shape[1]
    pmf_rows = jnp.take(grid.slot_pmf, cell, axis=0)        # [N,K]
    cdf_rows = jnp.cumsum(pmf_rows, -1)
    slot = jnp.clip(jnp.sum(
        (cdf_rows < jnp.clip(u_slot, 0.0, 1.0 - 1e-7)[..., None])
        .astype(jnp.int32), -1), 0, k - 1)
    li = jnp.take_along_axis(jnp.take(grid.slots, cell, axis=0),
                             slot[..., None], axis=-1)[..., 0]
    w_slot = jnp.take_along_axis(jnp.take(grid.slot_w, cell, axis=0),
                                 slot[..., None], axis=-1)[..., 0]
    pmf_slot = jnp.take_along_axis(pmf_rows, slot[..., None],
                                   axis=-1)[..., 0]

    uv = jnp.stack([u1, u2], -1)
    wi, dist, Li, src_pdf = eval_light_sample(lights, envmap,
                                              jnp.maximum(li, 0), uv,
                                              shade_pos)
    # effective selection density of light li through this cell: the
    # K-slot RIS estimator is (1/K) sum_s f*W_s, realized by one slot drawn
    # with pmf_slot -> discrete select pdf = K*pmf_slot / W_slot.
    sel_global = jnp.maximum(jnp.take(lights.power, jnp.maximum(li, 0)),
                             1e-12)
    sel_eff = jnp.where(w_slot > 1e-12,
                        k * pmf_slot / jnp.maximum(w_slot, 1e-12), 0.0)
    pdf = src_pdf * sel_eff / sel_global
    kind = jnp.take(lights.kind, jnp.maximum(li, 0))
    is_delta = (kind == 1) | (kind == 2) | (kind == 3)
    valid = (li >= 0) & (pdf > 1e-12)
    return dict(wi=wi, dist=dist, Li=Li, pdf=pdf, is_delta=is_delta,
                valid=valid, light_index=li)
