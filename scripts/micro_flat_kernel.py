"""Feasibility probe: ALL-ROWS flat-lane clustered intersection.

Round-2's all-rows rework wedged Mosaic building [1, R*128] lane vectors
from [R,128] rows (sublane->lane relayout, unimplemented). This probe
validates the round-3 workaround:

  * the ray o/d arrive ALREADY FLAT as [6, 1024] per group (XLA-side
    reshape — free outside the kernel);
  * per visit: ONE dot_general [32,512]x[32,1024] -> [512,1024] and ONE
    selection chain on [128,1024] tiles (vs 8 per-row matmuls + chains);
  * the winner state lives flat [K, 1024] in scratch;
  * the flat->[R,128] bridge at the END is 8 PERMUTATION MATMULS with
    iota-built selection matrices P_r[k,l] = (k == r*128 + l):
    out_r = Q @ P_r, [K,1024]@[1024,128] -> [K,128]. No relayout op.

Run FORCE_CPU=1 for interpret-mode correctness; default = TPU compile +
perf. Compare per-visit cost against micro_cluster_kernel.py.
"""

import functools
import os
import sys
import time

import jax

if os.environ.get("FORCE_CPU") == "1":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CT = 128
KSLOTS = 16
_BIG = 1e30
FLAT = 1024       # rays per group, flat lanes


def _bf16_split(x):
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, x - hi


def kernel(cand_ref, od_ref, tri_hbm, tout_ref, jout_ref,
           buf0, buf1, best_ref, sem0, sem1, *, interpret):
    count = cand_ref[0, 0, 0]

    def dma(slot, buf, sem):
        c = cand_ref[0, 0, 1 + jnp.minimum(slot, KSLOTS - 1)]
        return pltpu.make_async_copy(tri_hbm.at[c], buf, sem)

    @pl.when(count > 0)
    def _():
        dma(0, buf0, sem0).start()

    # flat split-bf16 ray operand [32, FLAT] built once per group
    od = od_ref[:]                                   # [6, FLAT]
    o = od[0:3]
    d = od[3:6]
    oxd0 = o[1:2] * d[2:3] - o[2:3] * d[1:2]
    oxd1 = o[2:3] * d[0:1] - o[0:1] * d[2:3]
    oxd2 = o[0:1] * d[1:2] - o[1:2] * d[0:1]
    rvec = jnp.concatenate(
        [d, oxd0, oxd1, oxd2, o, jnp.ones((1, FLAT), jnp.float32)], axis=0)
    r_hi, r_lo = _bf16_split(rvec)
    cols = jnp.concatenate(
        [r_hi, r_lo, r_hi, jnp.zeros((2, FLAT), jnp.float32)], axis=0)

    best_ref[:] = jnp.concatenate(
        [jnp.full((1, FLAT), _BIG, jnp.float32),
         jnp.zeros((7, FLAT), jnp.float32)], axis=0)

    def visit(i, cur):
        chi = cur[0:10, :]
        clo = cur[10:20, :]
        cstack = jnp.concatenate(
            [chi, chi, clo, jnp.zeros((2, 4 * CT), jnp.float32)], axis=0)
        prod = jax.lax.dot_general(
            cstack, cols, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [512, FLAT]
        det = prod[0:CT]
        un = prod[CT:2 * CT]
        vn = prod[2 * CT:3 * CT]
        tn = prod[3 * CT:4 * CT]
        sgn = jnp.where(det >= 0.0, 1.0, -1.0)
        absd = det * sgn
        su = un * sgn
        sv = vn * sgn
        st = tn * sgn
        mm = 2e-3 * absd
        valid = ((absd > 1e-30) & (su >= -mm) & (sv >= -mm)
                 & (su + sv <= absd + mm + mm) & (st > 0.0))
        tt = st / jnp.maximum(absd, 1e-30)
        t_m = jnp.where(valid, tt, _BIG)
        t_c = jnp.min(t_m, axis=0, keepdims=True)     # [1, FLAT]
        b = best_ref[0:1]
        improved = t_c < b
        iota = jax.lax.broadcasted_iota(jnp.int32, (CT, FLAT), 0)
        jrow = jnp.min(jnp.where(t_m <= t_c, iota, CT), axis=0,
                       keepdims=True).astype(jnp.float32)
        cid = cand_ref[0, 0, 1 + jnp.minimum(i, KSLOTS - 1)].astype(
            jnp.float32)
        new = jnp.concatenate(
            [t_c, jrow, jnp.full((1, FLAT), cid, jnp.float32),
             jnp.zeros((5, FLAT), jnp.float32)], axis=0)
        best_ref[:] = jnp.where(improved, new, best_ref[:])

    def step(i, cur, curs, nxt, nxts):
        @pl.when(i < count)
        def _():
            dma(i, cur, curs).wait()

        @pl.when(i + 1 < count)
        def _():
            dma(i + 1, nxt, nxts).start()

        @pl.when(i < count)
        def _():
            visit(i, cur[:])

    def body(i, carry):
        jax.lax.cond(
            i % 2 == 0,
            lambda: step(i, buf0, sem0, buf1, sem1),
            lambda: step(i, buf1, sem1, buf0, sem0))
        return carry

    jax.lax.fori_loop(0, KSLOTS, body, 0)

    # ---- flat -> [R,128] bridge: permutation matmuls ----
    q = best_ref[:]                                   # [8, FLAT]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (FLAT, 128), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (FLAT, 128), 1)
    trows, jrows = [], []
    for r in range(8):
        P = (iota_k == iota_l + r * 128).astype(jnp.float32)  # [FLAT,128]
        qr = jax.lax.dot_general(
            q, P, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [8, 128]
        trows.append(qr[0:1])
        jrows.append(qr[1:2] + qr[2:3] * float(CT))   # prim = cid*CT+j
    tout_ref[:] = jnp.concatenate(trows, axis=0)      # [8,128]
    jout_ref[:] = jnp.concatenate(jrows, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def run(cand, od_flat, blocks, interpret=False):
    n_groups = od_flat.shape[0]
    kern = functools.partial(kernel, interpret=interpret)
    return pl.pallas_call(
        kern,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, 1, 1 + KSLOTS), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, 6, FLAT), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((None, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_groups, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, 8, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((24, 4 * CT), jnp.float32),
            pltpu.VMEM((24, 4 * CT), jnp.float32),
            pltpu.VMEM((8, FLAT), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(cand, od_flat, blocks)


def main():
    interpret = os.environ.get("FORCE_CPU") == "1"
    rng = np.random.default_rng(0)
    C = 64
    # random clusters of triangles near origin cells
    centers = rng.uniform(-20, 20, (C, 3)).astype(np.float32)
    blocks = np.zeros((C, 24, 4 * CT), np.float32)
    tris = np.zeros((C, CT, 3, 3), np.float32)
    for c in range(C):
        v0 = centers[c] + rng.uniform(-2, 2, (CT, 3))
        e1 = rng.uniform(-0.5, 0.5, (CT, 3))
        e2 = rng.uniform(-0.5, 0.5, (CT, 3))
        tris[c, :, 0] = v0
        tris[c, :, 1] = v0 + e1
        tris[c, :, 2] = v0 + e2
        n = np.cross(e1, e2)
        v0l = v0 - centers[c]
        coef = np.zeros((10, 4 * CT), np.float32)
        coef[0:3, 0 * CT:1 * CT] = -n.T
        coef[0:3, 1 * CT:2 * CT] = np.cross(v0l, e2).T
        coef[3:6, 1 * CT:2 * CT] = e2.T
        coef[0:3, 2 * CT:3 * CT] = -np.cross(v0l, e1).T
        coef[3:6, 2 * CT:3 * CT] = -e1.T
        coef[6:9, 3 * CT:4 * CT] = n.T
        coef[9, 3 * CT:4 * CT] = -np.einsum("tj,tj->t", v0l, n)
        hi = coef.astype(np.dtype("bfloat16")).astype(np.float32) \
            if False else None
        # bf16 split
        u = np.ascontiguousarray(coef, np.float32).view(np.uint32)
        hi = ((u + 0x7FFF + ((u >> 16) & 1)) & 0xFFFF0000).astype(
            np.uint32).view(np.float32)
        blocks[c, 0:10] = hi
        lo = coef - hi
        u2 = np.ascontiguousarray(lo, np.float32).view(np.uint32)
        blocks[c, 10:20] = ((u2 + 0x7FFF + ((u2 >> 16) & 1))
                            & 0xFFFF0000).astype(np.uint32).view(np.float32)

    G = 32 if not interpret else 2
    o = rng.uniform(-25, 25, (G, 3, FLAT)).astype(np.float32)
    d = rng.standard_normal((G, 3, FLAT)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # each group considers ALL KSLOTS clusters (worst case)
    cand = np.zeros((G, 1, 1 + KSLOTS), np.int32)
    cand[:, 0, 0] = KSLOTS
    for g in range(G):
        cand[g, 0, 1:] = rng.choice(C, KSLOTS, replace=False)
    od = np.concatenate([o, d], axis=1)               # [G,6,FLAT]

    t_out, j_out = run(jnp.asarray(cand), jnp.asarray(od),
                       jnp.asarray(blocks), interpret=interpret)
    jax.block_until_ready(t_out)

    # reference: brute force over candidate clusters
    ok = True
    for g in range(min(G, 2)):
        for lane in range(0, FLAT, 73):
            oo = o[g, :, lane]
            dd = d[g, :, lane]
            bt, bj = _BIG, -1
            for c in cand[g, 0, 1:]:
                for j in range(CT):
                    v0, v1, v2 = tris[c, j]
                    e1 = v1 - v0
                    e2 = v2 - v0
                    pv = np.cross(dd, e2)
                    det = e1 @ pv
                    if abs(det) < 1e-12:
                        continue
                    tv = oo - v0
                    u = (tv @ pv) / det
                    qv = np.cross(tv, e1)
                    v = (dd @ qv) / det
                    t = (e2 @ qv) / det
                    if u >= -1e-3 and v >= -1e-3 and u + v <= 1 + 1e-3 \
                            and 0 < t < bt:
                        bt, bj = t, c * CT + j
            kt = float(np.asarray(t_out)[g, lane // 128, lane % 128])
            if bt < _BIG:
                if abs(kt - bt) > 2e-2 * max(1.0, bt):
                    print(f"MISMATCH g={g} lane={lane}: {kt} vs {bt}")
                    ok = False
    print("correctness:", "OK" if ok else "FAIL")

    if not interpret:
        t0 = time.perf_counter()
        N = 20
        for _ in range(N):
            t_out, j_out = run(jnp.asarray(cand), jnp.asarray(od),
                               jnp.asarray(blocks))
        jax.block_until_ready(t_out)
        dt = (time.perf_counter() - t0) / N
        per_visit = dt / (G * KSLOTS)
        print(f"{dt*1e3:.3f} ms for {G} groups x {KSLOTS} visits "
              f"({per_visit*1e9:.0f} ns/visit, all 1024 rays)")


if __name__ == "__main__":
    main()
