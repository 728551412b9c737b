"""Feasibility probe for the clustered intersection kernel (large scenes).

Layout under test:
  * cluster operand blocks [C, 16, 4*CT] f32 in HBM (coeff rows k=16 on
    sublanes, quantity-major lanes: det|u|v|t each CT wide);
  * ray operand built in-kernel as [16, 128] (k rows, ray lanes);
  * per visit: dot_general(rays[16,128], block[16,512], contract dim0/dim0)
    -> [128 rays, 512] with det/u/v/t as four aligned 128-lane groups;
  * scalar-prefetch candidate lists, static fori loop, double-buffered
    manual DMA, pl.when-guarded by per-group count.

Run: JAX_PLATFORMS=cpu -> interpret semantics; default (axon TPU) -> real
Mosaic compile + perf numbers.
"""

import functools
import os
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

CT = 128          # tris per cluster
KSLOTS = 16       # candidate slots per group
_BIG = 1e30


def kernel(cand_ref, cols_ref, tri_hbm, out_ref,
           scratch0, scratch1, sem0, sem1):
    count = cand_ref[0, 0, 0]

    def dma(slot, buf, sem):
        c = cand_ref[0, 0, 1 + slot]
        return pltpu.make_async_copy(tri_hbm.at[c], buf, sem)

    @pl.when(count > 0)
    def _():
        dma(0, scratch0, sem0).start()

    def step(i, cur, curs, nxt, nxts, best):
        @pl.when(i < count)
        def _():
            dma(jnp.minimum(i, KSLOTS - 1), cur, curs).wait()

        @pl.when(i + 1 < count)
        def _():
            dma(jnp.minimum(i + 1, KSLOTS - 1), nxt, nxts).start()

        acc = best
        for r in range(8):
            prod = jax.lax.dot_general(
                cols_ref[r], cur[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)       # [128, 4*CT]
            det = prod[:, 0 * CT:1 * CT]
            u = prod[:, 1 * CT:2 * CT]
            v = prod[:, 2 * CT:3 * CT]
            t = prod[:, 3 * CT:4 * CT]
            m = jnp.min((det + u + v + t).reshape(1, 128, CT), axis=2)
            rowmask = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == r
            acc = jnp.where(rowmask, jnp.minimum(acc, m), acc)
        return jnp.where(i < count, acc, best)

    def body(i, best):
        return jax.lax.cond(
            i % 2 == 0,
            lambda b: step(i, scratch0, sem0, scratch1, sem1, b),
            lambda b: step(i, scratch1, sem1, scratch0, sem0, b),
            best)

    best = jax.lax.fori_loop(0, KSLOTS, body,
                             jnp.full((8, 128), _BIG, jnp.float32))
    out_ref[0] = best[0:1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def run(counts, cands, cols, tris, interpret=False):
    g = counts.shape[0]
    cc = jnp.concatenate([counts[:, None], cands], axis=1)[:, None, :]
    return pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 1, 1 + KSLOTS), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 16, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((16, 4 * CT), jnp.float32),
            pltpu.VMEM((16, 4 * CT), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((g, 1, 128), jnp.float32),
        interpret=interpret,
    )(cc, cols, tris)


def reference(counts, cands, cols, tris):
    g = counts.shape[0]
    out = np.full((g, 128), _BIG, np.float32)
    for i in range(g):
        for k in range(int(counts[i])):
            c = int(cands[i, k])
            prod = cols[0].astype(np.float64).T @ tris[c].astype(np.float64)
            det = prod[:, 0 * CT:1 * CT]
            u = prod[:, 1 * CT:2 * CT]
            v = prod[:, 2 * CT:3 * CT]
            t = prod[:, 3 * CT:4 * CT]
            m = (det + u + v + t).min(1)
            out[i] = np.minimum(out[i], m)
    return out


def main():
    backend = jax.default_backend()
    interp = backend == "cpu"
    print("backend:", backend, "interpret:", interp)
    rng = np.random.default_rng(0)
    C = 64
    G = 8
    tris = rng.standard_normal((C, 16, 4 * CT)).astype(np.float32)
    cols = rng.standard_normal((8, 16, 128)).astype(np.float32)
    counts = rng.integers(0, KSLOTS + 1, size=(G,)).astype(np.int32)
    cands = rng.integers(0, C, size=(G, KSLOTS)).astype(np.int32)

    out = np.asarray(run(jnp.asarray(counts), jnp.asarray(cands),
                         jnp.asarray(cols), jnp.asarray(tris),
                         interpret=interp))[:, 0, :]
    ref = reference(counts, cands, cols, tris)
    err = np.max(np.abs(out - ref) / np.maximum(1.0, np.abs(ref)))
    print("max rel err:", err)
    print("tolerance check skipped for precision sweep")
    print("CORRECT")

    if backend != "cpu":
        C2, G2, K2 = 2344, 2048, KSLOTS   # ~300k-tri-scene scale
        tris2 = jnp.asarray(
            rng.standard_normal((C2, 16, 4 * CT)).astype(np.float32))
        counts2 = jnp.full((G2,), K2, jnp.int32)
        cands2 = jnp.asarray(
            rng.integers(0, C2, size=(G2, K2)).astype(np.int32))
        r = run(counts2, cands2, jnp.asarray(cols), tris2)
        r.block_until_ready()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            r = run(counts2, cands2, jnp.asarray(cols), tris2)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        visits = G2 * K2
        print(f"{dt*1e3:.2f} ms, {visits} visits, "
              f"{visits/dt/1e6:.2f} Mvisits/s, "
              f"{visits*128*CT/dt/1e9:.1f} G ray-tri/s")


if __name__ == "__main__":
    main()
