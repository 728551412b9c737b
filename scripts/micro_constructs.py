"""Bisect which Mosaic construct of the all-rows clustered kernel wedges
the TPU worker. Each construct compiles+runs in its OWN subprocess with a
timeout, in increasing order of suspicion; results logged to stdout.

Usage: python scripts/micro_constructs.py [construct ...]
With no args, prints the construct list.
"""

import os
import subprocess
import sys

CONSTRUCTS = [
    "tile8",          # lane-concat of identical [1,128] tiles -> [1,1024]
    "subl_concat",    # sublane-concat of [1,1024] ref-row slices
    "mm_concat_256",  # concat-built [32,512] x [32,256] matmul
    "mm_concat_1024",  # concat-built [32,512] x [32,1024] matmul (DEFAULT)
    "unflat",         # [1,1024] -> [8,128] lane-slice + sublane-concat
    "scratch32",      # [32,1024] VMEM scratch where-update
    "iota_sel",       # [128,1024] iota select + one-hot matmul
]

BODY = r'''
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NAME = %r

def kernel(x_ref, b_ref, o_ref, scr):
    x = x_ref[:]                      # [16, 1024]
    if NAME == "tile8":
        t = x[0:1, 0:128]
        y = jnp.concatenate([t] * 8, axis=1)          # [1,1024]
        o_ref[:] = y * 2.0
    elif NAME == "subl_concat":
        rows = [x[i:i + 1] for i in range(10)]
        y = jnp.concatenate(rows, axis=0)             # [10,1024]
        o_ref[:] = jnp.sum(y, axis=0, keepdims=True)
    elif NAME in ("mm_concat_256", "mm_concat_1024"):
        n = 256 if NAME == "mm_concat_256" else 1024
        blk = b_ref[:]                                 # [32, 512]
        cstack = jnp.concatenate(
            [blk[0:10], blk[0:10], blk[10:20],
             jnp.zeros((2, 512), jnp.float32)], axis=0)
        rows = [x[i:i + 1, 0:n] for i in range(10)]
        rvec = jnp.concatenate(rows, axis=0)           # [10, n]
        hi = rvec.astype(jnp.bfloat16).astype(jnp.float32)
        cols = jnp.concatenate(
            [hi, rvec - hi, hi, jnp.zeros((2, n), jnp.float32)], axis=0)
        prod = jax.lax.dot_general(cstack, cols, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        m = jnp.max(prod, axis=0, keepdims=True)       # [1, n]
        o_ref[:] = jnp.concatenate([m] * (1024 // n), axis=1)
    elif NAME == "unflat":
        f = x[0:1]                                     # [1,1024]
        y = jnp.concatenate([f[0:1, r * 128:(r + 1) * 128]
                             for r in range(8)], axis=0)   # [8,128]
        o_ref[:] = jnp.concatenate([jnp.sum(y, axis=0, keepdims=True)] * 8,
                                   axis=1)
    elif NAME == "scratch32":
        scr[:] = jnp.zeros((32, 1024), jnp.float32) + x[0:1]
        b = scr[:]
        scr[:] = jnp.where(x[0:1] > 0.5, b * 2.0, b)
        o_ref[:] = scr[0:1]
    elif NAME == "iota_sel":
        t_m = jnp.broadcast_to(x[0:1], (128, 1024))
        t_c = jnp.min(t_m, axis=0, keepdims=True)
        iota = jax.lax.broadcasted_iota(jnp.int32, (128, 1024), 0)
        jrow = jnp.min(jnp.where(t_m <= t_c, iota, 128), axis=0,
                       keepdims=True)
        sel = (iota == jrow).astype(jnp.float32)
        amat = jnp.broadcast_to(x[0:1, 0:128], (27, 128))
        attr = jax.lax.dot_general(amat, sel, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        o_ref[:] = jnp.max(attr, axis=0, keepdims=True)

x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (16, 1024)),
                jnp.float32)
b = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (32, 512)),
                jnp.float32)
f = pl.pallas_call(
    kernel,
    in_specs=[pl.BlockSpec((16, 1024), lambda: (0, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((32, 512), lambda: (0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, 1024), lambda: (0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, 1024), jnp.float32),
    scratch_shapes=[pltpu.VMEM((32, 1024), jnp.float32)],
)
y = np.asarray(f(x, b))
assert np.isfinite(y).all()
print("RAN_OK", NAME, flush=True)
'''


def main():
    names = sys.argv[1:] or CONSTRUCTS
    for name in names:
        code = BODY % name
        try:
            r = subprocess.run([sys.executable, "-c", code], timeout=240,
                               capture_output=True, text=True)
            ok = "RAN_OK" in r.stdout
            tailerr = [l for l in r.stderr.splitlines()
                       if "Mosaic" in l or "Error" in l][:2]
            print(f"{name}: {'OK' if ok else 'FAIL rc=%d' % r.returncode}",
                  *tailerr, flush=True)
            if not ok:
                return  # stop before wedging further
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT (worker wedge?)", flush=True)
            return


if __name__ == "__main__":
    main()
