"""Concurrent pipeline warmup — the PTPipelineBaker analog.

The reference bakes shader permutations on a thread pool before the first
frame (PTPipelineBaker.h:17 donut ThreadPool; SURVEY §2.2/§2.6 "threaded
host shader compilation -> concurrent jit warmup"). The XLA equivalent of
a PSO permutation is a (config, resolution) jit specialization: first
compilation of each takes tens of seconds on TPU, and XLA compilation
releases the GIL, so warming the expected permutations on a thread pool
overlaps their compiles exactly like the reference's baker.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Optional, Sequence, Tuple

import jax.numpy as jnp


def warmup_pipelines(scene, cam, permutations: Sequence[Tuple],
                     max_workers: int = 4) -> dict:
    """Pre-compile render_sample specializations concurrently.

    permutations: sequence of (cfg, width, height) tuples — one per
    expected (mode, resolution) combination, mirroring the reference's
    permutation table from MaterialsBaker/PTPipelineBaker.
    Returns {permutation index: exception or None}.
    """
    from rtxpt_tpu.pt.integrator import render_sample_jit

    def bake(i):
        cfg, w, h = permutations[i]
        try:
            out = render_sample_jit(scene, cam, cfg, w, h, jnp.uint32(0))
            out["L"].block_until_ready()
            return None
        except Exception as e:                       # surface, don't raise
            return e

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        results = list(pool.map(bake, range(len(permutations))))
    return dict(enumerate(results))
