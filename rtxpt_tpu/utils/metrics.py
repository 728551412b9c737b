"""Per-frame metrics & perf markers.

Analog of the reference's observability stack (SURVEY.md §5): nested
perf markers (ScopedPerfMarker), avg-ms-per-frame bench window keyed to
accumulation (Sample.cpp:1430-1440), per-subsystem stats readbacks.
Produces the structured metrics the reference lacks: a per-frame dict
(Mrays/s, ms, rays) with CSV/JSON export — this is how BENCH numbers are
produced.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional


class FrameMetrics:
    """Collects per-frame timings + counters; windowed averages exclude
    `warmup` frames (the reference excludes accumulation frames < 16)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.frames: List[Dict] = []
        self._current: Optional[Dict] = None
        self._t0 = 0.0

    def begin_frame(self):
        self._current = {"markers": {}}
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def marker(self, name: str):
        """Nested pass marker (ScopedPerfMarker analog)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            cur = self._current["markers"]
            cur[name] = cur.get(name, 0.0) + dt

    def end_frame(self, rays: int = 0, **counters):
        self._current["ms"] = (time.perf_counter() - self._t0) * 1e3
        self._current["rays"] = rays
        if rays and self._current["ms"] > 0:
            self._current["mrays_s"] = rays / self._current["ms"] / 1e3
        self._current.update(counters)
        self.frames.append(self._current)
        self._current = None

    def averages(self) -> Dict[str, float]:
        fr = self.frames[self.warmup:] or self.frames
        if not fr:
            return {}
        keys = [k for k in fr[0] if isinstance(fr[0][k], (int, float))]
        out = {k: sum(f.get(k, 0.0) for f in fr) / len(fr) for k in keys}
        out["frames"] = len(fr)
        return out

    @staticmethod
    def device_memory() -> Dict[str, int]:
        """HBM usage snapshot (the VRAM-budget query analog,
        SampleBaseApp.cpp:125-138)."""
        import jax

        try:
            stats = jax.devices()[0].memory_stats() or {}
            return {k: int(v) for k, v in stats.items()
                    if isinstance(v, (int, float))}
        except Exception:
            return {}

    @staticmethod
    @contextlib.contextmanager
    def profiler_trace(out_dir: str):
        """Capture a `jax.profiler` device trace around the enclosed
        frames (SURVEY.md §5 TPU plan — the Nsight/PIX pass-marker
        analog, Sample.cpp:2459/2498). View with TensorBoard or
        xprof; yields the artifact directory (or None when the
        profiler is unavailable on this backend) so callers can embed
        the path in their metrics JSON."""
        import jax

        try:
            jax.profiler.start_trace(out_dir)
        except Exception:
            yield None
            return
        try:
            yield out_dir
        finally:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass

    def dump_json(self, path: str):
        with open(path, "w") as f:
            json.dump({"frames": self.frames, "avg": self.averages()}, f,
                      indent=2)

    def dump_csv(self, path: str):
        if not self.frames:
            return
        keys = sorted({k for f in self.frames for k in f
                       if isinstance(f.get(k), (int, float))})
        with open(path, "w") as f:
            f.write(",".join(keys) + "\n")
            for fr in self.frames:
                f.write(",".join(str(fr.get(k, "")) for k in keys) + "\n")
