"""Pipelined (double-buffered) frame driver — async-compute overlap.

The reference splits per-frame GPU work across async queues: the
lighting bake runs on a compute queue overlapping BVH builds and the
previous frame's trace (reference: LightsBaker::UpdateBegin/UpdateEnd
designed for async queues, Lighting/LightsBaker.h:88-91; per-frame
ordering in Sample::Render, Sample.cpp:1891-2312). On TPU the analog is
XLA's asynchronous dispatch: every jitted stage returns device futures
immediately, so overlap falls out of NOT synchronizing — the frame graph
discipline is (a) keep the whole frame one chain of jitted calls with no
host readbacks inside (pt/realtime.render_frame is built that way), and
(b) fetch frame N's pixels only AFTER frame N+1's device work has been
enqueued. This driver enforces (b) with a one-frame-deep pipeline:
host-side work (PNG encode, disk IO, metrics) overlaps device compute,
at a latency cost of exactly one frame.

Double-buffered feedback state is inherent to the design: the NEE-AT
histograms and ReSTIR reservoirs produced by frame N are *inputs* to
frame N+1's dispatch (RealtimeState threading), never read back to the
host — the same one-frame-latency contract as the reference's feedback
reprojection (LightsBaker.cpp:1331-1408).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from rtxpt_tpu.pt import realtime


class PipelinedRenderer:
    """One-frame-deep pipelined realtime driver.

    step(cam) dispatches the next frame and returns the PREVIOUS frame's
    (display, hdr) as numpy — None on the first call. flush() drains the
    last in-flight frame. Images are identical to serial render_frame
    calls; only the host sync point moves.
    """

    def __init__(self, scene, pt_cfg, rc, stable_planes: bool = False):
        self.scene = scene
        self.pt_cfg = pt_cfg
        self.rc = rc
        self.state = realtime.init_state(rc.height, rc.width, scene=scene,
                                         pt_cfg=pt_cfg)
        self._frame_fn = (realtime.render_frame_stable_planes
                          if stable_planes else realtime.render_frame)
        self._pending = None

    def step(self, cam) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        img, hdr, self.state = self._frame_fn(
            self.scene, cam, self.pt_cfg, self.rc, self.state)
        prev, self._pending = self._pending, (img, hdr)
        if prev is None:
            return None
        # the ONLY host sync: frame N-1, after frame N is enqueued
        return np.asarray(prev[0]), np.asarray(prev[1])

    def flush(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        prev, self._pending = self._pending, None
        if prev is None:
            return None
        return np.asarray(prev[0]), np.asarray(prev[1])
