"""Pipelined frame driver (pt/frame_graph.py): identical images to the
serial loop, one-frame latency, single host sync per step."""

import numpy as np

from rtxpt_tpu.config import DenoiserMode, PathTracerConfig, RenderConfig
from rtxpt_tpu.pt import realtime
from rtxpt_tpu.pt.frame_graph import PipelinedRenderer
from rtxpt_tpu.scene.procedural import default_camera

W, H = 48, 32


def test_pipelined_matches_serial(cornell_scene):
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    cfg = PathTracerConfig(max_bounces=2)
    rc = RenderConfig(width=W, height=H, denoiser=DenoiserMode.RELAX,
                      tonemap="none")

    state = realtime.init_state(H, W)
    serial = []
    for _ in range(4):
        img, hdr, state = realtime.render_frame(scene, cam, cfg, rc, state)
        serial.append(np.asarray(hdr))

    pr = PipelinedRenderer(scene, cfg, rc)
    piped = []
    for _ in range(4):
        out = pr.step(cam)
        if out is not None:
            piped.append(out[1])
    last = pr.flush()
    assert last is not None
    piped.append(last[1])

    assert len(piped) == 4
    for a, b in zip(serial, piped):
        assert np.allclose(a, b, atol=1e-6), float(np.abs(a - b).max())


def test_first_step_returns_none(cornell_scene):
    host, scene = cornell_scene
    cam = default_camera(host, W, H)
    pr = PipelinedRenderer(scene, PathTracerConfig(max_bounces=1),
                           RenderConfig(width=W, height=H,
                                        denoiser=DenoiserMode.NONE,
                                        tonemap="none"))
    assert pr.step(cam) is None
    assert pr.step(cam) is not None
    assert pr.flush() is not None
    assert pr.flush() is None
