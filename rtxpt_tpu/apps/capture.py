"""Capture scripting: headless deterministic sequences + screenshots.

Analog of the reference's CaptureScriptManager + headless test flags
(SampleCommon/CaptureScriptManager.h:24, CommandLine.h screenshotFrameIndex/
screenshotFileName, fixed-dt headless determinism Sample.cpp:2602). Drives
the golden-image harness: render a fixed number of real-time frames with a
fixed timestep and save screenshots at requested frame indices.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class CaptureScript:
    screenshot_frames: List[int]
    total_frames: int
    out_pattern: str = "frame_{index:04d}.png"
    fixed_dt: float = 1.0 / 60.0
    animate: Optional[Callable] = None   # (frame, t) -> camera override


def run_capture(scene, host_scene, pt_cfg, render_cfg, script: CaptureScript,
                out_dir: str = ".") -> Dict[int, str]:
    """Run the real-time pipeline deterministically; save screenshots.
    Returns {frame_index: path}."""
    import os
    import jax.numpy as jnp
    from rtxpt_tpu.pt import realtime
    from rtxpt_tpu.scene.procedural import default_camera
    from rtxpt_tpu.utils.image import save_png

    cam = default_camera(host_scene, render_cfg.width, render_cfg.height)
    state = realtime.init_state(render_cfg.height, render_cfg.width)
    saved = {}
    t = 0.0
    prev_hdr = None
    for frame in range(script.total_frames):
        if script.animate is not None:
            cam = script.animate(frame, t) or cam
        img, hdr, state = realtime.render_frame(scene, cam, pt_cfg,
                                                render_cfg, state)
        # Frame generation (DLSS-FG/MFG analog): synthesize interpolated
        # frames between the previous and this rendered frame from the
        # renderer's own motion vectors (render/framegen.py).
        if (render_cfg.frame_gen > 0 and prev_hdr is not None
                and frame in script.screenshot_frames
                and state.motion is not None):
            from rtxpt_tpu.render.framegen import generate_frames
            from rtxpt_tpu.render.postprocess import tonemap
            gens = generate_frames(prev_hdr, hdr, state.motion,
                                   n=render_cfg.frame_gen)
            for k, g in enumerate(gens):
                gimg = tonemap(g, render_cfg.exposure, render_cfg.tonemap)
                gpath = os.path.join(
                    out_dir, script.out_pattern.format(index=frame)
                    .replace(".png", f".gen{k}.png"))
                save_png(gpath, np.asarray(gimg))
                saved[f"{frame}.gen{k}"] = gpath
        prev_hdr = hdr
        if frame in script.screenshot_frames:
            path = os.path.join(out_dir,
                                script.out_pattern.format(index=frame))
            save_png(path, np.asarray(img))
            saved[frame] = path
        t += script.fixed_dt
    return saved
