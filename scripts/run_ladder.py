"""Run the BASELINE.json config ladder end-to-end and report metrics.

The five rungs mirror BASELINE.json "configs" (the driver's acceptance
ladder). Each rung prints one JSON line with timing and, where a cheap
oracle exists, an RMSE. Usage:

    python scripts/run_ladder.py                 # all rungs, default res
    python scripts/run_ladder.py --rung 3        # one rung
    python scripts/run_ladder.py --scale 0.5     # halve resolutions
    python scripts/run_ladder.py --cpu           # force CPU backend

On TPU this is the evidence run for "a user of the reference can run
every headline workload here"; on CPU it is a smoke/correctness pass.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _tm(x):
    x = np.clip(np.asarray(x), 0.0, None)
    return x / (1.0 + x)


def rung1(scale):
    """Reference accumulation: Cornell 64spp @ 256x256 + golden RMSE."""
    import jax.numpy as jnp
    from rtxpt_tpu.config import PathTracerConfig
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt.integrator import render
    from rtxpt_tpu.scene.procedural import cornell_box, default_camera

    w = h = max(int(256 * scale), 32)
    spp = 64
    host = cornell_box()
    sd = prepare(host)
    cam = default_camera(host, w, h)
    t0 = time.perf_counter()
    img, _, rays = render(sd, cam, PathTracerConfig(max_bounces=6), w, h,
                          spp=spp)
    img = np.asarray(img)
    dt = time.perf_counter() - t0
    out = dict(rung=1, scene="cornell", mode="reference", res=f"{w}x{h}",
               spp=spp, seconds=round(dt, 2),
               mrays_s=round(int(rays) / dt / 1e6, 2))
    g = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                     "cornell.reference.8spp.npy")
    if w == h == 32 and os.path.exists(g):
        out["rmse_vs_golden"] = round(float(np.sqrt(np.mean(
            (_tm(img) - _tm(np.load(g))) ** 2))), 4)
    return out


def rung2(scale):
    """NEE + emissive + envmap IS + Owen sampler + RayCones + firefly."""
    from rtxpt_tpu.config import NEEMode, PathTracerConfig
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt.integrator import render
    from rtxpt_tpu.scene.procedural import default_camera, textured_cornell

    w = h = max(int(512 * scale), 32)
    host = textured_cornell(with_env=True)
    sd = prepare(host)
    cam = default_camera(host, w, h)
    cfg = PathTracerConfig(max_bounces=5, nee=NEEMode.POWER,
                           firefly_clamp=16.0,
                           stochastic_texture_filtering=True)
    t0 = time.perf_counter()
    img, _, rays = render(sd, cam, cfg, w, h, spp=16)
    dt = time.perf_counter() - t0
    img = np.asarray(img)
    assert np.isfinite(img).all()
    return dict(rung=2, scene="textured_cornell+env", mode="reference",
                res=f"{w}x{h}", spp=16, seconds=round(dt, 2),
                mrays_s=round(int(rays) / dt / 1e6, 2),
                mean=round(float(img.mean()), 4))


def rung3(scale):
    """Real-time: NEE-AT + 3-plane stable decomposition + denoiser."""
    from rtxpt_tpu.config import (DenoiserMode, NEEMode, PathTracerConfig,
                                  RenderConfig)
    from rtxpt_tpu.pt import realtime
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.scene.procedural import default_camera, kitchen_scene

    w = h = max(int(512 * scale), 32)
    frames = 8
    host = kitchen_scene()
    sd = prepare(host)
    cam = default_camera(host, w, h)
    cfg = PathTracerConfig(max_bounces=3, nee=NEEMode.NEEAT)
    rc = RenderConfig(width=w, height=h, denoiser=DenoiserMode.RELAX,
                      enable_taa=True, tonemap="aces")
    state = realtime.init_state(h, w, scene=sd, pt_cfg=cfg)
    img = hdr = None
    t0 = time.perf_counter()
    for _ in range(frames):
        img, hdr, state = realtime.render_frame_stable_planes(
            sd, cam, cfg, rc, state)
    np.asarray(img)
    dt = time.perf_counter() - t0
    # quality vs converged golden when at golden res
    out = dict(rung=3, scene="kitchen_513_lights",
               mode="realtime+neeat+stable_planes+relax",
               res=f"{w}x{h}", frames=frames, seconds=round(dt, 2),
               ms_per_frame=round(dt / frames * 1e3, 1))
    g = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens",
                     "kitchen.reference.64spp.npy")
    if (w, h) == (256, 256) and os.path.exists(g):
        out["rmse_vs_converged"] = round(float(np.sqrt(np.mean(
            (_tm(hdr) - _tm(np.load(g))) ** 2))), 4)
    return out


def rung4(scale):
    """ReSTIR DI + GI on the many-light interior (RTXDI path)."""
    from rtxpt_tpu.config import (DenoiserMode, NEEMode, PathTracerConfig,
                                  RenderConfig)
    from rtxpt_tpu.pt import realtime
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.scene.procedural import default_camera, kitchen_scene

    w = h = max(int(512 * scale), 32)
    frames = 8
    host = kitchen_scene()
    sd = prepare(host)
    cam = default_camera(host, w, h)
    cfg = PathTracerConfig(max_bounces=2, nee=NEEMode.POWER)
    rc = RenderConfig(width=w, height=h, denoiser=DenoiserMode.RELAX,
                      tonemap="aces", restir="digi")
    state = realtime.init_state(h, w, scene=sd, pt_cfg=cfg)
    img = None
    t0 = time.perf_counter()
    for _ in range(frames):
        img, hdr, state = realtime.render_frame(sd, cam, cfg, rc, state)
    np.asarray(img)
    dt = time.perf_counter() - t0
    return dict(rung=4, scene="kitchen_513_lights", mode="restir_digi",
                res=f"{w}x{h}", frames=frames, seconds=round(dt, 2),
                ms_per_frame=round(dt / frames * 1e3, 1))


def rung5(scale):
    """Animated Bistro stress (BASELINE config 5): the committed
    programmer-art bistro asset — 0.57M tris, alpha-tested foliage
    (OMM micromaps), glass volumes + nested priorities, >128 emissive
    bulbs, base-color + normal-map textures — swaying crowns/sign via
    per-frame device refit, RELAX denoise + TAA + bloom + tonemap
    (reference workload: Amazon Lumberyard Bistro, README.md; per-frame
    BLAS update Sample.cpp:1170-1198)."""
    from rtxpt_tpu.config import (DenoiserMode, NEEMode, PathTracerConfig,
                                  RenderConfig)
    from rtxpt_tpu.pt import realtime
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.scene import animation as anim
    from rtxpt_tpu.scene.procedural import (bistro_animations,
                                            bistro_scene, default_camera)

    w = max(int(1920 * scale), 64)
    h = max(int(1080 * scale), 36)
    frames = 6
    budget = 600_000 if scale >= 0.5 else 60_000
    host = bistro_scene(tri_budget=budget)
    sd = prepare(host)
    n_tris = int(np.asarray(sd.geometry.indices).shape[0])
    tracks = bistro_animations(host)
    cam = default_camera(host, w, h)
    cfg = PathTracerConfig(max_bounces=4, nee=NEEMode.POWER,
                           stochastic_texture_filtering=True,
                           firefly_clamp=32.0)
    rc = RenderConfig(width=w, height=h, denoiser=DenoiserMode.RELAX,
                      enable_taa=True, enable_bloom=True, tonemap="aces")
    state = realtime.init_state(h, w, scene=sd, pt_cfg=cfg)

    tables = None
    img = None
    t0 = time.perf_counter()
    for i in range(frames):
        sd, tables = anim.refresh_refit(host, tracks, i * 0.12, sd,
                                        tables=tables)
        img, hdr, state = realtime.render_frame(sd, cam, cfg, rc, state)
    np.asarray(img)
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(img)).all()
    return dict(rung=5, scene=f"bistro_{n_tris}tris",
                mode="realtime_stress_anim", res=f"{w}x{h}",
                frames=frames, seconds=round(dt, 2),
                ms_per_frame=round(dt / frames * 1e3, 1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rung", type=int, default=0, help="0 = all")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    rungs = {1: rung1, 2: rung2, 3: rung3, 4: rung4, 5: rung5}
    todo = [args.rung] if args.rung else sorted(rungs)
    results = []
    for r in todo:
        out = rungs[r](args.scale)
        results.append(out)
        print(json.dumps(out), flush=True)
    ok = all(np.isfinite(list(
        v for v in r.values() if isinstance(v, float))).all()
        for r in results)
    print(json.dumps({"ladder": "complete", "rungs": todo, "ok": bool(ok)}))


if __name__ == "__main__":
    main()
