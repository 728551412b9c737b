"""Headless render CLI.

Flag surface mirrors the reference's command line (reference:
SampleCommon/CommandLine.h:16-65 — scene, width/height, spp, NEE type,
denoiser, screenshot naming, nonInteractive/noWindow headless mode; our
framework is headless-first so --out *is* the screenshot path).

Usage:
    python -m rtxpt_tpu.apps.cli --scene cornell --width 512 --height 512 \
        --spp 16 --bounces 6 --out out.png [--hdr out.npy] [--aux]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_scene(name: str, args):
    from rtxpt_tpu.scene import procedural

    if name == "cornell":
        return procedural.cornell_box()
    if name == "cornell-specular":
        return procedural.cornell_box(sphere_specular=True)
    if name == "furnace":
        return procedural.furnace_box()
    if name == "triangle":
        return procedural.single_triangle()
    if name == "cornell-textured":
        return procedural.textured_cornell(with_env=True)
    if name == "city":
        return procedural.city_scene()
    if name == "city-textured":
        return procedural.city_scene(textured=True, with_env=True)
    if name == "kitchen":
        return procedural.kitchen_scene()
    if name.endswith((".gltf", ".glb")):
        from rtxpt_tpu.scene.gltf import load_gltf
        return load_gltf(name)
    raise SystemExit(f"unknown scene '{name}' (procedural: cornell, "
                     f"cornell-specular, cornell-textured, furnace, "
                     f"triangle, city, city-textured, kitchen; or a "
                     f".gltf/.glb)")


def main(argv=None):
    p = argparse.ArgumentParser(prog="rtxpt_tpu",
                                description="TPU-native path tracer")
    p.add_argument("--scene", default="cornell",
                   help="procedural name or .gltf/.glb path")
    p.add_argument("--preset", choices=["fast", "balanced", "quality",
                                        "reference"], default=None,
                   help="performance preset (overridden by explicit flags)")
    p.add_argument("--env-quads", type=int, default=0, metavar="Q",
                   help="bake the environment as Q region lights "
                        "(kEnvironmentQuad analog; pairs well with "
                        "--nee neeat)")
    p.add_argument("--sky", action="store_true",
                   help="add a procedural sky environment")
    p.add_argument("--envmap", default=None,
                   help="equirect HDR/.npy environment image path")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--spp", type=int, default=16)
    p.add_argument("--bounces", type=int, default=6)
    p.add_argument("--nee", choices=["off", "uniform", "power", "neeat"],
                   default="power",
                   help="light sampler; 'neeat' enables the feedback-"
                        "adaptive tier (needs --realtime for the feedback "
                        "loop)")
    p.add_argument("--no-mis", action="store_true")
    p.add_argument("--no-rr", action="store_true")
    p.add_argument("--firefly-clamp", type=float, default=0.0)
    p.add_argument("--exposure", type=float, default=1.0)
    p.add_argument("--auto-exposure", action="store_true")
    p.add_argument("--tonemap", choices=["aces", "reinhard", "linear", "none"],
                   default="aces")
    p.add_argument("--out", default="out.png", help="PNG output path")
    p.add_argument("--hdr", default=None, help="also dump linear HDR .npy")
    p.add_argument("--aux", action="store_true",
                   help="dump albedo/normal/depth guide buffers")
    p.add_argument("--seed", type=int, default=0, help="first sample index")
    p.add_argument("--hybrid", action="store_true",
                   help="hybrid G-buffer renderer (IntroSample analog): "
                        "deferred lighting + GTAO + local-probe IBL + "
                        "ray-traced reflections")
    p.add_argument("--realtime", type=int, default=0, metavar="FRAMES",
                   help="real-time mode: run N 1-spp frames through the "
                        "denoiser/TAA pipeline, save the last")
    p.add_argument("--denoiser", choices=["none", "relax", "reblur"],
                   default="relax", help="denoiser for --realtime")
    p.add_argument("--restir", choices=["none", "di", "digi"],
                   default="none",
                   help="resampled direct (+one-bounce indirect) lighting "
                        "in --realtime frames (RtxdiPass analog)")
    p.add_argument("--regir", action="store_true",
                   help="with --restir: draw DI candidates from the ReGIR "
                        "world-space cell grid")
    p.add_argument("--render-scale", type=float, default=1.0,
                   help="trace at this fraction of display resolution and "
                        "temporally upscale (DLSS-SR substitute)")
    p.add_argument("--split-denoise", action="store_true",
                   help="denoise diffuse/specular channels separately")
    p.add_argument("--pipelined", action="store_true",
                   help="double-buffered frame driver: overlap host IO "
                        "with device compute (one frame latency)")
    p.add_argument("--stable-planes", action="store_true",
                   help="real-time path-space decomposition (delta chains)")
    p.add_argument("--taa", action="store_true")
    p.add_argument("--stf", action="store_true",
                   help="stochastic texture filtering (RTXTF analog; "
                        "required for textured scenes on the Pallas hot "
                        "tiers)")
    p.add_argument("--bloom", action="store_true")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--materials-json", default=None,
                   help="material sidecar: overrides applied after scene "
                        "load (MaterialsBaker JSON analog)")
    p.add_argument("--save-materials", default=None, metavar="PATH",
                   help="dump the loaded scene's material table to a JSON "
                        "sidecar and continue")
    p.add_argument("--camera-json", default=None,
                   help="camera sidecar: loaded if it exists, else saved "
                        "after the render (Sample.cpp:919-987 analog)")
    p.add_argument("--devices", type=int, default=0,
                   help="shard across N devices (0 = single device)")
    p.add_argument("--metrics", default=None,
                   help="write perf metrics JSON here")
    p.add_argument("--debug-view", default=None,
                   choices=["albedo", "normal", "depth", "emission"],
                   help="render a guide-buffer visualization instead of the "
                        "beauty image (SampleUI debug views analog)")
    p.add_argument("--denoise-still", action="store_true",
                   help="photo mode: run the spatial denoiser on the final "
                        "accumulated image (OptiX-denoised-screenshot analog)")
    args = p.parse_args(argv)
    from rtxpt_tpu.utils.localconfig import apply_local_config
    applied = apply_local_config(args, argv)
    if applied:
        print(f"[localconfig] {dict(applied)}", file=sys.stderr)
    if args.spp < 1:
        p.error("--spp must be >= 1")
    if args.width < 1 or args.height < 1:
        p.error("--width/--height must be >= 1")
    if args.bounces < 0:
        p.error("--bounces must be >= 0")

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax
    import jax.numpy as jnp

    from rtxpt_tpu.config import NEEMode, PathTracerConfig
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.render.postprocess import (
        auto_exposure_histogram, tonemap)
    from rtxpt_tpu.scene.procedural import default_camera
    from rtxpt_tpu.utils.image import save_png

    host = build_scene(args.scene, args)
    if args.materials_json:
        from rtxpt_tpu.scene.materials_io import apply_materials_json
        apply_materials_json(host, args.materials_json)
    if args.save_materials:
        from rtxpt_tpu.scene.materials_io import save_materials_json
        save_materials_json(args.save_materials, host)
    if args.sky:
        from rtxpt_tpu.lighting.sky import make_sky
        host.envmap_image = make_sky()
    elif args.envmap:
        if args.envmap.endswith(".npy"):
            host.envmap_image = np.load(args.envmap)
        else:
            from rtxpt_tpu.utils.image import load_png
            host.envmap_image = load_png(args.envmap)
    t0 = time.time()
    scene = prepare(host)
    print(f"[prepare] {scene.geometry.num_triangles} tris, "
          f"{scene.lights.count} lights, {time.time()-t0:.2f}s",
          file=sys.stderr)

    if args.camera_json:
        from rtxpt_tpu.render.checkpoint import load_camera
        loaded = load_camera(args.camera_json)
        if loaded:
            host.camera = loaded
    cam = default_camera(host, args.width, args.height)
    if args.camera_json and host.camera:
        from rtxpt_tpu.render.checkpoint import save_camera
        save_camera(args.camera_json, host.camera)
    if args.preset:
        from rtxpt_tpu.config import PRESETS
        pre = PRESETS[args.preset]
        if "--bounces" not in (argv or sys.argv):
            args.bounces = pre.pt.max_bounces
        if "--spp" not in (argv or sys.argv):
            args.spp = pre.render.spp
    cfg = PathTracerConfig(
        max_bounces=args.bounces,
        nee={"off": NEEMode.OFF, "uniform": NEEMode.UNIFORM,
             "power": NEEMode.POWER, "neeat": NEEMode.NEEAT}[args.nee],
        enable_mis=not args.no_mis,
        enable_russian_roulette=not args.no_rr,
        firefly_clamp=args.firefly_clamp,
        stochastic_texture_filtering=args.stf,
    )
    from rtxpt_tpu.pt.dispatch import resolve as _resolve_tier
    print(f"[dispatch] kernel tier: {_resolve_tier(scene, cfg).kernel_tier}",
          file=sys.stderr)

    t0 = time.time()
    if args.hybrid:
        from rtxpt_tpu.pt.hybrid import render_hybrid
        from rtxpt_tpu.render.postprocess import tonemap
        hdr = np.asarray(render_hybrid(scene, cam, args.width, args.height))
        dt = time.time() - t0
        print(f"[hybrid] {args.width}x{args.height} in {dt:.2f}s "
              f"(incl. probe bake + compile)", file=sys.stderr)
        img = np.asarray(tonemap(jnp.asarray(hdr), args.exposure,
                                 args.tonemap))
        save_png(args.out, img)
        print(f"[out] {args.out}", file=sys.stderr)
        if args.hdr:
            np.save(args.hdr, hdr)
        return 0
    if args.realtime:
        from rtxpt_tpu.config import DenoiserMode, RenderConfig
        from rtxpt_tpu.pt import realtime

        rc = RenderConfig(
            width=args.width, height=args.height,
            denoiser={"relax": DenoiserMode.RELAX,
                      "reblur": DenoiserMode.REBLUR,
                      "none": DenoiserMode.NONE}[args.denoiser],
            enable_taa=args.taa, enable_bloom=args.bloom,
            exposure=args.exposure, tonemap=args.tonemap,
            render_scale=args.render_scale,
            split_denoise=args.split_denoise,
            restir=args.restir, restir_regir=args.regir)
        if args.pipelined:
            from rtxpt_tpu.pt.frame_graph import PipelinedRenderer
            pr = PipelinedRenderer(scene, cfg, rc,
                                   stable_planes=args.stable_planes)
            for fidx in range(args.realtime):
                pr.step(cam)
            img, hdr = pr.flush()
        else:
            state = realtime.init_state(args.height, args.width,
                                        scene=scene, pt_cfg=cfg)
            frame_fn = (realtime.render_frame_stable_planes
                        if args.stable_planes else realtime.render_frame)
            for fidx in range(args.realtime):
                img, hdr, state = frame_fn(scene, cam, cfg, rc, state)
        dt = time.time() - t0
        print(f"[realtime] {args.realtime} frames in {dt:.2f}s "
              f"({dt/args.realtime*1e3:.1f} ms/frame avg incl. compile)",
              file=sys.stderr)
        save_png(args.out, np.asarray(img))
        print(f"[out] {args.out}", file=sys.stderr)
        if args.hdr:
            np.save(args.hdr, np.asarray(hdr))
        if args.metrics:
            with open(args.metrics, "w") as f:
                json.dump({"mode": "realtime", "frames": args.realtime,
                           "seconds": dt,
                           "ms_per_frame": dt / args.realtime * 1e3}, f)
        return 0
    if args.devices:
        from rtxpt_tpu.parallel.mesh import make_mesh, render_sample_sharded
        mesh = make_mesh(args.devices)
        acc = None
        rays = 0
        for s in range(args.seed, args.seed + args.spp):
            L, rc = render_sample_sharded(scene, cam, cfg, args.width,
                                          args.height, jnp.uint32(s), mesh)
            acc = L if acc is None else acc + L
            rays += int(rc)
        hdr = np.asarray(acc) / args.spp
        aux = {}
    else:
        from rtxpt_tpu.pt.integrator import render
        hdr, aux, rays = render(scene, cam, cfg, args.width, args.height,
                                spp=args.spp, first_sample=args.seed,
                                want_aux=args.aux)
        hdr = np.asarray(hdr)
    dt = time.time() - t0
    mrays = rays / dt / 1e6
    print(f"[render] {args.width}x{args.height}@{args.spp}spp in {dt:.2f}s "
          f"({rays} rays, {mrays:.2f} Mrays/s incl. compile)", file=sys.stderr)

    if args.debug_view:
        from rtxpt_tpu.pt.integrator import render_sample_jit
        from rtxpt_tpu.render.debug_viz import visualize
        aux_out = render_sample_jit(scene, cam, cfg, args.width, args.height,
                                    jnp.uint32(args.seed), True)
        img = np.asarray(visualize(args.debug_view,
                                   albedo=aux_out["albedo"],
                                   normal=aux_out["normal"],
                                   depth=aux_out["depth"],
                                   emission=aux_out["emission"]))
        save_png(args.out, img)
        print(f"[out] {args.out} (debug view: {args.debug_view})",
              file=sys.stderr)
        return 0

    if args.denoise_still:
        # Photo mode (reference: Sample.cpp:2782 DenoisedScreenshot via the
        # OptiX CLI denoiser): spatial-only pass of our own denoiser using
        # freshly traced guide buffers.
        from rtxpt_tpu.pt.integrator import render_sample_jit
        from rtxpt_tpu.render import denoise as dn
        aux_out = render_sample_jit(scene, cam, cfg, args.width, args.height,
                                    jnp.uint32(args.seed), True)
        albedo = jnp.maximum(aux_out["albedo"], 1e-3)
        illum = jnp.asarray(hdr) / albedo
        variance = jnp.ones((args.height, args.width), jnp.float32) * 0.25
        for it in range(4):
            illum, variance = dn.atrous_iteration(
                illum, variance, aux_out["normal"], aux_out["depth"], it)
        hdr = np.asarray(illum * albedo)

    exposure = args.exposure
    if args.auto_exposure:
        exposure = float(auto_exposure_histogram(jnp.asarray(hdr)))
    ldr = np.asarray(tonemap(jnp.asarray(hdr), exposure, args.tonemap))
    save_png(args.out, ldr)
    print(f"[out] {args.out}", file=sys.stderr)
    if args.hdr:
        np.save(args.hdr, hdr)
    if args.aux and aux:
        base = args.out.rsplit(".", 1)[0]
        for k, v in aux.items():
            np.save(f"{base}.{k}.npy", np.asarray(v))
    if args.metrics:
        with open(args.metrics, "w") as f:
            json.dump({"mrays_s": mrays, "seconds": dt, "rays": rays,
                       "spp": args.spp,
                       "resolution": [args.width, args.height]}, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
