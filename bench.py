"""Benchmark: Mrays/s of the wavefront path tracer on real hardware.

Protocol mirrors the reference's in-app measurement (avg over frames with
warmup excluded, Sample.cpp:1430-1440) on the BASELINE.json ladder scene
class: Cornell-style interior at 1080p, reference mode, plus the 340k-tri
city on the clustered streamed tier (the Bistro-class path).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 200 (the BASELINE.md >=200 Mrays/s v5e-8 target,
scaled by nothing — single-chip numbers count against the same bar).

Robustness: this environment's remote TPU compile helper can wedge for
30-120 min on a novel compile unit (docs/PERF_NOTES.md). Each stage
therefore runs in a SUBPROCESS with its own deadline — a wedged stage is
reported as {"error": "timeout"} instead of hanging the whole bench —
and compiled programs land in a persistent cache so the next run skips
straight to execution.
"""

import json
import os
import subprocess
import sys
import time

CACHE_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/root/repo/.jax_cache")
STAGE_TIMEOUT = int(os.environ.get("RTXPT_BENCH_STAGE_TIMEOUT", "900"))


def _enable_cache():
    import jax
    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          5.0)
    except Exception:
        pass


def stage_cornell():
    """Headline: Cornell 1080p reference mode (fused Pallas tier)."""
    import jax
    import jax.numpy as jnp
    _enable_cache()
    from rtxpt_tpu.config import PathTracerConfig, NEEMode
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt.integrator import render_sample_jit
    from rtxpt_tpu.scene.procedural import cornell_box, default_camera

    width, height = 1920, 1080
    spp_timed = 4
    host = cornell_box()
    scene = prepare(host)
    cam = default_camera(host, width, height)
    cfg = PathTracerConfig(max_bounces=4, nee=NEEMode.POWER,
                           ray_chunk=1 << 18)
    print("[stage] cornell warmup (compile)", file=sys.stderr, flush=True)
    out = render_sample_jit(scene, cam, cfg, width, height, jnp.uint32(0))
    jax.block_until_ready(out["L"] + out["L"])
    print("[stage] cornell timed loop", file=sys.stderr, flush=True)
    # Optional device-trace capture (SURVEY.md §5: jax.profiler traces;
    # opt-in so the driver's timed run isn't perturbed):
    #   RTXPT_BENCH_TRACE=1 python bench.py  -> trace dir in the JSON.
    trace_dir = None
    ctx = None
    if os.environ.get("RTXPT_BENCH_TRACE") == "1":
        from rtxpt_tpu.utils.metrics import FrameMetrics
        ctx = FrameMetrics.profiler_trace("/root/repo/.profiles/cornell")
        trace_dir = ctx.__enter__()
    t0 = time.perf_counter()
    total_rays = 0
    acc = None
    for s in range(1, 1 + spp_timed):
        out = render_sample_jit(scene, cam, cfg, width, height,
                                jnp.uint32(s))
        acc = out["L"] if acc is None else acc + out["L"]
        total_rays += int(out["ray_count"])
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0
    if ctx is not None:
        ctx.__exit__(None, None, None)
    return {
        **({"profiler_trace": trace_dir} if trace_dir else {}),
        "scene": "cornell_box", "res": f"{width}x{height}",
        "spp_timed": spp_timed, "bounces": cfg.max_bounces,
        "rays": total_rays,
        "mrays_per_s": round(total_rays / dt / 1e6, 3),
        "ms_per_frame_1spp": round(dt / spp_timed * 1e3, 2),
        "device": str(jax.devices()[0]),
    }


def stage_city():
    """Large scene ABOVE the VMEM-resident cap: 340k-tri city on the
    clustered streamed tier (accel/cluster.py + pt/bounce_clustered.py)
    — the path any Bistro-class scene takes."""
    import jax
    import jax.numpy as jnp
    _enable_cache()
    from rtxpt_tpu.config import PathTracerConfig, NEEMode
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt.integrator import render_sample_jit
    from rtxpt_tpu.scene.procedural import city_scene, default_camera

    width, height = 1920, 1080
    chost = city_scene(tri_budget=350_000, seed=0)
    cscene = prepare(chost)
    ccam = default_camera(chost, width, height)
    ccfg = PathTracerConfig(max_bounces=4, nee=NEEMode.POWER,
                            ray_chunk=1 << 30)
    print("[stage] city warmup (compile)", file=sys.stderr, flush=True)
    out = render_sample_jit(cscene, ccam, ccfg, width, height,
                            jnp.uint32(0))
    jax.block_until_ready(out["L"] + out["L"])
    print("[stage] city timed loop", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    crays = 0
    cacc = None
    for s in range(1, 3):
        out = render_sample_jit(cscene, ccam, ccfg, width, height,
                                jnp.uint32(s))
        cacc = out["L"] if cacc is None else cacc + out["L"]
        crays += int(out["ray_count"])
    jax.block_until_ready(cacc)
    cdt = time.perf_counter() - t0
    return {
        "scene": "city_340k_tris",
        "mrays_per_s": round(crays / cdt / 1e6, 3),
        "ms_per_frame_1spp": round(cdt / 2 * 1e3, 2),
        "clustered_path": cscene.cluster_tables is not None,
    }


def _run_stage(name: str, timeout: int, env_extra=None):
    """Run one stage in a subprocess with a deadline; return its JSON."""
    if timeout <= 60:
        return {"error": f"skipped stage {name}: bench deadline spent"}
    code = (f"import bench, json, sys; "
            f"json.dump(bench.stage_{name}(), sys.stdout)")
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=timeout, env=env)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout}s (stage {name})"}
    sys.stderr.write(proc.stderr[-2000:])
    if proc.returncode != 0:
        return {"error": f"stage {name} rc={proc.returncode}: "
                         f"{proc.stderr[-300:]}"}
    try:
        return json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception as e:
        return {"error": f"stage {name} bad output: {e}"}


def _emit(cornell, city=None):
    """Print ONE complete, parseable result line from whatever has
    banked so far. Called after EVERY stage completes so a driver-side
    kill (rc=124) can only lose the stages that hadn't finished — the
    last line printed is always a valid result (VERDICT r4 missing #1:
    r4 lost all numbers because results were only emitted at the end).
    Results are also mirrored to .bench_partial.json for post-mortems.
    """
    ok = isinstance(cornell, dict) and "error" not in cornell
    mrays = cornell.get("mrays_per_s", 0.0) if ok else 0.0
    detail = dict(cornell) if ok else {"cornell": cornell}
    if city is not None:
        detail["city"] = city
    result = {
        "metric": "pathtrace_throughput",
        "value": mrays,
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 200.0, 4),
        "detail": detail,
    }
    line = json.dumps(result)
    print(line, flush=True)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".bench_partial.json"), "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


def main():
    # Overall deadline: stages split whatever remains of it, so the
    # bench always prints its JSON line before the driver's timeout.
    # Kept safely below the driver's observed kill timer (~30-45 min);
    # a warmed persistent compile cache makes each stage O(1 min).
    deadline = time.monotonic() + int(
        os.environ.get("RTXPT_BENCH_DEADLINE", "1500"))

    def left():
        return int(deadline - time.monotonic())

    cornell = _run_stage("cornell", min(STAGE_TIMEOUT, left()))
    _emit(cornell)  # bank the headline immediately
    # City order matters on the fragile axon worker: bank a number with
    # the known-good flat kernels FIRST (the production default), then
    # any experimental variant with whatever budget remains.
    city = _run_stage("city", min(STAGE_TIMEOUT, left()))
    city["kernel"] = "flat_all_rows"
    _emit(cornell, city)
    return 0


if __name__ == "__main__":
    sys.exit(main())
