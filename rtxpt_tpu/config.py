"""Configuration tree for the framework.

Mirrors the reference's three config tiers (SURVEY.md §5 "Config / flag
system"; reference: Rtxpt/Shaders/PathTracer/Config.h, SampleCommon/
CommandLine.h:16-65, SampleUI.h:120-210):

  * compile-time switches  -> frozen dataclasses used as *static* jit args
  * command line           -> apps/cli.py argparse building these dataclasses
  * runtime UI settings    -> fields on the same dataclasses (re-jit on change)

Everything here must stay hashable (static argnums / closure capture).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class PTMode(enum.Enum):
    """Top-level render mode (reference: Config.h:56-59 PATH_TRACER_MODE_*)."""

    REFERENCE = 0            # progressive accumulation, unbiased
    BUILD_STABLE_PLANES = 1  # real-time: deterministic delta-path exploration
    FILL_STABLE_PLANES = 2   # real-time: noisy fill restarted from V-buffer


class NEEMode(enum.Enum):
    """Next-event-estimation light sampler choice (reference CommandLine.h
    `neeType`; LightSampler.hlsli uniform/power/NEE-AT)."""

    OFF = 0
    UNIFORM = 1
    POWER = 2     # power-proportional global CDF
    NEEAT = 3     # feedback-adaptive (global proxies + per-tile local caches)


class DenoiserMode(enum.Enum):
    NONE = 0
    RELAX = 1
    REBLUR = 2


@dataclasses.dataclass(frozen=True)
class PathTracerConfig:
    """Per-dispatch path tracing switches.

    Reference analogs: Config.h:36 (max bounces 96), SampleUI.h:170-171
    (default 20 bounces / 2 diffuse), PathTracer.hlsli:182-208 (russian
    roulette), Sample.cpp:1518-1522 (firefly filter threshold).
    """

    mode: PTMode = PTMode.REFERENCE
    max_bounces: int = 6
    min_bounces_before_rr: int = 2
    enable_russian_roulette: bool = True
    nee: NEEMode = NEEMode.POWER
    nee_candidates: int = 1          # WRS candidate count (PathTracerNEE.hlsli:54-85)
    enable_mis: bool = True
    firefly_clamp: float = 0.0       # 0 = off; radiance clamp scale
    texture_mips: bool = True        # ray-cone driven MIP selection
    # Stochastic texture filtering (RTXTF analog, Config.h:95): one
    # jittered texel instead of bilinear+mip blend — 4x fewer gathers,
    # unbiased in expectation; noise folds into the denoiser.
    stochastic_texture_filtering: bool = False
    max_ray_travel: float = 1.0e27   # Config.h:84-86 kMaxRayTravel analog
    # Sampling
    low_discrepancy: bool = True     # Owen-scrambled Sobol' vs hash chains
    # Wavefront execution
    ray_chunk: int = 1 << 16         # rays per wavefront chunk
    # Clustered large-scene path (pt/bounce_clustered.py)
    sort_rays: bool = True           # inter-bounce (cell, octant) ray sort
    cluster_kslots: int = 0          # candidate clusters/group; 0 = default
    # Candidate-list pages per bounce: when a group's kslots-long
    # nearest-first list saturates, rays not yet terminated before the
    # page boundary stream further pages of the (entry-distance-sorted)
    # cluster order, so capping degrades to MORE WORK instead of DROPPED
    # GEOMETRY (the DXR traversal never drops; tests/
    # test_cluster_saturation.py proves parity vs the no-cap oracle).
    # 0 = default (env RTXPT_TPU_CLUSTER_PAGES, else 2).
    cluster_pages: int = 0
    # Diffuse/specular radiance split for per-channel denoising
    # (NRD RELAX_DIFFUSE_SPECULAR semantics, NrdConfig.cpp:25-27)
    split_channels: bool = False
    # Extra wavefront iterations on the Pallas tiers for pass-through
    # lanes (alpha-test rejections / nested-priority false hits re-trace
    # without consuming a logical bounce — the in-kernel analog of the
    # XLA bounded retrace, scene/omm.MAX_ALPHA_RETRACE)
    passthrough_extra_iters: int = 2
    # --- kernel-tier dispatch (pt/dispatch.py) ---------------------------
    # Which bounce-kernel tier serves trace_paths. "auto" is resolved to a
    # concrete tier OUTSIDE jit by pt/dispatch.resolve(); the resolved
    # value rides in this frozen (static-jit-arg) config so the jit cache
    # key captures the dispatch decision — env vars / backend state are
    # never consulted at trace time (round-2 order-dependent cache bug).
    kernel_tier: str = "auto"        # "auto" | "fused" | "clustered" | "xla"
    pallas_interpret: Optional[bool] = None   # None = resolve from backend
    # Resolved by pt/dispatch.py: route NEE through the external XLA
    # selection block (pt/nee_external.py) on the Pallas tiers — NEE-AT,
    # >128 lights, or WRS K>1. Static jit arg like kernel_tier.
    nee_external: bool = False
    # Kulla-Conty multiple-scattering energy compensation inside the
    # fused kernels (was env RTXPT_TPU_KERNEL_MS).
    kernel_energy_comp: bool = True
    # Disable the clustered kernel's early visit-prune (debug; was env
    # RTXPT_TPU_CLUSTER_NOPRUNE).
    cluster_noprune: bool = False


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Frame-level settings (reference: CommandLine.h width/height/spp,
    AccumulationPass, ToneMappingPasses.h)."""

    width: int = 512
    height: int = 512
    spp: int = 1
    exposure: float = 1.0
    tonemap: str = "aces"            # "aces" | "reinhard" | "linear" | "none"
    denoiser: DenoiserMode = DenoiserMode.NONE
    enable_taa: bool = False
    enable_bloom: bool = False
    accumulation_limit: int = 0      # 0 = unlimited progressive accumulation
    # Render-vs-display resolution split (the DLSS-SR substitute: trace at
    # render_scale * display res, temporal-upscale to display; reference:
    # Sample.h:343-344 m_renderSize/m_displaySize).
    render_scale: float = 1.0
    # Denoise diffuse and specular channels separately (reference runs
    # split NRD instances per plane: Sample.cpp:2570-2573).
    split_denoise: bool = False
    # Resampled direct/indirect lighting in the realtime frame loop
    # (reference: RtxdiPass::Execute inside PathTrace, Sample.cpp:2526-2539).
    # "none" | "di" (ReSTIR DI replaces NEE for primary-surface direct
    # light) | "digi" (DI + ReSTIR GI one-bounce indirect resampling).
    restir: str = "none"
    # Use the ReGIR world-space cell grid as the DI candidate source
    # instead of the global power CDF (reference: RtxdiPass local-light
    # presampling / ReGIR mode).
    restir_regir: bool = False
    # Frame generation (DLSS-FG/MFG analog, render/framegen.py): number
    # of motion-vector-interpolated frames synthesized between each pair
    # of rendered frames (0 = off; 1 = FG, 2-3 = MFG).
    frame_gen: int = 0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / sharding settings (SURVEY.md §2.6: tile+sample sharding
    over ICI is the TPU equivalent of the reference's SIMT dispatch)."""

    n_devices: Optional[int] = None  # None = all available
    axis_name: str = "tiles"
    shard_samples: bool = False      # shard spp instead of pixel rows


@dataclasses.dataclass(frozen=True)
class FrameworkConfig:
    pt: PathTracerConfig = dataclasses.field(default_factory=PathTracerConfig)
    render: RenderConfig = dataclasses.field(default_factory=RenderConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


# Perf/quality presets (reference: SampleUI.h:98-118 PerformancePreset table).
PRESETS = {
    "fast": FrameworkConfig(
        pt=PathTracerConfig(max_bounces=3, nee_candidates=1),
        render=RenderConfig(spp=1),
    ),
    "balanced": FrameworkConfig(
        pt=PathTracerConfig(max_bounces=6, nee_candidates=1),
        render=RenderConfig(spp=1),
    ),
    "quality": FrameworkConfig(
        pt=PathTracerConfig(max_bounces=12, nee_candidates=4),
        render=RenderConfig(spp=4),
    ),
    "reference": FrameworkConfig(
        pt=PathTracerConfig(max_bounces=20, nee_candidates=1,
                            firefly_clamp=0.0),
        render=RenderConfig(spp=256),
    ),
}
