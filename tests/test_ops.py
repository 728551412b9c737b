"""Wavefront ops tests (SER sort + compaction analogs) and stochastic
texture filtering."""

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.ops.wavefront import (
    compact_mask_prefix, hit_sort_key, sort_by_key, unsort,
)


def test_sort_unsort_roundtrip():
    r = np.random.default_rng(0)
    keys = jnp.asarray(r.integers(0, 1000, 256), jnp.uint32)
    payload = jnp.asarray(r.normal(0, 1, (256, 3)), jnp.float32)
    perm, sorted_payload = sort_by_key(keys, payload)
    sk = np.asarray(jnp.take(keys, perm))
    assert (np.diff(sk) >= 0).all()
    back = unsort(perm, sorted_payload)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(payload))


def test_hit_sort_key_orders_inactive_last():
    prim = jnp.asarray([5, -1, 7], jnp.int32)
    mat = jnp.asarray([1, 2, 1], jnp.int32)
    active = jnp.asarray([True, False, True])
    keys = hit_sort_key(prim, mat, active)
    k = np.asarray(keys)
    assert k[1] == 0xFFFFFFFF
    assert k[0] < k[1] and k[2] < k[1]
    assert k[0] < k[2]  # same material, lower prim first


def test_compaction_prefix():
    active = jnp.asarray([False, True, True, False, True])
    perm, n = compact_mask_prefix(active)
    assert int(n) == 3
    first = np.asarray(jnp.take(active, perm))[:3]
    assert first.all()


def test_stochastic_filtering_matches_bilinear_in_mean():
    from rtxpt_tpu.scene.textures import (
        bake_textures, sample_texture, sample_texture_stochastic,
    )

    r = np.random.default_rng(1)
    img = r.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    atlas = bake_textures([img])
    n = 1 << 14
    uv = jnp.tile(jnp.asarray([[0.37, 0.61]], jnp.float32), (n, 1))
    tid = jnp.zeros((n,), jnp.int32)
    lod = jnp.zeros((n,), jnp.float32)
    ref = np.asarray(sample_texture(atlas, tid[:1], uv[:1], lod[:1]))[0]
    uj = jnp.asarray(r.uniform(0, 1, (n, 2)), jnp.float32)
    sto = np.asarray(sample_texture_stochastic(atlas, tid, uv, lod, uj))
    np.testing.assert_allclose(sto.mean(0)[:3], ref[:3], atol=0.02)


def test_concurrent_warmup_compiles_permutations():
    """PTPipelineBaker analog: concurrent jit warmup of config/resolution
    permutations; all compile, later renders are cache hits."""
    import jax.numpy as jnp
    from rtxpt_tpu.config import NEEMode, PathTracerConfig
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.scene.procedural import cornell_box, default_camera
    from rtxpt_tpu.utils.warmup import warmup_pipelines

    host = cornell_box()
    scene = prepare(host)
    cam = default_camera(host, 16, 16)
    perms = [
        (PathTracerConfig(max_bounces=1, nee=NEEMode.POWER), 16, 16),
        (PathTracerConfig(max_bounces=1, nee=NEEMode.OFF), 16, 16),
    ]
    results = warmup_pipelines(scene, cam, perms, max_workers=2)
    assert all(v is None for v in results.values()), results
