"""OMM-analog alpha testing: bake classification + runtime re-trace."""

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.config import PathTracerConfig
from rtxpt_tpu.prepare import prepare
from rtxpt_tpu.pt.integrator import render
from rtxpt_tpu.scene.procedural import cornell_box, default_camera, _quad, _materials
from rtxpt_tpu.scene.scene import HostScene, MeshInstance


def _alpha_scene(cutout: bool):
    """Cornell box with a screen-filling curtain in front of the back wall;
    the curtain's texture alpha is a checkerboard (cutout=True) or opaque."""
    host = cornell_box(boxes=False)
    pos, nrm, uv, idx, mat = _quad([0.02, 0.02, 0.5], [0.98, 0.02, 0.5],
                                   [0.98, 0.98, 0.5], [0.02, 0.98, 0.5], 5)
    inst = MeshInstance(positions=pos, normals=nrm, uvs=uv, indices=idx,
                        material=mat, name="curtain")
    host.instances.append(inst)

    # checkerboard alpha texture
    tex = np.ones((8, 8, 4), np.float32)
    tex[..., :3] = 0.2
    if cutout:
        yy, xx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        tex[..., 3] = ((yy + xx) % 2).astype(np.float32)
    host.textures = [tex]

    mats = host.materials
    import jax.numpy as jnp2
    n_mat = 6
    from rtxpt_tpu.scene.scene import Materials
    new = Materials.create(n_mat)
    for f in ("base_color", "metallic", "roughness", "ior", "transmission",
              "diffuse_transmission", "emissive", "specular_f0_scale",
              "thin", "alpha_cutoff", "volume_absorption",
              "base_color_tex", "emissive_tex", "metal_rough_tex",
              "normal_tex"):
        old = getattr(mats, f)
        upd = getattr(new, f)
        upd = upd.at[:old.shape[0]].set(old)
        new = new.replace(**{f: upd})
    new = new.replace(
        base_color=new.base_color.at[5].set(jnp2.asarray([0.9, 0.9, 0.9])),
        roughness=new.roughness.at[5].set(1.0),
        alpha_cutoff=new.alpha_cutoff.at[5].set(0.5),
        base_color_tex=new.base_color_tex.at[5].set(0),
        thin=new.thin.at[5].set(1.0),
    )
    host.materials = new
    return host


def test_opacity_bake_classes():
    from rtxpt_tpu.scene.omm import MIXED, bake_opacity

    host = _alpha_scene(True)
    sd = host.flatten()
    classes = bake_opacity(host, sd.materials, host.textures)
    assert classes is not None
    # walls opaque, curtain tris mixed
    assert (classes[:-2] == 0).all()
    assert (classes[-2:] == MIXED).all()


def test_alpha_cutout_lets_light_through():
    cfg = PathTracerConfig(max_bounces=2)
    W = H = 32
    host_c = _alpha_scene(True)
    scene_c = prepare(host_c)
    cam = default_camera(host_c, W, H)
    img_cut, _, _ = render(scene_c, cam, cfg, W, H, spp=8)

    host_o = _alpha_scene(False)
    scene_o = prepare(host_o)
    img_solid, _, _ = render(scene_o, cam, cfg, W, H, spp=8)

    a = np.asarray(img_cut)
    b = np.asarray(img_solid)
    assert np.isfinite(a).all()
    # cut-out curtain scene differs substantially (back wall visible/lit
    # through holes), and is brighter behind the curtain region
    assert np.abs(a - b).mean() > 0.01


def test_micro_index_partition():
    """micro_index is a bijection-by-area: every barycentric point maps
    to a valid index and each of the 16 level-2 micro-tris receives the
    expected ~1/16 area share."""
    from rtxpt_tpu.scene.omm import micro_index

    rng = np.random.default_rng(1)
    u = rng.uniform(0, 1, 200_000)
    v = rng.uniform(0, 1, 200_000)
    keep = u + v <= 1.0
    u, v = u[keep], v[keep]
    idx = micro_index(u, v)
    assert idx.min() >= 0 and idx.max() <= 15
    counts = np.bincount(idx, minlength=16) / len(idx)
    assert np.allclose(counts, 1.0 / 16.0, atol=0.004), counts
    # jnp decode agrees with numpy decode
    ji = np.asarray(micro_index(jnp.asarray(u[:4096], jnp.float32),
                                jnp.asarray(v[:4096], jnp.float32)))
    assert (ji == idx[:4096]).all()


def test_micromap_bake_states():
    """Aligned half-transparent texture: micro-tris fully inside either
    half bake decisive states; only boundary-straddling ones are UNKNOWN."""
    from rtxpt_tpu.scene.omm import (MICRO_OPAQUE, MICRO_TRANSPARENT,
                                     bake_opacity_micromaps, MIXED)

    host = _alpha_scene(True)
    # left half of uv space transparent, right half opaque
    tex = np.ones((8, 8, 4), np.float32)
    tex[..., :3] = 0.2
    tex[:, :4, 3] = 0.0
    host.textures = [tex]
    sd = host.flatten()
    classes, mm, _cov = bake_opacity_micromaps(host, sd.materials, host.textures)
    curtain = classes == MIXED
    assert curtain.any()
    states = []
    for w in mm[curtain]:
        states.extend((int(w) >> (2 * k)) & 3 for k in range(16))
    states = np.asarray(states)
    # the 5x5-subdivided curtain quad has whole triangles inside each
    # half, so both decisive states must appear in volume
    assert (states == MICRO_OPAQUE).sum() > len(states) * 0.2
    assert (states == MICRO_TRANSPARENT).sum() > len(states) * 0.2


def test_in_traversal_micromap_matches_texture_test():
    """With micromaps stripped, the texture-test retrace path must agree
    with the in-traversal micromap rejection on a decisively-baked scene
    (exact: each level-2 micro-tri lies inside one texel half)."""
    from rtxpt_tpu.accel.traverse import scene_closest

    host = _alpha_scene(True)
    tex = np.ones((8, 8, 4), np.float32)
    tex[..., :3] = 0.2
    tex[:, :4, 3] = 0.0
    host.textures = [tex]
    sd = prepare(host)
    assert sd.tri_micromap is not None
    assert sd.bvh.tri_micro is not None or sd.bvh.brute is not None

    from rtxpt_tpu.scene.omm import intersect_closest_alpha
    n = 400
    rng = np.random.default_rng(4)
    o = np.column_stack([rng.uniform(0.05, 0.95, n),
                         rng.uniform(0.05, 0.95, n),
                         np.full(n, 0.95)]).astype(np.float32)
    d = np.tile(np.asarray([[0.0, 0.0, -1.0]], np.float32), (n, 1))
    h1 = intersect_closest_alpha(sd, jnp.asarray(o), jnp.asarray(d),
                                 jnp.zeros((n,), jnp.float32),
                                 jnp.full((n,), 10.0, jnp.float32))
    sd_plain = sd.replace(bvh=sd.bvh.replace(tri_micro=None),
                          tri_micromap=None)
    h2 = intersect_closest_alpha(sd_plain, jnp.asarray(o), jnp.asarray(d),
                                 jnp.zeros((n,), jnp.float32),
                                 jnp.full((n,), 10.0, jnp.float32))
    # texel-boundary-straddling rays may bake UNKNOWN (tested identically
    # on both paths), so results must agree everywhere
    same = np.asarray(h1.prim) == np.asarray(h2.prim)
    assert same.mean() > 0.98, same.mean()
