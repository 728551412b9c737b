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
