"""Material JSON sidecar round-trip (MaterialsBaker.h:209-218 analog)."""

import json

import numpy as np

from rtxpt_tpu.scene.materials_io import (
    apply_materials_json, materials_to_json, save_materials_json)
from rtxpt_tpu.scene.procedural import cornell_box


def test_sidecar_roundtrip(tmp_path):
    host = cornell_box()
    path = str(tmp_path / "mats.json")
    save_materials_json(path, host)
    doc = json.load(open(path))
    n = len(np.asarray(host.materials.base_color))
    assert len(doc["materials"]) == n
    assert doc["materials"][1]["base_color"][0] > \
        doc["materials"][1]["base_color"][1]        # red wall stays red

    # edit: repaint material 1 blue, raise roughness of 0
    doc["materials"][1]["base_color"] = [0.1, 0.1, 0.9]
    doc["materials"][0]["roughness"] = 0.123
    path2 = str(tmp_path / "edit.json")
    json.dump(doc, open(path2, "w"))
    apply_materials_json(host, path2)
    bc = np.asarray(host.materials.base_color)
    assert np.allclose(bc[1], [0.1, 0.1, 0.9], atol=1e-6)
    assert abs(float(np.asarray(host.materials.roughness)[0]) - 0.123) < 1e-6


def test_sidecar_partial_and_name_match(tmp_path):
    host = cornell_box()
    host.material_names = [f"m{i}" for i in
                           range(len(np.asarray(host.materials.base_color)))]
    before = np.asarray(host.materials.base_color).copy()
    # partial row, matched by name, overriding one field only
    apply_materials_json(host, {"materials": [
        {"name": "m2", "metallic": 0.75},
        {"name": "missing", "metallic": 0.9},       # ignored
        {"index": 999, "metallic": 0.9},            # out of range, ignored
    ]})
    assert abs(float(np.asarray(host.materials.metallic)[2]) - 0.75) < 1e-6
    assert np.allclose(np.asarray(host.materials.base_color), before)


def test_sidecar_render_effect(tmp_path):
    """Overrides must actually reach the renderer (prepare + trace)."""
    import jax.numpy as jnp
    from rtxpt_tpu.config import PathTracerConfig
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt.integrator import render
    from rtxpt_tpu.scene.procedural import default_camera

    host = cornell_box()
    cam = default_camera(host, 32, 32)
    cfg = PathTracerConfig(max_bounces=2)
    img0, _, _ = render(prepare(host), cam, cfg, 32, 32, spp=2)

    apply_materials_json(host, {"materials": [
        {"index": 0, "base_color": [0.05, 0.05, 0.05]}]})
    img1, _, _ = render(prepare(host), cam, cfg, 32, 32, spp=2)
    assert float(jnp.mean(img1)) < float(jnp.mean(img0)) * 0.7
