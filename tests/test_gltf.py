"""glTF loader tests: synthesize minimal .gltf/.glb files and load them."""

import base64
import json
import struct

import numpy as np
import pytest

from rtxpt_tpu.scene.gltf import load_gltf


def _tri_payload():
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    nrm = np.asarray([[0, 0, 1]] * 3, np.float32)
    idx = np.asarray([0, 1, 2], np.uint16)
    buf = pos.tobytes() + nrm.tobytes() + idx.tobytes() + b"\x00\x00"
    return pos, nrm, idx, buf


def _gltf_dict(buf_len):
    return {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0, 1]}],
        "nodes": [
            {"mesh": 0, "translation": [0, 0, 1]},
            {"extensions": {"KHR_lights_punctual": {"light": 0}},
             "translation": [0, 0, 5]},
        ],
        "extensions": {"KHR_lights_punctual": {"lights": [
            {"type": "point", "color": [1, 1, 1], "intensity": 20.0}]}},
        "extensionsUsed": ["KHR_lights_punctual"],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1},
            "indices": 2, "material": 0}]}],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.9, 0.2, 0.1, 1.0],
                "metallicFactor": 0.0, "roughnessFactor": 0.8},
            "emissiveFactor": [0, 0, 0]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 6},
        ],
        "buffers": [{"byteLength": buf_len}],
    }


def test_load_gltf_data_uri(tmp_path):
    pos, nrm, idx, buf = _tri_payload()
    g = _gltf_dict(len(buf))
    g["buffers"][0]["uri"] = ("data:application/octet-stream;base64,"
                              + base64.b64encode(buf).decode())
    path = tmp_path / "tri.gltf"
    path.write_text(json.dumps(g))
    host = load_gltf(str(path))
    assert len(host.instances) == 1
    inst = host.instances[0]
    np.testing.assert_allclose(inst.positions, pos)
    np.testing.assert_array_equal(inst.indices, [[0, 1, 2]])
    # node translation present in transform
    np.testing.assert_allclose(inst.transform[:3, 3], [0, 0, 1])
    mats = host.materials
    np.testing.assert_allclose(np.asarray(mats.base_color[0]),
                               [0.9, 0.2, 0.1], atol=1e-6)
    assert host.analytic_lights is not None
    assert int(np.asarray(host.analytic_lights.kind[0])) == 0  # point
    np.testing.assert_allclose(np.asarray(host.analytic_lights.position[0]),
                               [0, 0, 5])


def test_load_glb(tmp_path):
    pos, nrm, idx, buf = _tri_payload()
    g = _gltf_dict(len(buf))
    gj = json.dumps(g).encode()
    gj += b" " * ((4 - len(gj) % 4) % 4)
    bin_chunk = buf + b"\x00" * ((4 - len(buf) % 4) % 4)
    glb = (struct.pack("<III", 0x46546C67, 2,
                       12 + 8 + len(gj) + 8 + len(bin_chunk))
           + struct.pack("<II", len(gj), 0x4E4F534A) + gj
           + struct.pack("<II", len(bin_chunk), 0x004E4942) + bin_chunk)
    path = tmp_path / "tri.glb"
    path.write_bytes(glb)
    host = load_gltf(str(path))
    assert len(host.instances) == 1
    np.testing.assert_allclose(host.instances[0].positions, pos)


def test_render_loaded_gltf(tmp_path):
    """End-to-end: loaded glTF renders with its punctual light."""
    pos, nrm, idx, buf = _tri_payload()
    g = _gltf_dict(len(buf))
    g["buffers"][0]["uri"] = ("data:application/octet-stream;base64,"
                              + base64.b64encode(buf).decode())
    path = tmp_path / "tri.gltf"
    path.write_text(json.dumps(g))
    host = load_gltf(str(path))
    host.camera = dict(position=[0.3, 0.3, 4], target=[0.3, 0.3, 1],
                       up=[0, 1, 0], fov_y_deg=40)

    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt.integrator import render
    from rtxpt_tpu.config import PathTracerConfig
    from rtxpt_tpu.scene.procedural import default_camera

    scene = prepare(host)
    cam = default_camera(host, 16, 16)
    hdr, _, _ = render(scene, cam, PathTracerConfig(max_bounces=1),
                       16, 16, spp=2)
    hdr = np.asarray(hdr)
    assert np.isfinite(hdr).all()
    assert hdr.max() > 0.01  # lit triangle visible
    # red-dominant material
    lit = hdr[hdr.sum(-1) > 0.01]
    assert lit[:, 0].mean() > lit[:, 1].mean() * 2


def test_export_roundtrip(tmp_path):
    """Exporter -> loader round trip renders identically to procedural."""
    from rtxpt_tpu.scene.procedural import cornell_box, default_camera
    from rtxpt_tpu.scene.gltf_export import export_gltf
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt.integrator import render
    from rtxpt_tpu.config import PathTracerConfig

    host = cornell_box()
    path = str(tmp_path / "cornell.gltf")
    export_gltf(host, path)
    back = load_gltf(path)
    a, _, _ = render(prepare(back), default_camera(back, 16, 16),
                     PathTracerConfig(max_bounces=2), 16, 16, spp=2)
    b, _, _ = render(prepare(host), default_camera(host, 16, 16),
                     PathTracerConfig(max_bounces=2), 16, 16, spp=2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
