"""glTF animation + skinning import (reference: Donut scene-graph
animation consumed at Sample.cpp:2065 / UpdateSkinnedBLASs :1170)."""

import base64
import json

import numpy as np

from rtxpt_tpu.scene.gltf import animate_gltf, load_gltf


def _b64(arr):
    return base64.b64encode(np.ascontiguousarray(arr).tobytes()).decode()


class _B:
    """Tiny glTF buffer/accessor builder."""

    def __init__(self):
        self.blob = b""
        self.views = []
        self.accessors = []

    def acc(self, arr, ctype, atype):
        arr = np.ascontiguousarray(arr)
        off = len(self.blob)
        self.blob += arr.tobytes()
        self.views.append(dict(buffer=0, byteOffset=off,
                               byteLength=arr.nbytes))
        self.accessors.append(dict(
            bufferView=len(self.views) - 1, componentType=ctype,
            count=len(arr), type=atype,
            max=np.max(arr, 0).reshape(-1).tolist(),
            min=np.min(arr, 0).reshape(-1).tolist()))
        return len(self.accessors) - 1


def _write(tmp_path, gltf, blob):
    gltf["buffers"] = [dict(
        byteLength=len(blob),
        uri="data:application/octet-stream;base64,"
            + base64.b64encode(blob).decode())]
    p = tmp_path / "anim.gltf"
    p.write_text(json.dumps(gltf))
    return str(p)


def test_rotation_channel_drives_transform(tmp_path):
    b = _B()
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([[0, 1, 2]], np.uint16)
    a_pos = b.acc(pos, 5126, "VEC3")
    a_idx = b.acc(idx.reshape(-1, 1), 5123, "SCALAR")
    times = np.asarray([[0.0], [1.0]], np.float32)
    s2 = np.sqrt(0.5, dtype=np.float32)
    quats = np.asarray([[0, 0, 0, 1], [0, 1, 0, 0]], np.float32)  # 0/180deg
    a_t = b.acc(times, 5126, "SCALAR")
    a_q = b.acc(quats, 5126, "VEC4")
    gltf = dict(
        asset=dict(version="2.0"), scene=0, scenes=[dict(nodes=[0])],
        nodes=[dict(mesh=0)],
        meshes=[dict(primitives=[dict(
            attributes=dict(POSITION=a_pos), indices=a_idx)])],
        animations=[dict(
            samplers=[dict(input=a_t, output=a_q,
                           interpolation="LINEAR")],
            channels=[dict(sampler=0,
                           target=dict(node=0, path="rotation"))])],
        bufferViews=b.views, accessors=b.accessors)
    host = load_gltf(_write(tmp_path, gltf, b.blob))
    assert getattr(host, "gltf_rig", None) is not None

    animate_gltf(host, 0.5)                  # halfway: 90deg about +y
    T = host.instances[0].transform
    v = T[:3, :3] @ np.asarray([1.0, 0.0, 0.0], np.float32)
    np.testing.assert_allclose(v, [0.0, 0.0, -1.0], atol=1e-5)


def test_skinned_strip_deforms(tmp_path):
    b = _B()
    # vertical quad strip; bottom row bound to joint 0, top to joint 1
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                     np.float32)
    idx = np.asarray([0, 1, 2, 2, 1, 3], np.uint16)
    joints = np.asarray([[0, 0, 0, 0]] * 2 + [[1, 0, 0, 0]] * 2, np.uint16)
    weights = np.asarray([[1, 0, 0, 0]] * 4, np.float32)
    ibm = np.stack([np.eye(4, dtype=np.float32).T] * 2)  # column-major
    a_pos = b.acc(pos, 5126, "VEC3")
    a_idx = b.acc(idx.reshape(-1, 1), 5123, "SCALAR")
    a_j = b.acc(joints, 5123, "VEC4")
    a_w = b.acc(weights, 5126, "VEC4")
    a_ibm = b.acc(ibm.reshape(2, 16), 5126, "MAT4")
    times = np.asarray([[0.0], [1.0]], np.float32)
    trans = np.asarray([[0, 0, 0], [0, 0, 2]], np.float32)
    a_t = b.acc(times, 5126, "SCALAR")
    a_tr = b.acc(trans, 5126, "VEC3")
    gltf = dict(
        asset=dict(version="2.0"), scene=0, scenes=[dict(nodes=[0, 1, 2])],
        nodes=[dict(mesh=0, skin=0), dict(), dict()],  # 1=joint0, 2=joint1
        skins=[dict(joints=[1, 2], inverseBindMatrices=a_ibm)],
        meshes=[dict(primitives=[dict(
            attributes=dict(POSITION=a_pos, JOINTS_0=a_j, WEIGHTS_0=a_w),
            indices=a_idx)])],
        animations=[dict(
            samplers=[dict(input=a_t, output=a_tr,
                           interpolation="LINEAR")],
            channels=[dict(sampler=0,
                           target=dict(node=2, path="translation"))])],
        bufferViews=b.views, accessors=b.accessors)
    host = load_gltf(_write(tmp_path, gltf, b.blob))
    rig = getattr(host, "gltf_rig", None)
    assert rig is not None and len(rig.skins) == 1

    animate_gltf(host, 1.0)                  # joint1 moved +2 in z
    p = host.instances[0].positions
    np.testing.assert_allclose(p[:2, 2], 0.0, atol=1e-5)   # bottom fixed
    np.testing.assert_allclose(p[2:, 2], 2.0, atol=1e-5)   # top follows


def test_animated_scene_renders(tmp_path):
    import jax.numpy as jnp
    from rtxpt_tpu.config import NEEMode, PathTracerConfig
    from rtxpt_tpu.prepare import prepare
    from rtxpt_tpu.pt.integrator import render
    from rtxpt_tpu.scene.animation import refresh_refit
    from rtxpt_tpu.scene.camera import look_at

    b = _B()
    pos = np.asarray([[-1, -1, 0], [1, -1, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([[0, 1, 2]], np.uint16)
    a_pos = b.acc(pos, 5126, "VEC3")
    a_idx = b.acc(idx.reshape(-1, 1), 5123, "SCALAR")
    times = np.asarray([[0.0], [1.0]], np.float32)
    trs = np.asarray([[0, 0, 0], [0.5, 0, 0]], np.float32)
    a_t = b.acc(times, 5126, "SCALAR")
    a_tr = b.acc(trs, 5126, "VEC3")
    gltf = dict(
        asset=dict(version="2.0"), scene=0, scenes=[dict(nodes=[0])],
        nodes=[dict(mesh=0)],
        meshes=[dict(primitives=[dict(
            attributes=dict(POSITION=a_pos), indices=a_idx)])],
        materials=[dict(pbrMetallicRoughness=dict(
            baseColorFactor=[0.8, 0.8, 0.8, 1.0], metallicFactor=0.0),
            emissiveFactor=[2.0, 2.0, 2.0])],
        bufferViews=b.views, accessors=b.accessors)
    gltf["meshes"][0]["primitives"][0]["material"] = 0
    gltf["animations"] = [dict(
        samplers=[dict(input=a_t, output=a_tr, interpolation="LINEAR")],
        channels=[dict(sampler=0,
                       target=dict(node=0, path="translation"))])]
    host = load_gltf(_write(tmp_path, gltf, b.blob))
    sd = prepare(host)
    cam = look_at([0, 0, 3], [0, 0, 0], [0, 1, 0], 45.0, 16, 16)
    cfg = PathTracerConfig(max_bounces=2, nee=NEEMode.OFF)
    img0 = np.asarray(render(sd, cam, cfg, 16, 16, spp=1)[0])

    animate_gltf(host, 1.0)
    sd2, _ = refresh_refit(host, [], 1.0, prev=sd)
    img1 = np.asarray(render(sd2, cam, cfg, 16, 16, spp=1)[0])
    assert np.isfinite(img1).all()
    # the emissive triangle moved right: the images must differ
    assert np.abs(img1 - img0).max() > 0.1
