"""glTF 2.0 loader: pure Python/numpy -> HostScene.

Replaces the reference's Donut glTF import pipeline (reference: Donut engine
scene graph via cgltf, used from Sample.cpp:398-455 LoadScene /
SceneLoaded:523-674) with a dependency-free loader producing flat arrays.

Supported: .gltf (external or data-URI buffers) and .glb; node hierarchy
with TRS/matrix transforms; mesh primitives (POSITION/NORMAL/TEXCOORD_0,
indexed or not); pbrMetallicRoughness materials + emissiveFactor and
the KHR_materials_{transmission,ior,volume,emissive_strength} extensions;
KHR_lights_punctual; images via PIL; first camera node as camera hint.
"""

from __future__ import annotations

import base64
import dataclasses
import json
import os
import struct
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from rtxpt_tpu.scene.scene import (
    AnalyticLights, HostScene, Materials, MeshInstance,
    LIGHT_DIRECTIONAL, LIGHT_POINT, LIGHT_SPOT,
)

_COMPONENT_DTYPE = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_SIZE = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
              "MAT3": 9, "MAT4": 16}


def _load_glb(path: str):
    with open(path, "rb") as f:
        magic, version, _length = struct.unpack("<III", f.read(12))
        assert magic == 0x46546C67, "not a GLB file"
        gltf = None
        buffers = []
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            clen, ctype = struct.unpack("<II", hdr)
            data = f.read(clen)
            if ctype == 0x4E4F534A:        # JSON
                gltf = json.loads(data)
            elif ctype == 0x004E4942:      # BIN
                buffers.append(data)
    return gltf, buffers


def _load_buffers(gltf: dict, base_dir: str, glb_buffers: List[bytes]):
    out = []
    for i, buf in enumerate(gltf.get("buffers", [])):
        uri = buf.get("uri")
        if uri is None:
            out.append(glb_buffers[i])
        elif uri.startswith("data:"):
            out.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            with open(os.path.join(base_dir, uri), "rb") as f:
                out.append(f.read())
    return out


def _accessor(gltf: dict, buffers: List[bytes], idx: int) -> np.ndarray:
    acc = gltf["accessors"][idx]
    n = acc["count"]
    ncomp = _TYPE_SIZE[acc["type"]]
    dtype = _COMPONENT_DTYPE[acc["componentType"]]
    itemsize = np.dtype(dtype).itemsize * ncomp

    if "bufferView" not in acc:
        data = np.zeros((n, ncomp), dtype)
    else:
        bv = gltf["bufferViews"][acc["bufferView"]]
        raw = buffers[bv["buffer"]]
        start = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
        stride = bv.get("byteStride", itemsize)
        if stride == itemsize:
            data = np.frombuffer(raw, dtype, count=n * ncomp,
                                 offset=start).reshape(n, ncomp)
        else:
            rows = []
            for k in range(n):
                rows.append(np.frombuffer(raw, dtype, count=ncomp,
                                          offset=start + k * stride))
            data = np.stack(rows)
    if acc.get("normalized") and dtype != np.float32:
        info = np.iinfo(dtype)
        data = data.astype(np.float32) / max(abs(info.min), info.max)
    # sparse accessor patch
    sp = acc.get("sparse")
    if sp:
        data = data.copy()
        sidx = _accessor_raw(gltf, buffers, sp["indices"], n=sp["count"])
        svals = _accessor_raw(gltf, buffers, sp["values"], n=sp["count"],
                              ncomp=ncomp, dtype=dtype)
        data[sidx.reshape(-1).astype(np.int64)] = svals
    return data


def _accessor_raw(gltf, buffers, ref, n, ncomp=1, dtype=None):
    bv = gltf["bufferViews"][ref["bufferView"]]
    raw = buffers[bv["buffer"]]
    if dtype is None:
        dtype = _COMPONENT_DTYPE[ref["componentType"]]
    start = bv.get("byteOffset", 0) + ref.get("byteOffset", 0)
    return np.frombuffer(raw, dtype, count=n * ncomp,
                         offset=start).reshape(n, ncomp)


def _node_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    t = node.get("translation", [0, 0, 0])
    r = node.get("rotation", [0, 0, 0, 1])      # xyzw quaternion
    s = node.get("scale", [1, 1, 1])
    x, y, z, w = r
    rot = np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], np.float32)
    m[:3, :3] = rot * np.asarray(s, np.float32)[None, :]
    m[:3, 3] = t
    return m


def _load_images(gltf: dict, buffers, base_dir: str) -> List[np.ndarray]:
    from io import BytesIO
    images = []
    for img in gltf.get("images", []):
        try:
            from PIL import Image
            if "uri" in img and not img["uri"].startswith("data:"):
                im = Image.open(os.path.join(base_dir, img["uri"]))
            elif "uri" in img:
                im = Image.open(BytesIO(base64.b64decode(
                    img["uri"].split(",", 1)[1])))
            else:
                bv = gltf["bufferViews"][img["bufferView"]]
                raw = buffers[bv["buffer"]]
                s = bv.get("byteOffset", 0)
                im = Image.open(BytesIO(raw[s:s + bv["byteLength"]]))
            images.append(np.asarray(im.convert("RGBA"), np.uint8))
        except Exception:
            images.append(np.full((1, 1, 4), 255, np.uint8))
    return images


def _srgb_to_linear_np(c):
    c = c.astype(np.float32)
    return np.where(c <= 0.04045, c / 12.92,
                    ((c + 0.055) / 1.055) ** 2.4).astype(np.float32)


def _materials_from_gltf(gltf: dict, tex_source: Dict[int, int]) -> Materials:
    mats_json = gltf.get("materials", [])
    n = max(len(mats_json), 1)
    m = Materials.create(n)
    bc, met, rough, ior, trans, emis, thin, alpha = \
        [], [], [], [], [], [], [], []
    bct, emt, mrt, nmt, prio, aniso = [], [], [], [], [], []
    for mj in mats_json:
        pbr = mj.get("pbrMetallicRoughness", {})
        bc.append(pbr.get("baseColorFactor", [1, 1, 1, 1])[:3])
        met.append(pbr.get("metallicFactor", 1.0))
        rough.append(pbr.get("roughnessFactor", 1.0))
        ext = mj.get("extensions", {})
        ior.append(ext.get("KHR_materials_ior", {}).get("ior", 1.5))
        trans.append(ext.get("KHR_materials_transmission", {})
                     .get("transmissionFactor", 0.0))
        strength = ext.get("KHR_materials_emissive_strength", {}) \
            .get("emissiveStrength", 1.0)
        emis.append([e * strength for e in mj.get("emissiveFactor", [0, 0, 0])])
        thin.append(0.0 if "KHR_materials_volume" in ext else 1.0)
        if mj.get("alphaMode") == "MASK":
            alpha.append(mj.get("alphaCutoff", 0.5))
        else:
            alpha.append(-1.0)

        def tex_idx(texinfo):
            if not texinfo:
                return -1
            t = gltf["textures"][texinfo["index"]]
            return tex_source.get(t.get("source", -1), -1)

        bct.append(tex_idx(pbr.get("baseColorTexture")))
        emt.append(tex_idx(mj.get("emissiveTexture")))
        mrt.append(tex_idx(pbr.get("metallicRoughnessTexture")))
        nmt.append(tex_idx(mj.get("normalTexture")))
        prio.append(int(mj.get("extras", {}).get("nestedPriority", 0)))
        aniso.append(float(ext.get("KHR_materials_anisotropy", {})
                           .get("anisotropyStrength", 0.0)))
    if not mats_json:
        bc, met, rough, ior = [[0.8] * 3], [0.0], [0.7], [1.5]
        trans, emis, thin, alpha = [0.0], [[0, 0, 0]], [1.0], [-1.0]
        bct, emt, mrt, nmt, prio, aniso = [-1], [-1], [-1], [-1], [0], [0.0]
    return m.replace(
        base_color=jnp.asarray(np.asarray(bc, np.float32)),
        metallic=jnp.asarray(np.asarray(met, np.float32)),
        roughness=jnp.asarray(np.asarray(rough, np.float32)),
        ior=jnp.asarray(np.asarray(ior, np.float32)),
        transmission=jnp.asarray(np.asarray(trans, np.float32)),
        emissive=jnp.asarray(np.asarray(emis, np.float32)),
        thin=jnp.asarray(np.asarray(thin, np.float32)),
        alpha_cutoff=jnp.asarray(np.asarray(alpha, np.float32)),
        base_color_tex=jnp.asarray(np.asarray(bct, np.int32)),
        emissive_tex=jnp.asarray(np.asarray(emt, np.int32)),
        metal_rough_tex=jnp.asarray(np.asarray(mrt, np.int32)),
        normal_tex=jnp.asarray(np.asarray(nmt, np.int32)),
        nested_priority=jnp.asarray(np.asarray(prio, np.int32)),
        anisotropy=jnp.asarray(np.asarray(aniso, np.float32)),
    )


def load_gltf(path: str) -> HostScene:
    base_dir = os.path.dirname(os.path.abspath(path))
    if path.endswith(".glb"):
        gltf, glb_buffers = _load_glb(path)
    else:
        with open(path) as f:
            gltf = json.load(f)
        glb_buffers = []
    buffers = _load_buffers(gltf, base_dir, glb_buffers)

    raw_images = _load_images(gltf, buffers, base_dir)
    # Convert sRGB color/emissive textures to linear; keep an id remap.
    textures: List[np.ndarray] = []
    tex_source: Dict[int, int] = {}
    srgb_sources = set()
    for mj in gltf.get("materials", []):
        pbr = mj.get("pbrMetallicRoughness", {})
        for info in (pbr.get("baseColorTexture"), mj.get("emissiveTexture")):
            if info:
                t = gltf["textures"][info["index"]]
                if "source" in t:
                    srgb_sources.add(t["source"])
    for i, img in enumerate(raw_images):
        rgba = img.astype(np.float32) / 255.0
        if i in srgb_sources:
            rgba[..., :3] = _srgb_to_linear_np(rgba[..., :3])
        tex_source[i] = len(textures)
        textures.append(rgba)

    materials = _materials_from_gltf(gltf, tex_source)

    # Flatten node hierarchy.
    instances: List[MeshInstance] = []
    lights_acc = dict(kind=[], position=[], direction=[], intensity=[],
                      angular=[], cin=[], cout=[])
    camera_hint: Optional[dict] = None
    nodes = gltf.get("nodes", [])
    scene_idx = gltf.get("scene", 0)
    roots = gltf.get("scenes", [{}])[scene_idx].get("roots") or \
        gltf.get("scenes", [{}])[scene_idx].get("nodes", [])

    parents = [-1] * len(nodes)
    instance_nodes: List[int] = []
    skin_bindings: List[SkinBinding] = []

    def walk(node_idx: int, parent: np.ndarray, parent_idx: int = -1):
        nonlocal camera_hint
        parents[node_idx] = parent_idx
        node = nodes[node_idx]
        world = parent @ _node_matrix(node)
        if "mesh" in node:
            mesh = gltf["meshes"][node["mesh"]]
            for prim_i, prim in enumerate(mesh.get("primitives", [])):
                if prim.get("mode", 4) != 4:     # triangles only
                    continue
                attrs = prim["attributes"]
                pos = _accessor(gltf, buffers, attrs["POSITION"]) \
                    .astype(np.float32)
                nv = len(pos)
                if "NORMAL" in attrs:
                    nrm = _accessor(gltf, buffers, attrs["NORMAL"]) \
                        .astype(np.float32)
                else:
                    nrm = np.zeros_like(pos)
                uv = (_accessor(gltf, buffers, attrs["TEXCOORD_0"])
                      .astype(np.float32) if "TEXCOORD_0" in attrs
                      else np.zeros((nv, 2), np.float32))
                if "indices" in prim:
                    idx = _accessor(gltf, buffers, prim["indices"]) \
                        .reshape(-1).astype(np.int32)
                else:
                    idx = np.arange(nv, dtype=np.int32)
                idx = idx.reshape(-1, 3)
                if "NORMAL" not in attrs:
                    fn = np.cross(pos[idx[:, 1]] - pos[idx[:, 0]],
                                  pos[idx[:, 2]] - pos[idx[:, 0]])
                    fn /= np.maximum(np.linalg.norm(fn, -1, keepdims=True)
                                     if fn.ndim == 1 else
                                     np.linalg.norm(fn, axis=-1,
                                                    keepdims=True), 1e-12)
                    np.add.at(nrm, idx.reshape(-1), np.repeat(fn, 3, axis=0))
                    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1,
                                                     keepdims=True), 1e-12)
                mat_id = prim.get("material", 0)
                instance_nodes.append(node_idx)
                instances.append(MeshInstance(
                    positions=pos, normals=nrm, uvs=uv, indices=idx,
                    material=np.full((len(idx),), mat_id, np.int32),
                    transform=world.astype(np.float32),
                    name=node.get("name", f"node{node_idx}"),
                    # nodes referencing the same glTF mesh share one
                    # prototype in the two-level BVH (accel/tlas.py);
                    # skinned nodes deform per-instance, never shared
                    mesh_key=(None if "skin" in node
                              else f"mesh{node['mesh']}.{prim_i}")))
                if "skin" in node and "JOINTS_0" in attrs:
                    sk = gltf["skins"][node["skin"]]
                    jn = np.asarray(sk["joints"], np.int32)
                    if "inverseBindMatrices" in sk:
                        ibm = _accessor(gltf, buffers,
                                        sk["inverseBindMatrices"])                             .reshape(-1, 4, 4).transpose(0, 2, 1)                             .astype(np.float32)
                    else:
                        ibm = np.tile(np.eye(4, dtype=np.float32),
                                      (len(jn), 1, 1))
                    joints = _accessor(gltf, buffers, attrs["JOINTS_0"])                         .astype(np.int32)
                    weights = _accessor(gltf, buffers,
                                        attrs["WEIGHTS_0"])                         .astype(np.float32)
                    wsum = np.maximum(weights.sum(-1, keepdims=True),
                                      1e-8)
                    skin_bindings.append(SkinBinding(
                        instance=len(instances) - 1, joints=joints,
                        weights=weights / wsum, joint_nodes=jn, ibm=ibm,
                        base_positions=pos.copy(),
                        base_normals=nrm.copy()))
        ext = node.get("extensions", {})
        if "KHR_lights_punctual" in ext:
            ldef = gltf.get("extensions", {}).get(
                "KHR_lights_punctual", {}).get("lights", [])[
                ext["KHR_lights_punctual"]["light"]]
            color = np.asarray(ldef.get("color", [1, 1, 1]), np.float32)
            inten = color * ldef.get("intensity", 1.0)
            kind = {"point": LIGHT_POINT, "directional": LIGHT_DIRECTIONAL,
                    "spot": LIGHT_SPOT}[ldef["type"]]
            wdir = -world[:3, 2]  # lights point down -Z in local space
            wdir = wdir / max(np.linalg.norm(wdir), 1e-9)
            spot = ldef.get("spot", {})
            lights_acc["kind"].append(kind)
            lights_acc["position"].append(world[:3, 3])
            lights_acc["direction"].append(wdir)
            lights_acc["intensity"].append(inten)
            lights_acc["angular"].append(0.0)
            lights_acc["cin"].append(float(np.cos(
                spot.get("innerConeAngle", 0.0))))
            lights_acc["cout"].append(float(np.cos(
                spot.get("outerConeAngle", np.pi / 4))))
        if "camera" in node and camera_hint is None:
            cdef = gltf["cameras"][node["camera"]]
            if cdef.get("type") == "perspective":
                fov = np.rad2deg(cdef["perspective"].get("yfov", 0.8))
                pos = world[:3, 3]
                fwd = -world[:3, 2]
                up = world[:3, 1]
                camera_hint = dict(position=pos.tolist(),
                                   target=(pos + fwd).tolist(),
                                   up=up.tolist(), fov_y_deg=float(fov))
        for child in node.get("children", []):
            walk(child, world)

    for r in roots:
        walk(r, np.eye(4, dtype=np.float32), -1)

    analytic = None
    if lights_acc["kind"]:
        analytic = AnalyticLights(
            kind=jnp.asarray(np.asarray(lights_acc["kind"], np.int32)),
            position=jnp.asarray(np.asarray(lights_acc["position"],
                                            np.float32)),
            direction=jnp.asarray(np.asarray(lights_acc["direction"],
                                             np.float32)),
            intensity=jnp.asarray(np.asarray(lights_acc["intensity"],
                                             np.float32)),
            angular_size=jnp.asarray(np.asarray(lights_acc["angular"],
                                                np.float32)),
            cos_inner=jnp.asarray(np.asarray(lights_acc["cin"], np.float32)),
            cos_outer=jnp.asarray(np.asarray(lights_acc["cout"], np.float32)),
        )

    scene = HostScene(instances=instances, materials=materials,
                      analytic_lights=analytic,
                      textures=textures if textures else None,
                      material_names=[m.get("name")
                                      for m in gltf.get("materials", [])])
    scene.camera = camera_hint

    # --- retained rig: animations + skins (animate_gltf drives it) ---
    channels: List[AnimChannel] = []
    duration = 0.0
    for anim in gltf.get("animations", []):
        samplers = anim.get("samplers", [])
        for ch in anim.get("channels", []):
            tgt = ch.get("target", {})
            path = tgt.get("path")
            if path not in ("translation", "rotation", "scale") \
                    or "node" not in tgt:
                continue                      # weights/morphs unsupported
            sa = samplers[ch["sampler"]]
            times = _accessor(gltf, buffers, sa["input"]) \
                .reshape(-1).astype(np.float32)
            values = _accessor(gltf, buffers, sa["output"]) \
                .astype(np.float32)
            channels.append(AnimChannel(
                node=int(tgt["node"]), path=path, times=times,
                values=values,
                interp=sa.get("interpolation", "LINEAR")))
            duration = max(duration, float(times[-1]))
    if channels or skin_bindings:
        scene.gltf_rig = GltfRig(
            parents=parents, base_nodes=nodes, channels=channels,
            instance_nodes=instance_nodes, skins=skin_bindings,
            duration=duration)
    return scene


# ---------------------------------------------------------------------------
# Animation + skinning import (reference: Donut scene-graph animation,
# consumed at Sample.cpp:2065 Refresh / :1170 UpdateSkinnedBLASs)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class AnimChannel:
    node: int
    path: str                 # "translation" | "rotation" | "scale"
    times: np.ndarray         # [K]
    values: np.ndarray        # [K,3] or [K,4]
    interp: str               # "LINEAR" | "STEP"


@dataclasses.dataclass
class SkinBinding:
    instance: int             # index into host.instances
    joints: np.ndarray        # [V,4] i32
    weights: np.ndarray       # [V,4] f32
    joint_nodes: np.ndarray   # [J] i32 node ids
    ibm: np.ndarray           # [J,4,4] inverse bind matrices
    base_positions: np.ndarray  # [V,3] bind-pose local positions
    base_normals: np.ndarray    # [V,3]


@dataclasses.dataclass
class GltfRig:
    """Retained node hierarchy + animation tracks for a loaded glTF."""

    parents: List[int]
    base_nodes: List[dict]     # raw node dicts (TRS/matrix source)
    channels: List[AnimChannel]
    instance_nodes: List[int]  # per MeshInstance: owning node id
    skins: List[SkinBinding]
    duration: float


def _quat_to_mat3(q: np.ndarray) -> np.ndarray:
    x, y, z, w = q
    return np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ], np.float32)


def _sample_channel(ch: AnimChannel, t: float) -> np.ndarray:
    times = ch.times
    cubic = ch.interp == "CUBICSPLINE"
    # glTF 2.0 spec: CUBICSPLINE output accessors hold 3 elements per
    # keyframe (in-tangent, value, out-tangent) — indexing values[i]
    # directly would read a tangent (ADVICE r2).
    val = (lambda i: ch.values[3 * i + 1]) if cubic \
        else (lambda i: ch.values[i])
    if len(times) == 1:
        return val(0)
    t = float(np.clip(t, times[0], times[-1]))
    i = int(np.searchsorted(times, t, side="right") - 1)
    i = min(max(i, 0), len(times) - 2)
    if ch.interp == "STEP":
        return val(i)
    t0, t1 = times[i], times[i + 1]
    a = 0.0 if t1 <= t0 else (t - t0) / (t1 - t0)
    v0, v1 = val(i), val(i + 1)
    if cubic:
        # cubic Hermite (glTF spec eq.; tangents scaled by keyframe dt)
        td = t1 - t0
        bk = ch.values[3 * i + 2] * td        # out-tangent of key i
        ak1 = ch.values[3 * (i + 1)] * td     # in-tangent of key i+1
        a2, a3 = a * a, a * a * a
        v = ((2 * a3 - 3 * a2 + 1) * v0 + (a3 - 2 * a2 + a) * bk
             + (-2 * a3 + 3 * a2) * v1 + (a3 - a2) * ak1)
    else:
        v = (1.0 - a) * v0 + a * v1
    if ch.path == "rotation":
        if cubic:
            v = v / max(np.linalg.norm(v), 1e-12)
        else:
            # nlerp with shortest-arc sign fix
            if np.dot(v0, v1) < 0.0:
                v = (1.0 - a) * v0 - a * v1
            v = v / max(np.linalg.norm(v), 1e-12)
    return v


def animate_gltf(host, t: float) -> None:
    """Advance the retained glTF rig to time `t` (wrapping by duration):
    rigid nodes update their instance transforms; skinned instances
    re-skin their vertex positions/normals (linear blend). Mutates
    `host.instances` in place — follow with animation.refresh_refit (or
    refresh) to rebuild the device scene."""
    rig: Optional[GltfRig] = getattr(host, "gltf_rig", None)
    if rig is None:
        return
    if rig.duration > 0 and t > rig.duration:
        t = t % rig.duration

    n = len(rig.base_nodes)
    trs = {}
    for ni, node in enumerate(rig.base_nodes):
        trs[ni] = [np.asarray(node.get("translation", [0, 0, 0]),
                              np.float32),
                   np.asarray(node.get("rotation", [0, 0, 0, 1]),
                              np.float32),
                   np.asarray(node.get("scale", [1, 1, 1]), np.float32),
                   "matrix" in node]
    animated = set()
    for ch in rig.channels:
        v = _sample_channel(ch, t)
        k = {"translation": 0, "rotation": 1, "scale": 2}[ch.path]
        trs[ch.node][k] = np.asarray(v, np.float32)
        trs[ch.node][3] = False          # channel overrides a raw matrix
        animated.add(ch.node)

    local = np.zeros((n, 4, 4), np.float32)
    for ni, node in enumerate(rig.base_nodes):
        if trs[ni][3]:
            local[ni] = _node_matrix(node)
        else:
            tr, q, sc, _ = trs[ni]
            m4 = np.eye(4, dtype=np.float32)
            m4[:3, :3] = _quat_to_mat3(q) * sc[None, :]
            m4[:3, 3] = tr
            local[ni] = m4
    world = np.zeros_like(local)
    # parents precede children in the recorded order (walk order)
    order = sorted(range(n), key=lambda i: 0 if rig.parents[i] < 0 else 1)
    # robust topological pass (handles arbitrary parent order)
    done = [False] * n
    stack = [i for i in range(n) if rig.parents[i] < 0]
    while stack:
        ni = stack.pop()
        p = rig.parents[ni]
        world[ni] = local[ni] if p < 0 else world[p] @ local[ni]
        done[ni] = True
        stack.extend(c for c in range(n) if rig.parents[c] == ni)

    from rtxpt_tpu.scene.animation import skin_vertices
    skinned = {sb.instance for sb in rig.skins}
    for ii, ni in enumerate(rig.instance_nodes):
        if ii not in skinned and ni >= 0:
            host.instances[ii].transform = world[ni].astype(np.float32)
    for sb in rig.skins:
        palette = np.einsum("jab,jbc->jac", world[sb.joint_nodes], sb.ibm)
        host.instances[sb.instance].positions = skin_vertices(
            sb.base_positions, sb.joints, sb.weights, palette)
        # normals: rotate by the blended matrix (uniform-scale approx)
        nrm = np.zeros_like(sb.base_normals)
        for k in range(4):
            mats = palette[sb.joints[:, k]][:, :3, :3]
            nrm += sb.weights[:, k:k + 1] * np.einsum(
                "vij,vj->vi", mats, sb.base_normals)
        ln = np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
        host.instances[sb.instance].normals = (nrm / ln).astype(np.float32)
        host.instances[sb.instance].transform = np.eye(4, dtype=np.float32)
