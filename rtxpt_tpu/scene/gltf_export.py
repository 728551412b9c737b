"""Minimal glTF 2.0 exporter: HostScene -> .gltf with embedded buffers.

Gives the framework a round-trippable asset path (the reference ships its
test scene as glTF via the separate RTXPT-Assets repo; our pytest harness
generates assets from the procedural builders instead). Exports positions/
normals/uvs/indices per instance, pbrMetallicRoughness materials with
KHR_materials_transmission/ior/emissive_strength, and punctual lights.
"""

from __future__ import annotations

import base64
import json

import numpy as np


def export_gltf(host, path: str) -> None:
    buffers = bytearray()
    accessors = []
    buffer_views = []
    meshes = []
    nodes = []

    def add_view(data: np.ndarray, target=None):
        start = len(buffers)
        raw = data.tobytes()
        buffers.extend(raw)
        while len(buffers) % 4:
            buffers.append(0)
        view = {"buffer": 0, "byteOffset": start, "byteLength": len(raw)}
        if target:
            view["target"] = target
        buffer_views.append(view)
        return len(buffer_views) - 1

    def add_accessor(data: np.ndarray, ctype: int, atype: str, target=None):
        view = add_view(data, target)
        acc = {"bufferView": view, "componentType": ctype,
               "count": len(data), "type": atype}
        if atype == "VEC3" and ctype == 5126:
            acc["min"] = data.min(0).tolist()
            acc["max"] = data.max(0).tolist()
        accessors.append(acc)
        return len(accessors) - 1

    mats = host.materials
    n_mats = int(np.asarray(mats.base_color).shape[0])
    materials_json = []
    for i in range(n_mats):
        bc = np.asarray(mats.base_color[i]).tolist()
        em = np.asarray(mats.emissive[i])
        strength = float(max(em.max(), 1.0))
        mj = {
            "pbrMetallicRoughness": {
                "baseColorFactor": bc + [1.0],
                "metallicFactor": float(np.asarray(mats.metallic[i])),
                "roughnessFactor": float(np.asarray(mats.roughness[i])),
            },
            "emissiveFactor": (em / strength).clip(0, 1).tolist(),
        }
        ext = {}
        if strength > 1.0:
            ext["KHR_materials_emissive_strength"] = {
                "emissiveStrength": strength}
        tr = float(np.asarray(mats.transmission[i]))
        if tr > 0:
            ext["KHR_materials_transmission"] = {"transmissionFactor": tr}
        ior = float(np.asarray(mats.ior[i]))
        if abs(ior - 1.5) > 1e-6:
            ext["KHR_materials_ior"] = {"ior": ior}
        if ext:
            mj["extensions"] = ext
        materials_json.append(mj)

    for inst in host.instances:
        # split instance triangles by material id (glTF = 1 material/prim)
        prims = []
        for mat_id in np.unique(inst.material):
            sel = inst.material == mat_id
            idx = inst.indices[sel].reshape(-1).astype(np.uint32)
            prims.append({
                "attributes": {
                    "POSITION": add_accessor(
                        inst.positions.astype(np.float32), 5126, "VEC3",
                        34962),
                    "NORMAL": add_accessor(
                        inst.normals.astype(np.float32), 5126, "VEC3",
                        34962),
                    "TEXCOORD_0": add_accessor(
                        (inst.uvs if inst.uvs is not None else
                         np.zeros((len(inst.positions), 2))).astype(
                             np.float32), 5126, "VEC2", 34962),
                },
                "indices": add_accessor(idx, 5125, "SCALAR", 34963),
                "material": int(mat_id),
            })
        meshes.append({"primitives": prims})
        node = {"mesh": len(meshes) - 1, "name": inst.name}
        if not np.allclose(inst.transform, np.eye(4)):
            node["matrix"] = inst.transform.T.reshape(-1).tolist()
        nodes.append(node)

    lights_json = []
    al = host.analytic_lights
    if al is not None:
        kinds = np.asarray(al.kind)
        for i in range(len(kinds)):
            k = int(kinds[i])
            name = {0: "point", 1: "directional", 2: "spot"}[k]
            inten = np.asarray(al.intensity[i])
            scale = float(max(inten.max(), 1e-6))
            ldef = {"type": name, "color": (inten / scale).tolist(),
                    "intensity": scale}
            if name == "spot":
                ldef["spot"] = {
                    "innerConeAngle": float(np.arccos(np.clip(
                        np.asarray(al.cos_inner[i]), -1, 1))),
                    "outerConeAngle": float(np.arccos(np.clip(
                        np.asarray(al.cos_outer[i]), -1, 1))),
                }
            lights_json.append(ldef)
            pos = np.asarray(al.position[i])
            d = np.asarray(al.direction[i])
            # orient -Z along d
            z = -d / max(np.linalg.norm(d), 1e-9)
            up = np.asarray([0.0, 1.0, 0.0])
            if abs(z @ up) > 0.99:
                up = np.asarray([1.0, 0.0, 0.0])
            x = np.cross(up, z)
            x /= max(np.linalg.norm(x), 1e-9)
            y = np.cross(z, x)
            mtx = np.eye(4)
            mtx[:3, 0], mtx[:3, 1], mtx[:3, 2], mtx[:3, 3] = x, y, z, pos
            nodes.append({
                "name": f"light{i}",
                "matrix": mtx.T.reshape(-1).tolist(),
                "extensions": {"KHR_lights_punctual": {
                    "light": len(lights_json) - 1}},
            })

    if host.camera:
        c = host.camera
        pos = np.asarray(c["position"], np.float64)
        fwd = np.asarray(c["target"], np.float64) - pos
        fwd /= max(np.linalg.norm(fwd), 1e-9)
        up = np.asarray(c["up"], np.float64)
        x = np.cross(fwd, up)
        x /= max(np.linalg.norm(x), 1e-9)
        y = np.cross(x, fwd)
        mtx = np.eye(4)
        mtx[:3, 0], mtx[:3, 1], mtx[:3, 2], mtx[:3, 3] = x, y, -fwd, pos
        nodes.append({
            "name": "camera", "camera": 0,
            "matrix": mtx.T.reshape(-1).tolist(),
        })
        cameras = [{"type": "perspective", "perspective": {
            "yfov": float(np.deg2rad(c["fov_y_deg"])), "znear": 0.001}}]
    else:
        cameras = []

    gltf = {
        "asset": {"version": "2.0", "generator": "rtxpt_tpu"},
        "scene": 0,
        "scenes": [{"nodes": list(range(len(nodes)))}],
        "nodes": nodes,
        "meshes": meshes,
        "materials": materials_json,
        "accessors": accessors,
        "bufferViews": buffer_views,
        "buffers": [{
            "byteLength": len(buffers),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(bytes(buffers)).decode(),
        }],
        "extensionsUsed": ["KHR_materials_emissive_strength",
                           "KHR_materials_transmission",
                           "KHR_materials_ior", "KHR_lights_punctual"],
    }
    if cameras:
        gltf["cameras"] = cameras
    if lights_json:
        gltf["extensions"] = {"KHR_lights_punctual": {"lights": lights_json}}
    with open(path, "w") as f:
        json.dump(gltf, f)
