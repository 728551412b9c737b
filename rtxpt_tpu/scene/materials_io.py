"""Material JSON sidecar workflow (MaterialsBaker analog).

The reference persists artist-editable material overrides in a JSON
sidecar next to the asset and re-applies them on load
(/root/reference/Rtxpt/Materials/MaterialsBaker.h:209-218,
MaterialsBaker.cpp Load/Save paths). This module is the same contract
for rtxpt_tpu: dump the HostScene's material table to JSON, hand-edit
(or tool-edit) it, and apply it back over a freshly loaded asset —
overrides survive asset re-export.

Schema: {"materials": [{"index": i, "name": str|None, <field>: value…}]}
Texture-id fields are asset identity, not artist parameters, and are
excluded from the sidecar (matching the reference, which persists only
PTMaterial scalars/flags).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

import numpy as np

from rtxpt_tpu.scene.scene import HostScene, Materials

# fields owned by the asset, not the sidecar
_EXCLUDED = {"base_color_tex", "emissive_tex", "metal_rough_tex",
             "normal_tex"}


def _field_names():
    return [f.name for f in dataclasses.fields(Materials)
            if f.name not in _EXCLUDED]


def materials_to_json(materials: Materials,
                      names: Optional[list] = None) -> dict:
    """Serialize the material table to the sidecar dict."""
    n = len(np.asarray(materials.base_color))
    out = []
    for i in range(n):
        row = {"index": i}
        if names is not None and i < len(names) and names[i]:
            row["name"] = names[i]
        for fname in _field_names():
            arr = getattr(materials, fname)
            if arr is None:
                continue
            v = np.asarray(arr)[i]
            row[fname] = (float(v) if v.ndim == 0
                          else [float(x) for x in v])
        out.append(row)
    return {"materials": out}


def save_materials_json(path: str, host: HostScene) -> None:
    if host.materials is None:
        raise ValueError("scene has no materials")
    doc = materials_to_json(host.materials,
                            getattr(host, "material_names", None))
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


def apply_materials_json(host: HostScene, path_or_doc) -> HostScene:
    """Apply sidecar overrides to the host scene's material table.

    Rows match by "name" when both sides have one, else by "index".
    Unknown fields are ignored (forward compat); partial rows override
    only the listed fields. Returns the same HostScene (materials table
    replaced in place, mirroring the reference's load-time override)."""
    if isinstance(path_or_doc, (str, bytes)):
        with open(path_or_doc) as f:
            doc = json.load(f)
    else:
        doc = path_or_doc
    mats = host.materials
    if mats is None:
        raise ValueError("scene has no materials")
    names = list(getattr(host, "material_names", None) or [])
    cols = {fname: None for fname in _field_names()}
    n = len(np.asarray(mats.base_color))
    for row in doc.get("materials", []):
        idx = None
        if "name" in row and row["name"] in names:
            idx = names.index(row["name"])
        elif "index" in row:
            idx = int(row["index"])
        if idx is None or not (0 <= idx < n):
            continue
        for fname in _field_names():
            if fname not in row:
                continue
            cur = getattr(mats, fname)
            if cur is None:
                continue
            if cols[fname] is None:
                cols[fname] = np.array(np.asarray(cur))
            cols[fname][idx] = row[fname]
    updates = {}
    for fname, arr in cols.items():
        if arr is not None:
            updates[fname] = arr
    if updates:
        host.materials = mats.replace(**{
            k: _as(getattr(mats, k), v) for k, v in updates.items()})
    return host


def _as(like, value):
    import jax.numpy as jnp
    return jnp.asarray(np.asarray(value, np.asarray(like).dtype))
