"""Interactive viewer endpoints (apps/viewer.py, SampleUI analog):
frame rendering + progressive accumulation + live material editing."""

import json
import urllib.request

import numpy as np
import pytest

from rtxpt_tpu.scene.procedural import cornell_box


@pytest.fixture(scope="module")
def server():
    from rtxpt_tpu.apps.viewer import serve
    srv, state = serve(cornell_box(), port=18742, width=64, height=48,
                       block=False)
    yield "http://127.0.0.1:18742", state
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=300) as r:
        return r.read(), dict(r.headers)


def test_page_and_materials(server):
    base, _ = server
    body, _ = _get(base + "/")
    assert b"rtxpt_tpu viewer" in body
    mats, _ = _get(base + "/materials")
    doc = json.loads(mats)
    assert len(doc["materials"]) >= 1
    assert "roughness" in doc["materials"][0]


def test_frame_accumulates_and_resets(server):
    base, _ = server
    url = base + "/frame?yaw=0.8&pitch=0.5&dist=2.5&bounces=2&denoise=0"
    png1, h1 = _get(url)
    assert png1[:8] == b"\x89PNG\r\n\x1a\n"
    _, h2 = _get(url)
    assert int(h2["X-Accum"]) > int(h1["X-Accum"])    # progressive
    _, h3 = _get(base + "/frame?yaw=1.4&pitch=0.5&dist=2.5&bounces=2"
                 "&denoise=0")
    assert int(h3["X-Accum"]) == 1                    # camera move resets


def test_debug_views_presets_and_probe(server):
    """Debug-view taxonomy + preset dropdown + right-click pixel pick
    (SampleUI.h:209, Sample.cpp:2259-2291 analog endpoints)."""
    base, _ = server
    opts = json.loads(_get(base + "/options")[0])
    assert "normal" in opts["views"] and "quality" in opts["presets"]
    # each debug view renders a valid PNG distinct from beauty
    q = "?yaw=0.8&pitch=0.5&dist=2.5&bounces=2&denoise=0"
    beauty, _ = _get(base + "/frame" + q)
    for view in ("albedo", "normal", "depth", "emission"):
        png, _ = _get(base + "/frame" + q + "&view=" + view)
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert png != beauty, view
    # preset changes the render
    png_p, _ = _get(base + "/frame" + q + "&preset=fast")
    assert png_p[:8] == b"\x89PNG\r\n\x1a\n"
    # pixel probe returns the per-bounce path of the picked pixel
    rec = json.loads(_get(base + "/probe" + q + "&x=32&y=24")[0])
    assert rec["x"] == 32 and rec["y"] == 24
    assert len(rec["path"]) >= 1
    v0 = rec["path"][0]
    assert {"bounce", "origin", "direction", "hit"} <= set(v0)
    assert v0["hit"] is True                     # cornell wall behind


def test_material_edit_changes_frame(server):
    base, state = server
    url = base + "/frame?yaw=0.8&pitch=0.4&dist=2.0&bounces=2&denoise=0"
    png_before, _ = _get(url)
    req = urllib.request.Request(
        base + "/material",
        data=json.dumps({"index": 0,
                         "base_color": [0.05, 0.05, 0.9]}).encode(),
        method="POST")
    urllib.request.urlopen(req, timeout=300).read()
    assert float(np.asarray(state.host.materials.base_color)[0, 2]) == \
        pytest.approx(0.9)
    png_after, _ = _get(url)
    assert png_after != png_before                    # re-render differs
