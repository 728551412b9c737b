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
