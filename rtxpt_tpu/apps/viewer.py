"""Interactive browser viewer + material editor (SampleUI analog).

The reference ships an ImGui control panel with camera control, material
editor and debug views (reference: SampleUI.h:120-210 SampleUIData,
material editor; Sample.cpp camera controls). Headless-first TPU analog:
a dependency-free HTTP viewer — the renderer stays a server-side JAX
process (where the TPU is), the browser is just a remote control:

  * orbit camera (drag / WASD+QE keys), progressive accumulation while
    the camera rests, restart on move;
  * live material editor: sliders patch the material table and re-prepare
    the scene (MaterialsBaker JSON sidecar semantics — scene/
    materials_io.py — with instant feedback);
  * render settings: bounces, exposure, tonemap, denoiser on/off;
  * plain GET endpoints, PNG frames — works over SSH port-forwarding.

Run:  python -m rtxpt_tpu.apps.viewer --scene kitchen --port 8000
"""

from __future__ import annotations

import io
import json
import struct as _struct
import threading
import time
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


def _png_bytes(img01: np.ndarray) -> bytes:
    """Minimal PNG encoder (8-bit RGB), no external deps."""
    h, w = img01.shape[:2]
    raw = (np.clip(img01, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    rows = b"".join(b"\x00" + raw[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = tag + data
        return (_struct.pack(">I", len(data)) + c
                + _struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF))

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(rows, 6))
            + chunk(b"IEND", b""))


_PAGE = """<!doctype html><html><head><title>rtxpt_tpu viewer</title>
<style>
 body{margin:0;background:#15171a;color:#cfd3d8;font:13px sans-serif;
      display:flex;height:100vh}
 #view{flex:1;display:flex;align-items:center;justify-content:center}
 img{image-rendering:pixelated;max-width:100%;max-height:100%}
 #panel{width:300px;padding:12px;background:#1d2025;overflow-y:auto}
 label{display:block;margin-top:8px}
 input[type=range]{width:100%}
 select,button{width:100%;margin-top:4px}
 h3{margin:12px 0 4px;font-size:13px;color:#8ab4f8}
 .mat{border-top:1px solid #333;padding:4px 0}
</style></head><body>
<div id=view><img id=frame width=640></div>
<div id=panel>
 <h3>camera (drag / WASD+QE)</h3>
 <div id=stats></div>
 <h3>render</h3>
 <label>preset
  <select id=preset><option value="">(none)</option></select></label>
 <label>debug view
  <select id=view><option value=beauty>beauty</option></select></label>
 <label>bounces <span id=bv>4</span>
  <input type=range id=bounces min=1 max=12 value=4></label>
 <label>exposure <span id=ev>1</span>
  <input type=range id=exposure min=-4 max=4 step=0.1 value=0></label>
 <label><input type=checkbox id=denoise checked> denoise (1spp realtime)
 </label>
 <h3>pixel probe (right-click image)</h3>
 <pre id=probe style="font-size:10px;white-space:pre-wrap"></pre>
 <h3>materials</h3><div id=mats></div>
</div>
<script>
let yaw=0.8,pitch=0.5,dist=2.5,gen=0,busy=false,acc=0;
const img=document.getElementById('frame');
function q(){return `yaw=${yaw}&pitch=${pitch}&dist=${dist}`+
  `&bounces=${document.getElementById('bounces').value}`+
  `&exposure=${Math.pow(2,document.getElementById('exposure').value)}`+
  `&denoise=${document.getElementById('denoise').checked?1:0}`+
  `&view=${document.getElementById('view').value}`+
  `&preset=${document.getElementById('preset').value}`;}
async function tick(){
  if(busy)return; busy=true;
  const t0=performance.now();
  const r=await fetch('/frame?'+q()+'&gen='+gen);
  const b=await r.blob();
  img.src=URL.createObjectURL(b); acc=r.headers.get('X-Accum');
  document.getElementById('stats').textContent=
    `${(performance.now()-t0).toFixed(0)} ms | spp ${acc}`;
  busy=false;
}
setInterval(tick,120);
let drag=null;
img.onmousedown=e=>{drag=[e.clientX,e.clientY];};
window.onmouseup=()=>{drag=null;};
window.onmousemove=e=>{if(!drag)return;
  yaw+=(e.clientX-drag[0])*0.01; pitch+=(e.clientY-drag[1])*0.01;
  pitch=Math.max(-1.5,Math.min(1.5,pitch)); drag=[e.clientX,e.clientY];
  gen++;};
window.onkeydown=e=>{const s=0.15;
  if(e.key=='w')dist*=0.9; if(e.key=='s')dist*=1.1;
  if(e.key=='a')yaw-=s; if(e.key=='d')yaw+=s;
  if(e.key=='q')pitch-=s; if(e.key=='e')pitch+=s; gen++;};
img.oncontextmenu=async e=>{e.preventDefault();
  const r=img.getBoundingClientRect();
  const x=Math.floor((e.clientX-r.left)/r.width*img.naturalWidth);
  const y=Math.floor((e.clientY-r.top)/r.height*img.naturalHeight);
  const j=await (await fetch(`/probe?x=${x}&y=${y}&`+q())).json();
  document.getElementById('probe').textContent=
    JSON.stringify(j,null,1);};
async function loadOpts(){
  const o=await (await fetch('/options')).json();
  const vs=document.getElementById('view');
  o.views.forEach(v=>{if(v!='beauty'){const e=document.createElement(
    'option');e.value=v;e.textContent=v;vs.appendChild(e);}});
  const ps=document.getElementById('preset');
  o.presets.forEach(v=>{const e=document.createElement('option');
    e.value=v;e.textContent=v;ps.appendChild(e);});
}
loadOpts();
for(const id of ['bounces','exposure','denoise','view','preset'])
  document.getElementById(id).oninput=()=>{gen++;
    document.getElementById('bv').textContent=
      document.getElementById('bounces').value;
    document.getElementById('ev').textContent=
      Math.pow(2,document.getElementById('exposure').value).toFixed(2);};
async function loadMats(){
  const ms=await (await fetch('/materials')).json();
  const root=document.getElementById('mats'); root.innerHTML='';
  ms.materials.forEach(m=>{
    const d=document.createElement('div'); d.className='mat';
    d.innerHTML=`<b>#${m.index} ${m.name||''}</b>`;
    for(const f of ['roughness','metallic','transmission']){
      if(!(f in m))continue;
      const l=document.createElement('label');
      l.textContent=f+' ';
      const r=document.createElement('input');
      r.type='range';r.min=0;r.max=1;r.step=0.05;r.value=m[f];
      r.oninput=async()=>{await fetch('/material',{method:'POST',
        body:JSON.stringify({index:m.index,[f]:parseFloat(r.value)})});
        gen++;};
      l.appendChild(r); d.appendChild(l);
    }
    root.appendChild(d);});
}
loadMats();
</script></body></html>"""


class ViewerState:
    """Render state shared across requests (single renderer lock)."""

    def __init__(self, host, width=320, height=240):
        import jax.numpy as jnp
        from rtxpt_tpu.prepare import prepare
        self.jnp = jnp
        self.host = host
        self.scene = prepare(host)
        self.width, self.height = width, height
        self.lock = threading.Lock()
        self.accum = None
        self.accum_n = 0
        self.last_key = None
        pos = np.concatenate([np.asarray(i.positions) @ i.transform[:3, :3].T
                              + i.transform[:3, 3]
                              for i in host.instances])
        self.center = (pos.min(0) + pos.max(0)) * 0.5
        self.radius = float(np.linalg.norm(pos.max(0) - pos.min(0)) * 0.5)

    def camera(self, yaw, pitch, dist):
        from rtxpt_tpu.scene.camera import look_at
        d = self.radius * dist
        eye = self.center + d * np.asarray([
            np.cos(pitch) * np.cos(yaw), np.sin(pitch),
            np.cos(pitch) * np.sin(yaw)])
        return look_at(eye.tolist(), self.center.tolist(), [0, 1, 0],
                       50.0, self.width, self.height)

    def _cfg(self, bounces, preset=""):
        from rtxpt_tpu.config import NEEMode, PathTracerConfig, PRESETS
        from rtxpt_tpu.pt.dispatch import resolve
        if preset and preset in PRESETS:
            cfg = PRESETS[preset].pt
        else:
            cfg = PathTracerConfig(max_bounces=bounces, nee=NEEMode.POWER)
        return resolve(self.scene, cfg)

    def frame(self, yaw, pitch, dist, bounces, exposure, denoise,
              view="beauty", preset=""):
        """One progressive frame; accumulation restarts when any input
        changes (the reference's ResetRealtimeCaches / accumulation-reset
        semantics, Sample.cpp:1416-1462). view selects a debug
        visualization (SampleUI.h:209 debug-view taxonomy analog,
        render/debug_viz.py); preset applies a config.PRESETS entry
        (SampleUI preset dropdown)."""
        from rtxpt_tpu.pt.integrator import render_sample_jit
        from rtxpt_tpu.render.postprocess import tonemap
        key = (round(yaw, 4), round(pitch, 4), round(dist, 4), bounces,
               denoise, view, preset)
        with self.lock:
            cam = self.camera(yaw, pitch, dist)
            cfg = self._cfg(bounces, preset)
            if key != self.last_key:
                self.accum = None
                self.accum_n = 0
                self.last_key = key
            out = render_sample_jit(self.scene, cam, cfg, self.width,
                                    self.height,
                                    self.jnp.uint32(self.accum_n), True,
                                    None)
            if view != "beauty":
                from rtxpt_tpu.render.debug_viz import visualize
                img = visualize(view, albedo=out["albedo"],
                                normal=out["normal"], depth=out["depth"],
                                emission=out["emission"])
                self.accum_n += 1
                return np.asarray(img), self.accum_n
            L = out["L"]
            if denoise and self.accum_n < 4:
                # early frames: one edge-aware a-trous sweep while the
                # accumulation warms (full SVGF runs in pt/realtime)
                from rtxpt_tpu.render.denoise import atrous_iteration
                var = self.jnp.ones(L.shape[:2], self.jnp.float32)
                L, _ = atrous_iteration(L, var, out["normal"],
                                        out["depth"], 1)
            self.accum = L if self.accum is None else (
                self.accum * (self.accum_n / (self.accum_n + 1.0))
                + L / (self.accum_n + 1.0))
            self.accum_n += 1
            img = tonemap(self.accum, exposure, "aces")
            return np.asarray(img), self.accum_n

    def patch_material(self, overrides: dict):
        from rtxpt_tpu.scene.materials_io import apply_materials_json
        from rtxpt_tpu.prepare import prepare
        with self.lock:
            apply_materials_json(self.host, {"materials": [overrides]})
            self.scene = prepare(self.host)      # re-bake (cheap scenes)
            self.accum = None
            self.accum_n = 0
            self.last_key = None

    def materials_json(self):
        from rtxpt_tpu.scene.materials_io import materials_to_json
        return materials_to_json(self.host.materials,
                                 getattr(self.host, "material_names", None))

    def probe(self, x, y, yaw, pitch, dist, bounces, preset=""):
        """Pixel pick: re-trace one pixel, per-bounce state dump (the
        right-click DebugFeedbackStruct pick, Sample.cpp:2259-2291)."""
        from rtxpt_tpu.utils.debug import probe_pixel
        with self.lock:
            cam = self.camera(yaw, pitch, dist)
            cfg = self._cfg(bounces, preset)
            x = min(max(int(x), 0), self.width - 1)
            y = min(max(int(y), 0), self.height - 1)
            return {"x": x, "y": y,
                    "path": probe_pixel(self.scene, cam, cfg, x, y)}


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):              # quiet
            pass

        def _send(self, code, body, ctype="text/html", extra=()):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in extra:
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self._send(200, _PAGE.encode())
            elif url.path == "/frame":
                qs = parse_qs(url.query)
                g = lambda k, d: float(qs.get(k, [d])[0])
                img, n = state.frame(
                    g("yaw", 0.8), g("pitch", 0.5), g("dist", 2.5),
                    int(g("bounces", 4)), g("exposure", 1.0),
                    qs.get("denoise", ["1"])[0] == "1",
                    qs.get("view", ["beauty"])[0],
                    qs.get("preset", [""])[0])
                self._send(200, _png_bytes(img), "image/png",
                           extra=[("X-Accum", str(n))])
            elif url.path == "/materials":
                self._send(200, json.dumps(state.materials_json()).encode(),
                           "application/json")
            elif url.path == "/options":
                from rtxpt_tpu.config import PRESETS
                body = json.dumps({
                    "views": ["beauty", "albedo", "normal", "depth",
                              "emission"],
                    "presets": sorted(PRESETS)}).encode()
                self._send(200, body, "application/json")
            elif url.path == "/probe":
                qs = parse_qs(url.query)
                g = lambda k, d: float(qs.get(k, [d])[0])
                rec = state.probe(g("x", 0), g("y", 0), g("yaw", 0.8),
                                  g("pitch", 0.5), g("dist", 2.5),
                                  int(g("bounces", 4)),
                                  qs.get("preset", [""])[0])
                self._send(200, json.dumps(rec).encode(),
                           "application/json")
            else:
                self._send(404, b"not found")

        def do_POST(self):
            if urlparse(self.path).path == "/material":
                n = int(self.headers.get("Content-Length", 0))
                overrides = json.loads(self.rfile.read(n) or b"{}")
                state.patch_material(overrides)
                self._send(200, b"{}", "application/json")
            else:
                self._send(404, b"not found")

    return Handler


def serve(host_scene, port=8000, width=320, height=240, block=True):
    state = ViewerState(host_scene, width, height)
    srv = ThreadingHTTPServer(("127.0.0.1", port), make_handler(state))
    print(f"[viewer] http://127.0.0.1:{port}/  "
          f"({width}x{height}, drag to orbit)")
    if block:
        srv.serve_forever()
    else:
        threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, state


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--scene", default="cornell")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from rtxpt_tpu.apps.cli import build_scene
    host = build_scene(args.scene, args)
    serve(host, args.port, args.width, args.height)


if __name__ == "__main__":
    main()
