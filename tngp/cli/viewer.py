"""Interactive web viewer — the TPU-side replacement for the DearPyGui GUI.

Behavioral reference: torch-ngp `nerf/gui.py` (NeRFGUI:55-435, OrbitCamera:
10-52): orbit camera, optional "train N steps per frame", dynamic resolution
scaling to hold frame time, depth/rgb modes.  A desktop GUI makes no sense next
to a TPU pod; instead a tiny HTTP server renders frames on request and a
self-contained HTML page does the orbit control + streaming.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>tngp viewer</title><style>
body { margin:0; background:#111; color:#eee; font-family:monospace; }
#hud { position:fixed; top:8px; left:8px; }
img { width:100vw; height:100vh; object-fit:contain; }
</style></head><body>
<div id="hud">drag: orbit / wheel: zoom / t: toggle training / d: depth</div>
<img id="view">
<script>
let theta=1.2, phi=0.6, radius=2.5, mode='rgb', training=false, busy=false;
const img = document.getElementById('view');
async function frame() {
  if (busy) return; busy = true;
  const r = await fetch('/render', {method:'POST', body: JSON.stringify(
    {theta, phi, radius, mode, train: training})});
  const blob = await r.blob();
  img.src = URL.createObjectURL(blob);
  busy = false;
}
let drag=false, lx=0, ly=0;
window.addEventListener('mousedown', e=>{drag=true; lx=e.x; ly=e.y;});
window.addEventListener('mouseup', ()=>drag=false);
window.addEventListener('mousemove', e=>{
  if(!drag) return;
  theta += (e.x-lx)*0.005; phi += (e.y-ly)*0.005;
  phi = Math.min(Math.max(phi, 0.05), Math.PI-0.05);
  lx=e.x; ly=e.y; frame();
});
window.addEventListener('wheel', e=>{radius *= (1 + e.deltaY*0.001); frame();});
window.addEventListener('keydown', e=>{
  if (e.key==='t') training=!training;
  if (e.key==='d') mode = (mode==='rgb') ? 'depth' : 'rgb';
});
setInterval(frame, 200); frame();
</script></body></html>"""


def _orbit_pose(theta: float, phi: float, radius: float) -> np.ndarray:
    c = radius * np.array(
        [np.sin(phi) * np.sin(theta), np.cos(phi), np.sin(phi) * np.cos(theta)]
    )
    forward = -c / np.linalg.norm(c)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(forward, up)
    right /= np.linalg.norm(right) + 1e-9
    up2 = np.cross(right, forward)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.stack([right, up2, forward], axis=-1)
    pose[:3, 3] = c
    return pose


def run_viewer(trainer, port: int = 7860, train_steps_per_frame: int = 16):
    """Serve the orbit viewer for a (partially trained) Trainer."""
    import cv2

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(_PAGE.encode())

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            with lock:
                if req.get("train"):
                    trainer.train_one_epoch(train_steps_per_frame)
                pose = _orbit_pose(
                    req.get("theta", 1.2), req.get("phi", 0.6), req.get("radius", 2.5)
                )
                img, dep = trainer.render_image(pose, use_ema=False)
            if req.get("mode") == "depth":
                d = (dep - dep.min()) / max(dep.max() - dep.min(), 1e-6)
                frame = (np.stack([d] * 3, -1) * 255).astype(np.uint8)
            else:
                frame = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            ok, buf = cv2.imencode(".jpg", frame[..., ::-1])
            self.send_response(200)
            self.send_header("Content-Type", "image/jpeg")
            self.end_headers()
            self.wfile.write(buf.tobytes())

    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"[viewer] http://localhost:{port} (ctrl-c to stop)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
