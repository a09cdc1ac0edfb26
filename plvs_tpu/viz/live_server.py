"""Interactive live map viewer over HTTP.

The reference opens a Pangolin OpenGL window with menu controls (follow /
pause / save, reference: src/Viewer.cc:305-393, menu at :371-393 and the
Pause->Save flow at :860). A TPU pod runs headless, so the TPU-native
equivalent serves the same capability to any browser: a stdlib HTTP server
streams JSON snapshots of the sparse map + trajectory + state (drawn on a
<canvas> top-down view with zoom/pan) and accepts the same control verbs
(pause, resume, localization-mode toggle, map save).

Zero dependencies (http.server + a self-contained HTML page), so it runs —
and is tested — in any environment; the richer 3-D stream remains available
through the rerun logger (viz/rerun_logger.py).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!DOCTYPE html>
<html><head><title>plvs_tpu live</title><style>
body{margin:0;background:#111;color:#ddd;font:13px monospace}
#bar{padding:6px}#bar button{margin-right:6px}
canvas{display:block}
</style></head><body>
<div id="bar">
 <button onclick="cmd('pause')">pause</button>
 <button onclick="cmd('resume')">resume</button>
 <button onclick="cmd('save')">save map</button>
 <label><input id="follow" type="checkbox" checked>follow</label>
 <span id="stat"></span>
</div>
<canvas id="c"></canvas>
<script>
const c=document.getElementById('c'),x=c.getContext('2d');
let scale=80,cx=0,cz=0;
function rs(){c.width=innerWidth;c.height=innerHeight-40}rs();onresize=rs;
c.onwheel=e=>{scale*=e.deltaY<0?1.1:0.9;e.preventDefault()};
let drag=null;c.onmousedown=e=>drag=[e.x,e.y];
c.onmousemove=e=>{if(drag){cx-=(e.x-drag[0])/scale;cz+=(e.y-drag[1])/scale;
 document.getElementById('follow').checked=false;drag=[e.x,e.y]}};
c.onmouseup=()=>drag=null;
function W(px,pz){return [(px-cx)*scale+c.width/2,(pz-cz)*-scale+c.height/2]}
async function cmd(v){await fetch('/cmd?op='+v)}
async function tick(){
 try{
  const s=await (await fetch('/state.json')).json();
  document.getElementById('stat').textContent=
   ` state=${s.state} kf=${s.stats.keyframes} pts=${s.stats.points}`+
   ` lines=${s.stats.lines} frames=${s.stats.frames}${s.paused?' [PAUSED]':''}`;
  if(document.getElementById('follow').checked&&s.pose){cx=s.pose[0];cz=s.pose[2]}
  x.fillStyle='#111';x.fillRect(0,0,c.width,c.height);
  x.fillStyle='#555';
  for(const p of s.points){const[a,b]=W(p[0],p[2]);x.fillRect(a,b,2,2)}
  x.strokeStyle='#0af';x.beginPath();
  s.trajectory.forEach((p,i)=>{const[a,b]=W(p[0],p[2]);i?x.lineTo(a,b):x.moveTo(a,b)});
  x.stroke();
  x.fillStyle='#fa0';
  for(const k of s.keyframes){const[a,b]=W(k[0],k[2]);x.fillRect(a-2,b-2,4,4)}
  if(s.pose){x.fillStyle='#0f0';const[a,b]=W(s.pose[0],s.pose[2]);
   x.beginPath();x.arc(a,b,5,0,7);x.fill()}
 }catch(e){}
 setTimeout(tick,500)}
tick();
</script></body></html>"""


class LiveViewer:
    """Serve a live view of a running System; control it from the page.

    The ``pause`` verb gates the caller's feed loop via ``wait_if_paused()``
    (the reference's Viewer pause blocks tracking the same way,
    src/Viewer.cc:391-393).
    """

    def __init__(self, system, port: int = 0, max_points: int = 4000,
                 save_path: str = "live_map.npz"):
        self.system = system
        self.save_path = save_path
        self.max_points = max_points
        self._paused = threading.Event()
        self._saved = threading.Event()
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                url = urlparse(self.path)
                if url.path == "/":
                    body = _PAGE.encode()
                    ctype = "text/html"
                elif url.path == "/state.json":
                    body = json.dumps(viewer.state()).encode()
                    ctype = "application/json"
                elif url.path == "/cmd":
                    op = parse_qs(url.query).get("op", [""])[0]
                    viewer.command(op)
                    body = b"ok"
                    ctype = "text/plain"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()

    # -- state snapshot -----------------------------------------------------
    def state(self) -> dict:
        sysm = self.system
        st = sysm.store
        with st.lock:
            pts_sel = np.nonzero(st.pt_mask)[0]
            if len(pts_sel) > self.max_points:
                stride = len(pts_sel) // self.max_points + 1
                pts_sel = pts_sel[::stride]
            pts = st.pt_xyz[pts_sel]
            kfs = np.nonzero(st.kf_mask)[0]
            kf_C = np.einsum("kij,kj->ki", st.kf_R[kfs].transpose(0, 2, 1),
                             -st.kf_t[kfs]) if len(kfs) else np.zeros((0, 3))
        traj = [
            (-R.T @ t).tolist() for _, R, t in sysm.trajectory[-2000:]
        ]
        pose = traj[-1] if traj else None
        return {
            "state": int(sysm.tracker.state),
            "stats": sysm.map_statistics(),
            "points": np.round(pts, 3).tolist(),
            "keyframes": np.round(kf_C, 3).tolist(),
            "trajectory": traj,
            "pose": pose,
            "paused": self._paused.is_set(),
        }

    # -- control ------------------------------------------------------------
    def command(self, op: str):
        if op == "pause":
            self._paused.set()
        elif op == "resume":
            self._paused.clear()
        elif op == "save":
            try:
                from ..io import serialization

                serialization.save_atlas(self.save_path, self.system.store)
                self._saved.set()
            except Exception:
                pass
        elif op == "localization":
            self.system.activate_localization_mode()
        elif op == "mapping":
            self.system.deactivate_localization_mode()

    def wait_if_paused(self, timeout: float | None = None):
        """Call from the frame-feed loop; blocks while paused."""
        if self._paused.is_set():
            t0 = None
            import time

            t0 = time.time()
            while self._paused.is_set():
                if timeout is not None and time.time() - t0 > timeout:
                    break
                time.sleep(0.05)

    def close(self):
        self._httpd.shutdown()
        self._httpd.server_close()
