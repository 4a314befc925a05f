"""Minimal HTTP viewer — the headless stand-in for nerfstudio's websocket
viewer (the reference trains with ``vis="viewer"``, reference train.py:100).

Two modes:

- **standalone** (``nkt-train <method> --serve 7007 --trainer.load-dir ...``):
  renders eval cameras and free orbit cameras on demand from a checkpoint;
- **during training** (``--viewer-port N``): a daemon thread renders LIVE
  from the current training params (``trainer.params``/``trainer.step`` are
  immutable snapshots, so a render between dispatches sees the latest
  completed step; the device queue serializes render vs train work, and a
  lock keeps at most one render in flight).

The HTML page is a continuous free-camera navigator: pointer drag orbits
(theta, phi), wheel zooms radius, and with "live re-render" checked the
current pose re-renders whenever training advances — the reference's
vis='viewer' interaction model (nerfstudio websocket viewer,
reference train.py:100).

Transport is a real RFC-6455 WebSocket when the browser supports it
(GET /ws): the server PUSHES a status JSON text frame whenever the
training step advances, the client sends {"type": "pose", theta, phi,
radius, size} messages, and rendered frames come back as binary PNG
frames — no polling. Plain-HTTP endpoints remain as the fallback (and
as a scriptable API):

  GET /            HTML page (drag-to-orbit live view + camera controls)
  GET /ws          WebSocket upgrade (status push + pose->PNG frames)
  GET /status      JSON {step, num_eval_images, mode, last_metrics}
  GET /render?cam=0&kind=rgb|depth        eval-camera render
  GET /orbit?theta=0&phi=0.3&radius=1.6&size=128   free-orbit render
  GET /latest?kind=rgb|depth              newest eval dump
"""

from __future__ import annotations

import base64
import hashlib
import io
import json
import os
import socket
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import numpy as np

# ------------------------------------------------------------- websocket
# Minimal RFC-6455 server-side framing (stdlib only; no external deps).

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def ws_accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def ws_send_frame(sock, payload: bytes, opcode: int) -> None:
    """One unfragmented, unmasked server->client frame (FIN set).

    Sends under its own generous timeout: the caller keeps a short recv
    timeout for idle polling, but a large PNG frame to a slow client can
    legitimately block sendall for seconds — inheriting the 0.5 s poll
    timeout would raise mid-send and kill the session."""
    head = bytes([0x80 | opcode])
    n = len(payload)
    if n < 126:
        head += bytes([n])
    elif n < 1 << 16:
        head += bytes([126]) + struct.pack(">H", n)
    else:
        head += bytes([127]) + struct.pack(">Q", n)
    prev = sock.gettimeout()
    sock.settimeout(30.0)
    try:
        sock.sendall(head + payload)
    finally:
        try:
            sock.settimeout(prev)
        except OSError:
            pass


class _BufferedSocket:
    """Socket facade serving bytes the HTTP handler's BufferedReader had
    already consumed (a client may pipeline its first WS frame with the
    upgrade request in one TCP segment) before reading the real socket."""

    def __init__(self, sock, initial: bytes = b""):
        self._sock = sock
        self._initial = initial

    def recv(self, n: int) -> bytes:
        if self._initial:
            out, self._initial = self._initial[:n], self._initial[n:]
            return out
        return self._sock.recv(n)

    def sendall(self, data) -> None:
        return self._sock.sendall(data)

    def settimeout(self, t) -> None:
        return self._sock.settimeout(t)

    def gettimeout(self):
        return self._sock.gettimeout()


def _read_exact(sock, n: int):
    """Read exactly n bytes. Raises TimeoutError only when NO bytes have
    arrived yet (idle between frames); once a frame has started, retries
    through timeouts (bounded) so a short socket timeout cannot corrupt
    frame sync mid-read. Returns None on EOF / dead peer."""
    buf = b""
    stalls = 0
    while len(buf) < n:
        try:
            chunk = sock.recv(n - len(buf))
        except (socket.timeout, TimeoutError):
            if not buf:
                raise
            stalls += 1
            if stalls > 240:  # ~2 min mid-frame silence: peer is gone
                return None
            continue
        if not chunk:
            return None
        buf += chunk
        stalls = 0
    return buf


# Largest client->server frame we accept. Inbound traffic is small JSON
# pose/status messages; anything bigger is a hostile or desynced peer and
# must fail the session instead of buffering gigabytes in _read_exact.
WS_MAX_FRAME = 1 << 20


def ws_recv_frame(sock):
    """Receive one frame -> (opcode, payload, fin). None on EOF / oversized
    frame; propagates TimeoutError when the connection is idle (no frame
    started)."""
    hdr = _read_exact(sock, 2)
    if hdr is None:
        return None
    fin = bool(hdr[0] & 0x80)
    opcode = hdr[0] & 0x0F
    masked = bool(hdr[1] & 0x80)
    n = hdr[1] & 0x7F
    if n == 126:
        ext = _read_exact(sock, 2)
        if ext is None:
            return None
        n = struct.unpack(">H", ext)[0]
    elif n == 127:
        ext = _read_exact(sock, 8)
        if ext is None:
            return None
        n = struct.unpack(">Q", ext)[0]
    if n > WS_MAX_FRAME:
        return None
    mask = b"\x00" * 4
    if masked:  # client->server frames are always masked (RFC 6455 §5.1)
        mask = _read_exact(sock, 4)
        if mask is None:
            return None
    payload = _read_exact(sock, n) if n else b""
    if payload is None:
        return None
    if masked and n:
        payload = bytes(c ^ mask[i & 3] for i, c in enumerate(payload))
    return opcode, payload, fin

_PAGE = """<!doctype html><html><head><title>nerf-kbs-tpu viewer</title></head>
<body style="font-family:monospace;background:#111;color:#ddd">
<h3>nerf-kbs-tpu viewer</h3>
<div id="status" style="white-space:pre-wrap;font-size:11px"></div>
<div style="margin:6px 0">
 cam <input id="cam" type="number" value="0" min="0" style="width:4em">
 kind <select id="kind"><option>rgb</option><option>depth</option></select>
 <button onclick="renderCam()">eval cam</button>
 &nbsp;|&nbsp; size <select id="size"><option>128</option><option selected>192</option><option>256</option><option>384</option></select>
 <label><input id="live" type="checkbox" checked> live re-render</label>
 <span id="pose" style="color:#8c8"></span>
</div>
<p><img id="im" draggable="false"
   style="max-width:95%;image-rendering:pixelated;cursor:grab;touch-action:none;user-select:none"></p>
<div style="color:#888">drag = orbit &middot; wheel = zoom &middot; live re-renders as training advances</div>
<script>
// Continuous free-camera navigation: drag updates (theta, phi), wheel
// updates radius; at most one render request in flight, latest wins.
// Transport: WebSocket (server pushes status on step advance; pose
// messages out, binary PNG frames back) with plain-HTTP fallback.
let th=0, ph=0.35, r=1.6, inflight=false, inflightSince=0, dirty=true, lastStep=-1;
let ws=null, wsOpen=false;
const im=document.getElementById('im');
function poseStr(){return 'th='+th.toFixed(2)+' ph='+ph.toFixed(2)+' r='+r.toFixed(2);}
function showFrame(blob){
  const prev=im.src;
  im.src=URL.createObjectURL(blob);
  if(prev.startsWith('blob:')){URL.revokeObjectURL(prev);}
  document.getElementById('pose').textContent=poseStr();
}
function onStatus(s){
  document.getElementById('status').textContent=JSON.stringify(s);
  if(document.getElementById('live').checked && s.step!==undefined && s.step!==lastStep){
    lastStep=s.step; dirty=true;
  }
}
function connectWS(){
  if(!window.WebSocket){return;}
  try{ws=new WebSocket('ws://'+location.host+'/ws');}catch(e){return;}
  ws.binaryType='blob';
  ws.onopen=()=>{wsOpen=true;};
  ws.onclose=ws.onerror=()=>{wsOpen=false; ws=null; inflight=false;};
  ws.onmessage=(ev)=>{
    if(typeof ev.data==='string'){onStatus(JSON.parse(ev.data));}
    else{showFrame(ev.data); inflight=false;}
  };
}
connectWS();
async function pump(){
  // watchdog: a pose frame the server never answers (dropped message,
  // half-dead socket) must not freeze live rendering forever
  if(inflight && Date.now()-inflightSince>6000){inflight=false; dirty=true;}
  if(inflight||!dirty){return;}
  inflight=true; inflightSince=Date.now(); dirty=false;
  const size=document.getElementById('size').value;
  if(wsOpen){
    ws.send(JSON.stringify({type:'pose',theta:th,phi:ph,radius:r,size:+size}));
    return; // the binary reply clears inflight
  }
  const url='/orbit?theta='+th+'&phi='+ph+'&radius='+r+'&size='+size+'&t='+Date.now();
  try{ showFrame(await (await fetch(url)).blob()); }catch(e){}
  inflight=false;
}
setInterval(pump, 120);
let drag=null;
im.addEventListener('pointerdown', e=>{drag=[e.clientX,e.clientY]; im.setPointerCapture(e.pointerId);});
im.addEventListener('pointermove', e=>{
  if(!drag) return;
  th-=(e.clientX-drag[0])*0.01;
  ph=Math.max(-1.4, Math.min(1.4, ph+(e.clientY-drag[1])*0.01));
  drag=[e.clientX,e.clientY]; dirty=true;
});
im.addEventListener('pointerup', ()=>{drag=null;});
im.addEventListener('wheel', e=>{e.preventDefault(); r=Math.max(0.2, r*(e.deltaY>0?1.08:0.93)); dirty=true;});
function renderCam(){
  const c=document.getElementById('cam').value, k=document.getElementById('kind').value;
  im.src='/render?cam='+c+'&kind='+k+'&t='+Date.now();
}
async function refresh(){
  if(wsOpen){return;} // server pushes status over the websocket
  try{ onStatus(await (await fetch('/status')).json()); }catch(e){}
}
refresh(); setInterval(refresh, 2000);
</script></body></html>"""


def _to_png(arr: np.ndarray) -> bytes:
    from PIL import Image

    from nerf_kbs_tpu.utils import colormaps as cm

    buf = io.BytesIO()
    Image.fromarray(cm.to_uint8(arr)).save(buf, format="PNG")
    return buf.getvalue()


class ViewerServer:
    def __init__(self, trainer=None, eval_image_dir: str | None = None,
                 port: int = 7007, host: str | None = None,
                 mode: str = "standalone"):
        if host is None:
            host = os.environ.get("NKT_VIEWER_HOST", "127.0.0.1")
        self.trainer = trainer
        self.mode = mode
        self.eval_image_dir = Path(eval_image_dir) if eval_image_dir else None
        self.port = port
        self.host = host
        self._render_lock = threading.Lock()
        self.last_metrics: dict = {}
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            # HTTP/1.1 is required for the 101 Switching Protocols upgrade
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, body, ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                try:
                    u = urlparse(self.path)
                    q = {k: v[0] for k, v in parse_qs(u.query).items()}
                    if u.path == "/":
                        self._send(200, _PAGE.encode(), "text/html")
                    elif u.path == "/ws":
                        viewer._ws_session(self)
                    elif u.path == "/status":
                        self._send(200, json.dumps(viewer.status()).encode())
                    elif u.path == "/render":
                        png = viewer.render_eval_camera(
                            int(q.get("cam", 0)), q.get("kind", "rgb")
                        )
                        self._send(200, png, "image/png")
                    elif u.path == "/orbit":
                        png = viewer.render_orbit(
                            float(q.get("theta", 0.0)),
                            float(q.get("phi", 0.35)),
                            float(q.get("radius", 1.6)),
                            int(q.get("size", 128)),
                        )
                        self._send(200, png, "image/png")
                    elif u.path == "/latest":
                        png = viewer.latest_dump(q.get("kind", "rgb"))
                        if png is None:
                            self._send(404, b'{"error": "no eval dumps yet"}')
                        else:
                            self._send(200, png, "image/png")
                    else:
                        self._send(404, b'{"error": "not found"}')
                except Exception as e:  # surface errors to the client
                    self._send(500, json.dumps({"error": str(e)}).encode())

        # loopback by default: /render and /orbit occupy the device on
        # demand and serve checkpoint contents — opt into exposure via host=
        self._server = ThreadingHTTPServer((host, port), Handler)
        # port=0 binds an OS-assigned ephemeral port; report the real one
        self.port = self._server.server_address[1]

    # ------------------------------------------------------------- handlers
    def status(self) -> dict:
        out = {"mode": self.mode, "port": self.port}
        if self.trainer is not None:
            out["step"] = self.trainer.step
            out["num_eval_images"] = self.trainer.dm.num_eval_images()
        if self.eval_image_dir is not None and self.eval_image_dir.exists():
            dumps = sorted(self.eval_image_dir.glob("*_rgb.png"))
            out["num_dumps"] = len(dumps)
            if dumps:
                out["latest_dump"] = dumps[-1].name
        metrics_file = (
            self.eval_image_dir.parent / "metrics.jsonl"
            if self.eval_image_dir is not None else None
        )
        if metrics_file is not None and metrics_file.exists():
            try:
                last = metrics_file.read_text().strip().rsplit("\n", 1)[-1]
                out["last_metrics"] = json.loads(last)
            except Exception:
                pass
        return out

    def render_eval_camera(self, cam: int, kind: str) -> bytes:
        if self.trainer is None:
            raise RuntimeError("no trainer attached: rendering unavailable")
        with self._render_lock:
            outputs = self.trainer.render_camera(cam)
        return self._encode(outputs, kind)

    def render_orbit(self, theta: float, phi: float, radius: float, size: int) -> bytes:
        if self.trainer is None:
            raise RuntimeError("no trainer attached: rendering unavailable")
        from nerf_kbs_tpu.data.outputs import DataparserOutputs

        origin = radius * np.array(
            [np.cos(theta) * np.cos(phi), np.sin(theta) * np.cos(phi), np.sin(phi)]
        )
        z = origin / np.linalg.norm(origin)
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x = x / max(np.linalg.norm(x), 1e-9)
        y = np.cross(z, x)
        c2w = np.stack([x, y, z, origin], axis=1)[None].astype(np.float32)
        f = size * 1.1
        cams_np = {
            "fx": np.array([f], np.float32), "fy": np.array([f], np.float32),
            "cx": np.array([size / 2], np.float32), "cy": np.array([size / 2], np.float32),
            "c2w": c2w, "width": np.array([size], np.int32),
            "height": np.array([size], np.int32),
        }
        cameras = DataparserOutputs([], cams_np, np.array([[-1.0] * 3, [1.0] * 3])).cameras()
        with self._render_lock:
            outputs = self.trainer.render_camera(0, cameras=cameras)
        return self._encode(outputs, "rgb")

    def _ws_session(self, handler) -> None:
        """RFC-6455 session: handshake, then serve until close. Pushes a
        status text frame whenever the training step advances; answers
        {"type": "pose"} messages with binary PNG frames and
        {"type": "status"} with an immediate status frame. Runs on the
        per-connection thread ThreadingHTTPServer already gives us."""
        key = handler.headers.get("Sec-WebSocket-Key")
        upgrade = handler.headers.get("Upgrade", "").lower()
        if upgrade != "websocket" or not key:
            handler._send(426, b'{"error": "websocket upgrade required"}')
            return
        handler.send_response(101, "Switching Protocols")
        handler.send_header("Upgrade", "websocket")
        handler.send_header("Connection", "Upgrade")
        handler.send_header("Sec-WebSocket-Accept", ws_accept_key(key))
        handler.end_headers()
        handler.close_connection = True  # the socket is ours now
        raw = handler.connection
        # bytes the handler's BufferedReader consumed past the request head
        # (a scripted client can pipeline its first frame with the upgrade):
        # drain them non-blockingly and serve them before the socket
        pipelined = b""
        try:
            raw.setblocking(False)
            while True:
                chunk = handler.rfile.read1(65536)
                if not chunk:
                    break
                pipelined += chunk
        except (BlockingIOError, OSError, ValueError):
            pass
        finally:
            raw.setblocking(True)
        sock = _BufferedSocket(raw, pipelined)
        # short timeout = the cadence of idle status pushes
        sock.settimeout(0.5)
        last_step = None
        frag_op, frag_buf = None, b""  # fragmented-message reassembly
        try:
            st = self.status()
            last_step = st.get("step")
            ws_send_frame(sock, json.dumps(st).encode(), 0x1)
            while True:
                try:
                    frame = ws_recv_frame(sock)
                except (socket.timeout, TimeoutError):
                    # idle: push status on step advance. Check the cheap
                    # step counter first — building the full status dict
                    # globs the eval dir and reads metrics.jsonl, which is
                    # wasteful at 2 Hz per client
                    step = self.trainer.step if self.trainer is not None else None
                    if step != last_step:
                        st = self.status()
                        last_step = st.get("step")
                        ws_send_frame(sock, json.dumps(st).encode(), 0x1)
                    continue
                if frame is None:
                    return
                opcode, payload, fin = frame
                if opcode == 0x8:  # close: echo and finish
                    try:
                        ws_send_frame(sock, payload[:2], 0x8)
                    except OSError:
                        pass
                    return
                if opcode == 0x9:  # ping -> pong
                    ws_send_frame(sock, payload, 0xA)
                    continue
                if opcode == 0x0:  # continuation of a fragmented message
                    if frag_op is None:
                        continue  # stray continuation: drop
                    frag_buf += payload
                    if not fin:
                        continue
                    opcode, payload = frag_op, frag_buf
                    frag_op, frag_buf = None, b""
                elif not fin:  # first fragment: buffer and keep reading
                    frag_op, frag_buf = opcode, payload
                    continue
                if opcode != 0x1:  # ignore binary/pong
                    continue
                try:
                    msg = json.loads(payload.decode())
                except (UnicodeDecodeError, json.JSONDecodeError):
                    continue
                if msg.get("type") == "pose":
                    png = self.render_orbit(
                        float(msg.get("theta", 0.0)),
                        float(msg.get("phi", 0.35)),
                        float(msg.get("radius", 1.6)),
                        int(msg.get("size", 128)),
                    )
                    ws_send_frame(sock, png, 0x2)
                elif msg.get("type") == "status":
                    st = self.status()
                    last_step = st.get("step")
                    ws_send_frame(sock, json.dumps(st).encode(), 0x1)
        except Exception as e:
            # past the 101 handshake HTTP error reporting is impossible;
            # any failure (render error, dead peer) ends the session
            if not isinstance(e, (OSError, BrokenPipeError)):
                print(f"viewer: websocket session error: {e!r}", flush=True)
            return

    def latest_dump(self, kind: str):
        if self.eval_image_dir is None or not self.eval_image_dir.exists():
            return None
        dumps = sorted(self.eval_image_dir.glob(f"*_{kind}.png"))
        if not dumps:
            return None
        return dumps[-1].read_bytes()

    def _encode(self, outputs: dict, kind: str) -> bytes:
        if kind == "depth":
            from nerf_kbs_tpu.utils import colormaps as cm

            panel = cm.apply_depth_colormap(
                outputs["depth"], outputs.get("accumulation")
            )
            return _to_png(panel)
        return _to_png(outputs["rgb"])

    # ------------------------------------------------------------ lifecycle
    def serve_forever(self):
        print(f"viewer listening on http://{self.host}:{self.port}", flush=True)
        self._server.serve_forever()

    def start_background(self):
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self._server.shutdown()
        self._server.server_close()
