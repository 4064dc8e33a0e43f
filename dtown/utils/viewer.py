"""Live browser viewer — the headless equivalent of the reference's
interactive ``render('human')`` window.

The reference pops a pyglet/OpenGL window and repaints it every step
(reference: simulator.py::render(mode='human'), manual_control.py,
SURVEY.md §3.5).  A TPU host is headless, so the TPU-native equivalent
is a tiny in-process HTTP server that streams the latest frame as
MJPEG: point any browser at ``http://<host>:<port>/`` and the view
repaints live as the simulation advances.  No extra dependencies —
stdlib ``http.server`` + PIL (already used by the GIF writers) for JPEG
encoding.

Endpoints:
  ``/``           HTML page with the live <img> and a caption line
  ``/stream``     multipart/x-mixed-replace MJPEG stream
  ``/frame.jpg``  single JPEG snapshot of the latest frame

Usage::

    v = LiveViewer(port=8600)          # port=0 picks a free port
    v.update(frame, caption="step 12 reward=0.53")   # uint8 [H,W,3]
    ...
    v.close()

``manual_control.py --serve`` and ``scripts/eval_policy.py --serve``
wire this up as the reference's live window.
"""
from __future__ import annotations

import io
import socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>dtown live view</title>
<style>
 body {{ background: #111; color: #ddd; font-family: monospace;
        display: flex; flex-direction: column; align-items: center; }}
 img {{ margin-top: 2em; image-rendering: pixelated; width: {w}px; }}
 #cap {{ margin-top: 1em; }}
</style></head>
<body><img src="/stream" alt="live frame"><div id="cap"></div>
<script>
 setInterval(async () => {{
   const r = await fetch('/caption');
   document.getElementById('cap').textContent = await r.text();
 }}, 500);
</script>
</body></html>
"""


class LiveViewer:
    """Threaded MJPEG server holding the latest simulator frame."""

    def __init__(self, port: int = 0, display_width: int = 512):
        self._lock = threading.Condition()
        self._jpeg: bytes | None = None
        self._caption = ""
        self._seq = 0
        self._closed = False
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # silence per-request stderr spam
                pass

            def do_GET(self):
                if self.path in ("/", "/index.html"):
                    body = _PAGE.format(w=display_width).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/caption":
                    body = viewer._caption.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/frame.jpg":
                    jpeg = viewer._wait_frame(None)
                    if jpeg is None:
                        self.send_response(404)
                        self.end_headers()
                        return
                    self.send_response(200)
                    self.send_header("Content-Type", "image/jpeg")
                    self.send_header("Content-Length", str(len(jpeg)))
                    self.end_headers()
                    self.wfile.write(jpeg)
                elif self.path == "/stream":
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=frame",
                    )
                    self.end_headers()
                    seq = -1
                    try:
                        while not viewer._closed:
                            jpeg, seq = viewer._wait_next(seq)
                            if jpeg is None:
                                break
                            self.wfile.write(b"--frame\r\n")
                            self.wfile.write(
                                b"Content-Type: image/jpeg\r\n")
                            self.wfile.write(
                                b"Content-Length: %d\r\n\r\n" % len(jpeg))
                            self.wfile.write(jpeg)
                            self.wfile.write(b"\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        pass  # browser tab closed
                else:
                    self.send_response(404)
                    self.end_headers()

        self._server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
        self._server.daemon_threads = True
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True)
        self._thread.start()

    @property
    def url(self) -> str:
        return f"http://{socket.gethostname()}:{self.port}/"

    def update(self, frame, caption: str = ""):
        """Publish a new frame (uint8 [H,W,3] or [H,W] grayscale)."""
        from PIL import Image

        arr = np.asarray(frame)
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0, 255).astype(np.uint8)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=85)
        with self._lock:
            self._jpeg = buf.getvalue()
            self._caption = caption
            self._seq += 1
            self._lock.notify_all()

    def _wait_frame(self, timeout):
        with self._lock:
            return self._jpeg

    def _wait_next(self, last_seq, timeout: float = 5.0):
        """Block until a frame newer than last_seq exists (or timeout,
        which re-sends the current frame to keep the stream alive)."""
        with self._lock:
            if self._seq == last_seq:
                self._lock.wait(timeout)
            return self._jpeg, self._seq

    def close(self):
        with self._lock:
            self._closed = True
            self._lock.notify_all()
        self._server.shutdown()
        self._server.server_close()
