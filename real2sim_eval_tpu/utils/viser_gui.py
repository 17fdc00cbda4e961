"""Live in-browser viewer for online rendering.

Replaces the reference's viser-based web GUI (sim/utils/gs/viser_gui.py:40-169)
with a dependency-free MJPEG streamer on the Python stdlib: the renderer
pushes frames via ``set_output``; any browser pointed at the port sees the
stream. (viser is not available in this environment; an MJPEG endpoint keeps
the same "alternate render sink" role, reference gs_renderer.py:1018-1048.)
"""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = b"""<html><head><title>real2sim-eval-tpu live</title></head>
<body style="margin:0;background:#111;color:#eee;font-family:monospace">
<div style="padding:8px">real2sim_eval_tpu live view &mdash; <span id="fps"></span></div>
<img src="/stream" style="width:100%"/>
</body></html>"""


class ViserViewer:
    """API-compatible stand-in for the reference's ViserViewer."""

    def __init__(self, device=None, port: int = 6789, w: int = 848, h: int = 480):
        self.port = int(port)
        self._frame: np.ndarray | None = None
        self._frame_lock = threading.Lock()
        self._fps = 0.0
        self._w, self._h = w, h
        self._metadata: dict = {}
        self._server = None
        self._start_server()

    # -- reference API --------------------------------------------------

    def get_metadata(self) -> dict:
        return self._metadata

    def set_metadata(self, w, h, k, w2c) -> None:
        self._metadata = {"w": w, "h": h, "k": k, "w2c": w2c}

    def set_output(self, output: dict) -> None:
        img = np.asarray(output["image"])
        with self._frame_lock:
            self._frame = img

    def set_fps(self, fps: float) -> None:
        self._fps = float(fps)

    def update(self) -> None:
        pass  # frames are pulled by connected clients

    # -- server ---------------------------------------------------------

    def _start_server(self):
        viewer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def do_GET(self):
                if self.path == "/":
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(_PAGE)
                    return
                if self.path != "/stream":
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=frame")
                self.end_headers()
                try:
                    while True:
                        with viewer._frame_lock:
                            frame = viewer._frame
                        if frame is not None:
                            jpg = _encode_jpeg(frame)
                            self.wfile.write(b"--frame\r\n")
                            self.wfile.write(b"Content-Type: image/jpeg\r\n\r\n")
                            self.wfile.write(jpg)
                            self.wfile.write(b"\r\n")
                        time.sleep(1.0 / 30.0)
                except (BrokenPipeError, ConnectionResetError):
                    return

        try:
            self._server = ThreadingHTTPServer(("0.0.0.0", self.port), Handler)
        except OSError:
            self._server = ThreadingHTTPServer(("0.0.0.0", 0), Handler)
        self.port = self._server.server_port
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()

    def close(self):
        if self._server is not None:
            self._server.shutdown()


def _encode_jpeg(img: np.ndarray) -> bytes:
    try:
        import cv2

        ok, buf = cv2.imencode(".jpg", img[:, :, ::-1])
        if ok:
            return buf.tobytes()
    except ImportError:
        pass
    from io import BytesIO

    from PIL import Image

    bio = BytesIO()
    Image.fromarray(img).save(bio, format="JPEG")
    return bio.getvalue()
