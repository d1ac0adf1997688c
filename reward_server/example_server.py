"""Remote reward server template.

Counterpart of the reference's FastAPI template
(``/root/reference`` ``reward_server/example_server.py``): serves
``POST /compute_reward`` with the JSON wire contract the framework's
``RemoteReward`` client speaks (``flow_factory_tpu/rewards/models.py``):

    request:  {"prompts": [str], "images": [b64 PNG]}       (videos: list of
              b64 PNGs per sample under "videos")
    response: {"rewards": [float]}

Run: ``python reward_server/example_server.py --port 8000``
(FastAPI+uvicorn when available, stdlib http.server otherwise — the wire
format is identical).

Subclass :class:`RewardServer` and override :meth:`compute_reward` with your
scoring model; the template scores mean brightness (matches the framework's
MyReward stub so end-to-end remote tests are deterministic).
"""
from __future__ import annotations

import argparse
import base64
import io
import json
from typing import List, Optional

import numpy as np


class RewardServer:
    def decode_image(self, b64: str) -> np.ndarray:
        from PIL import Image

        img = Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
        return np.asarray(img, np.float32) / 255.0

    def compute_reward(
        self,
        prompts: List[str],
        images: Optional[List[np.ndarray]] = None,
        videos: Optional[List[List[np.ndarray]]] = None,
    ) -> List[float]:
        """Override me. Template: mean brightness."""
        if images is not None:
            return [float(img.mean()) for img in images]
        if videos is not None:
            return [float(np.mean([f.mean() for f in vid])) for vid in videos]
        return [0.0] * len(prompts)

    def handle(self, payload: dict) -> dict:
        prompts = payload["prompts"]
        images = [self.decode_image(b) for b in payload.get("images", [])] or None
        videos = (
            [[self.decode_image(b) for b in vid] for vid in payload.get("videos", [])] or None
        )
        rewards = self.compute_reward(prompts, images=images, videos=videos)
        return {"rewards": [float(r) for r in rewards]}


def serve_fastapi(server: RewardServer, port: int) -> None:
    from fastapi import FastAPI
    import uvicorn

    app = FastAPI()

    @app.get("/health")
    def health():
        return {"status": "ok"}

    @app.post("/compute_reward")
    def compute_reward(payload: dict):
        return server.handle(payload)

    uvicorn.run(app, host="0.0.0.0", port=port)


def serve_stdlib(server: RewardServer, port: int) -> None:
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: dict):
            data = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/compute_reward":
                self._send(404, {"error": "not found"})
                return
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length))
            try:
                self._send(200, server.handle(payload))
            except Exception as e:  # noqa: BLE001 - report scoring errors to client
                self._send(500, {"error": str(e)})

        def log_message(self, *args):
            pass

    ThreadingHTTPServer(("0.0.0.0", port), Handler).serve_forever()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=8000)
    args = parser.parse_args()
    server = RewardServer()
    try:
        serve_fastapi(server, args.port)
    except ImportError:
        print(f"fastapi/uvicorn not installed; stdlib server on :{args.port}")
        serve_stdlib(server, args.port)
