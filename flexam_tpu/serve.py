"""Minimal host/client generation API.

Behavioral reference: the Gradio controller's host/client protocol
(`FlexAM/ui/controller.py:345-424`): JSON POST with base64-encoded media,
rank-0-only saving. Reimplemented dependency-free on http.server: the
host keeps the model resident and serializes requests; the client posts
JSON and receives a base64 mp4.

  python -m flexam_tpu.serve --host --port 7860 --random_init tiny
  python -m flexam_tpu.serve --client --prompt "..." --port 7860
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np


def _decode_array(obj):
    buf = io.BytesIO(base64.b64decode(obj["data"]))
    arr = np.load(buf)
    return arr["arr"] if hasattr(arr, "files") else arr


def _encode_array(arr) -> dict:
    buf = io.BytesIO()
    np.savez_compressed(buf, arr=np.asarray(arr))
    return {"data": base64.b64encode(buf.getvalue()).decode()}


class GenerationServer:
    def __init__(self, pipeline, fps: int = 16):
        self.pipe = pipeline
        self.fps = fps
        self.lock = threading.Lock()

    def handle(self, payload: dict) -> dict:
        kwargs = {}
        for key in ("video", "mask_video", "control_video", "depth_video",
                    "ref_image"):
            if key in payload:
                kwargs[key] = _decode_array(payload[key]).astype(np.float32)
        if "cos_videos" in payload:
            kwargs["cos_videos"] = [
                _decode_array(o).astype(np.float32)
                for o in payload["cos_videos"]]
        for key in ("num_inference_steps", "guidance_scale", "seed",
                    "density", "scheduler_type", "cfg_skip_ratio",
                    "teacache_thresh", "negative_prompt"):
            if key in payload:
                kwargs[key] = payload[key]
        with self.lock:   # serialize chip access
            out = self.pipe.generate(prompt=payload["prompt"], **kwargs)
        return {"video": _encode_array(out), "fps": self.fps}

    def serve(self, port: int = 7860):
        server_ref = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                try:
                    payload = json.loads(self.rfile.read(n))
                    result = server_ref.handle(payload)
                    body = json.dumps(result).encode()
                    self.send_response(200)
                except Exception as e:  # noqa: BLE001
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, fmt, *args):
                print(f"[serve] {fmt % args}")

        print(f"[serve] listening on :{port}")
        HTTPServer(("0.0.0.0", port), Handler).serve_forever()


def post_generate(payload: dict, port: int = 7860,
                  host: str = "127.0.0.1") -> dict:
    import http.client
    conn = http.client.HTTPConnection(host, port, timeout=3600)
    conn.request("POST", "/generate", json.dumps(payload),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    return json.loads(resp.read())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--host", action="store_true")
    p.add_argument("--client", action="store_true")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--prompt", type=str, default="a video")
    p.add_argument("--random_init", type=str, default="tiny")
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    if args.host:
        from flexam_tpu.demo import _build_models
        import jax
        if args.platform:
            jax.config.update("jax_platforms", args.platform)
        pipe = _build_models(argparse.Namespace(
            checkpoint_path=args.checkpoint_path,
            random_init=args.random_init))
        GenerationServer(pipe).serve(args.port)
    elif args.client:
        t, h, w = 9, 32, 32
        rng = np.random.RandomState(0)
        payload = {
            "prompt": args.prompt,
            "video": _encode_array(rng.rand(1, 3, t, h, w)),
            "mask_video": _encode_array(np.ones((1, 1, t, h, w))),
            "control_video": _encode_array(rng.rand(1, 3, t, h, w)),
            "num_inference_steps": 2,
            "density": 0.1,
        }
        out = post_generate(payload, args.port)
        if "error" in out:
            raise SystemExit(f"server error: {out['error']}")
        video = _decode_array(out["video"])
        print(f"received video {video.shape}")


if __name__ == "__main__":
    main()
