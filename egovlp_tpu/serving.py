"""Batched inference / serving API.

The reference has no serving story (research scripts only); production
deployment needs stable-shape, warm-cache embedding endpoints.  ``Embedder``
wraps a dual encoder with:

  * fixed batch buckets (pad to the bucket, slice the result) so every
    request hits an already-compiled XLA program;
  * text and video paths sharing the eval transform / tokenizer used in
    training (no train/serve skew);
  * optional on-disk video ingestion through the native decoder.

``serve()`` exposes the embedder over a minimal stdlib HTTP JSON API:

    POST /embed_text   {"texts": ["a person chops onions", ...]}
    POST /embed_video  {"paths": ["/data/clip.mp4", ...]}  (server-local)
    POST /similarity   {"texts": [...], "paths": [...]}
    GET  /healthz

Run: ``python -m egovlp_tpu.cli.serve --config ... --checkpoint ... --port 8000``.
"""

from __future__ import annotations

import json
from typing import Sequence

import numpy as np

from egovlp_tpu.data.readers import read_frames
from egovlp_tpu.data.text import WordPieceTokenizer
from egovlp_tpu.models.dual_encoder import sim_matrix


class Embedder:
    def __init__(self, model, params, tokenizer: WordPieceTokenizer,
                 num_frames: int = 4, input_res: int = 224,
                 pre_size: int = 256, buckets: Sequence[int] = (1, 4, 16)):
        self.model = model
        # accept either a raw param tree or a flax variables dict
        self.params = params.get("params", params) if isinstance(params, dict) else params
        self.tokenizer = tokenizer
        self.num_frames = num_frames
        self.input_res = input_res
        self.pre_size = pre_size
        self.buckets = sorted(buckets)

        from egovlp_tpu.train.steps import (
            make_text_embed_step,
            make_video_embed_step,
        )

        self._text_step = make_text_embed_step()
        self._video_step = make_video_embed_step(input_res)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return -(-n // self.buckets[-1]) * self.buckets[-1]

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        n = len(texts)
        b = self._bucket(n)
        padded = list(texts) + [""] * (b - n)
        ids, mask = self.tokenizer(padded)
        out = self._text_step(self.model.apply, self.params, ids, mask)
        return np.asarray(out)[:n]

    def embed_frames(self, frames: np.ndarray) -> np.ndarray:
        """frames: [N, T, pre, pre, 3] or channel-folded uint8."""
        if frames.ndim == 5:
            frames = frames.reshape(*frames.shape[:-2], -1)
        n = frames.shape[0]
        b = self._bucket(n)
        if b != n:
            pad = np.repeat(frames[-1:], b - n, axis=0)
            frames = np.concatenate([frames, pad], axis=0)
        out = self._video_step(self.model.apply, self.params, frames)
        return np.asarray(out)[:n]

    def embed_videos(self, paths: Sequence[str]) -> np.ndarray:
        clips = []
        for p in paths:
            f, _ = read_frames(p, self.num_frames, sample="uniform",
                               pre_size=self.pre_size)
            clips.append(f)
        return self.embed_frames(np.stack(clips))

    def similarity(self, texts: Sequence[str], paths: Sequence[str]
                   ) -> np.ndarray:
        t = self.embed_texts(texts)
        v = self.embed_videos(paths)
        import jax.numpy as jnp

        return np.asarray(sim_matrix(jnp.asarray(t), jnp.asarray(v)))


def serve(embedder: Embedder, host: str = "127.0.0.1", port: int = 8000,
          block: bool = True):
    """Minimal stdlib HTTP JSON server around an Embedder."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/embed_text":
                    out = embedder.embed_texts(req["texts"])
                    self._send(200, {"embeddings": out.tolist()})
                elif self.path == "/embed_video":
                    out = embedder.embed_videos(req["paths"])
                    self._send(200, {"embeddings": out.tolist()})
                elif self.path == "/similarity":
                    out = embedder.similarity(req["texts"], req["paths"])
                    self._send(200, {"similarity": out.tolist()})
                else:
                    self._send(404, {"error": "not found"})
            except Exception as e:  # noqa: BLE001 — report to client
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    if block:
        server.serve_forever()
    return server
