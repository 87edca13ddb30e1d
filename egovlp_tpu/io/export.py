"""Ahead-of-time export of the serving embedder (``jax.export`` / StableHLO).

The reference's deployment story is "load the torch checkpoint inside the
research codebase" — there is no artifact a serving stack could pin.  The
TPU-native equivalent: lower the two embedding functions (text, video) to
versioned StableHLO once per batch bucket, serialize them into a single
zip artifact, and reload them for serving with NO model code, config, or
retracing — the compiled behavior is frozen even as the framework evolves,
and one artifact can carry lowerings for several platforms (cpu + tpu).

Artifact layout (zip):

    manifest.json                 shapes / buckets / versions
    text_b{B}.jaxexp              jax.export bytes, (params, ids, mask) -> [B, P]
    video_b{B}.jaxexp             jax.export bytes, (params, frames) -> [B, P]

Parameters stay an INPUT of the exported functions (the artifact stores
only the program + the param tree structure), so the same artifact serves
any checkpoint with the same architecture; pair it with an Orbax/torch
checkpoint at load time.

Usage:

    manifest = export_embedder(model, params, "embedder.zip")
    emb = ExportedEmbedder("embedder.zip", params, tokenizer)
    emb.embed_texts(["a person chops onions"])

CLI: ``python -m egovlp_tpu.cli.serve --config ... --export-aot out.zip``
exports; ``--aot out.zip`` serves from an artifact.
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Sequence

import numpy as np

MANIFEST = "manifest.json"


def _specs_like(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), tree
    )


def export_embedder(model, params, path: str, *, num_frames: int = 4,
                    input_res: int = 224, pre_size: int = 256,
                    max_length: int = 30, buckets: Sequence[int] = (1, 4, 16),
                    platforms: "Sequence[str] | None" = None) -> dict:
    """Export text/video embedding programs for each batch bucket.

    ``platforms``: e.g. ``("cpu", "tpu")`` for a multi-platform artifact;
    None exports for the default backend only.  Inputs mirror the live
    ``serving.Embedder``: tokenized ids/mask, and channel-folded uint8
    frames ``[B, T, pre, pre*3]`` (the on-device eval transform is part of
    the exported program, so there is no train/serve skew).
    """
    import jax
    from jax import export as jexport

    from egovlp_tpu.data.transforms import eval_resize

    params = params.get("params", params) if isinstance(params, dict) else params
    pspecs = _specs_like(params)

    def text_fn(p, ids, mask):
        return model.apply({"params": p}, ids, mask, method="encode_text",
                           deterministic=True)

    def video_fn(p, frames):
        video = eval_resize(frames, out_size=input_res)
        return model.apply({"params": p}, video, method="encode_video",
                           deterministic=True)

    kw = {"platforms": tuple(platforms)} if platforms else {}
    buckets = sorted(set(int(b) for b in buckets))
    entries = {}
    for b in buckets:
        ids = jax.ShapeDtypeStruct((b, max_length), np.int32)
        mask = jax.ShapeDtypeStruct((b, max_length), np.int32)
        frames = jax.ShapeDtypeStruct(
            (b, num_frames, pre_size, pre_size * 3), np.uint8)
        entries[f"text_b{b}.jaxexp"] = jexport.export(
            jax.jit(text_fn), **kw)(pspecs, ids, mask).serialize()
        entries[f"video_b{b}.jaxexp"] = jexport.export(
            jax.jit(video_fn), **kw)(pspecs, frames).serialize()

    manifest = {
        "format": "egovlp_tpu.embedder/1",
        "buckets": buckets,
        "num_frames": num_frames,
        "input_res": input_res,
        "pre_size": pre_size,
        "max_length": max_length,
        "platforms": list(platforms) if platforms else None,
        "jax_version": jax.__version__,
        "n_params": int(sum(np.prod(s.shape) for s in
                            jax.tree_util.tree_leaves(pspecs))),
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(MANIFEST, json.dumps(manifest, indent=1))
        for name, data in entries.items():
            zf.writestr(name, data)
    return manifest


class ExportedEmbedder:
    """serving.Embedder lookalike running the AOT artifact.

    Same bucketing / padding / slicing contract as the live Embedder —
    ``embed_texts``/``embed_frames``/``embed_videos``/``similarity`` return
    identical values (tested), but every call executes a frozen StableHLO
    program via ``jax.export.deserialize(...).call``.
    """

    def __init__(self, path: str, params, tokenizer=None):
        from jax import export as jexport

        with zipfile.ZipFile(path) as zf:
            self.manifest = json.loads(zf.read(MANIFEST))
            self._text = {}
            self._video = {}
            for b in self.manifest["buckets"]:
                self._text[b] = jexport.deserialize(
                    bytearray(zf.read(f"text_b{b}.jaxexp")))
                self._video[b] = jexport.deserialize(
                    bytearray(zf.read(f"video_b{b}.jaxexp")))
        self.params = (params.get("params", params)
                       if isinstance(params, dict) else params)
        self.tokenizer = tokenizer
        self.buckets = sorted(self.manifest["buckets"])
        self.num_frames = self.manifest["num_frames"]
        self.pre_size = self.manifest["pre_size"]

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(
            f"batch {n} exceeds the largest exported bucket {self.buckets[-1]}"
        )

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        if self.tokenizer is None:
            raise ValueError("ExportedEmbedder needs a tokenizer for texts")
        n = len(texts)
        b = self._bucket(n)
        ids, mask = self.tokenizer(list(texts) + [""] * (b - n))
        L = self.manifest["max_length"]
        if ids.shape[1] != L:
            raise ValueError(f"tokenizer length {ids.shape[1]} != exported {L}")
        out = self._text[b].call(self.params, np.asarray(ids, np.int32),
                                 np.asarray(mask, np.int32))
        return np.asarray(out)[:n]

    def embed_frames(self, frames: np.ndarray) -> np.ndarray:
        if frames.ndim == 5:  # [N, T, H, W, 3] -> channel-folded
            frames = frames.reshape(*frames.shape[:-2], -1)
        n = frames.shape[0]
        b = self._bucket(n)
        if b != n:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], b - n, axis=0)], axis=0)
        out = self._video[b].call(self.params, np.asarray(frames, np.uint8))
        return np.asarray(out)[:n]

    def embed_videos(self, paths: Sequence[str]) -> np.ndarray:
        from egovlp_tpu.data.readers import read_frames

        clips = [read_frames(p, self.num_frames, sample="uniform",
                             pre_size=self.pre_size)[0] for p in paths]
        return self.embed_frames(np.stack(clips))

    def similarity(self, texts: Sequence[str], paths: Sequence[str]
                   ) -> np.ndarray:
        import jax.numpy as jnp

        from egovlp_tpu.models.dual_encoder import sim_matrix

        t, v = self.embed_texts(texts), self.embed_videos(paths)
        return np.asarray(sim_matrix(jnp.asarray(t), jnp.asarray(v)))
