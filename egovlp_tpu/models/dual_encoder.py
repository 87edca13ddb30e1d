"""Dual encoder: SpaceTimeTransformer video tower + DistilBERT text tower.

Behavioral reference: `FrozenInTime` (/root/reference/model/model.py:14-143).

  * text feature  = DistilBERT last_hidden[:, 0]  -> txt_proj (ReLU+Linear)
  * video feature = SpaceTimeTransformer CLS      -> vid_proj (Linear)
  * ``projection='minimal'`` gives the 256-dim joint space; ``projection=''``
    means identity heads (model.py:72-86).
  * ``projection_dim`` doubles as the task head width: 256 for retrieval,
    2 for OSCC and 16 for PNR (configs/ft/{oscc,pnr}.json).

`sim_matrix` reproduces model.py:189-197 (cosine similarity with eps-clamped
norms).
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp

from egovlp_tpu.models.text_tower import DistilBert, TextTowerConfig
from egovlp_tpu.models.video_tower import SpaceTimeTransformer, VideoTowerConfig


@dataclasses.dataclass(frozen=True)
class DualEncoderConfig:
    video: VideoTowerConfig = VideoTowerConfig()
    text: TextTowerConfig = TextTowerConfig()
    projection_dim: int = 256
    projection: str = "minimal"  # 'minimal' | ''


class DualEncoder(nn.Module):
    cfg: DualEncoderConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.video_model = SpaceTimeTransformer(
            self.cfg.video, dtype=self.dtype, name="video_model"
        )
        self.text_model = DistilBert(
            self.cfg.text, dtype=self.dtype, name="text_model"
        )
        if self.cfg.projection == "minimal":
            self.txt_proj = nn.Dense(
                self.cfg.projection_dim, dtype=self.dtype, name="txt_proj"
            )
            self.vid_proj = nn.Dense(
                self.cfg.projection_dim, dtype=self.dtype, name="vid_proj"
            )
        elif self.cfg.projection == "":
            self.txt_proj = None
            self.vid_proj = None
        else:
            raise NotImplementedError(self.cfg.projection)

    def encode_video(self, video, *, deterministic: bool = True):
        """video: [B, T, H, W, 3] -> [B, projection_dim] (float32)."""
        feat = self.video_model(video, deterministic=deterministic)
        if self.vid_proj is not None:
            feat = self.vid_proj(feat)
        return feat.astype(jnp.float32)

    def encode_text(self, input_ids, attention_mask, *, deterministic: bool = True):
        """-> [B, projection_dim] CLS-pooled projected text embedding."""
        hidden = self.text_model(
            input_ids, attention_mask, deterministic=deterministic
        )
        feat = hidden[:, 0]
        feat = self._project_text(feat)
        return feat.astype(jnp.float32)

    def encode_text_tokens(self, input_ids, attention_mask,
                           *, deterministic: bool = True):
        """Token-level projected embeddings [B, S, D'] (NLQ extraction,
        reference run/test_nlq.py:103-106 / model.py:128-138)."""
        hidden = self.text_model(
            input_ids, attention_mask, deterministic=deterministic
        )
        return self._project_text(hidden).astype(jnp.float32)

    def _project_text(self, feat):
        if self.txt_proj is None:
            return feat
        # reference txt_proj = Sequential(ReLU, Linear) — ReLU first
        # (model.py:73-75).
        return self.txt_proj(nn.relu(feat))

    def __call__(self, video, input_ids, attention_mask,
                 *, deterministic: bool = True):
        """Returns (text_embeddings, video_embeddings)."""
        t = self.encode_text(input_ids, attention_mask, deterministic=deterministic)
        v = self.encode_video(video, deterministic=deterministic)
        return t, v


def sim_matrix(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Cosine-similarity matrix with eps-clamped norms (model.py:189-197)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a_n = jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), eps)
    b_n = jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), eps)
    return (a / a_n) @ (b / b_n).T
