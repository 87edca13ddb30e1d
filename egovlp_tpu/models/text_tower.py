"""DistilBERT text tower (Flax).

TPU-native re-implementation of the `distilbert-base-uncased` encoder the
reference loads from HuggingFace (/root/reference/model/model.py:31-36).
Architecture: 6 post-LN transformer blocks, dim 768, 12 heads, FFN 3072,
learned positional embeddings, exact (erf) GELU, LayerNorm eps 1e-12.

The EgoVLP text path uses ``last_hidden_state[:, 0]`` (the [CLS] token,
model.py:122) — ``__call__`` returns the full hidden states so both the
CLS pooling and the token-level features needed by NLQ extraction
(run/test_nlq.py:103-106) are available.

Weights are converted from the HF torch checkpoint by
`egovlp_tpu.models.convert.convert_distilbert`.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from egovlp_tpu.kernels.fused_ln import FusedLayerNorm

NEG_INF = float(jnp.finfo(jnp.float32).min)


@dataclasses.dataclass(frozen=True)
class TextTowerConfig:
    vocab_size: int = 30522
    dim: int = 768
    n_layers: int = 6
    n_heads: int = 12
    hidden_dim: int = 3072
    max_position_embeddings: int = 512
    dropout: float = 0.0
    ln_eps: float = 1e-12


class SelfAttention(nn.Module):
    cfg: TextTowerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask, *, deterministic: bool = True):
        cfg = self.cfg
        B, S, D = x.shape
        H = cfg.n_heads
        hd = D // H

        def dense(name):
            return nn.Dense(D, dtype=self.dtype, name=name)

        def heads(t):
            return t.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

        q = heads(dense("q_lin")(x)) * (hd ** -0.5)
        k = heads(dense("k_lin")(x))
        v = heads(dense("v_lin")(x))

        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        mask = attention_mask[:, None, None, :].astype(jnp.bool_)
        scores = jnp.where(mask, scores, NEG_INF)
        probs = nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.dropout)(probs, deterministic=deterministic)

        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        return dense("out_lin")(out)


class TransformerBlock(nn.Module):
    cfg: TextTowerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask, *, deterministic: bool = True):
        cfg = self.cfg
        sa = SelfAttention(cfg, dtype=self.dtype, name="attention")(
            x, attention_mask, deterministic=deterministic
        )
        x = FusedLayerNorm(epsilon=cfg.ln_eps, dtype=self.dtype,
                           name="sa_layer_norm")(sa + x)
        h = nn.Dense(cfg.hidden_dim, dtype=self.dtype, name="ffn_lin1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.dim, dtype=self.dtype, name="ffn_lin2")(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        return FusedLayerNorm(
            epsilon=cfg.ln_eps, dtype=self.dtype, name="output_layer_norm"
        )(h + x)


class DistilBert(nn.Module):
    cfg: TextTowerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask, *, deterministic: bool = True):
        """Returns last hidden states [B, S, D]."""
        cfg = self.cfg
        B, S = input_ids.shape

        tok = nn.Embed(
            cfg.vocab_size, cfg.dim, dtype=self.dtype, name="word_embeddings"
        )(input_ids)
        pos_ids = jnp.arange(S)[None, :]
        pos = nn.Embed(
            cfg.max_position_embeddings,
            cfg.dim,
            dtype=self.dtype,
            name="position_embeddings",
        )(pos_ids)
        x = FusedLayerNorm(
            epsilon=cfg.ln_eps, dtype=self.dtype, name="embeddings_layer_norm"
        )(tok + pos)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        for i in range(cfg.n_layers):
            x = TransformerBlock(cfg, dtype=self.dtype, name=f"layer{i:02d}")(
                x, attention_mask, deterministic=deterministic
            )
        return x
