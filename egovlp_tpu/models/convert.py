"""Torch checkpoint -> Flax parameter conversion.

Covers the three weight sources the reference consumes:

  1. timm ViT-B/16 ImageNet-21k (`jx_vit_base_p16_224-80ecf9dd.pth`) used to
     initialize the video tower (/root/reference/model/model.py:38-64); the
     ViT dict lacks `timeattn` / `norm3` / `temporal_embed`, which keep
     their fresh init — the reference loads with strict=False the same way.
  2. HuggingFace `distilbert-base-uncased` for the text tower
     (model.py:31-36).
  3. Full EgoVLP checkpoints (`{state_dict: ...}` pickles, saved by
     base/base_trainer.py:399-422) including the `module.` DataParallel
     prefix normalization (utils/util.py:25-51) and the temporal
     positional-embedding inflation rules (model.py:145-176).

All converters take/return plain numpy; torch is only needed by
`load_torch_weights` to unpickle `.pth` files.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from egovlp_tpu.models.dual_encoder import DualEncoderConfig
from egovlp_tpu.models.video_tower import VideoTowerConfig

Array = np.ndarray
StateDict = Dict[str, Array]


# --------------------------------------------------------------------------
# generic helpers
# --------------------------------------------------------------------------

def load_torch_weights(path: str) -> StateDict:
    """Load a torch pickle into {name: float32 numpy}. Handles both raw
    state dicts (timm ViT file) and trainer checkpoints with a
    ``state_dict`` field."""
    import torch  # local import: torch is host-side tooling only

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: np.asarray(v.float().numpy()) for k, v in obj.items()
            if hasattr(v, "numpy")}


def strip_data_parallel_prefix(sd: Mapping[str, Array]) -> StateDict:
    """`module.`-prefix normalization (reference utils/util.py:25-51)."""
    if not sd:
        return dict(sd)
    if all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return dict(sd)


def inflate_temporal_embed(embed: Array, target_frames: int,
                           mode: str = "zeros") -> Array:
    """Temporal positional-embedding inflation (model.py:145-176).

    embed: [1, F, D].  More frames than target -> truncate; fewer ->
    zero-pad, nearest, or linear interpolation (torch ``interp``/
    ``bilinear`` with align_corners=True degenerates to 1-D along frames
    because the embedding width is unchanged).
    """
    _, f, d = embed.shape
    if f == target_frames:
        return embed
    if f > target_frames:
        return embed[:, :target_frames]
    if mode == "zeros":
        out = np.zeros((1, target_frames, d), embed.dtype)
        out[:, :f] = embed
        return out
    if mode in ("interp", "bilinear", "nearest"):
        if mode == "nearest":
            # torch F.interpolate nearest: src = floor(i * F / F')
            idx = np.floor(np.arange(target_frames) * f / target_frames)
            return embed[:, idx.astype(int)]
        # bilinear + align_corners=True: src = i * (F-1) / (F'-1)
        src = np.arange(target_frames) * (f - 1) / (target_frames - 1)
        lo = np.floor(src).astype(int)
        hi = np.minimum(lo + 1, f - 1)
        w = (src - lo)[None, :, None]
        return embed[:, lo] * (1 - w) + embed[:, hi] * w
    raise NotImplementedError(mode)


def _linear(sd: Mapping[str, Array], name: str) -> Dict[str, Array]:
    out = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _layernorm(sd: Mapping[str, Array], name: str) -> Dict[str, Array]:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


# --------------------------------------------------------------------------
# video tower (timm-ViT naming, which the reference's tower shares)
# --------------------------------------------------------------------------

def video_tower_params(sd: Mapping[str, Array], cfg: VideoTowerConfig,
                       template: Mapping[str, object],
                       load_temporal_fix: str = "zeros") -> Dict[str, object]:
    """Build the Flax video-tower param tree from a torch state dict.

    ``sd`` may be a plain timm ViT dict (no time-attention keys) or a full
    SpaceTimeTransformer dict; ``template`` supplies fresh-init values for
    any key absent from ``sd`` (== torch ``load_state_dict(strict=False)``).
    """
    p: Dict[str, object] = _deep_copy(template)

    def have(k):
        return k in sd

    if have("patch_embed.proj.weight"):
        # torch conv OIHW -> flax HWIO
        p["patch_embed"] = {
            "kernel": np.ascontiguousarray(
                sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0)
            ),
            "bias": sd["patch_embed.proj.bias"],
        }
    if have("cls_token"):
        p["cls_token"] = sd["cls_token"]
    if have("pos_embed"):
        tgt_tokens = np.asarray(p["pos_embed"]).shape[1]
        src_tokens = sd["pos_embed"].shape[1]
        if src_tokens != tgt_tokens:
            # Match the reference's explicit guard (model/model.py:179-185):
            # loading across spatial resolutions / patch counts is not
            # supported — fail with a named error, not a later shape blowup.
            raise NotImplementedError(
                f"checkpoint pos_embed has {src_tokens} tokens but the model "
                f"expects {tgt_tokens} (img_size={cfg.img_size}, "
                f"patch_size={cfg.patch_size}); loading a checkpoint with a "
                "different spatial resolution / patch count is not supported"
            )
        p["pos_embed"] = sd["pos_embed"]
    if have("temporal_embed"):
        p["temporal_embed"] = inflate_temporal_embed(
            sd["temporal_embed"], cfg.num_frames, load_temporal_fix
        )
    if have("norm.weight"):
        p["norm"] = _layernorm(sd, "norm")

    for i in range(cfg.depth):
        blk = p[f"block{i:02d}"]
        t = f"blocks.{i}"
        for ln in ("norm1", "norm2", "norm3"):
            if have(f"{t}.{ln}.weight"):
                blk[ln] = _layernorm(sd, f"{t}.{ln}")
        for attn in ("attn", "timeattn"):
            if have(f"{t}.{attn}.qkv.weight"):
                blk[attn] = {
                    "qkv": _linear(sd, f"{t}.{attn}.qkv"),
                    "proj": _linear(sd, f"{t}.{attn}.proj"),
                }
        if have(f"{t}.mlp.fc1.weight"):
            blk["mlp"] = {
                "fc1": _linear(sd, f"{t}.mlp.fc1"),
                "fc2": _linear(sd, f"{t}.mlp.fc2"),
            }
    return p


# --------------------------------------------------------------------------
# text tower (HF DistilBERT naming)
# --------------------------------------------------------------------------

def text_tower_params(sd: Mapping[str, Array], n_layers: int = 6) -> Dict[str, object]:
    """HF `distilbert-base-uncased` torch dict -> Flax text-tower tree."""
    p: Dict[str, object] = {
        "word_embeddings": {
            "embedding": sd["embeddings.word_embeddings.weight"]
        },
        "position_embeddings": {
            "embedding": sd["embeddings.position_embeddings.weight"]
        },
        "embeddings_layer_norm": _layernorm(sd, "embeddings.LayerNorm"),
    }
    for i in range(n_layers):
        t = f"transformer.layer.{i}"
        p[f"layer{i:02d}"] = {
            "attention": {
                "q_lin": _linear(sd, f"{t}.attention.q_lin"),
                "k_lin": _linear(sd, f"{t}.attention.k_lin"),
                "v_lin": _linear(sd, f"{t}.attention.v_lin"),
                "out_lin": _linear(sd, f"{t}.attention.out_lin"),
            },
            "sa_layer_norm": _layernorm(sd, f"{t}.sa_layer_norm"),
            "ffn_lin1": _linear(sd, f"{t}.ffn.lin1"),
            "ffn_lin2": _linear(sd, f"{t}.ffn.lin2"),
            "output_layer_norm": _layernorm(sd, f"{t}.output_layer_norm"),
        }
    return p


# --------------------------------------------------------------------------
# full dual-encoder checkpoints
# --------------------------------------------------------------------------

def dual_encoder_params(sd: Mapping[str, Array], cfg: DualEncoderConfig,
                        template: Mapping[str, object],
                        load_temporal_fix: str = "zeros") -> Dict[str, object]:
    """Full EgoVLP checkpoint -> Flax dual-encoder tree.

    Reproduces FrozenInTime's load path (model.py:88-95): DataParallel
    prefix fix, temporal inflation, strict load of video/text towers and
    the two projection heads (torch Sequential indices: txt_proj.1 is the
    Linear after the ReLU, vid_proj.0 the lone Linear; model.py:72-79).
    """
    sd = strip_data_parallel_prefix(sd)
    out: Dict[str, object] = _deep_copy(template)

    vid_sd = _subdict(sd, "video_model.")
    txt_sd = _subdict(sd, "text_model.")
    out["video_model"] = video_tower_params(
        vid_sd, cfg.video, template["video_model"], load_temporal_fix
    )
    if txt_sd:
        out["text_model"] = text_tower_params(txt_sd, cfg.text.n_layers)
    # Projection heads load only when the widths match: OSCC/PNR fine-tunes
    # point load_checkpoint at the 256-dim retrieval checkpoint while the
    # task config sets projection_dim 2/16 (configs/ft/{oscc,pnr}.json) —
    # the fresh task head keeps its init in that case.
    for name, key in (("txt_proj", "txt_proj.1"), ("vid_proj", "vid_proj.0")):
        if f"{key}.weight" in sd and name in template:
            cand = _linear(sd, key)
            if cand["kernel"].shape == np.asarray(
                template[name]["kernel"]).shape:
                out[name] = cand
    return out


def _subdict(sd: Mapping[str, Array], prefix: str) -> StateDict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _deep_copy(tree):
    if isinstance(tree, Mapping):
        return {k: _deep_copy(v) for k, v in tree.items()}
    return np.asarray(tree)


# --------------------------------------------------------------------------
# reverse direction: Flax -> torch state dict (ecosystem interop)
# --------------------------------------------------------------------------

def export_dual_encoder(params: Mapping[str, object],
                        cfg: DualEncoderConfig) -> StateDict:
    """Export a Flax dual-encoder tree to a reference-convention torch
    state dict (the exact inverse of `dual_encoder_params`), so checkpoints
    trained here load into the original EgoVLP codebase/downstream tools."""
    sd: StateDict = {}

    def lin(prefix, node):
        sd[f"{prefix}.weight"] = np.ascontiguousarray(
            np.asarray(node["kernel"]).T)
        if "bias" in node:
            sd[f"{prefix}.bias"] = np.asarray(node["bias"])

    def ln(prefix, node):
        sd[f"{prefix}.weight"] = np.asarray(node["scale"])
        sd[f"{prefix}.bias"] = np.asarray(node["bias"])

    v = params["video_model"]
    sd["video_model.patch_embed.proj.weight"] = np.ascontiguousarray(
        np.asarray(v["patch_embed"]["kernel"]).transpose(3, 2, 0, 1))
    sd["video_model.patch_embed.proj.bias"] = np.asarray(
        v["patch_embed"]["bias"])
    for name in ("cls_token", "pos_embed", "temporal_embed"):
        sd[f"video_model.{name}"] = np.asarray(v[name])
    ln("video_model.norm", v["norm"])
    for i in range(cfg.video.depth):
        blk = v[f"block{i:02d}"]
        t = f"video_model.blocks.{i}"
        for name in ("norm1", "norm2", "norm3"):
            ln(f"{t}.{name}", blk[name])
        for attn in ("attn", "timeattn"):
            lin(f"{t}.{attn}.qkv", blk[attn]["qkv"])
            lin(f"{t}.{attn}.proj", blk[attn]["proj"])
        lin(f"{t}.mlp.fc1", blk["mlp"]["fc1"])
        lin(f"{t}.mlp.fc2", blk["mlp"]["fc2"])

    tmodel = params["text_model"]
    sd["text_model.embeddings.word_embeddings.weight"] = np.asarray(
        tmodel["word_embeddings"]["embedding"])
    sd["text_model.embeddings.position_embeddings.weight"] = np.asarray(
        tmodel["position_embeddings"]["embedding"])
    ln("text_model.embeddings.LayerNorm", tmodel["embeddings_layer_norm"])
    for i in range(cfg.text.n_layers):
        layer = tmodel[f"layer{i:02d}"]
        t = f"text_model.transformer.layer.{i}"
        for name in ("q_lin", "k_lin", "v_lin", "out_lin"):
            lin(f"{t}.attention.{name}", layer["attention"][name])
        ln(f"{t}.sa_layer_norm", layer["sa_layer_norm"])
        lin(f"{t}.ffn.lin1", layer["ffn_lin1"])
        lin(f"{t}.ffn.lin2", layer["ffn_lin2"])
        ln(f"{t}.output_layer_norm", layer["output_layer_norm"])

    if "txt_proj" in params:
        lin("txt_proj.1", params["txt_proj"])
    if "vid_proj" in params:
        lin("vid_proj.0", params["vid_proj"])
    return sd


def save_torch_checkpoint(params, cfg: DualEncoderConfig, path: str,
                          epoch: int = 0, monitor_best: float = 0.0):
    """Write a reference-compatible `{state_dict, epoch, monitor_best}`
    torch pickle (the payload base_trainer.py:399-422 produces)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_dual_encoder(params, cfg).items()}
    torch.save({"state_dict": sd, "epoch": epoch,
                "monitor_best": monitor_best, "arch": "FrozenInTime"}, path)
