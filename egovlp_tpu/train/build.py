"""Construct model / tokenizer / loaders from a task config.

The reference does this via reflective `config.initialize`
(parse_config.py:88-113); here construction is explicit but consumes the
same config schema (arch.args.video_params / text_params, data_loader.args,
optimizer, loss, trainer — see /root/reference/configs/pt/egoclip.json).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from egovlp_tpu.data.datasets import DatasetConfig, dataset_factory
from egovlp_tpu.data.pipeline import Loader
from egovlp_tpu.data.text import WordPieceTokenizer
from egovlp_tpu.models import (
    DualEncoder,
    DualEncoderConfig,
    TextTowerConfig,
    VideoTowerConfig,
)
from egovlp_tpu.models.convert import (
    dual_encoder_params,
    load_torch_weights,
    video_tower_params,
)


def build_model_config(arch: Dict[str, Any]) -> DualEncoderConfig:
    a = arch.get("args", arch)
    vp = dict(a.get("video_params", {}))
    tp = dict(a.get("text_params", {}))
    video = VideoTowerConfig(
        num_frames=int(vp.get("num_frames", 4)),
        time_init=vp.get("time_init", "zeros"),
        # architecture overrides beyond the reference's fixed ViT-B/16
        img_size=int(vp.get("img_size", 224)),
        patch_size=int(vp.get("patch_size", 16)),
        embed_dim=int(vp.get("embed_dim", 768)),
        depth=int(vp.get("depth", 12)),
        num_heads=int(vp.get("num_heads", 12)),
        drop_path_rate=float(vp.get("drop_path_rate", 0.0)),
        attention_impl=vp.get("attention_impl", "auto"),
        # remat: false | true/'block' | 'mlp' | 'attn' | 'attn_out' —
        # 'attn_out' is the measured 16f winner (scripts/remat_ab.py:
        # 17.2 vs 15.0 'attn' vs 14.9 'block' clips/s; 'none'/'mlp' don't
        # fit HBM at the EPIC 16f bs16 shape): it saves the named
        # attention outputs so the backward recomputes only the qkv Dense
        remat=vp.get("remat", False),
        sequence_parallel=vp.get("sequence_parallel"),
    )
    text = TextTowerConfig(
        vocab_size=int(tp.get("vocab_size", 30522)),
        dim=int(tp.get("dim", 768)),
        n_layers=int(tp.get("n_layers", 6)),
        n_heads=int(tp.get("n_heads", 12)),
        hidden_dim=int(tp.get("hidden_dim", 3072)),
        max_position_embeddings=int(tp.get("max_position_embeddings", 512)),
    )
    return DualEncoderConfig(
        video=video,
        text=text,
        projection_dim=int(a.get("projection_dim", 256)),
        projection=a.get("projection", "minimal"),
    )


def build_model(arch: Dict[str, Any], compute_dtype=None
                ) -> Tuple[DualEncoder, DualEncoderConfig]:
    """compute dtype resolution: explicit arg > arch.args.precision
    ('bf16'/'fp32', core/precision.py policy names) > bf16 default."""
    cfg = build_model_config(arch)
    if compute_dtype is None:
        from egovlp_tpu.core.precision import policy_from_name

        name = arch.get("args", arch).get("precision", "bf16")
        compute_dtype = policy_from_name(name).compute_dtype
    return DualEncoder(cfg, dtype=compute_dtype), cfg


def init_params(model: DualEncoder, cfg: DualEncoderConfig,
                seed: int = 0) -> Dict[str, Any]:
    R, T, L = cfg.video.img_size, cfg.video.num_frames, 8
    video = jnp.zeros((1, T, R, R, 3), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(seed), video,
        jnp.zeros((1, L), jnp.int32), jnp.ones((1, L), jnp.int32),
    )
    return variables["params"]


def load_pretrained(params: Dict[str, Any], cfg: DualEncoderConfig,
                    arch: Dict[str, Any], logger=None) -> Dict[str, Any]:
    """Apply the reference's init order (model.py:38-95): timm ViT weights
    into the video tower when no full checkpoint is given; otherwise the
    full EgoVLP checkpoint with temporal inflation.  DistilBERT weights
    load from ``text_params.weights`` (a torch state dict / HF pytorch_model
    .bin) when provided."""
    a = arch.get("args", arch)
    load_checkpoint = a.get("load_checkpoint") or ""
    fix = a.get("load_temporal_fix", "zeros")

    def log(msg):
        if logger:
            logger.info(msg)

    if load_checkpoint and os.path.exists(load_checkpoint):
        sd = load_torch_weights(load_checkpoint)
        log(f"loading full checkpoint {load_checkpoint}")
        return dual_encoder_params(sd, cfg, params, fix)

    vit = a.get("video_params", {}).get("vit_weights",
                                        "pretrained/jx_vit_base_p16_224-80ecf9dd.pth")
    if vit and os.path.exists(vit):
        log(f"initializing video tower from {vit}")
        sd = load_torch_weights(vit)
        params = dict(params)
        params["video_model"] = video_tower_params(
            sd, cfg.video, params["video_model"], fix
        )

    txt = a.get("text_params", {}).get("weights",
                                       "pretrained/distilbert-base-uncased/pytorch_model.bin")
    if txt and os.path.exists(txt):
        from egovlp_tpu.models.convert import text_tower_params

        log(f"initializing text tower from {txt}")
        sd = load_torch_weights(txt)
        sd = {k.removeprefix("distilbert."): v for k, v in sd.items()}
        params = dict(params)
        params["text_model"] = text_tower_params(sd, cfg.text.n_layers)
    return params


def build_tokenizer(config: Dict[str, Any], max_length: int = 30
                    ) -> Optional[WordPieceTokenizer]:
    vocab = config.get_path("arch.args.text_params.vocab") if hasattr(
        config, "get_path") else None
    vocab = vocab or os.environ.get(
        "EGOVLP_VOCAB", "pretrained/distilbert-base-uncased/vocab.txt"
    )
    if not os.path.exists(vocab):
        return None
    return WordPieceTokenizer(vocab, max_length=max_length)


def build_dataset(dl_args: Dict[str, Any], split: str):
    name = dl_args["dataset_name"]
    vp = dl_args.get("video_params", {})
    ds_cfg = DatasetConfig(
        data_dir=dl_args.get("data_dir", ""),
        meta_dir=dl_args.get("meta_dir"),
        split=split,
        num_frames=int(vp.get("num_frames", dl_args.get("num_frames", 4))),
        pre_size=int(vp.get("pre_size", 256)),
        input_res=int(vp.get("input_res", 224)),
        loading=vp.get("loading", "strict"),
        neg_param=dl_args.get("neg_param"),
        subsample=dl_args.get("subsample", 1),
        max_samples=dl_args.get("max_samples"),
        sliding_window_stride=int(
            dl_args.get("sliding_window_stride", -1)
        ),  # reference data_loader.py:25
        extra=dl_args.get("extra", {}),
    )
    return dataset_factory(name)(ds_cfg)


def build_loader(dl_args: Dict[str, Any], split: str,
                 tokenizer: Optional[WordPieceTokenizer],
                 batch_size: Optional[int] = None,
                 max_samples_per_epoch: Optional[int] = None) -> Loader:
    ds = build_dataset(dl_args, split)
    return Loader(
        ds,
        batch_size=batch_size or int(dl_args.get("batch_size", 16)),
        tokenizer=tokenizer,
        num_workers=int(dl_args.get("num_workers", 8)),
        num_procs=int(dl_args.get("num_procs", 0)),
        seed=int(dl_args.get("seed", 0)),
        shard=jax.process_index(),
        num_shards=jax.process_count(),
        drop_last=(split == "train"),
        shuffle=(split == "train") if dl_args.get("shuffle") is None
        else bool(dl_args.get("shuffle")),
        max_samples_per_epoch=max_samples_per_epoch,
        item_timeout=dl_args.get("item_timeout_sec"),
    )
