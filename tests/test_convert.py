"""Weight-converter parity tests against torch numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from egovlp_tpu.models import (
    DistilBert,
    SpaceTimeTransformer,
    TextTowerConfig,
    VideoTowerConfig,
)
from egovlp_tpu.models.convert import (
    inflate_temporal_embed,
    strip_data_parallel_prefix,
    text_tower_params,
    video_tower_params,
)
from tests.torch_oracle import random_space_time_state_dict, space_time_forward

VCFG = VideoTowerConfig(img_size=32, patch_size=16, embed_dim=24, depth=3,
                        num_heads=2, num_frames=4)


def _np_sd(sd):
    return {k: v.numpy() for k, v in sd.items()}


def _video_parity(sd_torch, rng, cfg=VCFG, frames=None):
    frames = frames or cfg.num_frames
    video = rng.normal(size=(2, frames, cfg.img_size, cfg.img_size, 3)).astype(
        np.float32
    )
    model = SpaceTimeTransformer(cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(video))["params"]
    params = video_tower_params(_np_sd(sd_torch), cfg, template)
    got = model.apply({"params": params}, jnp.asarray(video))

    with torch.no_grad():
        want = space_time_forward(
            sd_torch,
            torch.tensor(video).permute(0, 1, 4, 2, 3),
            num_frames=cfg.num_frames, heads=cfg.num_heads, depth=cfg.depth,
            patch_size=cfg.patch_size,
        )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=2e-4, atol=2e-4
    )


def test_video_tower_full_checkpoint_parity(rng):
    sd = random_space_time_state_dict(
        rng, dim=VCFG.embed_dim, depth=VCFG.depth, heads=VCFG.num_heads,
        num_frames=VCFG.num_frames, patches_per_frame=VCFG.patches_per_frame,
    )
    _video_parity(sd, rng)


def test_video_tower_vit_style_zero_time_parity(rng):
    """timm-ViT init path: the converted tree keeps zero time attention
    (reference model.py:58-64 loads the ViT dict strict=False over
    zero-initialized time attention)."""
    sd = random_space_time_state_dict(
        rng, dim=VCFG.embed_dim, depth=VCFG.depth, heads=VCFG.num_heads,
        num_frames=VCFG.num_frames, patches_per_frame=VCFG.patches_per_frame,
        zero_time=True,
    )
    # drop the time-attention + temporal keys like a plain ViT dict; the
    # oracle still needs them so pass the zeroed versions there.
    vit_sd = {
        k: v for k, v in sd.items()
        if "timeattn" not in k and k != "temporal_embed"
    }
    zeros_tmp = dict(sd)
    zeros_tmp["temporal_embed"] = torch.zeros_like(sd["temporal_embed"])

    video = rng.normal(size=(1, 4, 32, 32, 3)).astype(np.float32)
    model = SpaceTimeTransformer(VCFG)  # time_init='zeros' default
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(video))["params"]
    params = video_tower_params(_np_sd(vit_sd), VCFG, template)
    got = model.apply({"params": params}, jnp.asarray(video))
    with torch.no_grad():
        want = space_time_forward(
            zeros_tmp, torch.tensor(video).permute(0, 1, 4, 2, 3),
            num_frames=4, heads=2, depth=3, patch_size=16,
        )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4, atol=2e-4)


def test_distilbert_parity(rng):
    from transformers import DistilBertConfig, DistilBertModel

    hf_cfg = DistilBertConfig(
        vocab_size=100, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
        max_position_embeddings=48, dropout=0.0, attention_dropout=0.0,
    )
    torch_model = DistilBertModel(hf_cfg).eval()

    cfg = TextTowerConfig(vocab_size=100, dim=32, n_layers=2, n_heads=4,
                          hidden_dim=64, max_position_embeddings=48)
    params = text_tower_params(_np_sd(torch_model.state_dict()), cfg.n_layers)

    ids = rng.integers(0, 100, size=(3, 16))
    mask = np.ones((3, 16), np.int64)
    mask[:, 12:] = 0

    model = DistilBert(cfg)
    got = model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
    )
    with torch.no_grad():
        want = torch_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state
    np.testing.assert_allclose(
        np.asarray(got)[:, :12], want.numpy()[:, :12], rtol=1e-4, atol=1e-4
    )


def test_strip_data_parallel_prefix():
    sd = {"module.a.b": np.zeros(1), "module.c": np.ones(1)}
    out = strip_data_parallel_prefix(sd)
    assert set(out) == {"a.b", "c"}
    sd2 = {"a.b": np.zeros(1)}
    assert set(strip_data_parallel_prefix(sd2)) == {"a.b"}


def test_inflate_temporal_embed_modes():
    e = np.arange(8, dtype=np.float32).reshape(1, 4, 2)
    # truncate
    np.testing.assert_array_equal(inflate_temporal_embed(e, 2), e[:, :2])
    # zero pad
    z = inflate_temporal_embed(e, 6, "zeros")
    np.testing.assert_array_equal(z[:, :4], e)
    assert (z[:, 4:] == 0).all()
    # bilinear matches torch F.interpolate align_corners=True
    import torch.nn.functional as F

    want = F.interpolate(
        torch.tensor(e).unsqueeze(0), (6, 2), mode="bilinear", align_corners=True
    ).squeeze(0).numpy()
    got = inflate_temporal_embed(e, 6, "bilinear")
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # nearest matches torch
    want_n = F.interpolate(
        torch.tensor(e).unsqueeze(0), (6, 2), mode="nearest"
    ).squeeze(0).numpy()
    got_n = inflate_temporal_embed(e, 6, "nearest")
    np.testing.assert_allclose(got_n, want_n)


def test_dual_encoder_full_checkpoint(rng):
    """Full EgoVLP-style checkpoint (module. prefix, torch Sequential
    projection indices, temporal inflation) loads into the dual encoder."""
    from transformers import DistilBertConfig, DistilBertModel

    from egovlp_tpu.models import DualEncoder, DualEncoderConfig
    from egovlp_tpu.models.convert import dual_encoder_params

    hf_cfg = DistilBertConfig(
        vocab_size=100, dim=32, n_layers=2, n_heads=4, hidden_dim=64,
        max_position_embeddings=48, dropout=0.0, attention_dropout=0.0,
    )
    tcfg = TextTowerConfig(vocab_size=100, dim=32, n_layers=2, n_heads=4,
                           hidden_dim=64, max_position_embeddings=48)
    # model runs 4 frames; the synthetic checkpoint below was "trained"
    # with 8 — exercises the truncation path of the temporal inflation.
    vcfg = VideoTowerConfig(img_size=32, patch_size=16, embed_dim=24, depth=2,
                            num_heads=2, num_frames=4)
    cfg = DualEncoderConfig(video=vcfg, text=tcfg, projection_dim=8)

    vid_sd = random_space_time_state_dict(
        rng, dim=24, depth=2, heads=2, num_frames=8, patches_per_frame=4,
    )
    txt_model = DistilBertModel(hf_cfg).eval()
    full = {}
    for k, v in vid_sd.items():
        full[f"module.video_model.{k}"] = v.numpy()
    for k, v in txt_model.state_dict().items():
        full[f"module.text_model.{k}"] = v.numpy()
    full["module.txt_proj.1.weight"] = rng.normal(size=(8, 32)).astype(np.float32)
    full["module.txt_proj.1.bias"] = rng.normal(size=8).astype(np.float32)
    full["module.vid_proj.0.weight"] = rng.normal(size=(8, 24)).astype(np.float32)
    full["module.vid_proj.0.bias"] = rng.normal(size=8).astype(np.float32)

    model = DualEncoder(cfg)
    video = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 100, size=(1, 8)), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    template = model.init(jax.random.PRNGKey(0), video, ids, mask)["params"]
    params = dual_encoder_params(full, cfg, template, "zeros")

    # temporal embed truncated 8 -> 4 frames
    np.testing.assert_array_equal(
        params["video_model"]["temporal_embed"],
        vid_sd["temporal_embed"].numpy()[:, :4],
    )
    t, v = model.apply({"params": params}, video, ids, mask)
    assert t.shape == (1, 8) and v.shape == (1, 8)
    assert np.isfinite(np.asarray(t)).all() and np.isfinite(np.asarray(v)).all()

    # text projection applies ReLU before the Linear (model.py:73-75)
    hidden = model.apply({"params": params}, video, method="encode_video")
    assert hidden.shape == (1, 8)


def test_export_roundtrip(rng):
    """flax -> torch state dict -> flax must be the identity."""
    from egovlp_tpu.models import DualEncoder, DualEncoderConfig
    from egovlp_tpu.models.convert import dual_encoder_params, export_dual_encoder

    tcfg = TextTowerConfig(vocab_size=100, dim=32, n_layers=2, n_heads=4,
                           hidden_dim=64, max_position_embeddings=48)
    vcfg = VideoTowerConfig(img_size=32, patch_size=16, embed_dim=24, depth=2,
                            num_heads=2, num_frames=4)
    cfg = DualEncoderConfig(video=vcfg, text=tcfg, projection_dim=8)
    model = DualEncoder(cfg)
    video = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 100, size=(1, 8)), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(3), video, ids, mask)["params"]

    sd = export_dual_encoder(params, cfg)
    back = dual_encoder_params(sd, cfg, params)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), rtol=1e-6,
            err_msg=str(path),
        )


def test_task_head_dim_mismatch_keeps_fresh_init(rng):
    """Loading the 256-dim retrieval checkpoint into an OSCC-style 2-dim
    head keeps the fresh head init (the towers still load)."""
    from egovlp_tpu.models import DualEncoder, DualEncoderConfig
    from egovlp_tpu.models.convert import dual_encoder_params

    tcfg = TextTowerConfig(vocab_size=100, dim=32, n_layers=1, n_heads=4,
                           hidden_dim=64, max_position_embeddings=48)
    vcfg = VideoTowerConfig(img_size=32, patch_size=16, embed_dim=24, depth=1,
                            num_heads=2, num_frames=4)
    cfg = DualEncoderConfig(video=vcfg, text=tcfg, projection_dim=2)
    model = DualEncoder(cfg)
    video = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), video,
                          jnp.zeros((1, 4), jnp.int32),
                          jnp.ones((1, 4), jnp.int32))["params"]

    sd = {  # 8-dim projections in the "checkpoint", 2-dim in the model
        "txt_proj.1.weight": rng.normal(size=(8, 32)).astype(np.float32),
        "txt_proj.1.bias": rng.normal(size=8).astype(np.float32),
        "vid_proj.0.weight": rng.normal(size=(8, 24)).astype(np.float32),
        "vid_proj.0.bias": rng.normal(size=8).astype(np.float32),
    }
    out = dual_encoder_params(sd, cfg, template)
    np.testing.assert_array_equal(
        np.asarray(out["txt_proj"]["kernel"]),
        np.asarray(template["txt_proj"]["kernel"]),
    )


def test_pos_embed_patch_count_mismatch_raises(rng):
    """A checkpoint trained at a different spatial resolution must fail with
    a named error (reference model/model.py:179-185), not a later shape
    blowup inside apply."""
    sd = random_space_time_state_dict(
        rng, dim=VCFG.embed_dim, depth=VCFG.depth, heads=VCFG.num_heads,
        num_frames=VCFG.num_frames, patches_per_frame=VCFG.patches_per_frame,
    )
    video = rng.normal(size=(1, 4, 32, 32, 3)).astype(np.float32)
    model = SpaceTimeTransformer(VCFG)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(video))["params"]
    sd = _np_sd(sd)
    pe = sd["pos_embed"]
    sd["pos_embed"] = np.concatenate([pe, pe[:, -3:]], axis=1)  # wrong count
    with pytest.raises(NotImplementedError, match="pos_embed"):
        video_tower_params(sd, VCFG, template)


def test_inspect_checkpoint_torch_and_orbax(rng, tmp_path):
    """`cli.convert inspect` summarizes both checkpoint formats (the
    user-facing replacement for the reference's model/load_checkpoint.py
    debug scratch)."""
    import torch

    from egovlp_tpu.cli.convert import inspect_checkpoint
    from egovlp_tpu.io.checkpoints import CheckpointManager

    # torch trainer-style checkpoint with a state_dict field + metadata
    pth = tmp_path / "ckpt.pth"
    torch.save({"state_dict": {"module.w": torch.zeros(3, 4),
                               "module.b": torch.ones(4)},
                "epoch": 3, "monitor_best": 0.5}, pth)
    lines = []
    summary = inspect_checkpoint(str(pth), print_fn=lines.append)
    assert summary["module.w"][0] == (3, 4)
    assert summary["module.b"][0] == (4,)
    assert "16" in lines[-1].split("params")[0] or "0.00M" in lines[-1]
    assert "'epoch': 3" in lines[-1]

    # orbax tree (CheckpointManager layout)
    cm = CheckpointManager(str(tmp_path / "orbax"))
    cm.save_epoch(2, {"params": {"layer": {"kernel": np.zeros((5, 6),
                                                              np.float32)}},
                      "epoch": 2, "monitor_best": 1.0})
    lines = []
    summary = inspect_checkpoint(str(tmp_path / "orbax" /
                                     "checkpoint-epoch2"),
                                 print_fn=lines.append)
    assert summary["layer.kernel"] == ((5, 6), "float32")
    assert "1 tensors" in lines[-1] and "'epoch': 2" in lines[-1]


def test_inspect_checkpoint_model_best_only(tmp_path):
    """A run dir whose epoch checkpoints were pruned (only model_best
    left) still inspects (review finding r3)."""
    import shutil

    from egovlp_tpu.cli.convert import inspect_checkpoint
    from egovlp_tpu.io.checkpoints import CheckpointManager

    cm = CheckpointManager(str(tmp_path))
    cm.save_epoch(1, {"params": {"w": np.ones((2, 2), np.float32)},
                      "epoch": 1, "monitor_best": 0.9}, is_best=True)
    shutil.rmtree(tmp_path / "checkpoint-epoch1")
    lines = []
    summary = inspect_checkpoint(str(tmp_path), print_fn=lines.append)
    assert summary["w"] == ((2, 2), "float32")
    assert "'epoch': 1" in lines[-1]
