"""Committed golden conversion fixture: convert -> apply must reproduce the
recorded reference-semantics outputs WITHOUT torch in the loop.

The fixture (tests/fixtures/golden_dual_encoder.npz, built once by
scripts/make_golden_fixtures.py) holds a tiny reference-format checkpoint
(DataParallel-prefixed flat state dict) plus embeddings computed on the
torch side: HF DistilBertModel + the functional SpaceTimeTransformer oracle
+ the reference 'minimal' projection heads (model/model.py:72-79,117-143).
Any drift in a converter mapping or in model semantics fails here in CI,
with no torch and no 1.7 GB egovlp.pth required.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egovlp_tpu.models import (
    DualEncoder,
    DualEncoderConfig,
    TextTowerConfig,
    VideoTowerConfig,
)
from egovlp_tpu.models.convert import dual_encoder_params

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_dual_encoder.npz")

CFG = DualEncoderConfig(
    video=VideoTowerConfig(img_size=32, patch_size=16, embed_dim=24, depth=2,
                           num_heads=2, num_frames=4),
    text=TextTowerConfig(vocab_size=100, dim=32, n_layers=2, n_heads=4,
                         hidden_dim=64, max_position_embeddings=48),
    projection_dim=8,
)


@pytest.fixture(scope="module")
def fixture():
    data = np.load(FIXTURE)
    sd = {k[len("sd/"):]: data[k] for k in data.files if k.startswith("sd/")}
    return sd, data


@pytest.fixture(scope="module")
def converted(fixture):
    sd, data = fixture
    model = DualEncoder(CFG)
    video = jnp.asarray(data["in/video"])
    ids = jnp.asarray(data["in/ids"])
    mask = jnp.asarray(data["in/mask"])
    template = model.init(jax.random.PRNGKey(0), video, ids, mask)["params"]
    params = dual_encoder_params(sd, CFG, template)
    return model, params, data


def test_golden_embeddings_match_recorded(converted):
    model, params, data = converted
    t, v = model.apply({"params": params}, jnp.asarray(data["in/video"]),
                       jnp.asarray(data["in/ids"]),
                       jnp.asarray(data["in/mask"]), deterministic=True)
    np.testing.assert_allclose(np.asarray(t), data["out/t"],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v), data["out/v"],
                               rtol=2e-4, atol=2e-4)


def test_golden_mapping_is_bit_exact(converted, fixture):
    """Spot-check leaf mappings bit-exactly: any renamed param or dropped
    transpose in the converter fails here even if the numerics happen to
    stay close."""
    sd, _ = fixture
    _, params, _ = converted
    vid = params["video_model"]
    np.testing.assert_array_equal(
        np.asarray(vid["block01"]["attn"]["qkv"]["kernel"]),
        sd["module.video_model.blocks.1.attn.qkv.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(vid["patch_embed"]["kernel"]),
        sd["module.video_model.patch_embed.proj.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(vid["temporal_embed"]),
        sd["module.video_model.temporal_embed"])
    txt = params["text_model"]
    np.testing.assert_array_equal(
        np.asarray(txt["layer01"]["attention"]["q_lin"]["kernel"]),
        sd["module.text_model.transformer.layer.1.attention.q_lin.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(params["txt_proj"]["kernel"]),
        sd["module.txt_proj.1.weight"].T)
    np.testing.assert_array_equal(
        np.asarray(params["vid_proj"]["kernel"]),
        sd["module.vid_proj.0.weight"].T)


def test_golden_fixture_has_full_coverage(fixture):
    """Every checkpoint key family the converter claims to handle is present
    in the fixture, so the golden test actually exercises the full map."""
    sd, _ = fixture
    for probe in (
        "module.video_model.patch_embed.proj.weight",
        "module.video_model.cls_token",
        "module.video_model.pos_embed",
        "module.video_model.temporal_embed",
        "module.video_model.norm.weight",
        "module.video_model.blocks.0.timeattn.qkv.weight",
        "module.video_model.blocks.0.mlp.fc2.bias",
        "module.text_model.embeddings.word_embeddings.weight",
        "module.text_model.transformer.layer.0.ffn.lin1.weight",
        "module.text_model.transformer.layer.1.output_layer_norm.bias",
        "module.txt_proj.1.weight",
        "module.vid_proj.0.weight",
    ):
        assert probe in sd, probe
