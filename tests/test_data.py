"""Data-layer tests: samplers, tokenizer, on-device transforms."""

import numpy as np
import pytest

from egovlp_tpu.data.samplers import (
    sample_frames,
    sample_frames_clips,
    sample_frames_start_end,
)
from egovlp_tpu.data.text import WordPieceTokenizer


def test_sample_frames_uniform_midpoints():
    # vlen 100, 4 frames: intervals [0,25,50,75,100] -> mids (lo+hi)//2 with
    # hi = next-1: (0+24)/2=12, (25+49)/2=37, 62, 87
    assert sample_frames(4, 100, "uniform") == [12, 37, 62, 87]


def test_sample_frames_short_video():
    # vlen < num_frames: one sample per available frame slot
    assert len(sample_frames(8, 3, "uniform")) == 3


def test_sample_frames_rand_in_interval(rng):
    for _ in range(20):
        idxs = sample_frames(4, 100, "rand", rng=rng)
        iv = np.linspace(0, 100, 5).astype(int)
        for i, idx in enumerate(idxs):
            assert iv[i] <= idx < iv[i + 1]


def test_sample_frames_fix_start():
    assert sample_frames(4, 100, "rand", fix_start=3) == [3, 28, 53, 78]


def test_sample_frames_start_end_quirk():
    # reference quirk: acc = min(num_frames, END INDEX) not span length
    idxs = sample_frames_start_end(16, 5, 8, "uniform")
    assert len(idxs) == 8
    # literal reference arithmetic: linspace(5,8,9)=[5,5,5,6,6,6,7,7,8],
    # mid of (iv[i], iv[i+1]-1) — degenerate intervals emit start-1
    assert idxs == [4, 4, 5, 5, 5, 6, 6, 7]


def test_sample_frames_clips_bounds():
    idxs = sample_frames_clips(-5, 1000, 100, 4)
    assert len(idxs) == 4
    assert all(0 <= i < 100 for i in idxs)


@pytest.fixture
def vocab_file(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "the", "cat", "sat", "on", "mat", "##s", "open", "##ing",
             "door", "#", "c"]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab))
    return str(p)


@pytest.mark.parametrize("backend", ["rust", "python"])
def test_tokenizer_static_shapes(vocab_file, backend):
    tok = WordPieceTokenizer(vocab_file, max_length=8, backend=backend)
    ids, mask = tok(["the cats sat on the mat", "opening the door", ""])
    assert ids.shape == (3, 8) and mask.shape == (3, 8)
    assert ids.dtype == np.int32
    # starts with CLS, ends unmasked region with SEP
    assert (ids[:, 0] == 2).all()
    for b in range(3):
        last = mask[b].sum() - 1
        assert ids[b, last] == 3  # SEP
    # truncation keeps shape
    ids2, mask2 = tok("the " * 50)
    assert ids2.shape == (1, 8)


def test_tokenizer_backends_agree(vocab_file):
    r = WordPieceTokenizer(vocab_file, max_length=10, backend="rust")
    p = WordPieceTokenizer(vocab_file, max_length=10, backend="python")
    texts = ["The cats sat", "opening doors", "#C C opens the door"]
    ids_r, mask_r = r(texts)
    ids_p, mask_p = p(texts)
    np.testing.assert_array_equal(ids_r, ids_p)
    np.testing.assert_array_equal(mask_r, mask_p)


def test_transforms_shapes_and_stats(rng):
    import jax

    from egovlp_tpu.data.transforms import eval_resize, train_transform

    frames = rng.integers(0, 255, size=(2, 4, 64, 64, 3)).astype(np.uint8)
    out = train_transform(jax.random.PRNGKey(0), frames, out_size=32)
    assert out.shape == (2, 4, 32, 32 * 3)  # channel-folded layout
    assert np.isfinite(np.asarray(out)).all()

    out_e = eval_resize(frames, out_size=32)
    assert out_e.shape == (2, 4, 32, 32 * 3)

    # eval on a constant image: normalize exactly
    const = np.full((1, 1, 32, 32, 3), 255, np.uint8)
    got = np.asarray(eval_resize(const, out_size=32))
    want = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225]
    )
    np.testing.assert_allclose(got[0, 0, 0, :3], want, rtol=1e-5)


def test_train_transform_crop_within_bounds(rng):
    """A crop of a constant-color frame stays constant (no out-of-bounds
    zero bleed)."""
    import jax

    from egovlp_tpu.data.transforms import train_transform

    const = np.full((4, 2, 64, 64, 3), 128, np.uint8)
    for seed in range(5):
        out = np.asarray(train_transform(jax.random.PRNGKey(seed), const,
                                         out_size=32))
        out = out.reshape(4, 2, 32, 32, 3)  # unfold channels
        spread = out.max(axis=(1, 2, 3)) - out.min(axis=(1, 2, 3))
        assert spread.max() < 1e-4, f"seed {seed}: crop sampled out of bounds"


def test_eval_resize_matches_torch_bilinear(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from egovlp_tpu.data.transforms import eval_resize

    frames = rng.integers(0, 255, size=(1, 2, 16, 16, 3)).astype(np.uint8)
    got = np.asarray(eval_resize(frames, out_size=8)).reshape(1, 2, 8, 8, 3)
    x = torch.tensor(frames.astype(np.float32) / 255.0).permute(0, 1, 4, 2, 3)
    y = F.interpolate(x.reshape(2, 3, 16, 16), size=8, mode="bilinear",
                      align_corners=False)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    want = ((y - mean) / std).reshape(1, 2, 3, 8, 8).permute(0, 1, 3, 4, 2)
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-4)


def test_multi_crops(rng):
    from egovlp_tpu.data.transforms import (
        center_plus_four_crops,
        center_plus_two_horizontal_crops,
        two_horizontal_crop,
    )

    frames = rng.integers(0, 255, size=(1, 2, 48, 64, 3)).astype(np.uint8)
    five = center_plus_four_crops(frames, 32)
    assert five.shape == (5, 1, 2, 32, 32 * 3)
    three = center_plus_two_horizontal_crops(frames, 32)
    assert three.shape == (3, 1, 2, 32, 32 * 3)
    left = two_horizontal_crop(frames, 32, 0)
    right = two_horizontal_crop(frames, 32, 1)
    assert left.shape == right.shape == (1, 2, 32, 32 * 3)
    # left crop = vertically centered, horizontally at 0
    folded = frames.reshape(1, 2, 48, 64 * 3)
    np.testing.assert_array_equal(np.asarray(left), folded[..., 8:40, :96])


def test_tokenizer_punctuation_and_accents(vocab_file):
    """Backends agree on punctuation splitting and accent stripping."""
    r = WordPieceTokenizer(vocab_file, max_length=12, backend="rust")
    p = WordPieceTokenizer(vocab_file, max_length=12, backend="python")
    texts = ["the cat, sat... on the mat!", "Thé cät §", "#c c opens"]
    ids_r, mask_r = r(texts)
    ids_p, mask_p = p(texts)
    np.testing.assert_array_equal(ids_r, ids_p)
    np.testing.assert_array_equal(mask_r, mask_p)


def test_validation_split_loader(rng):
    """Reference BaseDataLoader.validation_split semantics
    (base_data_loader.py:29-54): seed-0 permutation, first len_valid
    indices -> validation, remainder -> train; split_validation() returns
    the val-side Loader over the SAME dataset; subsets are disjoint and
    exhaustive."""
    from tests.synth_ds import SynthEgoClipDataset

    from egovlp_tpu.data.pipeline import Loader

    ds = SynthEgoClipDataset(n=20)
    loader = Loader(ds, batch_size=4, shuffle=True, num_workers=1,
                    validation_split=0.25)
    val = loader.split_validation(shuffle=False)

    want = np.random.RandomState(0).permutation(20)
    np.testing.assert_array_equal(np.sort(loader.subset), np.sort(want[5:]))
    np.testing.assert_array_equal(np.sort(val.subset), np.sort(want[:5]))
    assert len(loader) == 3  # 15 train items, drop_last batches of 4
    assert len(val) == 2     # 5 val items, no drop_last

    # every yielded item index stays inside its subset; epochs reshuffle
    seen = []
    for ep in range(2):
        for b in loader.epoch(ep):
            seen.append(b["_index"])
    seen = np.concatenate(seen)
    assert set(seen) <= set(want[5:].tolist())
    vseen = np.concatenate([b["_index"] for b in val.epoch(0)])
    np.testing.assert_array_equal(np.sort(vseen), np.sort(want[:5]))

    # integer split = absolute validation count (reference :38-42)
    li = Loader(ds, batch_size=4, shuffle=True, num_workers=1,
                validation_split=7)
    assert len(li.split_validation().subset) == 7

    with pytest.raises(ValueError, match="validation_split"):
        Loader(ds, batch_size=4, num_workers=1).split_validation()
