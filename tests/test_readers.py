"""Decode-path tests on synthetic videos (native C++ decoder + cv2 fallback)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from egovlp_tpu.data import native
from egovlp_tpu.data.readers import (
    _Cv2Video,
    get_video_len,
    open_video,
    read_frames,
    read_frames_egoclip,
)


def make_video(path, n_frames=60, fps=30, size=(64, 48)):
    """Each frame's mean gray level encodes its index (idx * 4)."""
    w, h = size
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (w, h))
    assert vw.isOpened()
    for i in range(n_frames):
        frame = np.full((h, w, 3), min(i * 4, 255), np.uint8)
        vw.write(frame)
    vw.release()
    return str(path)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    return make_video(tmp_path_factory.mktemp("vids") / "v.mp4")


def _frame_level(frames):
    return frames.astype(np.float64).mean(axis=(1, 2, 3))


def test_native_available():
    assert native.available(), "libegodecode.so should be built (make -C native)"


def test_native_metadata(video):
    v = native.NativeVideo(video)
    assert v.frame_count == 60
    assert abs(v.fps - 30) < 0.5
    assert v.width == 64 and v.height == 48
    v.close()


def test_native_reads_correct_frames(video):
    v = native.NativeVideo(video)
    frames, ok = v.read_frames([0, 10, 30, 59], pre_size=32)
    assert frames.shape == (4, 32, 32, 3) and ok == 4
    lv = _frame_level(frames)
    want = np.minimum(np.array([0, 10, 30, 59]) * 4, 255)
    np.testing.assert_allclose(lv, want, atol=6)
    v.close()


def test_native_backward_seek(video):
    v = native.NativeVideo(video)
    f1, _ = v.read_frames([50], pre_size=32)
    f2, _ = v.read_frames([5], pre_size=32)  # backward
    np.testing.assert_allclose(_frame_level(f2), [20], atol=6)
    v.close()


def test_native_matches_cv2(video):
    nat = native.NativeVideo(video)
    cvv = _Cv2Video(video)
    idxs = [3, 20, 45]
    fn, _ = nat.read_frames(idxs, pre_size=32)
    fc, _ = cvv.read_frames(idxs, pre_size=32)
    # cv2 fallback seeks to idx-1 (reference quirk) so levels may differ by
    # one frame step; allow that margin
    np.testing.assert_allclose(_frame_level(fn), _frame_level(fc), atol=8)
    nat.close()
    cvv.close()


def test_read_frames_static_shape(video):
    frames, idxs = read_frames(video, num_frames=4, sample="uniform",
                               pre_size=32)
    assert frames.shape == (4, 32, 32, 3)
    assert frames.dtype == np.uint8


def test_read_frames_pads_short_video(tmp_path):
    short = make_video(tmp_path / "short.mp4", n_frames=2)
    frames, idxs = read_frames(short, num_frames=8, sample="uniform",
                               pre_size=32)
    assert frames.shape == (8, 32, 32, 3)
    # padded tail repeats the last valid frame
    np.testing.assert_array_equal(frames[2], frames[7])


def test_get_video_len(video):
    assert get_video_len(video) == 60


def test_read_frames_egoclip_two_chunks(tmp_path):
    """Clip spanning two 600-s chunk files: indices past bound_sec read from
    the second chunk, modulo chunk length."""
    c0 = make_video(tmp_path / "0.mp4", n_frames=60)   # chunk 0 (last 2 s)
    c1 = make_video(tmp_path / "1.mp4", n_frames=60)
    # pretend chunk 0 covers [598, 600) s: clip 599 -> 601 s crosses bound 600
    frames, idxs = read_frames_egoclip(
        c0, c1, num_frames=4, sample="uniform",
        start_sec=599.0, end_sec=601.0, bound_sec=600.0, pre_size=32,
    )
    assert frames.shape == (4, 32, 32, 3)
    # global indices in [17970, 18030]; local = idx % 18000
    assert all(17970 <= i <= 18030 for i in idxs)


def test_native_wide_video_no_corruption(tmp_path):
    """Regression: sws_scale SIMD writes overran unaligned line strides on
    wide (landscape) videos -> heap corruption. Decode many wide frames."""
    p = make_video(tmp_path / "wide.mp4", n_frames=40, size=(456, 256))
    from egovlp_tpu.data import native as nat

    v = nat.NativeVideo(p)
    for _ in range(5):
        frames, ok = v.read_frames([0, 10, 20, 30, 39], pre_size=256)
        assert ok == 5
        assert frames.shape == (5, 256, 256, 3)
    v.close()


def test_native_true_frame_index_vs_cv2_quirk(tmp_path):
    """The native decoder returns the exact requested frame; the cv2
    fallback reproduces the reference's seek-to-(idx-1) quirk
    (base_dataset.py:229), so the two differ by one frame on purpose."""
    p = make_video(tmp_path / "idx.mp4", n_frames=60)
    from egovlp_tpu.data import native as nat

    v = nat.NativeVideo(p)
    f, _ = v.read_frames([20], pre_size=32)
    # frame 20 has gray level 80 (idx*4)
    np.testing.assert_allclose(_frame_level(f), [80], atol=6)
    v.close()
    c = _Cv2Video(p)
    f2, _ = c.read_frames([20], pre_size=32)
    np.testing.assert_allclose(_frame_level(f2), [76], atol=6)  # idx-1
    c.close()


def test_load_frames_from_video_path_uniform(video, tmp_path):
    """Standalone raw-resolution loader (reference utils/video.py:8-40):
    native frame size, [0,1] float, interval-midpoint indices, optional
    jpg dump."""
    from egovlp_tpu.data.readers import load_frames_from_video_path

    frames, idxs = load_frames_from_video_path(video, 4, sample="uniform",
                                               save_dir=str(tmp_path / "im"))
    assert frames.shape == (4, 48, 64, 3) and frames.dtype == np.float32
    assert 0.0 <= frames.min() and frames.max() <= 1.0
    # uniform midpoints of 4 intervals over 60 frames: (lo + hi)//2
    iv = np.linspace(0, 60, 5).astype(int)
    want_idx = [(iv[i] + iv[i + 1] - 1) // 2 for i in range(4)]
    assert idxs == want_idx
    # gray level encodes the DECODED index (seek straight to idx here,
    # not the dataset readers' idx-1 quirk)
    lv = frames.astype(np.float64).mean(axis=(1, 2, 3)) * 255
    np.testing.assert_allclose(lv, np.minimum(np.array(idxs) * 4, 255),
                               atol=6)
    dumped = sorted(os.listdir(tmp_path / "im"))
    assert dumped == sorted(f"{i}.jpg" for i in idxs)


def test_load_frames_from_video_path_rand_reproducible(video):
    from egovlp_tpu.data.readers import load_frames_from_video_path

    _, a = load_frames_from_video_path(video, 6, "rand",
                                       rng=np.random.default_rng(3))
    _, b = load_frames_from_video_path(video, 6, "rand",
                                       rng=np.random.default_rng(3))
    assert a == b and len(a) == 6
    # each index falls inside its interval [iv[i], iv[i+1]-1)
    iv = np.linspace(0, 60, 7).astype(int)
    assert all(iv[i] <= a[i] < iv[i + 1] for i in range(6))


def test_load_frames_from_video_path_short_video(tmp_path):
    """num_frames > vlen degrades to vlen frames (acc_samples=min), like
    the reference."""
    from egovlp_tpu.data.readers import load_frames_from_video_path

    p = make_video(tmp_path / "short.mp4", n_frames=3)
    frames, idxs = load_frames_from_video_path(p, 8, sample="uniform")
    assert frames.shape[0] == 3 and len(idxs) == 3

    with pytest.raises(IOError):
        load_frames_from_video_path(str(tmp_path / "nope.mp4"), 4)


def _make_bframe_video(path, n=200, gop=50, max_b_frames=2, size=(128, 96)):
    """Encode a reordered (B-frame) mpeg4 stream via the native encoder.

    cv2's mp4v writer never emits B-frames, so without this helper the
    decoder's pts-reorder handling and the skip_frame=NONREF roll fast path
    would go untested (no ffmpeg CLI / PyAV in the environment)."""
    w, h = size
    rng = np.random.default_rng(0)
    t = np.arange(n)[:, None, None, None]
    yy = np.arange(h)[None, :, None, None]
    xx = np.arange(w)[None, None, :, None]
    frames = ((np.sin(0.05 * t + 0.1 * yy) + np.cos(0.07 * t + 0.08 * xx)
               + 2) * 60).astype(np.uint8)
    frames = np.broadcast_to(frames, (n, h, w, 3)).copy()
    frames += rng.integers(0, 8, size=(1, h, w, 3)).astype(np.uint8)
    assert native.encode_video(path, frames, fps=30, gop=gop,
                               max_b_frames=max_b_frames)
    return str(path)


def test_native_skip_roll_bit_exact_with_bframes(tmp_path):
    """Random access into a B-frame stream must be bit-identical to a
    sequential decode: the roll fast path discards only NON-REFERENCE
    frames (which by definition cannot affect the target's pixels)."""
    p = _make_bframe_video(tmp_path / "b.mp4")
    v = native.NativeVideo(p)
    seq, _ = v.read_frames(list(range(200)), pre_size=64)
    v.close()

    native.decode_stats(reset=True)
    skipped = 0
    for targets in ([149], [52, 149, 151], [199], [3, 90, 91, 180]):
        v2 = native.NativeVideo(p)
        got, n_ok = v2.read_frames(targets, pre_size=64)
        v2.close()
        assert n_ok == len(targets)
        for i, t in enumerate(targets):
            np.testing.assert_array_equal(got[i], seq[t])
    st = native.decode_stats(reset=True)
    if st:  # old .so builds lack the counter; exactness above still holds
        skipped = st.get("n_frames_skipped", 0)
        assert skipped > 0, "roll fast path never engaged on a B-frame roll"
        # decode amplification: every skipped frame is codec work avoided
        assert st["n_frames_decoded"] < 200


def test_native_skip_roll_zero_margin_overshoot_retry(tmp_path, monkeypatch):
    """ED_SKIP_MARGIN=0 makes the skip-roll run right up to the target, so
    B-frame targets get skipped and the roll OVERSHOOTS — the decode_to
    rc=2 rail must then re-seek and retry with skipping off, keeping random
    access bit-exact (rather than silently delivering a later frame).  The
    margin is read at ed_open, so the env must be set before NativeVideo."""
    p = _make_bframe_video(tmp_path / "b0.mp4")
    v = native.NativeVideo(p)
    seq, _ = v.read_frames(list(range(200)), pre_size=64)
    v.close()

    monkeypatch.setenv("ED_SKIP_MARGIN", "0")
    native.decode_stats(reset=True)
    # isolated single-target reads: every access seeks + rolls, and with
    # B-frames ~2/3 of targets are non-ref, so overshoots are guaranteed.
    # 199 (the LAST frame) exercises the EOF rail: when the skip eats the
    # final frame the drain hits EOF with nothing left to overshoot, and
    # decode_to must still report retryable (rc=2), not failure.
    for t in (7, 8, 52, 53, 149, 150, 151, 197, 198, 199):
        v2 = native.NativeVideo(p)
        got, n_ok = v2.read_frames([t], pre_size=64)
        v2.close()
        assert n_ok == 1
        np.testing.assert_array_equal(got[0], seq[t])
    st = native.decode_stats(reset=True)
    if st:
        assert st.get("n_frames_skipped", 0) > 0


def test_native_encoder_rejects_bad_shape(tmp_path):
    with pytest.raises(ValueError):
        native.encode_video(tmp_path / "x.mp4", np.zeros((4, 8, 8), np.uint8))


def test_native_skip_margin_env_validation(tmp_path, monkeypatch):
    """A non-numeric ED_SKIP_MARGIN (typo, empty) must fall through to the
    stream-derived margin, NOT strtol-parse to 0 — 0 is the most aggressive
    skip setting and turns a bad env value into maximal rail reliance."""
    p = _make_bframe_video(tmp_path / "m0.mp4")
    v = native.NativeVideo(p)
    derived = v.skip_margin
    v.close()
    if derived < 0:
        pytest.skip("old .so without ed_skip_margin")
    assert derived >= 2  # reorder depth + 2

    for bad in ("auto", "", "  ", "3x"):
        monkeypatch.setenv("ED_SKIP_MARGIN", bad)
        v = native.NativeVideo(p)
        assert v.skip_margin == derived, f"env {bad!r} must be ignored"
        v.close()

    monkeypatch.setenv("ED_SKIP_MARGIN", "7")
    v = native.NativeVideo(p)
    assert v.skip_margin == 7
    v.close()
