"""Host-side frame readers.

Behavioral reference: the reader registry in
/root/reference/base/base_dataset.py:220-405.  Every reader returns a FIXED
``[num_frames, pre, pre, 3]`` uint8 array (short-side resized + center
cropped) plus the number of valid frames — static shapes for XLA; short
reads are padded by repeating the last frame, exactly the reference's
egoclip padding (base_dataset.py:291-292).

Two decode backends:
  * native: the C++ libav runtime (egovlp_tpu.data.native), preferred;
  * cv2: OpenCV VideoCapture fallback mirroring the reference's seek loop.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from egovlp_tpu.data import native
from egovlp_tpu.data.samplers import sample_frames, sample_frames_start_end

EGOCLIP_FPS = 30  # EgoClip chunks are 30 fps (base_dataset.py:263-265)
CHUNK_SEC = 600   # 600-second chunk files (EgoClip_EgoMCQ_dataset.py:23)


# --------------------------------------------------------------------------
# backend primitives
# --------------------------------------------------------------------------

def _resize_center_crop_cv2(frame_bgr: np.ndarray, pre: int) -> np.ndarray:
    import cv2

    h, w = frame_bgr.shape[:2]
    if w <= h:
        sw, sh = pre, int(h * pre / w)
    else:
        sh, sw = pre, int(w * pre / h)
    img = cv2.resize(frame_bgr, (sw, sh), interpolation=cv2.INTER_LINEAR)
    y0, x0 = (sh - pre) // 2, (sw - pre) // 2
    img = img[y0:y0 + pre, x0:x0 + pre]
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


class _Cv2Video:
    def __init__(self, path: str):
        import cv2

        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise IOError(f"cv2 cannot open {path}")
        self.frame_count = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.fps = float(self.cap.get(cv2.CAP_PROP_FPS))

    def read_frames(self, indices, pre_size=256):
        import cv2

        out = np.zeros((len(indices), pre_size, pre_size, 3), np.uint8)
        ok = 0
        last = None
        for i, idx in enumerate(indices):
            idx = int(np.clip(idx, 0, max(self.frame_count - 1, 0)))
            # reference seeks to index-1 then reads (base_dataset.py:229)
            self.cap.set(cv2.CAP_PROP_POS_FRAMES, max(idx - 1, 0))
            ret, frame = self.cap.read()
            if ret:
                last = _resize_center_crop_cv2(frame, pre_size)
                out[i] = last
                ok += 1
            elif last is not None:
                out[i] = last
        return out, ok

    def close(self):
        self.cap.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_video(path: str, backend: str = "auto"):
    if backend in ("auto", "native") and native.available():
        try:
            return native.NativeVideo(path)
        except Exception:
            if backend == "native":
                raise
    return _Cv2Video(path)


# --------------------------------------------------------------------------
# per-thread open-handle cache
# --------------------------------------------------------------------------
# Container open + stream probe (avformat_find_stream_info reads MBs of the
# file) is a large share of the per-clip budget, and EgoClip reads the SAME
# 600 s chunk 2-4x per item: positive clip + scene negative share a segment
# (datasets/egoclip.py), and EgoMCQ items read 5 options.  Each Loader
# decode thread keeps a small LRU of open decoders; decoders are fully
# repositionable (seek_to handles any order), so reuse is free.
# EGOVLP_READER_CACHE sets the per-thread capacity (0 disables).

_CACHE_CAP = int(os.environ.get("EGOVLP_READER_CACHE", "4"))
_tls = __import__("threading").local()


def _cache_dict():
    d = getattr(_tls, "videos", None)
    if d is None:
        from collections import OrderedDict

        d = _tls.videos = OrderedDict()
    return d


def acquire_video(path: str, backend: str = "auto"):
    """Checked-out open handle for ``path`` — from this thread's cache when
    present, freshly opened otherwise.  Pair with release_video()."""
    if _CACHE_CAP <= 0:
        return open_video(path, backend)
    v = _cache_dict().pop((path, backend), None)
    return v if v is not None else open_video(path, backend)


def release_video(path: str, backend: str, video, ok: bool = True) -> None:
    """Return a handle to this thread's cache (LRU-evicting past capacity);
    ``ok=False`` (decode error — decoder state is suspect) closes instead."""
    if _CACHE_CAP <= 0 or not ok:
        video.close()
        return
    d = _cache_dict()
    old = d.pop((path, backend), None)
    if old is not None and old is not video:
        old.close()  # duplicate handle for the same file: keep the newest
    d[(path, backend)] = video
    while len(d) > _CACHE_CAP:
        _, old = d.popitem(last=False)
        old.close()


class cached_video:
    """Context manager over acquire/release (drop-in for open_video)."""

    def __init__(self, path: str, backend: str = "auto"):
        self.path, self.backend = path, backend
        self.video = acquire_video(path, backend)

    def __enter__(self):
        return self.video

    def __exit__(self, exc_type, *exc):
        release_video(self.path, self.backend, self.video,
                      ok=exc_type is None)
        return False


def get_video_len(path: str, backend: str = "auto") -> int:
    try:
        with cached_video(path, backend) as v:
            return v.frame_count
    except Exception:
        return 0


def _pad_to(frames: np.ndarray, valid: int, num_frames: int) -> np.ndarray:
    """Repeat the last valid frame up to num_frames (static shape)."""
    if valid == 0:
        return np.zeros((num_frames,) + frames.shape[1:], np.uint8)
    if frames.shape[0] == num_frames and valid == num_frames:
        return frames
    out = np.zeros((num_frames,) + frames.shape[1:], np.uint8)
    n = min(valid, num_frames)
    out[:n] = frames[:n]
    out[n:] = frames[n - 1]
    return out


# --------------------------------------------------------------------------
# readers (reference registry parity: base_dataset.py:397-405)
# --------------------------------------------------------------------------

def read_frames(video_path: str, num_frames: int, sample: str = "rand",
                fix_start: Optional[int] = None, pre_size: int = 256,
                rng: Optional[np.random.Generator] = None,
                backend: str = "auto") -> Tuple[np.ndarray, List[int]]:
    """Generic whole-video reader ('cv2'/'decord'/'av' equivalents)."""
    with cached_video(video_path, backend) as v:
        idxs = sample_frames(num_frames, max(v.frame_count, 1), sample,
                             fix_start=fix_start, rng=rng)
        frames, ok = v.read_frames(idxs, pre_size)
    return _pad_to(frames, ok, num_frames), idxs


def read_frames_egoclip(video_path_1: str, video_path_2: str,
                        num_frames: int, sample: str,
                        start_sec: float, end_sec: float, bound_sec: float,
                        pre_size: int = 256,
                        rng: Optional[np.random.Generator] = None,
                        backend: str = "auto"):
    """EgoClip chunked reader (base_dataset.py:246-297): a clip may span two
    600-s chunk files; global frame index = sec * 30, local index = modulo
    chunk length; frames past ``bound_sec`` come from the second chunk."""
    start_f = max(0, int(start_sec * EGOCLIP_FPS))
    end_f = max(0, int(end_sec * EGOCLIP_FPS))
    bound_f = int(bound_sec * EGOCLIP_FPS)
    idxs = sample_frames_start_end(num_frames, start_f, end_f, sample=sample,
                                   rng=rng)

    same = video_path_1 == video_path_2
    ok = False
    v1 = acquire_video(video_path_1, backend)
    v2 = v1 if same else acquire_video(video_path_2, backend)
    try:
        chunk_len = CHUNK_SEC * EGOCLIP_FPS
        locals_1, locals_2, order = [], [], []
        for i, gidx in enumerate(idxs):
            lidx = gidx % chunk_len
            if gidx > bound_f:
                locals_2.append(min(lidx, max(v2.frame_count - 1, 0)))
                order.append((i, 2, len(locals_2) - 1))
            else:
                locals_1.append(min(lidx, max(v1.frame_count - 1, 0)))
                order.append((i, 1, len(locals_1) - 1))
        f1, ok1 = (v1.read_frames(locals_1, pre_size) if locals_1
                   else (np.zeros((0, pre_size, pre_size, 3), np.uint8), 0))
        f2, ok2 = (v2.read_frames(locals_2, pre_size) if locals_2
                   else (np.zeros((0, pre_size, pre_size, 3), np.uint8), 0))
        if not locals_2:
            out = f1  # common case (clip inside one chunk): the decode
            # buffer is already frame-ordered — skip the per-frame copy
        else:
            out = np.zeros((len(idxs), pre_size, pre_size, 3), np.uint8)
            for i, which, j in order:
                out[i] = f1[j] if which == 1 else f2[j]
        ok = True
    finally:
        # handles go back to this thread's cache (the scene negative of the
        # same item almost always re-reads the same 600 s chunk); a decode
        # error closes them instead
        release_video(video_path_1, backend, v1, ok=ok)
        if not same:
            release_video(video_path_2, backend, v2, ok=ok)
    return _pad_to(out, len(idxs), num_frames), idxs


def read_frames_epic(frame_dir: str, start_frame: int, stop_frame: int,
                     num_frames: int, sample: str = "rand",
                     fix_start: Optional[int] = None, pre_size: int = 256,
                     rng: Optional[np.random.Generator] = None):
    """EPIC-Kitchens pre-extracted JPEG reader (base_dataset.py:299-316):
    frames live as frame_%010d.jpg in a directory."""
    import cv2

    idxs = sample_frames_start_end(num_frames, start_frame, stop_frame,
                                   sample=sample, fix_start=fix_start, rng=rng)
    out = np.zeros((len(idxs), pre_size, pre_size, 3), np.uint8)
    ok = 0
    for i, idx in enumerate(idxs):
        path = os.path.join(frame_dir, f"frame_{int(idx):010d}.jpg")
        img = cv2.imread(path)
        if img is None:
            continue
        out[i] = _resize_center_crop_cv2(img, pre_size)
        ok += 1
    return _pad_to(out, len(idxs), num_frames), idxs


def read_frames_charades(video_path: str, num_frames: int, sample: str,
                         start_sec: Optional[float] = None,
                         end_sec: Optional[float] = None,
                         pre_size: int = 256,
                         rng: Optional[np.random.Generator] = None,
                         backend: str = "auto"):
    """CharadesEgo reader (base_dataset.py:318-349): optional second-based
    bounds scaled by the container fps."""
    with cached_video(video_path, backend) as v:
        if not start_sec and not end_sec:
            idxs = sample_frames(num_frames, max(v.frame_count, 1), sample,
                                 rng=rng)
        else:
            fps = v.fps or 30.0
            start_f = max(0, int(start_sec * fps))
            end_f = min(int(end_sec * fps), max(v.frame_count, 1))
            idxs = sample_frames_start_end(num_frames, start_f, end_f,
                                           sample=sample, rng=rng)
        frames, ok = v.read_frames(idxs, pre_size)
    return _pad_to(frames, ok, num_frames), idxs


def read_image(path: str, pre_size: int = 256) -> np.ndarray:
    """Single-image reader (CC3M, TextImageDataset equivalent)."""
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise IOError(f"cannot read image {path}")
    return _resize_center_crop_cv2(img, pre_size)[None]


def load_frames_from_video_path(path: str, num_frames: int,
                                sample: str = "rand",
                                rng: Optional[np.random.Generator] = None,
                                save_dir: Optional[str] = None,
                                ) -> Tuple[np.ndarray, List[int]]:
    """Standalone raw-resolution frame loader (demo/debug helper).

    Behavioral reference: /root/reference/utils/video.py:8-40 — interval
    sampling over the whole video, frames at NATIVE resolution (no resize /
    crop, unlike the dataset readers), values scaled to [0, 1].  Differences
    by design:

      * returns channel-LAST float32 ``[T, H, W, 3]`` (the tpu-native layout
        every transform here consumes) instead of torch CHW;
      * the reference unconditionally dumps each frame to ``images/*.jpg``;
        here the dump is opt-in via ``save_dir``;
      * seeks directly to the sampled index (the reference util does too —
        only the dataset readers use the seek-to-(idx-1) quirk);
      * randomness is an explicit numpy Generator.

    Raises ``IOError`` if the video cannot be opened and ``ValueError`` if a
    sampled frame fails to decode, matching the reference's asserts.
    """
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cv2 cannot open {path}")
    try:
        vlen = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        if sample == "rand" and rng is None:
            rng = np.random.default_rng()
        frame_idxs = sample_frames(num_frames, vlen, sample, rng=rng)
        frames = []
        for index in frame_idxs:
            cap.set(cv2.CAP_PROP_POS_FRAMES, index)
            ret, frame = cap.read()
            if not ret:
                raise ValueError(f"failed to decode frame {index} of {path}")
            if save_dir is not None:
                os.makedirs(save_dir, exist_ok=True)
                cv2.imwrite(os.path.join(save_dir, f"{index}.jpg"), frame)
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        out = np.stack(frames).astype(np.float32) / 255.0
    finally:
        cap.release()
    return out, frame_idxs
