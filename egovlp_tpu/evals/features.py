"""Dense feature extraction for Ego4D NLQ / MQ episodic memory.

Behavioral reference: run/test_nlq.py:17-113 and run/test_mq.py:17-89 —
per clip, dense frames are reshaped into ``num_frames``-sized windows,
``compute_video`` runs in micro-batches, and features are saved per
``clip_uid``; text mode embeds each query (CLS-pooled or token-level).

Output formats: ``.npy`` per clip (framework-neutral); ``save_format=
'pt'`` additionally writes torch tensors compatible with the reference's
downstream VSLNet/VSGN consumers, when torch is importable.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from egovlp_tpu.train.steps import make_video_embed_step


def _save(path: Path, array: np.ndarray, save_format: str):
    if save_format == "pt":
        import torch

        torch.save(torch.from_numpy(np.ascontiguousarray(array)),
                   str(path.with_suffix(".pt")))
    else:
        np.save(path.with_suffix(".npy"), array)


def extract_video_features(model, params, dataset, out_dir: str,
                           num_frames: int = 4, input_res: int = 224,
                           micro_batch: int = 4, save_format: str = "npy",
                           progress: bool = False):
    """dataset: NLQ/MQ dataset in subsample='video' mode.  Dense frames are
    chunked into [n_windows, num_frames, ...] and encoded in micro-batches
    of ``micro_batch`` windows (reference test_nlq.py:70-88)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    video_embed = make_video_embed_step(input_res)

    indices = range(len(dataset))
    if progress:
        import tqdm

        indices = tqdm.tqdm(indices)
    rng = np.random.default_rng(0)
    for i in indices:
        item = dataset.get(i, rng)
        frames = item["frames"]
        n = (frames.shape[0] // num_frames) * num_frames
        if n == 0:
            continue
        windows = frames[:n].reshape(-1, num_frames, *frames.shape[1:])
        feats = []
        for j in range(0, len(windows), micro_batch):
            chunk = windows[j:j + micro_batch]
            pad = micro_batch - len(chunk)  # static batch for XLA
            if pad:
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
            f = np.asarray(video_embed(model.apply, params, chunk))
            feats.append(f[: micro_batch - pad] if pad else f)
        _save(out / item["meta"]["clip_uid"], np.concatenate(feats),
              save_format)


def extract_text_features(model, params, dataset, tokenizer, out_dir: str,
                          token_level: bool = False,
                          save_format: str = "npy", progress: bool = False):
    """dataset: NLQ dataset in subsample='text' mode; one feature file per
    query (reference test_nlq.py:94-113)."""
    import functools

    import jax

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    @functools.partial(jax.jit, static_argnums=(0,))
    def embed_tokens(apply_fn, params, ids, mask):
        return apply_fn({"params": params}, ids, mask,
                        method="encode_text_tokens", deterministic=True)

    @functools.partial(jax.jit, static_argnums=(0,))
    def embed_cls(apply_fn, params, ids, mask):
        return apply_fn({"params": params}, ids, mask,
                        method="encode_text", deterministic=True)

    indices = range(len(dataset))
    if progress:
        import tqdm

        indices = tqdm.tqdm(indices)
    rng = np.random.default_rng(0)
    counter = {}
    for i in indices:
        item = dataset.get(i, rng)
        ids, mask = tokenizer([item["text"]])
        fn = embed_tokens if token_level else embed_cls
        feat = np.asarray(fn(model.apply, params, ids, mask))[0]
        clip_uid = item["meta"]["clip_uid"]
        k = counter.get(clip_uid, 0)
        counter[clip_uid] = k + 1
        _save(out / f"{clip_uid}_sentence_{k}", feat, save_format)
