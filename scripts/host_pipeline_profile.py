"""Python-share profile of the host input pipeline (VERDICT r4 #2).

The native decoder supports ~85 clips/s on one core (2.9 ms thread-CPU per
frame, 8 frames per EgoClip item incl. the scene negative); the pipeline
delivers ~34-38.  This script attributes the gap:

  1. run the synthetic-corpus input pipeline and split the PROCESS CPU
     budget into native decode CPU (C runtime `ed_stats`) vs everything
     else (Python: dataset.get, pandas, collate, tokenizer, queueing);
  2. microbench the per-item / per-batch Python pieces in isolation
     (decode stubbed out) so the residual has named line items.

    python scripts/host_pipeline_profile.py      # one JSON line
"""

import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def _cpu_seconds() -> float:
    r = resource.getrusage(resource.RUSAGE_SELF)
    return r.ru_utime + r.ru_stime


def pipeline_split(n_batches: int = 24, warmup: int = 4,
                   batch_size: int = 16, workers: int = 12) -> dict:
    """Native-vs-Python CPU split over the steady-state batch window only
    (corpus encode + warmup excluded).  `clips_per_cpu_sec` is the
    host-load-independent figure of merit on this shared 1-core host."""
    from e2e_throughput import make_corpus

    from egovlp_tpu.data import native
    from egovlp_tpu.data.datasets import DatasetConfig, EgoClipDataset
    from egovlp_tpu.data.pipeline import Loader
    from egovlp_tpu.data.text import WordPieceTokenizer

    root = tempfile.mkdtemp(prefix="egoclip_synth_")
    make_corpus(root)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "#", "c", "does", "action",
             "in", "video"] + [str(i) for i in range(20)]
    vocab_path = os.path.join(root, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(vocab))
    ds = EgoClipDataset(DatasetConfig(
        data_dir=root, split="train", num_frames=4, pre_size=256,
        loading="strict", neg_param=60,
    ))
    loader = Loader(ds, batch_size=batch_size,
                    tokenizer=WordPieceTokenizer(vocab_path, max_length=30),
                    num_workers=workers, prefetch_batches=6, seed=0)

    done, t0, cpu0 = 0, None, None
    epoch = 0
    while done < n_batches:
        for batch in loader.epoch(epoch):
            done += 1
            if done == warmup:
                native.decode_stats(reset=True)
                cpu0, t0 = _cpu_seconds(), time.perf_counter()
            if done >= n_batches:
                break
        epoch += 1
    wall = time.perf_counter() - t0
    cpu = _cpu_seconds() - cpu0
    loader.close()
    st = native.decode_stats(reset=True)
    native_cpu = st["open_s"] + st["seek_s"] + st["decode_s"] + st["sws_s"]
    clips = batch_size * (n_batches - warmup)
    return {
        "clips_per_sec": round(clips / wall, 2),
        "clips_per_cpu_sec": round(clips / max(cpu, 1e-9), 2),
        "workers": workers,
        "host_cpus": os.cpu_count(),
        "wall_s": round(wall, 2),
        "process_cpu_s": round(cpu, 2),
        "native_cpu_s": round(native_cpu, 2),
        "python_cpu_s": round(cpu - native_cpu, 2),
        "python_share_of_cpu": round((cpu - native_cpu) / max(cpu, 1e-9), 3),
        "cpu_utilization": round(cpu / wall, 3),
    }


def python_line_items(n_items: int = 256, batch_size: int = 16) -> dict:
    """Per-item / per-batch cost of each Python piece, decode stubbed."""
    from e2e_throughput import make_corpus

    from egovlp_tpu.data.datasets import DatasetConfig, EgoClipDataset
    from egovlp_tpu.data.pipeline import collate
    from egovlp_tpu.data.text import WordPieceTokenizer

    root = tempfile.mkdtemp(prefix="egoclip_synth_")
    make_corpus(root)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "#", "c", "does", "action",
             "in", "video"] + [str(i) for i in range(20)]
    vocab_path = os.path.join(root, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(vocab))

    ds = EgoClipDataset(DatasetConfig(
        data_dir=root, split="train", num_frames=4, pre_size=256,
        loading="strict", neg_param=60,
    ))
    rng = np.random.default_rng(0)
    out = {}

    # (a) dataset.get WITHOUT decode: metadata lookup + tags + neg choice
    frames = np.zeros((4, 256, 256, 3), np.uint8)
    orig = EgoClipDataset._read_clip
    EgoClipDataset._read_clip = lambda self, sample, rng: frames
    try:
        t0 = time.perf_counter()
        items = [ds.get(i % len(ds), rng) for i in range(n_items)]
        out["get_no_decode_us_per_item"] = round(
            (time.perf_counter() - t0) / n_items * 1e6, 1)
    finally:
        EgoClipDataset._read_clip = orig

    # (b) collate + channel fold (+ tokenize, measured separately below)
    tok = WordPieceTokenizer(vocab_path, max_length=30)
    batch_items = items[:batch_size]
    reps = max(n_items // batch_size, 1)
    t0 = time.perf_counter()
    for _ in range(reps):
        collate(batch_items, tokenizer=None)
    out["collate_us_per_item"] = round(
        (time.perf_counter() - t0) / (reps * batch_size) * 1e6, 1)

    texts = [it["text"] for it in batch_items] * 2  # text + text_neg
    t0 = time.perf_counter()
    for _ in range(reps):
        tok(texts)
    out["tokenize_us_per_item"] = round(
        (time.perf_counter() - t0) / (reps * batch_size) * 1e6, 1)

    # (c) the no-op ctypes surface: acquire/release + read_frames call
    # overhead on a cached handle decoding ONE frame (the floor of a hop)
    from egovlp_tpu.data import native as nat
    from egovlp_tpu.data.readers import acquire_video, release_video

    if nat.available():
        path = os.path.join(root, "vid_0", "0.mp4")
        v = acquire_video(path)
        v.read_frames([0], 256)
        t0 = time.perf_counter()
        for _ in range(200):
            v.read_frames([0], 256)  # cached current frame, no decode
        out["ctypes_hop_us"] = round((time.perf_counter() - t0) / 200 * 1e6, 1)
        release_video(path, "auto", v)

    return out


def main():
    split = pipeline_split()
    lines = python_line_items()
    print(json.dumps({
        "metric": "host_pipeline_python_share",
        "split": split,
        "line_items_us": lines,
    }))


if __name__ == "__main__":
    main()
