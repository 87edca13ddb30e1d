"""MCQ eval throughput attribution (VERDICT r4 #5).

bench.py's ``mcq_eval_items_per_sec`` (~78 on the r4 chip session) times
``_mcq_scores`` on a DEVICE-RESIDENT batch — it is the device bound.  The
full EgoMCQ eval also (a) decodes 5 video options per item on the host
and (b) ships the [B, 5, T, P, P*3] uint8 batch to the device.  This
script measures (a) on the synthetic B-frame corpus with the native
decoder's phase counters, so the eval's end-to-end rate has a named
bound per stage:

  host:   items/s through the real EgoMCQ Loader (decode 5 options +
          tokenize 6 texts + collate), native-vs-Python CPU split
  device: bench.py's mcq_eval_items_per_sec (device-resident batch)
  h2d:    20 frames x pre^2 x 3 bytes/item over the measured link
          (bench.py h2d_gbps; ~0.04 GB/s tunnel here, ~10 GB/s DMA on a
          production host)

    python scripts/mcq_eval_profile.py          # one JSON line
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


def make_mcq_meta(root, n_items=96, n_videos=12, intra_ratio=0.5):
    """egomcq.json over the e2e corpus: `intra_ratio` of items draw all 5
    options from ONE video (EgoMCQ type 1, 'Intra-video'), the rest from 5
    different videos (type 2) — mirroring the reference split's two
    question types."""
    rng = np.random.default_rng(7)
    mcq = {}
    for q in range(n_items):
        intra = rng.random() < intra_ratio
        if intra:
            vid = int(rng.integers(n_videos))
            vids = [vid] * 5
        else:
            vids = list(rng.choice(n_videos, size=5, replace=False))
        starts = rng.uniform(0.2, 6.0, size=5)
        mcq[str(q)] = {
            "query": {"video_uid": f"vid_{vids[0]}",
                      "clip_start": float(starts[0]),
                      "clip_end": float(starts[0]) + 1.0,
                      "clip_text": f"query {q}"},
            "choices": {
                str(i): {"video_uid": f"vid_{vids[i]}",
                         "clip_start": float(starts[i]),
                         "clip_end": float(starts[i]) + 1.0,
                         "clip_text": f"option {i} of {q}"}
                for i in range(5)
            },
            "answer": int(rng.integers(5)),
            "types": 1 if intra else 2,
        }
    with open(os.path.join(root, "egomcq.json"), "w") as f:
        json.dump(mcq, f)


def main():
    from e2e_throughput import make_corpus

    from egovlp_tpu.data import native
    from egovlp_tpu.data.datasets import DatasetConfig, EgoMCQDataset
    from egovlp_tpu.data.pipeline import Loader
    from egovlp_tpu.data.text import WordPieceTokenizer

    root = tempfile.mkdtemp(prefix="egomcq_synth_")
    make_corpus(root)
    make_mcq_meta(root)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "#", "c", "query", "option",
             "of"] + [str(i) for i in range(20)]
    vocab_path = os.path.join(root, "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(vocab))

    ds = EgoMCQDataset(DatasetConfig(
        data_dir=root, meta_dir=root, split="val", num_frames=4,
        pre_size=256, loading="strict",
    ))
    tok = WordPieceTokenizer(vocab_path, max_length=30)
    loader = Loader(ds, batch_size=8, tokenizer=tok, num_workers=12,
                    shuffle=False, drop_last=False)

    # warm one FULL epoch (handle caches, pandas, thread pool).  Breaking
    # after the first batch would leave the prefetch window's in-flight
    # items draining in the pool — their decode CPU would land inside the
    # timed epoch-1 window and inflate native_cpu_s (r5 review finding).
    for _ in loader.epoch(0):
        pass

    native.decode_stats(reset=True)
    cpu0, t0 = _cpu_seconds(), time.perf_counter()
    n_items = 0
    for batch in loader.epoch(1):
        n_items += int(batch["frames_options"].shape[0])
    wall = time.perf_counter() - t0
    cpu = _cpu_seconds() - cpu0
    st = native.decode_stats(reset=True)
    native_s = (st.get("open_s", 0.0) + st.get("seek_s", 0.0)
                + st.get("decode_s", 0.0) + st.get("sws_s", 0.0))
    frames = st.get("n_frames_out", 0)

    out = {
        "metric": "mcq_eval_host_items_per_sec",
        "value": round(n_items / wall, 2),
        "items": n_items,
        "wall_s": round(wall, 2),
        "process_cpu_s": round(cpu, 2),
        "native_cpu_s": round(native_s, 2),
        "python_cpu_s": round(max(cpu - native_s, 0.0), 2),
        "python_share_of_cpu": round(max(cpu - native_s, 0.0) / cpu, 3)
        if cpu else None,
        "frames_decoded": int(frames),
        "ms_native_per_frame": round(native_s / frames * 1e3, 2)
        if frames else None,
        "native_phases_s": {k: round(st.get(k, 0.0), 2)
                            for k in ("open_s", "seek_s", "decode_s",
                                      "sws_s")},
        "n_seek": st.get("n_seek", 0),
        "n_frames_decoded": st.get("n_frames_decoded", 0),
        "n_frames_skipped": st.get("n_frames_skipped", 0),
        "host_cpus": os.cpu_count(),
        "note": "device bound = bench.py mcq_eval_items_per_sec; "
                "h2d/item = 5*T*pre*pre*3 bytes over bench.py h2d_gbps",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
