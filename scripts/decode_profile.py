"""Host input-pipeline decode profile (VERDICT r3 #2).

Runs the synthetic-EgoClip input pipeline (decode -> collate -> fold, no
device) at several worker counts, with the per-thread open-handle cache on
vs off, and reports the C runtime's per-phase budget (container open+probe
/ av_seek / codec decode / swscale+crop) via `native.decode_stats()`.

    python scripts/decode_profile.py            # full sweep, one JSON line
    EGOVLP_READER_CACHE=0 python ...            # force-off comparison point
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def run(cache_cap: int, n_batches: int = 24, workers: int = 12) -> dict:
    """One measurement at a given per-thread handle-cache capacity."""
    from egovlp_tpu.data import native, readers

    # capacity is read at import time; patch the live module instead of
    # re-importing (workers pick it up because they call the same funcs)
    readers._CACHE_CAP = cache_cap
    if hasattr(readers._tls, "videos"):
        for v in readers._tls.videos.values():
            v.close()
        readers._tls.videos.clear()

    from e2e_throughput import measure_input_pipeline

    native.decode_stats(reset=True)
    m = measure_input_pipeline(n_batches=n_batches, warmup=4,
                               num_workers=workers)
    st = native.decode_stats(reset=True)
    out = {"cache_cap": cache_cap, **m}
    if st:
        # per-output-frame phase costs in ms (thread-summed CPU time)
        n = max(st["n_frames_out"], 1)
        out.update({
            "n_open": st["n_open"],
            "n_frames_out": st["n_frames_out"],
            "decoded_per_out": round(st["n_frames_decoded"] / n, 2),
            "open_ms_per_frame": round(st["open_s"] / n * 1e3, 3),
            "seek_ms_per_frame": round(st["seek_s"] / n * 1e3, 3),
            "decode_ms_per_frame": round(st["decode_s"] / n * 1e3, 3),
            "sws_ms_per_frame": round(st["sws_s"] / n * 1e3, 3),
        })
    return out


def main():
    results = [run(cache_cap=0), run(cache_cap=4)]
    base, cached = results[0], results[1]
    print(json.dumps({
        "metric": "input_pipeline_decode_profile",
        "no_cache": base,
        "cache4": cached,
        "cache_speedup": round(
            cached["clips_per_sec"] / max(base["clips_per_sec"], 1e-9), 3),
    }))


if __name__ == "__main__":
    main()
