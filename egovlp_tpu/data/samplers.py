"""Frame-index samplers (pure functions).

Behavioral reference: /root/reference/base/base_dataset.py:174-218.  The
clip duration is divided into ``num_frames`` equal intervals; training picks
a random index inside each interval, evaluation the midpoint.  Quirks kept
for parity (and documented):

  * the random pick excludes the last index of each interval
    (``random.choice(range(lo, hi))`` with hi = next_boundary - 1);
  * `sample_frames_start_end` clamps the frame count by ``min(num_frames,
    end)`` — the END FRAME INDEX, not the span length (base_dataset.py:204);
  * empty intervals (consecutive equal boundaries) fall back to the lower
    boundary instead of crashing like the reference would.

Randomness is explicit (numpy Generator) — no global RNG, so input
pipelines are reproducible per worker/epoch.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def _intervals(start: float, stop: float, n: int) -> np.ndarray:
    return np.linspace(start=start, stop=stop, num=n + 1).astype(int)


def _pick(lo: int, hi: int, sample: str, fix_start: Optional[int],
          rng: Optional[np.random.Generator]) -> int:
    """Pick an index in [lo, hi] following the reference's convention where
    hi = next_boundary - 1."""
    if fix_start is not None:
        return lo + int(fix_start)
    if sample == "rand":
        if hi <= lo:
            return lo
        assert rng is not None, "rand sampling requires an rng"
        return int(rng.integers(lo, hi))  # excludes hi, like the reference
    if sample == "uniform":
        return (lo + hi) // 2
    raise NotImplementedError(sample)


def sample_frames(num_frames: int, vlen: int, sample: str = "rand",
                  fix_start: Optional[int] = None,
                  rng: Optional[np.random.Generator] = None) -> List[int]:
    """Sample up to ``num_frames`` indices from a video of ``vlen`` frames."""
    acc = min(num_frames, vlen)
    iv = _intervals(0, vlen, acc)
    return [
        _pick(iv[i], iv[i + 1] - 1, sample, fix_start, rng)
        for i in range(acc)
    ]


def sample_frames_start_end(num_frames: int, start: int, end: int,
                            sample: str = "rand",
                            fix_start: Optional[int] = None,
                            rng: Optional[np.random.Generator] = None) -> List[int]:
    """Sample within [start, end] frame bounds (base_dataset.py:203-218)."""
    acc = min(num_frames, end)  # reference quirk: min with the END index
    iv = _intervals(start, end, acc)
    return [
        _pick(iv[i], iv[i + 1] - 1, sample, fix_start, rng)
        for i in range(acc)
    ]


def sample_frames_clips(start: int, end: int, vlen: int,
                        acc_samples: int) -> List[int]:
    """Uniform midpoints within clamped [start, end] (base_dataset.py:191-201;
    used by the decord start/end reader for NLQ/MQ dense windows)."""
    start = max(0, start)
    end = min(vlen, end)
    iv = _intervals(start, end, int(acc_samples))
    return [(iv[i] + iv[i + 1] - 1) // 2 for i in range(int(acc_samples))]
