"""True multi-process distributed smoke test: 2 JAX processes x 2 CPU
devices run one sharded EgoClip train step (the multi-host data path the
reference covers with torch DDP + DistributedSampler)."""

import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_step():
    worker = Path(__file__).parent / "multihost_worker.py"
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    losses = [re.search(r"LOSS=([-\d.]+)", o) for o in outs]
    assert all(losses), outs
    l0, l1 = (float(m.group(1)) for m in losses)
    # both processes computed the SAME global-batch loss
    assert abs(l0 - l1) < 1e-5, (l0, l1)
