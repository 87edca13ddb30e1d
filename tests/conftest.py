"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip logic (sharded training step, gathered contrastive loss) is
validated without TPU hardware by forcing the host platform to expose 8
fake devices — the pattern recommended in SURVEY.md §4(c).

Note: the environment may pre-import jax with a TPU platform plugin via
sitecustomize, so setting JAX_PLATFORMS in os.environ is not enough — the
jax config must be updated after import and before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    """Build the native decoder if missing (it is a build artifact, not
    tracked in git); readers fall back to cv2 when the build fails."""
    import pathlib
    import subprocess

    root = pathlib.Path(__file__).parent.parent
    so = root / "native" / "libegodecode.so"
    if not so.exists():
        subprocess.run(["make", "-C", str(root / "native")], check=False)
