"""Committed golden END-TO-END EgoMCQ eval fixture (VERDICT r2 item 6).

tests/fixtures/golden_egomcq.npz (built once by
scripts/make_golden_eval_fixture.py, torch side) records per-item 5-option
similarity rows and grouped accuracies computed with REFERENCE semantics
over the golden converted checkpoint.  This test runs the repo's REAL eval
chain — in-memory dataset -> Loader (collate + channel fold + _index) ->
eval_resize -> encode -> scores -> metric — without torch, and must
reproduce the recording.  Drift anywhere in the data->model->metric chain
fails here, not just in per-stage parity tests.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egovlp_tpu.data.pipeline import Loader
from egovlp_tpu.models import DualEncoder
from egovlp_tpu.models.convert import dual_encoder_params

from tests.test_golden_convert import CFG, FIXTURE as CKPT_FIXTURE

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_egomcq.npz")


class _McqFixtureDataset:
    """Loader-protocol dataset over the committed MCQ items (the committed
    ids/mask stand in for the tokenizer, which has its own parity tests)."""

    def __init__(self, data):
        self.d = data
        from egovlp_tpu.data.datasets.base import DatasetConfig

        self.cfg = DatasetConfig(split="val", num_frames=4)

    def __len__(self):
        return len(self.d["correct"])

    def get(self, idx, rng):
        return {
            "frames_options": self.d["frames"][idx],  # [5, T, H, W, 3] u8
            "text_ids": self.d["ids"][idx],
            "text_mask": self.d["mask"][idx],
            "correct": np.int64(self.d["correct"][idx]),
            "type": np.int64(self.d["types"][idx]),
        }


@pytest.fixture(scope="module")
def golden():
    data = np.load(FIXTURE)
    ckpt = np.load(CKPT_FIXTURE)
    sd = {k[len("sd/"):]: ckpt[k] for k in ckpt.files if k.startswith("sd/")}
    model = DualEncoder(CFG)
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 12), jnp.int32), jnp.ones((1, 12), jnp.int32),
    )["params"]
    params = dual_encoder_params(sd, CFG, template)
    return model, params, data


def test_golden_egomcq_metrics_via_real_eval_path(golden):
    from egovlp_tpu.evals.egomcq import evaluate_egomcq

    model, params, data = golden
    loader = Loader(_McqFixtureDataset(data), batch_size=3, num_workers=1,
                    shuffle=False, drop_last=False)
    m = evaluate_egomcq(model, params, loader, input_res=32)
    assert m["Intra-video"] == pytest.approx(float(data["metric_intra"]))
    assert m["Inter-video"] == pytest.approx(float(data["metric_inter"]))


def test_golden_egomcq_scores_match_recorded(golden):
    """Per-item similarity rows, not just the discrete accuracies."""
    from egovlp_tpu.data.pipeline import collate
    from egovlp_tpu.evals.egomcq import _mcq_scores

    model, params, data = golden
    items = [_McqFixtureDataset(data).get(i, None)
             for i in range(len(data["correct"]))]
    batch = collate(items)
    scores = np.asarray(_mcq_scores(model.apply, params, {
        "frames_options": batch["frames_options"],
        "text_ids": batch["text_ids"],
        "text_mask": batch["text_mask"],
    }, 32))
    np.testing.assert_allclose(scores, data["scores"], rtol=5e-4, atol=5e-4)
