"""End-to-end train/eval tests on synthetic data with tiny towers."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egovlp_tpu.data.datasets import DatasetConfig, EgoClipDataset, EgoMCQDataset
from egovlp_tpu.data.pipeline import Loader
from egovlp_tpu.data.text import WordPieceTokenizer
from egovlp_tpu.models import (
    DualEncoder,
    DualEncoderConfig,
    TextTowerConfig,
    VideoTowerConfig,
)
from egovlp_tpu.train.state import create_train_state, make_optimizer, make_step_lr
from egovlp_tpu.train.steps import (
    make_egoclip_train_step,
    make_oscc_train_step,
    make_pnr_train_step,
)
from egovlp_tpu.train.trainer import Trainer, TrainerConfig

from tests.test_datasets import egoclip_root  # fixture reuse  # noqa: F401

RES = 32
TINY = DualEncoderConfig(
    video=VideoTowerConfig(img_size=RES, patch_size=16, embed_dim=24, depth=2,
                           num_heads=2, num_frames=4),
    text=TextTowerConfig(vocab_size=64, dim=24, n_layers=2, n_heads=2,
                         hidden_dim=48, max_position_embeddings=16),
    projection_dim=8,
)


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "#", "c", "does", "thing",
             "query", "opt"] + [str(i) for i in range(10)]
    p = tmp_path_factory.mktemp("tok") / "vocab.txt"
    p.write_text("\n".join(words))
    return str(p)


@pytest.fixture(scope="module")
def tiny_model():
    model = DualEncoder(TINY)
    video = jnp.zeros((1, 4, RES, RES, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), video,
                        jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
    return model, params


def test_step_lr_schedule():
    sched = make_step_lr(1e-3, (3, 5), steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-3)       # epoch 1
    assert float(sched(29)) == pytest.approx(1e-3)      # epoch 3 (decays after)
    assert float(sched(30)) == pytest.approx(1e-4)      # epoch 4
    assert float(sched(50)) == pytest.approx(1e-5)      # epoch 6


def test_egoclip_train_step_learns(egoclip_root, vocab_file, tiny_model):  # noqa: F811
    model, params = tiny_model
    tok = WordPieceTokenizer(vocab_file, max_length=8)
    ds = EgoClipDataset(DatasetConfig(data_dir=egoclip_root, split="train",
                                      num_frames=4, pre_size=RES,
                                      neg_param=1))
    loader = Loader(ds, batch_size=2, tokenizer=tok, num_workers=2)
    tx = make_optimizer(1e-3, (60, 80), steps_per_epoch=3)
    state = create_train_state(model, params, tx)
    step = make_egoclip_train_step(loss_type="EgoNCE", input_res=RES)

    batch = next(iter(loader.epoch(0)))
    losses = []
    for i in range(4):
        state, loss = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no learning: {losses}"


def test_donated_step_matches_undonated(egoclip_root, vocab_file, tiny_model):  # noqa: F811
    """donate=True (the production-trainer default, trainer.donate_state)
    lets XLA update params/opt-state in place; it must not change the
    math.  Two fresh-but-identical states, one per variant — a donated
    state must never be reused, so each variant gets its own."""
    model, params = tiny_model
    tok = WordPieceTokenizer(vocab_file, max_length=8)
    ds = EgoClipDataset(DatasetConfig(data_dir=egoclip_root, split="train",
                                      num_frames=4, pre_size=RES,
                                      neg_param=1))
    loader = Loader(ds, batch_size=2, tokenizer=tok, num_workers=1,
                    shuffle=False)
    batch = next(iter(loader.epoch(0)))

    losses = {}
    for donate in (False, True):
        tx = make_optimizer(1e-3, (60, 80), steps_per_epoch=3)
        # deep-copy: a donated state's buffers are deleted by the step, and
        # create_train_state aliases the param arrays it is given — donating
        # the shared fixture's params would poison later tests
        own = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
        state = create_train_state(model, own, tx)
        step = make_egoclip_train_step(loss_type="EgoNCE", input_res=RES,
                                       donate=donate)
        ls = []
        for i in range(3):
            state, loss = step(state, batch, jax.random.PRNGKey(i))
            ls.append(float(loss))
        losses[donate] = ls
    assert losses[True] == losses[False], losses


def test_egomcq_eval_runs(egoclip_root, vocab_file, tiny_model):  # noqa: F811
    from egovlp_tpu.evals.egomcq import evaluate_egomcq

    model, params = tiny_model
    tok = WordPieceTokenizer(vocab_file, max_length=8)
    ds = EgoMCQDataset(DatasetConfig(data_dir=egoclip_root, split="val",
                                     num_frames=4, pre_size=RES))
    loader = Loader(ds, batch_size=1, tokenizer=tok, num_workers=1,
                    shuffle=False, drop_last=False)
    metrics = evaluate_egomcq(model, params, loader, input_res=RES)
    assert set(metrics) == {"Intra-video", "Inter-video"}
    for v in metrics.values():
        assert 0 <= v <= 100


def test_oscc_pnr_steps(tiny_model):
    model, _ = tiny_model
    rng = np.random.default_rng(0)
    for head_dim, make in ((2, make_oscc_train_step), (16, make_pnr_train_step)):
        cfg = DualEncoderConfig(video=TINY.video, text=TINY.text,
                                projection_dim=head_dim)
        m = DualEncoder(cfg)
        video = jnp.zeros((2, 4, RES, RES, 3), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), video,
                        jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
        tx = make_optimizer(1e-3, (60,), 10)
        state = create_train_state(m, params, tx)
        step = make(input_res=RES)
        batch = {
            "frames": rng.integers(0, 255, (2, 4, RES, RES, 3)).astype(np.uint8),
            "state": np.array([1, 0], np.int32),
            "labels": np.eye(16, dtype=np.float32)[[3, 7]][:, :16],
        }
        state, loss = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(loss))


def test_trainer_loop_monitor_and_checkpoint(tmp_path, tiny_model):
    model, params = tiny_model
    tx = make_optimizer(1e-3, (60,), 1)
    state = create_train_state(model, params, tx)

    vals = iter([5.0, 7.0, 6.0, 6.5, 6.4, 6.3])

    def train_epoch(state, epoch, mlog):
        return state, {"loss_0": 1.0 / epoch}

    def valid(state, epoch, mlog):
        return {"Inter-video": next(vals)}

    tcfg = TrainerConfig(epochs=6, save_period=2, monitor="max Inter-video",
                         early_stop=2, save_dir=str(tmp_path / "ckpts"))
    trainer = Trainer(tcfg, train_epoch, valid)
    trainer.train(state)
    # early stop after epoch 5 (no improvement since epoch 2, patience 2)
    assert trainer.mnt_best == 7.0
    ckpts = os.listdir(tmp_path / "ckpts")
    assert "model_best" in ckpts
    assert any(c.startswith("checkpoint-epoch") for c in ckpts)


def test_checkpoint_roundtrip(tmp_path, tiny_model):
    from egovlp_tpu.io.checkpoints import CheckpointManager

    model, params = tiny_model
    tx = make_optimizer(1e-3, (60,), 1)
    state = create_train_state(model, params, tx)
    cm = CheckpointManager(str(tmp_path / "ck"))
    payload = {"params": state.params, "epoch": 3, "monitor_best": 0.5}
    cm.save_epoch(3, payload)
    restored = cm.restore()
    assert restored["epoch"] == 3
    leaf = jax.tree_util.tree_leaves(restored["params"])[0]
    leaf0 = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(leaf0))


def test_checkpoint_async_save_roundtrip(tmp_path, tiny_model):
    """async_save=True returns before the write lands; wait()/restore()
    synchronize, and overwriting model_best twice in flight is safe."""
    from egovlp_tpu.io.checkpoints import CheckpointManager

    model, params = tiny_model
    tx = make_optimizer(1e-3, (60,), 1)
    state = create_train_state(model, params, tx)
    cm = CheckpointManager(str(tmp_path / "ck"), async_save=True)
    for epoch in (1, 2):
        cm.save_epoch(epoch, {"params": state.params, "epoch": epoch,
                              "monitor_best": 0.5}, is_best=True)
    cm.wait()
    restored = cm.restore()  # latest = epoch 2
    assert restored["epoch"] == 2
    best = cm.restore(str(tmp_path / "ck" / "model_best"))
    assert best["epoch"] == 2
    leaf = jax.tree_util.tree_leaves(restored["params"])[0]
    leaf0 = jax.tree_util.tree_leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(leaf0))


def test_egomcq_eval_batched_matches_batch1(egoclip_root, vocab_file,  # noqa: F811
                                            tiny_model):  # noqa: F811
    """The 5-option batch-axis fold makes larger eval batches exact: the
    default val batch 8 (train/recipes.py) must reproduce the reference's
    batch-1 scores bit-for-bit at the metric level."""
    from egovlp_tpu.evals.egomcq import evaluate_egomcq

    model, params = tiny_model
    tok = WordPieceTokenizer(vocab_file, max_length=8)
    ds = EgoMCQDataset(DatasetConfig(data_dir=egoclip_root, split="val",
                                     num_frames=4, pre_size=RES))

    def run(bs):
        loader = Loader(ds, batch_size=bs, tokenizer=tok, num_workers=1,
                        shuffle=False, drop_last=False)
        return evaluate_egomcq(model, params, loader, input_res=RES)

    m1, m8 = run(1), run(8)
    assert m1 == pytest.approx(m8), (m1, m8)


def test_make_optimizer_bf16_moments():
    """optimizer.args.mu_dtype="bfloat16" stores AdamW's first moment in
    bf16 (4 bytes/param saved) while the variance stays f32; a few updates
    track the all-f32 optimizer closely."""
    import optax

    params = {"w": jnp.linspace(-1.0, 1.0, 64, dtype=jnp.float32)}
    grads = {"w": jnp.sin(jnp.arange(64, dtype=jnp.float32))}

    tx32 = make_optimizer(1e-3, (60,), 10)
    txbf = make_optimizer(1e-3, (60,), 10, mu_dtype="bfloat16")
    s32, sbf = tx32.init(params), txbf.init(params)

    mus = [l for l in jax.tree_util.tree_leaves(sbf)
           if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert mus, "no bf16 moment leaf"
    nus32 = [l for l in jax.tree_util.tree_leaves(sbf)
             if hasattr(l, "dtype") and l.dtype == jnp.float32
             and l.shape == (64,)]
    assert nus32, "variance should stay f32"

    p32, pbf = params, params
    for _ in range(3):
        u32, s32 = tx32.update(grads, s32, p32)
        ubf, sbf = txbf.update(grads, sbf, pbf)
        p32 = optax.apply_updates(p32, u32)
        pbf = optax.apply_updates(pbf, ubf)
    np.testing.assert_allclose(np.asarray(pbf["w"]), np.asarray(p32["w"]),
                               rtol=1e-2, atol=2e-5)


def test_make_optimizer_fused_matches_optax():
    """variant='fused' (adamw_fused: optax.adamw's update rule in one tree
    pass, the scripts/opt_tail_ab.py probe subject) reproduces the optax
    chain's trajectory leaf-for-leaf — with and without weight decay and
    bf16 first moment.  The bf16-mu band is looser: optax's update_moment
    computes ``b1 * mu`` IN bf16 (weak-typed scalar * bf16), rounding the
    decay product, while adamw_fused upcasts the moment first — a ~3e-4
    relative drift in fused's favor."""
    import optax

    for kw, rtol, atol in (({}, 1e-6, 1e-8),
                           ({"weight_decay": 0.01}, 1e-6, 1e-8),
                           ({"mu_dtype": "bfloat16"}, 1e-3, 5e-5)):
        params = {"w": jnp.linspace(-1.0, 1.0, 64, dtype=jnp.float32),
                  "b": jnp.cos(jnp.arange(8, dtype=jnp.float32))}
        tx_o = make_optimizer(1e-3, (60,), 10, **kw)
        tx_f = make_optimizer(1e-3, (60,), 10, variant="fused", **kw)
        s_o, s_f = tx_o.init(params), tx_f.init(params)
        p_o, p_f = params, params
        for i in range(5):
            grads = jax.tree_util.tree_map(
                lambda p, i=i: jnp.sin(p * (i + 1)), params)
            u_o, s_o = tx_o.update(grads, s_o, p_o)
            u_f, s_f = tx_f.update(grads, s_f, p_f)
            p_o = optax.apply_updates(p_o, u_o)
            p_f = optax.apply_updates(p_f, u_f)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(p_f[k]), np.asarray(p_o[k]), rtol=rtol,
                atol=atol, err_msg=f"{kw} leaf {k}")
