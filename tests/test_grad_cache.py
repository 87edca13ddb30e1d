"""GradCache gradient accumulation (train/grad_cache.py): the two-pass
scheme must reproduce the monolithic full-batch gradient exactly — the
whole point is that it is NOT an approximation, unlike naive accumulation
(which is simply wrong for batch-coupled contrastive losses)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egovlp_tpu.train.grad_cache import grad_cache_value_and_grad


def _coupled_loss(emb):
    """An InfoNCE-style loss coupling every row with every other."""
    t, v = emb
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    sim = t @ v.T / 0.05
    return -jnp.mean(jnp.diag(jax.nn.log_softmax(sim, axis=-1)))


def test_grad_cache_matches_monolithic(rng):
    B, D, H = 8, 6, 5
    params = {"w_t": jnp.asarray(rng.normal(size=(D, H)), jnp.float32),
              "w_v": jnp.asarray(rng.normal(size=(D, H)), jnp.float32)}
    batch = {"x_t": jnp.asarray(rng.normal(size=(B, D)), jnp.float32),
             "x_v": jnp.asarray(rng.normal(size=(B, D)), jnp.float32)}

    def embed_fn(p, mb, key):
        return jnp.tanh(mb["x_t"] @ p["w_t"]), jnp.tanh(mb["x_v"] @ p["w_v"])

    def direct(p):
        return _coupled_loss(embed_fn(p, batch, None))

    want_loss, want_grads = jax.value_and_grad(direct)(params)

    for k in (1, 2, 4):
        vg = jax.jit(grad_cache_value_and_grad(embed_fn, _coupled_loss, k))
        loss, grads = vg(params, batch)
        assert float(loss) == pytest.approx(float(want_loss), rel=1e-6), k
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            grads, want_grads)


def test_grad_cache_divisibility_error(rng):
    vg = grad_cache_value_and_grad(
        lambda p, mb, k: mb["x"] @ p, lambda e: jnp.sum(e * e), 3)
    with pytest.raises(ValueError, match="divisible"):
        vg(jnp.eye(4), {"x": jnp.ones((8, 4))})


def test_egoclip_step_grad_accum_matches(egoclip_synth_batch, tiny_state):
    """The production EgoClip step with trainer.grad_accum=2 produces the
    same loss AND the same updated parameters as the monolithic step
    (dropout rates are 0 in the parity config, so the split dropout keys
    cannot diverge the comparison)."""
    from egovlp_tpu.train.steps import make_egoclip_train_step

    make_state, batch = tiny_state, egoclip_synth_batch
    results = {}
    for k in (1, 2):
        state = make_state()
        step = make_egoclip_train_step(loss_type="EgoNCE", input_res=32,
                                       n_micro=k)
        new_state, loss = step(state, batch, jax.random.PRNGKey(0))
        results[k] = (float(loss), new_state.params)

    assert results[1][0] == pytest.approx(results[2][0], rel=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        results[1][1], results[2][1])


def test_ring_plus_grad_accum_rejected():
    from egovlp_tpu.train.steps import make_egoclip_train_step

    with pytest.raises(ValueError, match="ring"):
        make_egoclip_train_step(global_sim="ring", n_micro=2)


# ---------------------------------------------------------------------------
# fixtures: a tiny dual encoder state factory + a synthetic egoclip batch
# (negatives included, so the concat-then-split path is exercised)
# ---------------------------------------------------------------------------

@pytest.fixture()
def tiny_state():
    from egovlp_tpu.models import (
        DualEncoder,
        DualEncoderConfig,
        TextTowerConfig,
        VideoTowerConfig,
    )
    from egovlp_tpu.train.state import create_train_state

    res = 32
    cfg = DualEncoderConfig(
        video=VideoTowerConfig(img_size=res, patch_size=16, embed_dim=24,
                               depth=2, num_heads=2, num_frames=4),
        text=TextTowerConfig(vocab_size=64, dim=24, n_layers=2, n_heads=2,
                             hidden_dim=48, max_position_embeddings=16),
        projection_dim=8,
    )
    model = DualEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, res, res, 3), jnp.float32),
                        jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]

    def make():
        import optax

        own = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                     params)
        # SGD, not AdamW: the updated params then differ by lr * d(grad),
        # so the k=1 vs k=2 comparison measures gradient agreement
        # directly.  AdamW's eps-normalized update lr*g/(|g|+eps) is
        # hypersensitive around |g| ~ eps (the zero-init time-attention
        # leaves), amplifying float-reduction noise ~1e4x.
        return create_train_state(model, own, optax.sgd(1e-3))

    return make


@pytest.fixture()
def egoclip_synth_batch(rng):
    res, B = 32, 4  # with negatives the embedded batch is 8 -> splits by 2
    return {
        "frames": rng.integers(0, 255, (B, 4, res, res, 3)).astype(np.uint8),
        "frames_neg": rng.integers(0, 255, (B, 4, res, res, 3)).astype(np.uint8),
        "text_ids": rng.integers(0, 64, (B, 8)).astype(np.int32),
        "text_mask": np.ones((B, 8), np.int32),
        "text_neg_ids": rng.integers(0, 64, (B, 8)).astype(np.int32),
        "text_neg_mask": np.ones((B, 8), np.int32),
        "noun_vec": np.eye(B, 582, dtype=np.float32),
        "verb_vec": np.eye(B, 118, dtype=np.float32),
        "noun_vec_neg": np.eye(B, 582, dtype=np.float32),
        "verb_vec_neg": np.eye(B, 118, dtype=np.float32),
    }
