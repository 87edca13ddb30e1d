"""Composed train-step parity vs torch autograd.

The reference's actual training math is the COMPOSITION dual-encoder
forward -> sim_matrix -> EgoNCE -> backward -> transformers.AdamW
(/root/reference/trainer/trainer_egoclip.py:82-180, model/loss.py:27-53,
run/train_egoclip.py:72-73).  The pieces are individually golden-tested
elsewhere (towers in test_convert.py, losses in test_objectives.py); this
file closes the gap by asserting the composed LOSS + GRADIENT + PARAMETER
TRAJECTORY against an independent torch implementation over several
optimizer steps on converted-identical weights — so any composed-math
divergence is caught before real published weights ever arrive.

World size is 1, so the reference's AllGather_multi is the identity and
the single-process composition below IS the reference step.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

torch = pytest.importorskip("torch")

from egovlp_tpu.models import (
    DualEncoder,
    DualEncoderConfig,
    TextTowerConfig,
    VideoTowerConfig,
    sim_matrix,
)
from egovlp_tpu.models.convert import dual_encoder_params
from egovlp_tpu.objectives import egonce
from egovlp_tpu.train.state import make_optimizer
from tests.torch_oracle import random_space_time_state_dict, space_time_forward

B = 5
FRAMES = 4
LR = 1e-3  # large enough that 5 steps move params well above f32 noise
STEPS = 5

VCFG = VideoTowerConfig(img_size=32, patch_size=16, embed_dim=24, depth=2,
                        num_heads=2, num_frames=FRAMES)
TCFG = TextTowerConfig(vocab_size=100, dim=32, n_layers=2, n_heads=4,
                       hidden_dim=64, max_position_embeddings=48)
CFG = DualEncoderConfig(video=VCFG, text=TCFG, projection_dim=8)


# --------------------------------------------------------------------------
# torch side: functional dual encoder + EgoNCE + transformers.AdamW math
# --------------------------------------------------------------------------

def _torch_sim_matrix(a, b, eps=1e-8):
    a_n = a / a.norm(dim=1, keepdim=True).clamp(min=eps)
    b_n = b / b.norm(dim=1, keepdim=True).clamp(min=eps)
    return a_n @ b_n.t()


def _torch_egonce(sim, mask_v, mask_n, t=0.05):
    n = sim.shape[0]
    mask = ((mask_v * mask_n + torch.eye(n)) > 0).float()
    i = torch.log((torch.softmax(sim / t, dim=1) * mask).sum(1)).mean()
    j = torch.log((torch.softmax(sim.t() / t, dim=1) * mask.t()).sum(1)).mean()
    return -(i + j)


class TorchDualEncoder:
    """State-dict-driven torch dual encoder (leaves carry requires_grad)."""

    def __init__(self, rng):
        from transformers import DistilBertConfig, DistilBertModel

        torch.manual_seed(0)  # DistilBertModel init uses torch's global rng
        hf_cfg = DistilBertConfig(
            vocab_size=TCFG.vocab_size, dim=TCFG.dim, n_layers=TCFG.n_layers,
            n_heads=TCFG.n_heads, hidden_dim=TCFG.hidden_dim,
            max_position_embeddings=TCFG.max_position_embeddings,
            dropout=0.0, attention_dropout=0.0,
        )
        self.txt_model = DistilBertModel(hf_cfg).eval()
        self.vid_sd = random_space_time_state_dict(
            rng, dim=VCFG.embed_dim, depth=VCFG.depth, heads=VCFG.num_heads,
            num_frames=FRAMES, patches_per_frame=VCFG.patches_per_frame,
        )
        for v in self.vid_sd.values():
            v.requires_grad_(True)
        d = CFG.projection_dim
        t = lambda *s: torch.tensor(
            rng.normal(scale=0.1, size=s), dtype=torch.float32,
            requires_grad=True)
        self.heads = {
            "txt_proj.1.weight": t(d, TCFG.dim),
            "txt_proj.1.bias": t(d),
            "vid_proj.0.weight": t(d, VCFG.embed_dim),
            "vid_proj.0.bias": t(d),
        }

    def leaves(self):
        """name -> leaf tensor, named in reference checkpoint convention."""
        out = {f"video_model.{k}": v for k, v in self.vid_sd.items()}
        for k, v in self.txt_model.named_parameters():
            out[f"text_model.{k}"] = v
        out.update(self.heads)
        return out

    def forward(self, video, ids, mask):
        """video [B,T,3,H,W] -> (text_emb, vid_emb), differentiable."""
        hidden = self.txt_model(input_ids=ids, attention_mask=mask
                                ).last_hidden_state[:, 0]
        h = self.heads
        t = torch.relu(hidden) @ h["txt_proj.1.weight"].t() + h["txt_proj.1.bias"]
        feat = space_time_forward(
            self.vid_sd, video, num_frames=FRAMES, heads=VCFG.num_heads,
            depth=VCFG.depth, patch_size=VCFG.patch_size,
        )
        v = feat @ h["vid_proj.0.weight"].t() + h["vid_proj.0.bias"]
        return t, v


class TorchReferenceAdamW:
    """transformers.AdamW (4.2.1) update rule, written from its spec:
    m/v EMA -> denom = sqrt(v) + eps (eps BEFORE bias correction) ->
    step_size = lr * sqrt(1-b2^t)/(1-b1^t) -> decoupled wd on the UPDATED
    param.  Implemented by hand so the oracle does not depend on the
    installed transformers version still shipping AdamW."""

    def __init__(self, leaves, lr, b1=0.9, b2=0.999, eps=1e-6, wd=0.0):
        self.leaves, self.lr, self.b1, self.b2, self.eps, self.wd = (
            leaves, lr, b1, b2, eps, wd)
        self.m = {k: torch.zeros_like(v) for k, v in leaves.items()}
        self.v = {k: torch.zeros_like(v) for k, v in leaves.items()}
        self.t = 0

    @torch.no_grad()
    def step(self):
        self.t += 1
        bc = math.sqrt(1 - self.b2 ** self.t) / (1 - self.b1 ** self.t)
        for k, p in self.leaves.items():
            g = p.grad
            self.m[k].mul_(self.b1).add_(g, alpha=1 - self.b1)
            self.v[k].mul_(self.b2).addcmul_(g, g, value=1 - self.b2)
            p.addcdiv_(self.m[k], self.v[k].sqrt() + self.eps,
                       value=-self.lr * bc)
            if self.wd:
                p.add_(p, alpha=-self.lr * self.wd)

    def zero_grad(self):
        for p in self.leaves.values():
            p.grad = None


# --------------------------------------------------------------------------
# shared fixtures
# --------------------------------------------------------------------------

def _batch(rng):
    video = rng.normal(size=(B, FRAMES, VCFG.img_size, VCFG.img_size, 3)
                       ).astype(np.float32)
    ids = rng.integers(0, TCFG.vocab_size, size=(B, 12)).astype(np.int64)
    mask = np.ones((B, 12), np.int64)
    mask[:, 9:] = 0
    nouns = rng.integers(0, 3, size=B)
    verbs = rng.integers(0, 2, size=B)
    mask_n = (nouns[:, None] == nouns[None, :]).astype(np.float32)
    mask_v = (verbs[:, None] == verbs[None, :]).astype(np.float32)
    return video, ids, mask, mask_v, mask_n


def _grads_to_tree(grad_sd, params):
    """Map a torch-convention gradient dict through the SAME converter the
    weights use.  The template is all-NaN so any converter fallback (a key
    the torch side failed to produce) poisons the comparison loudly instead
    of passing vacuously."""
    nan_template = jax.tree_util.tree_map(
        lambda x: np.full(np.shape(x), np.nan, np.float32), params)
    return dual_encoder_params(grad_sd, CFG, nan_template)


def _run_jax(params, batch, tx, steps=STEPS):
    video, ids, mask, mask_v, mask_n = batch
    model = DualEncoder(CFG)
    video, ids, mask = (jnp.asarray(video), jnp.asarray(ids, jnp.int32),
                        jnp.asarray(mask, jnp.int32))
    mask_v, mask_n = jnp.asarray(mask_v), jnp.asarray(mask_n)

    def loss_fn(p):
        t, v = model.apply({"params": p}, video, ids, mask,
                           deterministic=True)
        return egonce(sim_matrix(t, v), mask_v, mask_n)

    @jax.jit
    def step(p, o):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss, grads

    opt_state = tx.init(params)
    losses, first_grads = [], None
    for _ in range(steps):
        params, opt_state, loss, grads = step(params, opt_state)
        if first_grads is None:
            first_grads = grads
        losses.append(float(loss))
    return params, losses, first_grads


def _run_torch(enc, batch, steps=STEPS):
    video, ids, mask, mask_v, mask_n = batch
    video_t = torch.tensor(video).permute(0, 1, 4, 2, 3)
    ids_t, mask_t = torch.tensor(ids), torch.tensor(mask)
    mv, mn = torch.tensor(mask_v), torch.tensor(mask_n)
    opt = TorchReferenceAdamW(enc.leaves(), lr=LR)
    losses, first_grads = [], None
    for _ in range(steps):
        opt.zero_grad()
        t, v = enc.forward(video_t, ids_t, mask_t)
        loss = _torch_egonce(_torch_sim_matrix(t, v), mv, mn)
        loss.backward()
        if first_grads is None:
            first_grads = {k: p.grad.detach().clone().numpy()
                           for k, p in enc.leaves().items()}
        losses.append(float(loss.detach()))
        opt.step()
    return losses, first_grads


def _leafwise_max_err(tree_a, tree_b):
    """Per-leaf max |a-b| normalized by the LEAF's magnitude scale.

    Elementwise-relative error is the wrong metric here: leaves fed by
    eps-dominated gradients (e.g. timeattn qkv behind the zero-init time
    proj) have near-zero entries whose elementwise denominator explodes
    while the absolute drift stays ~lr-sized."""
    worst, worst_path = 0.0, None
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(tree_a),
            jax.tree_util.tree_leaves_with_path(tree_b)):
        a, b = np.asarray(a), np.asarray(b)
        err = float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-6))
        if err > worst:
            worst, worst_path = err, path
    return worst, worst_path


@pytest.fixture(scope="module")
def composed():
    """One torch trajectory + converted-identical initial flax params."""
    rng = np.random.default_rng(7)
    enc = TorchDualEncoder(rng)
    batch = _batch(rng)

    init_sd = {k: v.detach().clone().numpy() for k, v in enc.leaves().items()}
    model = DualEncoder(CFG)
    video, ids, mask = batch[0], batch[1], batch[2]
    template = model.init(
        jax.random.PRNGKey(0), jnp.asarray(video),
        jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32))["params"]
    params = dual_encoder_params(init_sd, CFG, template)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    torch_losses, torch_grads = _run_torch(enc, batch)
    final_sd = {k: v.detach().clone().numpy() for k, v in enc.leaves().items()}
    return {
        "batch": batch, "params": params,
        "torch_losses": torch_losses, "torch_grads": torch_grads,
        "torch_final": final_sd,
    }


# --------------------------------------------------------------------------
# the tests
# --------------------------------------------------------------------------

def test_composed_step_gradient_parity(composed):
    """value_and_grad of the composed loss == torch autograd, leaf by leaf
    (localizes any forward/backward divergence to a named parameter)."""
    tx = make_optimizer(base_lr=LR, milestones=(10**6,), steps_per_epoch=1,
                        variant="reference")
    _, losses, grads = _run_jax(composed["params"], composed["batch"], tx,
                                steps=1)
    np.testing.assert_allclose(losses[0], composed["torch_losses"][0],
                               rtol=1e-5)
    want = _grads_to_tree(composed["torch_grads"], composed["params"])
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(grads),
            jax.tree_util.tree_leaves_with_path(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-6,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}",
        )


def test_composed_trajectory_parity_reference_adamw(composed):
    """5-step loss + parameter trajectory, exact reference optimizer
    (adamw_reference == transformers.AdamW update rule)."""
    tx = make_optimizer(base_lr=LR, milestones=(10**6,), steps_per_epoch=1,
                        variant="reference")
    params, losses, _ = _run_jax(composed["params"], composed["batch"], tx)
    np.testing.assert_allclose(losses, composed["torch_losses"], rtol=2e-4)

    want = dual_encoder_params(composed["torch_final"], CFG,
                               composed["params"])
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5,
            err_msg=f"param mismatch after {STEPS} steps at "
                    f"{jax.tree_util.keystr(path)}",
        )


def test_optax_adamw_drift_is_bounded_and_larger(composed):
    """The production optax.adamw differs from transformers.AdamW only in
    eps placement (documented in train/state.py).  Assert the drift vs the
    torch trajectory is (a) bounded and (b) no better than the exact
    reference variant — i.e. 'reference' really is the closer math.

    Leaves whose gradients sit near eps (e.g. attention key biases, whose
    gradient is ~0 by softmax shift invariance, or anything behind the
    zero-init time proj) take eps-DOMINATED steps, where the two rules'
    effective epsilons differ by ~sqrt(1-b2^t) (32x at step 1) by design;
    there only an absolute per-step bound (|delta| <= ~lr*bc) is
    meaningful, so the relative bound applies to gradient-carrying leaves
    and the absolute bound to all of them."""
    want = dual_encoder_params(composed["torch_final"], CFG,
                               composed["params"])

    tx_ref = make_optimizer(base_lr=LR, milestones=(10**6,),
                            steps_per_epoch=1, variant="reference")
    ref_params, _, _ = _run_jax(composed["params"], composed["batch"], tx_ref)
    ref_err, _ = _leafwise_max_err(ref_params, want)

    tx_opt = make_optimizer(base_lr=LR, milestones=(10**6,),
                            steps_per_epoch=1, variant="optax")
    opt_params, _, _ = _run_jax(composed["params"], composed["batch"], tx_opt)
    opt_err, opt_path = _leafwise_max_err(opt_params, want)

    assert ref_err <= opt_err + 1e-6, (ref_err, opt_err, opt_path)

    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(opt_params),
            jax.tree_util.tree_leaves_with_path(want)):
        drift = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        # every AdamW step satisfies |delta| <= lr*bc*|m|/(sqrt(v)+eps)
        # with bc <= sqrt(1-b2)/(1-b1) ~ 0.32 at step 1; 2x headroom
        assert drift < 2 * STEPS * LR, \
            f"unbounded drift {drift} at {jax.tree_util.keystr(path)}"

    # drift relative to the total parameter MOVEMENT (leaf-relative metrics
    # are meaningless: zero-init biases and eps-dominated leaves have final
    # magnitudes that are themselves lr-sized).  Measured 0.094 on this
    # fixture (many eps-dominated leaves in a tiny model); 2x headroom.
    def l2(tree):
        return float(np.sqrt(sum(
            np.sum(np.square(np.asarray(x, np.float32)))
            for x in jax.tree_util.tree_leaves(tree))))

    diff = jax.tree_util.tree_map(
        lambda x, y: np.asarray(x) - np.asarray(y), opt_params, want)
    move = jax.tree_util.tree_map(
        lambda x, y: np.asarray(x) - np.asarray(y), want, composed["params"])
    assert l2(diff) / l2(move) < 0.2, (l2(diff), l2(move))
