"""Objective golden tests against independent numpy implementations of the
reference formulas (/root/reference/model/loss.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from egovlp_tpu.objectives import (
    adaptive_max_margin,
    cross_entropy,
    egonce,
    info_nce,
    max_margin,
)


def np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_info_nce(rng):
    n = 8
    sim = np.tanh(rng.normal(size=(n, n))).astype(np.float32)
    t = 0.05
    i = np.log(np_softmax(sim / t, 1)).diagonal().mean()
    j = np.log(np_softmax(sim.T / t, 1)).diagonal().mean()
    want = -i - j
    got = float(info_nce(jnp.asarray(sim), temperature=t))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_info_nce_perfect_alignment_is_low():
    sim = np.full((4, 4), -1.0, np.float32)
    np.fill_diagonal(sim, 1.0)
    assert float(info_nce(jnp.asarray(sim))) < 1e-4


@pytest.mark.parametrize("noun,verb", [(True, True), (True, False), (False, True)])
def test_egonce(rng, noun, verb):
    n = 10
    sim = np.tanh(rng.normal(size=(n, n))).astype(np.float32)
    nouns = rng.integers(0, 3, size=n)
    verbs = rng.integers(0, 2, size=n)
    mask_n = (nouns[:, None] == nouns[None, :]).astype(np.float32)
    mask_v = (verbs[:, None] == verbs[None, :]).astype(np.float32)

    if noun and verb:
        mask = mask_v * mask_n + np.eye(n)
    elif noun:
        mask = mask_n + np.eye(n)
    else:
        mask = mask_v + np.eye(n)
    mask = mask > 0
    t = 0.05
    i = np.log((np_softmax(sim / t, 1) * mask).sum(1)).mean()
    j = np.log((np_softmax(sim.T / t, 1) * mask.T).sum(1)).mean()
    want = -i - j

    got = float(
        egonce(
            jnp.asarray(sim), jnp.asarray(mask_v), jnp.asarray(mask_n),
            temperature=t, noun=noun, verb=verb,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _np_max_margin(sim, margin, weight=None, fix_norm=True):
    """Literal translation of the reference pair construction."""
    n = sim.shape[0]
    d = np.diag(sim)
    terms = []
    for i in range(n):
        for j in range(n):
            m = margin if weight is None else weight[i] * margin
            terms.append((max(0.0, m - (d[i] - sim[i, j])), i != j))
    for i in range(n):
        for j in range(n):
            m = margin if weight is None else weight[i] * margin
            terms.append((max(0.0, m - (d[i] - sim[j, i])), i != j))
    if fix_norm:
        vals = [t for t, keep in terms if keep]
    else:
        vals = [t for t, _ in terms]
    return float(np.mean(vals))


@pytest.mark.parametrize("fix_norm", [True, False])
def test_max_margin(rng, fix_norm):
    n = 6
    sim = np.tanh(rng.normal(size=(n, n))).astype(np.float32)
    want = _np_max_margin(sim, 0.2, fix_norm=fix_norm)
    got = float(max_margin(jnp.asarray(sim), margin=0.2, fix_norm=fix_norm))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("fix_norm", [True, False])
def test_adaptive_max_margin(rng, fix_norm):
    n = 6
    sim = np.tanh(rng.normal(size=(n, n))).astype(np.float32)
    w = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
    want = _np_max_margin(sim, 0.4, weight=w, fix_norm=fix_norm)
    got = float(
        adaptive_max_margin(jnp.asarray(sim), jnp.asarray(w), margin=0.4,
                            fix_norm=fix_norm)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_entropy(rng):
    logits = rng.normal(size=(5, 3)).astype(np.float32)
    targets = rng.integers(0, 3, size=5)
    p = np_softmax(logits, 1)
    want = float(-np.log(p[np.arange(5), targets]).mean())
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
