"""Memory-lean LayerNorm: f32 statistics, bf16 residuals, custom VJP.

Why this exists: ``flax.linen.LayerNorm`` upcasts the input to float32
for numerical stability (flax normalization.py:205) and reverse-mode
autodiff then saves full-size FLOAT32 ``x - mean`` / ``x_hat``
intermediates for the backward.  At the 16-frame fine-tune shape
(B=16, S=3137, D=768) the HLO traffic audit (docs/ROUND3.md) shows this
costs 48 layout copies of f32[16,3136,768] — ~14.8 GB/step of HBM
traffic on a step that is memory-bound.

``fused_layer_norm`` computes the identical forward (f32 stats, fast
variance, eps inside rsqrt, ``(x - mu) * (rstd * scale) + bias``, output
cast to the input dtype) but its custom VJP saves only ``(x, scale, mu,
rstd)`` — the per-row stats are ~0.4 MB — and recomputes ``x_hat`` from
the bf16 input inside ONE fused backward pass.  Everything is plain jnp,
so the op inherits GSPMD partitioning (no Shardy rule needed, unlike the
Pallas kernels).

Gradient formula (per normalized row, all in f32):

    g      = dy * scale                       # d loss / d x_hat
    dx     = rstd * (g - mean(g) - x_hat * mean(g * x_hat))
    dscale = sum_rows(dy * x_hat)
    dbias  = sum_rows(dy)

Matches reference torch.nn.LayerNorm semantics
(/root/reference/model/video_transformer.py:206 uses the default
nn.LayerNorm) to bf16 tolerance; parity-tested against
flax.linen.LayerNorm values AND gradients in tests/test_models.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, scale, bias, eps: float = 1e-6):
    """LayerNorm over the last axis; returns ``x.dtype``."""
    y, _, _ = _ln_fwd_math(x, scale, bias, eps)
    return y


def _ln_fwd_math(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    # fast variance (flax default): E[x^2] - E[x]^2, clamped at 0
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu,
                      0.0)
    rstd = jax.lax.rsqrt(var + eps)
    # (x - mu) * (rstd * scale) + bias — flax folds scale into the
    # multiplier before applying (normalization.py::_normalize)
    y = (xf - mu) * (rstd * scale.astype(jnp.float32))
    y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype), mu, rstd


def _ln_fwd(x, scale, bias, eps):
    y, mu, rstd = _ln_fwd_math(x, scale, bias, eps)
    return y, (x, scale, mu, rstd)


def _ln_bwd(eps, res, dy):
    x, scale, mu, rstd = res
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    xhat = (xf - mu) * rstd
    g = dyf * scale.astype(jnp.float32)
    m1 = jnp.mean(g, axis=-1, keepdims=True)
    m2 = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dx = (rstd * (g - m1 - xhat * m2)).astype(x.dtype)
    axes = tuple(range(dy.ndim - 1))
    dscale = jnp.sum(dyf * xhat, axis=axes).astype(scale.dtype)
    dbias = jnp.sum(dyf, axis=axes).astype(scale.dtype)
    return dx, dscale, dbias


fused_layer_norm.defvjp(_ln_fwd, _ln_bwd)


class FusedLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm`` (param tree: ``scale``, ``bias``).

    ``dtype`` selects the OUTPUT dtype like flax's (computation statistics
    are always f32 internally); parameters stay float32.
    """

    epsilon: float = 1e-6
    dtype: "jnp.dtype | None" = None

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        y = fused_layer_norm(x, scale, bias, self.epsilon)
        # NB: y is rounded to x.dtype before this cast, so an UPcast here
        # (x bf16, dtype f32) is lossier than flax's straight-from-f32
        # output.  Every tower calls this with dtype == the activation
        # dtype, where the two are identical.
        out_dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        return y.astype(out_dtype)
