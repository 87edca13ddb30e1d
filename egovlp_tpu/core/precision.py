"""Mixed-precision policy for TPU.

Parameters and optimizer state live in float32; matmul-heavy compute runs in
bfloat16 (the MXU-native dtype); softmax/layernorm accumulate in float32.
The reference trains in full fp32 on A100 (no AMP anywhere in
/root/reference); bf16 compute is the TPU-idiomatic choice and is
numerically safe for this model family.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype=jnp.float32)


def policy_from_name(name: str) -> Policy:
    return {
        "bf16": DEFAULT_POLICY,
        "bfloat16": DEFAULT_POLICY,
        "fp32": FP32_POLICY,
        "float32": FP32_POLICY,
    }[name]
