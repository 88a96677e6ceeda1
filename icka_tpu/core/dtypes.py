"""Mixed-precision policy.

TPU-first: bf16 matmuls on the MXU with fp32 parameters/accumulation, and
fp32 always for numerically-sensitive paths (CRF log-likelihood/Viterbi,
LayerNorm statistics, softmax). The reference runs fp32 with an optional
apex fp16 branch (`My_cross_attention.py:824-838`); on TPU bf16 needs no
loss scaling.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # CRF / loss / layernorm statistics always run in this dtype.
    reduce_dtype: jnp.dtype = jnp.float32

    @classmethod
    def full_precision(cls) -> "DTypePolicy":
        return cls(compute_dtype=jnp.float32)

    @classmethod
    def from_str(cls, name: str) -> "DTypePolicy":
        if name in ("bfloat16", "bf16"):
            return cls()
        if name in ("float32", "fp32"):
            return cls.full_precision()
        raise ValueError(f"unknown compute dtype {name!r}")
