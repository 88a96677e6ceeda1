"""Primitive NN blocks shared across encoders.

Numerics mirror the reference's legacy BERT stack so that reference weights
produce identical outputs at fp32:

  - additive attention masks `(1 - m) * -10000` (`Cross_Modal_Interaction_Module.py:364-372,962-965`)
  - erf-based gelu (:31-37)
  - LayerNorm with epsilon inside the square root (:509-522)

All matmuls run in the policy compute dtype (bf16 on TPU) with fp32
LayerNorm statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF_MASK = -10000.0


def scan_unroll(n: int = 8) -> int:
    """Unroll factor for latency-bound scans: 8 on TPU (loop overhead
    dominates tiny step bodies), 1 elsewhere (unrolling multiplies CPU
    compile time for no benefit)."""
    return n if jax.default_backend() == "tpu" else 1


def matmul_precision(dtype):
    """fp32 compute means real fp32: JAX's DEFAULT matmul precision lowers
    inputs to bf16 on TPU (and on this CPU build), which silently breaks
    reference parity. bf16 compute keeps DEFAULT (that IS the bf16 path)."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def gelu(x):
    """erf-gelu, matching the reference exactly (not the tanh approximation)."""
    return jax.nn.gelu(x, approximate=False)


ACT2FN = {
    "gelu": gelu,
    "relu": jax.nn.relu,
    "swish": jax.nn.silu,
    "tanh": jnp.tanh,
}


def additive_mask(mask, dtype=jnp.float32):
    """Convert a {0,1} key mask to the additive form the reference uses
    everywhere: 0 → -10000, 1 → 0. Accepts (B, S) and returns (B, 1, 1, S)
    broadcastable over (batch, heads, queries, keys)."""
    m = jnp.asarray(mask).astype(dtype)
    while m.ndim < 4:
        m = m[:, None]
    return (1.0 - m) * NEG_INF_MASK


def sparsemax(logits, axis: int = -1):
    """Sparsemax (Martins & Astudillo 2016): Euclidean projection of logits
    onto the simplex; produces sparse attention distributions. The
    reference imports an external `sparsemax` package as an optional
    attention normalizer (`Cross_Modal_Interaction_Module.py:17,496`)."""
    logits = jnp.asarray(logits, jnp.float32)
    sorted_logits = jnp.flip(jnp.sort(logits, axis=axis), axis=axis)
    k = jnp.arange(1, logits.shape[axis] + 1, dtype=jnp.float32)
    shape = [1] * logits.ndim
    shape[axis] = -1
    k = k.reshape(shape)
    cssv = jnp.cumsum(sorted_logits, axis=axis)
    support = (1.0 + k * sorted_logits) > cssv
    k_support = jnp.sum(support.astype(jnp.float32), axis=axis,
                        keepdims=True)
    idx = (k_support - 1).astype(jnp.int32)
    cssv_support = jnp.take_along_axis(cssv, idx, axis=axis)
    tau = (cssv_support - 1.0) / k_support
    return jnp.maximum(logits - tau, 0.0)


class LayerNorm(nn.Module):
    """TF-style LayerNorm (eps inside sqrt), fp32 statistics."""

    eps: float = 1e-12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


class Dense(nn.Module):
    """Linear layer with optional logical partitioning axes for TP.

    `kernel_axes` names the (in, out) logical axes; the partitioner in
    `icka_tpu.parallel` maps logical names to mesh axes.

    `quant="int8"` switches to a W8A8 serving layout: the kernel is stored
    as int8 with a per-output-channel fp32 scale (see
    `icka_tpu.models.convert.quantize_params_like` to convert a trained
    fp32 tree), activations are dynamically quantized per row
    (abs-max/127), and the matmul runs int8×int8→int32 on the MXU — 2× the
    bf16 peak on v5e. LayerNorm/softmax/bias stay high precision.

    `quant="int8_static"` replaces the dynamic per-row activation scale
    with ONE calibrated per-tensor scale stored as the `act_scale` param:
    the per-call abs-max reduction over the whole activation disappears
    and quantization becomes a fusable elementwise epilogue of the
    producing op. Calibrate by running the dynamic model with
    `mutable=["calib"]` (the dynamic path sows the observed abs-max) and
    convert with `icka_tpu.models.convert.static_quantize_params_like`.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    kernel_axes: tuple = (None, None)
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        if self.quant in ("int8", "int8_static"):
            kernel_q = self.param(
                "kernel_q",
                lambda key, shape, dtype: jax.random.randint(
                    key, shape, -127, 128, jnp.int32).astype(jnp.int8),
                (in_dim, self.features), jnp.int8)
            kernel_scale = self.param(
                "kernel_scale",
                nn.initializers.constant(0.02 / 127.0),
                (self.features,), jnp.float32)
            if self.quant == "int8_static":
                a_scale = self.param("act_scale",
                                     nn.initializers.constant(1.0 / 127.0),
                                     (), jnp.float32)
            else:
                amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                               keepdims=True)
                self.sow("calib", "amax", jnp.max(amax),
                         reduce_fn=jnp.maximum,
                         init_fn=lambda: jnp.zeros((), jnp.float32))
                a_scale = jnp.maximum(amax, 1e-8) / 127.0
            x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale),
                           -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                x_q, kernel_q,
                (((x_q.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * a_scale
                 * kernel_scale).astype(self.dtype)
        else:
            kernel = self.param(
                "kernel",
                nn.initializers.normal(stddev=0.02),
                (in_dim, self.features),
                jnp.float32,
            )
            y = jnp.matmul(x.astype(self.dtype), kernel.astype(self.dtype),
                           preferred_element_type=self.dtype,
                           precision=matmul_precision(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class MLP(nn.Module):
    """Feed-forward block: Dense → act → Dense (+residual+LN in callers)."""

    hidden: int
    out: int
    act: str = "gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Dense(self.hidden, dtype=self.dtype, name="wi",
                  kernel_axes=("embed", "mlp"))(x)
        h = ACT2FN[self.act](h)
        return Dense(self.out, dtype=self.dtype, name="wo",
                     kernel_axes=("mlp", "embed"))(h)
