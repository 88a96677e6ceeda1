"""Optimizer factory: AdamW + linear-warmup schedule + grad clipping.

Mirrors the reference recipe (`My_cross_attention.py:743-757,840`):

  - AdamW, lr 3e-5, weight_decay 0.01;
  - weight decay masked off for biases and LayerNorm parameters
    (`no_decay = ['bias', 'LayerNorm.bias', 'LayerNorm.weight']`, :744-748);
  - `get_linear_schedule_with_warmup` with 10% warmup (:756-757);
  - global-norm clip 1.0 applied every update (:840).

Also provides the legacy `BertAdam` schedules (`my_bert/optimization.py:23-36`)
as optax schedules for the BERT-variant training path.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import optax

from icka_tpu.core.config import TrainConfig


def linear_warmup_schedule(base_lr: float, warmup_steps: int,
                           total_steps: int):
    """HF get_linear_schedule_with_warmup: 0→base over warmup, then linear
    decay to 0 at total_steps."""

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = (total_steps - step) / jnp.maximum(
            1.0, total_steps - warmup_steps)
        return base_lr * jnp.clip(jnp.minimum(warm, decay), 0.0, 1.0)

    return schedule


def warmup_cosine(base_lr: float, warmup: float, total_steps: int):
    """BertAdam 'warmup_cosine' (`my_bert/optimization.py:23-26`)."""

    def schedule(step):
        import jax.numpy as jnp
        x = jnp.asarray(step, jnp.float32) / total_steps
        return base_lr * jnp.where(
            x < warmup, x / warmup,
            0.5 * (1.0 + jnp.cos(math.pi * x)))

    return schedule


def warmup_constant(base_lr: float, warmup: float, total_steps: int):
    def schedule(step):
        import jax.numpy as jnp
        x = jnp.asarray(step, jnp.float32) / total_steps
        return base_lr * jnp.where(x < warmup, x / warmup, 1.0)

    return schedule


def warmup_linear(base_lr: float, warmup: float, total_steps: int):
    """BertAdam 'warmup_linear' (:33-36): ramps up then falls linearly."""

    def schedule(step):
        import jax.numpy as jnp
        x = jnp.asarray(step, jnp.float32) / total_steps
        return base_lr * jnp.where(x < warmup, x / warmup, 1.0 - x)

    return schedule


def bert_adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-6, weight_decay: float = 0.01,
              max_grad_norm: float = 1.0,
              mask=None) -> optax.GradientTransformation:
    """The legacy `BertAdam` optimizer (`my_bert/optimization.py:45-162`):
    Adam WITHOUT bias correction, per-parameter gradient clipping before
    the moment update (:127-128), decoupled weight decay (:143-144).
    `learning_rate` may be a schedule (pair with the warmup_* schedules)."""

    def init(params):
        return optax.ScaleByAdamState(
            count=jax.numpy.zeros([], dtype=jax.numpy.int32),
            mu=jax.tree.map(jax.numpy.zeros_like, params),
            nu=jax.tree.map(jax.numpy.zeros_like, params))

    def update(grads, state, params):
        import jax.numpy as jnp

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            factor = jnp.minimum(1.0, max_grad_norm / (norm + 1e-6))
            return g * factor

        grads = jax.tree.map(clip, grads)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, grads)
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) \
            else learning_rate

        def step(m, v, p, decayed):
            upd = m / (jnp.sqrt(v) + eps)
            if decayed:
                upd = upd + weight_decay * p
            return -lr * upd

        if mask is not None:
            decay_tree = mask(params) if callable(mask) else mask
            updates = jax.tree.map(
                lambda m, v, p, d: step(m, v, p, d), mu, nu, params,
                decay_tree)
        else:
            updates = jax.tree.map(lambda m, v, p: step(m, v, p, True),
                                   mu, nu, params)
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def _decay_mask(params: Any):
    """True where weight decay applies: everything except biases and
    LayerNorm/CRF-transition parameters."""

    def keep(path, _):
        names = [getattr(k, "key", str(k)) for k in path]
        last = names[-1] if names else ""
        if last in ("bias", "scale"):
            return False
        if any("norm" in n.lower() for n in names):
            return False
        if last.endswith("transitions"):
            return False
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


def make_optimizer(cfg: TrainConfig, total_steps: int,
                   params=None) -> optax.GradientTransformation:
    schedule = linear_warmup_schedule(
        cfg.learning_rate,
        int(cfg.warmup_proportion * total_steps),
        total_steps)
    import jax.numpy as jnp

    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            schedule,
            b1=0.9, b2=0.999, eps=1e-8,
            # bf16 first moment halves mu's HBM residency (TrainConfig);
            # nu stays fp32 — sqrt(nu) precision gates the update scale
            mu_dtype=jnp.dtype(getattr(cfg, "mu_dtype", "float32")),
            weight_decay=cfg.weight_decay,
            mask=_decay_mask if params is None else _decay_mask(params),
        ),
    )
