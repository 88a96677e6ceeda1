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
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            schedule,
            b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=cfg.weight_decay,
            mask=_decay_mask if params is None else _decay_mask(params),
        ),
    )
