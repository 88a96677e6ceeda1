"""Score-level model ensembling.

Capability rebuild of `modeling/modeling_ensemble.py` (reference component
#24): `dual_ensemble_model*` (:45-352) average/stack per-choice scores of
two ChunkAlign variants, `Abstract_Specific` (:424) mixes an abstract
(caption-level) and specific (region-level) scorer with a learned gate, and
`model_vote` (:1006) majority-votes hard predictions. Here ensembling is
functional: members are score callables `(batch) -> (B, C)` and the
combiners are pure.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from icka_tpu.nn.layers import Dense

ScoreFn = Callable[..., jnp.ndarray]


def mean_ensemble(scores: Sequence[jnp.ndarray],
                  weights: Sequence[float] | None = None) -> jnp.ndarray:
    """Weighted average of per-choice score matrices (dual_ensemble)."""
    if weights is None:
        weights = [1.0] * len(scores)
    total = sum(w * jnp.asarray(s) for w, s in zip(weights, scores))
    return total / sum(weights)


def logprob_ensemble(scores: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Average in log-prob space (normalizes each member first)."""
    logps = [jax.nn.log_softmax(jnp.asarray(s), axis=-1) for s in scores]
    return sum(logps) / len(logps)


def model_vote(predictions: Sequence[np.ndarray]) -> np.ndarray:
    """Majority vote over hard predictions; ties resolve to the first
    member's choice (`model_vote` :1006)."""
    preds = np.stack([np.asarray(p) for p in predictions])   # (M, B)
    M, B = preds.shape
    out = np.empty(B, preds.dtype)
    for b in range(B):
        vals, counts = np.unique(preds[:, b], return_counts=True)
        best = counts.max()
        winners = set(vals[counts == best])
        # first member wins ties
        for m in range(M):
            if preds[m, b] in winners:
                out[b] = preds[m, b]
                break
    return out


class AbstractSpecificGate(nn.Module):
    """`Abstract_Specific` (:424): gate two scorers' pooled features into a
    mixing coefficient, blend their choice scores."""

    hidden: int

    @nn.compact
    def __call__(self, abstract_feat, specific_feat, abstract_scores,
                 specific_scores):
        g = nn.sigmoid(Dense(1, name="gate")(jnp.concatenate(
            [abstract_feat, specific_feat], axis=-1)))
        return g * abstract_scores + (1.0 - g) * specific_scores
