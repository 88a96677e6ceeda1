"""Linear-chain CRF, fully compiled (`lax.scan` forward algorithm + Viterbi).

TPU-native replacement for the external `torchcrf` dependency used by every
reference model head (`Cross_Modal_Interaction_Module.py:911-912,1046-1057`,
`my_bert/gate_cl_modeling.py:1261,1392-1399`). Semantics are bit-compatible
with torchcrf at fp32:

  - log-likelihood = numerator(score of the gold path) − denominator
    (log-partition via the forward algorithm), with masked timesteps
    contributing nothing and the `end_transitions` applied at each
    sequence's last *unmasked* position;
  - reduction: "token_mean" divides the summed llh by the unmasked token
    count (the ICKA training loss, :1047-1048), "mean" by batch size
    (gate_cl loss, gate_cl_modeling.py:1392), "sum" and "none" as in torchcrf;
  - decode: masked Viterbi with backpointer trace. Positions past a
    sequence's end repeat its last decoded tag (the caller masks them; the
    reference returns ragged Python lists instead — `crf.decode` :1051).

Everything runs under `jit` as two `lax.scan`s over time with (B, T) /
(B, T, T) batched tensors — no per-sample Python loops, no host sync.
All math is fp32 regardless of the surrounding compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from icka_tpu.nn.layers import scan_unroll


def _logsumexp(x, axis):
    m = jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    return jnp.squeeze(m, axis) + jnp.log(
        jnp.sum(jnp.exp(x - m), axis=axis))


def _as_jnp(*xs):
    return tuple(jnp.asarray(x) for x in xs)


def crf_numerator(emissions, tags, mask, start, end, trans):
    """Score of the gold tag path. Shapes: emissions (B,L,T), tags (B,L)
    int32, mask (B,L) {0,1} float/bool with mask[:,0] all-on."""
    emissions, tags, mask, start, end, trans = _as_jnp(
        emissions, tags, mask, start, end, trans)
    B, L, T = emissions.shape
    maskf = mask.astype(emissions.dtype)
    first = tags[:, 0]
    score = start[first] + jnp.take_along_axis(
        emissions[:, 0], first[:, None], axis=1)[:, 0]

    def step(carry, xs):
        score, prev = carry
        em_t, tag_t, m_t = xs          # (B,T), (B,), (B,)
        s = trans[prev, tag_t] + jnp.take_along_axis(
            em_t, tag_t[:, None], axis=1)[:, 0]
        score = score + s * m_t
        prev = jnp.where(m_t > 0, tag_t, prev)
        return (score, prev), None

    xs = (jnp.moveaxis(emissions[:, 1:], 1, 0),
          jnp.moveaxis(tags[:, 1:], 1, 0),
          jnp.moveaxis(maskf[:, 1:], 1, 0))
    (score, last_tag), _ = jax.lax.scan(step, (score, first), xs,
                                        unroll=scan_unroll())
    return score + end[last_tag]


def crf_log_partition(emissions, mask, start, end, trans):
    """Forward algorithm: log Z per sequence. fp32 accumulation."""
    emissions, mask, start, end, trans = _as_jnp(
        emissions, mask, start, end, trans)
    maskf = mask.astype(emissions.dtype)
    alpha = start[None, :] + emissions[:, 0]           # (B, T)

    def step(alpha, xs):
        em_t, m_t = xs                                  # (B,T), (B,)
        # (B, prev, next): alpha + trans + emission(next)
        nxt = _logsumexp(
            alpha[:, :, None] + trans[None] + em_t[:, None, :], axis=1)
        alpha = jnp.where(m_t[:, None] > 0, nxt, alpha)
        return alpha, None

    xs = (jnp.moveaxis(emissions[:, 1:], 1, 0),
          jnp.moveaxis(maskf[:, 1:], 1, 0))
    alpha, _ = jax.lax.scan(step, alpha, xs, unroll=scan_unroll())
    return _logsumexp(alpha + end[None, :], axis=1)


def crf_log_likelihood(emissions, tags, mask, start, end, trans,
                       reduction: str = "token_mean"):
    """Masked log-likelihood with torchcrf reduction semantics."""
    emissions = jnp.asarray(emissions, jnp.float32)
    num = crf_numerator(emissions, tags, mask, start, end, trans)
    den = crf_log_partition(emissions, mask, start, end, trans)
    llh = num - den
    if reduction == "none":
        return llh
    if reduction == "sum":
        return jnp.sum(llh)
    if reduction == "mean":
        return jnp.mean(llh)
    if reduction == "token_mean":
        return jnp.sum(llh) / jnp.sum(mask.astype(jnp.float32))
    raise ValueError(f"unknown reduction {reduction!r}")


def crf_decode(emissions, mask, start, end, trans, reset=None):
    """Batched masked Viterbi. Returns (B, L) int32 best-path tags.

    Masked steps carry scores unchanged and record identity backpointers, so
    the backward trace passes through padding transparently; positions past a
    sequence's end hold the tag at its last valid step.

    `reset` (B, L) {0,1}, optional — sequence-PACKING support: a set bit at
    position t>0 marks the first token of a new packed segment. The Viterbi
    lattice is cut there: the score restarts as `start + emissions[t]`
    (no transition from the previous segment), and the backpointer at t
    re-seeds the backward trace with the PREVIOUS segment's best final tag,
    argmax(score + end) — so one (B, L) decode yields every packed
    segment's independent Viterbi path, bit-identical to decoding each
    segment alone, at the cost of a single unpacked decode. Used by
    `icka_tpu.serving.packing`; reset[:, 0] is ignored (position 0 always
    starts a segment).
    """
    emissions, mask, start, end, trans = _as_jnp(
        emissions, mask, start, end, trans)
    emissions = emissions.astype(jnp.float32)
    B, L, T = emissions.shape
    maskb = mask.astype(bool)
    score = start[None, :] + emissions[:, 0]            # (B, T)
    ident = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))

    def step(score, xs):
        if reset is None:
            em_t, m_t = xs
        else:
            em_t, m_t, r_t = xs
        cand = score[:, :, None] + trans[None] + em_t[:, None, :]  # (B,prev,next)
        best_prev = jnp.argmax(cand, axis=1).astype(jnp.int32)     # (B, next)
        best_score = jnp.max(cand, axis=1)
        new_score = jnp.where(m_t[:, None], best_score, score)
        bp = jnp.where(m_t[:, None], best_prev, ident)
        if reset is not None:
            # previous segment's best final tag (end transitions applied
            # HERE, exactly once per segment — the restart replaces the
            # running score entirely, so nothing double-counts)
            seg_last = jnp.argmax(score + end[None, :], axis=1) \
                .astype(jnp.int32)                                 # (B,)
            new_score = jnp.where(r_t[:, None],
                                  start[None, :] + em_t, new_score)
            bp = jnp.where(r_t[:, None],
                           jnp.broadcast_to(seg_last[:, None], (B, T)), bp)
        return new_score, bp

    xs = (jnp.moveaxis(emissions[:, 1:], 1, 0),
          jnp.moveaxis(maskb[:, 1:], 1, 0))
    if reset is not None:
        xs = xs + (jnp.moveaxis(jnp.asarray(reset)[:, 1:], 1, 0)
                   .astype(bool),)
    # unroll amortizes TPU loop overhead: the per-step (B,T,T) compute is
    # tiny relative to loop iteration cost at small tag counts
    final_score, history = jax.lax.scan(step, score, xs, unroll=scan_unroll())

    last = jnp.argmax(final_score + end[None, :], axis=1).astype(jnp.int32)

    def back(tag, bp_t):
        tag = jnp.take_along_axis(bp_t, tag[:, None], axis=1)[:, 0]
        return tag, tag

    _, rev_tags = jax.lax.scan(back, last, history, reverse=True,
                               unroll=scan_unroll())
    tags = jnp.concatenate([rev_tags, last[None, :]], axis=0)      # (L, B)
    return jnp.moveaxis(tags, 0, 1)


def crf_decode_parallel(emissions, mask, start, end, trans):
    """Viterbi with O(log L) depth instead of an O(L) sequential scan.

    TPU-native decomposition of the decode:
      1. per-step max-plus transition matrices M_t[i,j] = trans[i,j] +
         em_t[j] (masked steps become the max-plus identity so padding
         passes scores through unchanged);
      2. alphas via `associative_scan` of max-plus matrix products —
         log₂(L) parallel steps on the VPU;
      3. backpointers for ALL timesteps at once from the alphas (one
         batched argmax);
      4. backtrace via pointer doubling: backpointer maps compose
         associatively ((f∘g)[x] = f[g[x]]), so a reverse
         `associative_scan` of gathers yields every tag in log₂(L) steps.

    Returns the same (B, L) tags as `crf_decode` (up to float-tie
    reordering); positions past a sequence's end repeat its last tag.
    """
    emissions, mask, start, end, trans = _as_jnp(
        emissions, mask, start, end, trans)
    emissions = emissions.astype(jnp.float32)
    B, L, T = emissions.shape
    NEG = -1e30

    # 1. masked max-plus step matrices, t = 1..L-1
    M = trans[None, None] + emissions[:, 1:, None, :]        # (B,L-1,T,T)
    ident = jnp.where(jnp.eye(T, dtype=bool), 0.0, NEG)
    step_mask = mask[:, 1:, None, None] > 0
    M = jnp.where(step_mask, M, ident[None, None])

    # 2. alphas via prefix max-plus products
    def mp(a, b):
        return jnp.max(a[..., :, :, None] + b[..., None, :, :], axis=-2)

    A = jax.lax.associative_scan(mp, M, axis=1)
    alpha0 = start[None] + emissions[:, 0]                   # (B, T)
    alphas_rest = jnp.max(alpha0[:, None, :, None] + A, axis=2)
    alphas = jnp.concatenate([alpha0[:, None], alphas_rest], axis=1)

    # 3. all backpointers at once: bp_t[j] = argmax_i alpha_{t-1}[i]
    #    + trans[i,j] (+ em_t[j], constant in i)
    cand = alphas[:, :-1, :, None] + trans[None, None]       # (B,L-1,T,T)
    bp = jnp.argmax(cand, axis=2).astype(jnp.int32)          # (B,L-1,T)
    ident_map = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[None, None, :], bp.shape)
    bp = jnp.where(mask[:, 1:, None] > 0, bp, ident_map)

    last = jnp.argmax(alphas[:, -1] + end[None], axis=1).astype(jnp.int32)

    # 4. suffix composition of backpointer maps (pointer doubling).
    # associative_scan(reverse=True) folds as elems[L-1] ⊕ … ⊕ elems[t],
    # so the operator must apply its LEFT argument innermost:
    # combine(a, b)[x] = b[a[x]] yields S_t = f_t ∘ f_{t+1} ∘ … ∘ f_{L-2}.
    def compose(a, b):
        return jnp.take_along_axis(b, a, axis=-1)

    S = jax.lax.associative_scan(compose, bp, axis=1, reverse=True)
    idx = jnp.broadcast_to(last[:, None, None], (B, L - 1, 1))
    tags_head = jnp.take_along_axis(S, idx, axis=2)[..., 0]
    return jnp.concatenate([tags_head, last[:, None]], axis=1)


def crf_marginals(emissions, mask, start, end, trans):
    """Posterior tag marginals p(y_t | x) via forward-backward (an addition
    over the reference — torchcrf exposes none). Returns (B, L, T)."""
    emissions, mask, start, end, trans = _as_jnp(
        emissions, mask, start, end, trans)
    emissions = emissions.astype(jnp.float32)
    maskf = mask.astype(jnp.float32)
    B, L, T = emissions.shape

    def fwd_step(alpha, xs):
        em_t, m_t = xs
        nxt = _logsumexp(alpha[:, :, None] + trans[None] + em_t[:, None, :], 1)
        alpha = jnp.where(m_t[:, None] > 0, nxt, alpha)
        return alpha, alpha

    alpha0 = start[None, :] + emissions[:, 0]
    _, alphas = jax.lax.scan(
        fwd_step, alpha0,
        (jnp.moveaxis(emissions[:, 1:], 1, 0), jnp.moveaxis(maskf[:, 1:], 1, 0)))
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)   # (L, B, T)

    def bwd_step(beta, xs):
        em_t, m_t = xs
        nxt = _logsumexp(trans[None] + (em_t + beta)[:, None, :], axis=2)
        beta = jnp.where(m_t[:, None] > 0, nxt, beta)
        return beta, beta

    betaL = jnp.broadcast_to(end[None, :], (B, T))
    _, betas = jax.lax.scan(
        bwd_step, betaL,
        (jnp.moveaxis(emissions[:, 1:], 1, 0), jnp.moveaxis(maskf[:, 1:], 1, 0)),
        reverse=True)
    betas = jnp.concatenate([betas, betaL[None]], axis=0)       # (L, B, T)

    logp = alphas + betas                                       # (L, B, T)
    logp = logp - _logsumexp(logp, axis=2)[:, :, None]
    return jnp.moveaxis(jnp.exp(logp), 0, 1)


class CRF(nn.Module):
    """Flax wrapper holding the transition parameters.

    Initialization matches torchcrf: uniform(-0.1, 0.1) for all three
    transition tensors.
    """

    num_tags: int

    def setup(self):
        init = nn.initializers.uniform(scale=0.2)

        def u(key, shape, dtype):
            return init(key, shape, dtype) - 0.1

        self.start_transitions = self.param(
            "start_transitions", u, (self.num_tags,), jnp.float32)
        self.end_transitions = self.param(
            "end_transitions", u, (self.num_tags,), jnp.float32)
        self.transitions = self.param(
            "transitions", u, (self.num_tags, self.num_tags), jnp.float32)

    def _params(self):
        return self.start_transitions, self.end_transitions, self.transitions

    def __call__(self, emissions, tags, mask, reduction: str = "token_mean"):
        start, end, trans = self._params()
        return crf_log_likelihood(emissions, tags, mask, start, end, trans,
                                  reduction=reduction)

    def decode(self, emissions, mask, parallel: bool = False, reset=None):
        """Viterbi decode. `parallel=True` switches to the log-depth
        associative-scan implementation — measured on v5e it only pays off
        for LARGE tag sets: at T=15 the (T, T) max-plus tensors pad to the
        128-lane tile and the sequential scan (≈2.7 ms at B=64, L=128) is
        ~5 ms faster end-to-end. `reset` (B, L) cuts the lattice at packed
        segment starts (see `crf_decode`; sequential path only)."""
        start, end, trans = self._params()
        if reset is not None:
            return crf_decode(emissions, mask, start, end, trans,
                              reset=reset)
        fn = crf_decode_parallel if parallel else crf_decode
        return fn(emissions, mask, start, end, trans)

    def marginals(self, emissions, mask):
        start, end, trans = self._params()
        return crf_marginals(emissions, mask, start, end, trans)
