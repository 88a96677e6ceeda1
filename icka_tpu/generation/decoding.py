"""Autoregressive decoding engine: greedy / sampling / beam search.

TPU-native rebuild of the reference's caption-generation engine
(`modeling/modeling_utils.py`): `generate` (:44), `_generate_no_beam_search`
(:263-589), `_generate_beam_search` (:590-1045), `top_k_top_p_filtering`
(:1046) and `BeamHypotheses` (:1081). The torch engine is a Python loop with
dynamic early-exit and list-of-hypotheses bookkeeping; here every strategy
is a fixed-shape `lax.scan`/`lax.while_loop` program:

  - the token-by-token loop is `lax.scan` over `max_len` steps with a
    static-shape token buffer (finished sequences keep emitting `pad_id`);
  - top-k/top-p filtering is a sort-based mask (no data-dependent shapes);
  - beam search keeps (B, num_beams) alive-scores plus (B, num_beams)
    finished-hypothesis slots, with the reference's length penalty
    `score / len**alpha` and its early-stop rule (best alive can't beat
    worst finished);
  - repetition penalty (:1133-ish semantics: divide positive logits,
    multiply negative) is a vectorized gather over the emitted buffer.

The model plugs in as `step_fn(tokens_t, cache, t) -> (logits, cache)` where
`cache` is any pytree (typically KV caches) — the engine is model-agnostic
so the VCR captioning heads and any future decoder reuse it.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

StepFn = Callable[[jnp.ndarray, Any, jnp.ndarray], tuple[jnp.ndarray, Any]]


class DecodeState(NamedTuple):
    tokens: jnp.ndarray      # (B, L) emitted tokens (pad-filled)
    finished: jnp.ndarray    # (B,) bool
    cache: Any
    key: jnp.ndarray
    scores: jnp.ndarray      # (B,) cumulative log-prob of emitted tokens


def apply_repetition_penalty(logits, tokens, penalty: float):
    """HF semantics: for already-emitted tokens, divide logits > 0 by the
    penalty and multiply logits < 0 by it."""
    if penalty == 1.0:
        return logits
    B, V = logits.shape
    seen = jnp.zeros((B, V), bool)
    seen = seen.at[jnp.arange(B)[:, None], tokens].set(True)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def top_k_top_p_filter(logits, top_k: int = 0, top_p: float = 1.0,
                       min_tokens_to_keep: int = 1,
                       filter_value: float = -1e9):
    """Static-shape port of `top_k_top_p_filtering` (:1046-1080)."""
    V = logits.shape[-1]
    if top_k > 0:
        k = max(min(top_k, V), min_tokens_to_keep)
        kth = jnp.sort(logits, axis=-1)[..., V - k][..., None]
        logits = jnp.where(logits < kth, filter_value, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep 1st)
        cutoff_mask = cum - probs > top_p
        cutoff_mask = cutoff_mask.at[..., :min_tokens_to_keep].set(False)
        # threshold = smallest kept logit
        kept = jnp.where(cutoff_mask, jnp.inf, sorted_logits)
        threshold = jnp.min(kept, axis=-1, keepdims=True)
        logits = jnp.where(logits < threshold, filter_value, logits)
    return logits


def _forced_active(forced_len, t):
    """(B,)-broadcastable bool — whether position t+1 is still inside the
    forced prefix. `forced_len` may be a python int or a (B,) array
    (ragged prefixes)."""
    return jnp.atleast_1d(jnp.asarray(forced_len) > (t + 1))


def _decode_loop(step_fn: StepFn, init_tokens, cache, max_len: int,
                 eos_id: int, pad_id: int, key,
                 select_fn: Callable, forced=None, forced_len=0):
    """Shared scan: `select_fn(logits, key) -> (token, logprob)`.

    `forced` (B, ≥max forced_len) + `forced_len` (int or (B,)) teacher-force
    a decoding prefix: while t+1 < forced_len the emitted token is
    forced[:, t+1] regardless of the model's choice (the KV cache still
    fills from the model pass), so prompted generation reuses the same
    fixed-shape scan — ragged per-sample prompts included.
    """
    B = init_tokens.shape[0]
    buf = jnp.full((B, max_len), pad_id, jnp.int32)
    buf = buf.at[:, 0].set(init_tokens)
    state = DecodeState(
        tokens=buf,
        finished=jnp.zeros((B,), bool),
        cache=cache,
        key=key,
        scores=jnp.zeros((B,), jnp.float32),
    )

    def body(state, t):
        cur = state.tokens[:, t]
        logits, cache = step_fn(cur, state.cache, t)
        state = state._replace(cache=cache)
        key, sub = jax.random.split(state.key)
        nxt, logp = select_fn(logits, sub, state.tokens)
        if forced is not None:
            f_now = _forced_active(forced_len, t)
            ftok = jnp.take(forced, jnp.minimum(t + 1, forced.shape[1] - 1),
                            axis=1)
            logp_all = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            logp_f = jnp.take_along_axis(logp_all, ftok[:, None], 1)[:, 0]
            nxt = jnp.where(f_now, ftok, nxt)
            logp = jnp.where(f_now, logp_f, logp)
        nxt = jnp.where(state.finished, pad_id, nxt).astype(jnp.int32)
        logp = jnp.where(state.finished, 0.0, logp)
        tokens = state.tokens.at[:, t + 1].set(nxt)
        finished = state.finished | (nxt == eos_id)
        if forced is not None:
            finished = finished & ~_forced_active(forced_len, t)
        return DecodeState(tokens, finished, state.cache, key,
                           state.scores + logp), None

    state, _ = jax.lax.scan(body, state, jnp.arange(max_len - 1))
    return state


def greedy_decode(step_fn: StepFn, init_tokens, cache, max_len: int,
                  eos_id: int, pad_id: int = 0,
                  repetition_penalty: float = 1.0,
                  forced=None, forced_len=0):
    def select(logits, key, emitted):
        logits = apply_repetition_penalty(logits, emitted,
                                          repetition_penalty)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok = jnp.argmax(logits, axis=-1)
        return tok, jnp.take_along_axis(logp, tok[:, None], 1)[:, 0]

    return _decode_loop(step_fn, init_tokens, cache, max_len, eos_id,
                        pad_id, jax.random.PRNGKey(0), select,
                        forced=forced, forced_len=forced_len)


def sample_decode(step_fn: StepFn, init_tokens, cache, max_len: int,
                  eos_id: int, key, pad_id: int = 0,
                  temperature: float = 1.0, top_k: int = 0,
                  top_p: float = 1.0, repetition_penalty: float = 1.0,
                  forced=None, forced_len=0):
    def select(logits, key, emitted):
        logits = apply_repetition_penalty(logits, emitted,
                                          repetition_penalty)
        if temperature != 1.0:
            logits = logits / temperature
        filtered = top_k_top_p_filter(logits, top_k, top_p)
        tok = jax.random.categorical(key, filtered, axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return tok, jnp.take_along_axis(logp, tok[:, None], 1)[:, 0]

    return _decode_loop(step_fn, init_tokens, cache, max_len, eos_id,
                        pad_id, key, select,
                        forced=forced, forced_len=forced_len)


@dataclass
class BeamResult:
    tokens: jnp.ndarray          # (B, num_beams, L) best-first
    scores: jnp.ndarray          # (B, num_beams) length-penalized


def beam_search(step_fn: StepFn, init_tokens, cache, max_len: int,
                eos_id: int, num_beams: int, pad_id: int = 0,
                length_penalty: float = 1.0,
                early_stopping: bool = False,
                forced=None, forced_len=0,
                bonus_mask=None, bonus_factor: float = 1.0,
                repetition_penalty: float = 1.0) -> BeamResult:
    """Fixed-shape beam search (reference `_generate_beam_search` +
    `BeamHypotheses`). The cache pytree must have leading batch dim B; it is
    tiled to B·num_beams and re-gathered every step.

    `forced`/`forced_len` teacher-force a (possibly ragged) decoding prefix
    through every beam. `bonus_mask` (B, V) + `bonus_factor` implement the
    reference's `BeamSearchScorer_constrained` semantics
    (`modeling_vcr_chunkalign_v10.py:1948-1950`): a candidate emitting a
    constraint token has its RUNNING score multiplied by the factor —
    log-probs are negative, so a factor < 1 boosts constraint words."""
    B = init_tokens.shape[0]
    K = num_beams
    BK = B * K

    def tile(x):
        return jnp.repeat(x, K, axis=0)

    cache = jax.tree.map(tile, cache)
    tokens = jnp.full((BK, max_len), pad_id, jnp.int32)
    tokens = tokens.at[:, 0].set(jnp.repeat(init_tokens, K, axis=0))
    # only beam 0 alive initially to avoid duplicate beams
    beam_scores = jnp.broadcast_to(
        jnp.where(jnp.arange(K) == 0, 0.0, -1e9), (B, K)
    ).astype(jnp.float32)

    fin_tokens = jnp.full((B, K, max_len), pad_id, jnp.int32)
    fin_scores = jnp.full((B, K), -jnp.inf, jnp.float32)

    def body(carry, t):
        tokens, beam_scores, cache, fin_tokens, fin_scores = carry
        cur = tokens[:, t]
        logits, cache = step_fn(cur, cache, t)           # (BK, V)
        V = logits.shape[-1]
        if repetition_penalty != 1.0:
            logits = apply_repetition_penalty(logits, tokens,
                                              repetition_penalty)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        cand = beam_scores.reshape(BK, 1) + logp          # (BK, V)
        if bonus_mask is not None and bonus_factor != 1.0:
            cand = cand.reshape(B, K, V)
            cand = jnp.where(bonus_mask[:, None, :], cand * bonus_factor,
                             cand)
            cand = cand.reshape(BK, V)
        if forced is not None:
            f_now = _forced_active(forced_len, t)         # (B,)
            ftok = jnp.take(forced, jnp.minimum(t + 1, forced.shape[1] - 1),
                            axis=1)                       # (B,)
            only_forced = jax.nn.one_hot(ftok, V, dtype=bool)   # (B, V)
            cand = cand.reshape(B, K, V)
            cand = jnp.where(
                f_now[:, None, None],
                jnp.where(only_forced[:, None, :], cand, -1e9), cand)
            cand = cand.reshape(BK, V)
        cand = cand.reshape(B, K * V)
        # take 2K best to guarantee K non-eos continuations
        top_scores, top_idx = jax.lax.top_k(cand, 2 * K)  # (B, 2K)
        src_beam = top_idx // V
        tok = (top_idx % V).astype(jnp.int32)
        is_eos = tok == eos_id

        # finished hypotheses: push eos candidates into fixed K slots
        # hypothesis length after this step = t + 2 tokens (BeamHypotheses
        # length penalty: score / len**alpha)
        lp = (t + 2).astype(jnp.float32) ** length_penalty
        fin_cand_scores = jnp.where(is_eos, top_scores / lp, -jnp.inf)
        # gather candidate token rows
        flat_src = (jnp.arange(B)[:, None] * K + src_beam).reshape(-1)
        cand_tokens = tokens[flat_src].reshape(B, 2 * K, max_len)
        cand_tokens = cand_tokens.at[:, :, t + 1].set(
            jnp.where(is_eos, eos_id, tok))
        # merge with existing finished set, keep top K
        all_scores = jnp.concatenate([fin_scores, fin_cand_scores], axis=1)
        all_tokens = jnp.concatenate([fin_tokens, cand_tokens], axis=1)
        keep_scores, keep_idx = jax.lax.top_k(all_scores, K)
        fin_scores = keep_scores
        fin_tokens = jnp.take_along_axis(
            all_tokens, keep_idx[:, :, None], axis=1)

        # alive beams: best K non-eos candidates
        alive_scores = jnp.where(is_eos, -jnp.inf, top_scores)
        new_scores, alive_idx = jax.lax.top_k(alive_scores, K)  # (B, K)
        new_tok = jnp.take_along_axis(tok, alive_idx, 1)
        new_src = jnp.take_along_axis(src_beam, alive_idx, 1)
        flat_new_src = (jnp.arange(B)[:, None] * K + new_src).reshape(-1)
        tokens = tokens[flat_new_src]
        tokens = tokens.at[:, t + 1].set(new_tok.reshape(-1))
        cache = jax.tree.map(lambda x: x[flat_new_src], cache)
        beam_scores = new_scores

        return (tokens, beam_scores, cache, fin_tokens, fin_scores), None

    carry = (tokens, beam_scores, cache, fin_tokens, fin_scores)
    carry, _ = jax.lax.scan(body, carry, jnp.arange(max_len - 1))
    tokens, beam_scores, cache, fin_tokens, fin_scores = carry

    # flush still-alive beams as length-max hypotheses
    final_lp = float(max_len) ** length_penalty
    alive_final = beam_scores / final_lp                    # (B, K)
    all_scores = jnp.concatenate([fin_scores, alive_final], axis=1)
    all_tokens = jnp.concatenate(
        [fin_tokens, tokens.reshape(B, K, max_len)], axis=1)
    best_scores, best_idx = jax.lax.top_k(all_scores, K)
    best_tokens = jnp.take_along_axis(all_tokens, best_idx[:, :, None],
                                      axis=1)
    return BeamResult(tokens=best_tokens, scores=best_scores)
