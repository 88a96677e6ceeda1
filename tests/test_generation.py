"""Decoding engine tests against brute-force references."""

import itertools

import numpy as np

import jax
import jax.numpy as jnp

from icka_tpu.generation import (
    beam_search,
    greedy_decode,
    sample_decode,
    top_k_top_p_filter,
)
from icka_tpu.generation.decoding import apply_repetition_penalty

V, EOS, PAD = 7, 6, 0


def make_step(table):
    """Deterministic Markov 'LM': logits depend only on current token."""
    table = jnp.asarray(table)

    def step(tokens_t, cache, t):
        return table[tokens_t], cache

    return step


def test_greedy_follows_argmax_chain(rng):
    table = rng.standard_normal((V, V)).astype(np.float32)
    step = make_step(table)
    init = np.array([1, 2], np.int32)
    out = greedy_decode(step, jnp.asarray(init), None, max_len=5,
                        eos_id=EOS, pad_id=PAD)
    toks = np.asarray(out.tokens)
    for b, start in enumerate(init):
        cur = start
        for t in range(1, 5):
            if cur == EOS:
                assert toks[b, t] == PAD
                continue
            cur = int(np.argmax(table[cur]))
            assert toks[b, t] == cur


def test_greedy_stops_at_eos():
    table = np.full((V, V), -5.0, np.float32)
    table[:, EOS] = 5.0  # always emit EOS
    out = greedy_decode(make_step(table), jnp.asarray([1], jnp.int32), None,
                        max_len=6, eos_id=EOS, pad_id=PAD)
    toks = np.asarray(out.tokens)[0]
    assert toks[1] == EOS and (toks[2:] == PAD).all()
    assert bool(np.asarray(out.finished)[0])


def test_top_k_filter():
    logits = jnp.asarray([[1.0, 3.0, 2.0, -1.0]])
    out = np.asarray(top_k_top_p_filter(logits, top_k=2))
    assert out[0, 1] == 3.0 and out[0, 2] == 2.0
    assert out[0, 0] < -1e8 and out[0, 3] < -1e8


def test_top_p_filter_keeps_nucleus():
    probs = np.array([[0.5, 0.3, 0.15, 0.05]], np.float32)
    logits = jnp.log(jnp.asarray(probs))
    out = np.asarray(top_k_top_p_filter(logits, top_p=0.7))
    # 0.5 + 0.3 >= 0.7 → keep first two only
    assert np.isfinite(out[0, 0]) and out[0, 0] > -1e8
    assert out[0, 1] > -1e8
    assert out[0, 2] < -1e8 and out[0, 3] < -1e8


def test_repetition_penalty():
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    tokens = jnp.asarray([[0, 1]], jnp.int32)
    out = np.asarray(apply_repetition_penalty(logits, tokens, 2.0))
    np.testing.assert_allclose(out[0], [1.0, -4.0, 1.0])


def test_sampling_respects_filter(rng):
    table = rng.standard_normal((V, V)).astype(np.float32)
    out = sample_decode(make_step(table), jnp.asarray([1, 3], jnp.int32),
                        None, max_len=8, eos_id=EOS,
                        key=jax.random.PRNGKey(0), top_k=1)
    greedy = greedy_decode(make_step(table), jnp.asarray([1, 3], jnp.int32),
                           None, max_len=8, eos_id=EOS)
    # top_k=1 sampling IS greedy
    np.testing.assert_array_equal(np.asarray(out.tokens),
                                  np.asarray(greedy.tokens))


def test_beam_search_finds_best_path(rng):
    """num_beams=V exhaustive beam must find the argmax-score sequence
    among all length-L paths (brute force over the tiny vocab)."""
    table = rng.standard_normal((V, V)).astype(np.float32)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(table), axis=-1))
    L = 4  # total tokens incl. start
    start = 2
    result = beam_search(make_step(table), jnp.asarray([start], jnp.int32),
                         None, max_len=L, eos_id=EOS, num_beams=V,
                         length_penalty=1.0)
    # brute force: best non-eos-interrupted path of length L, plus paths
    # that hit EOS earlier
    best = -np.inf
    for path in itertools.product(range(V), repeat=L - 1):
        score, cur, length, hit_eos = 0.0, start, 0, False
        for tok in path:
            score += logp[cur, tok]
            cur = tok
            length += 1
            if tok == EOS:
                hit_eos = True
                break
        denom = (length + 1) if hit_eos else L
        best = max(best, score / denom)
    np.testing.assert_allclose(float(result.scores[0, 0]), best, rtol=1e-5)


def test_beam_search_shapes(rng):
    table = rng.standard_normal((V, V)).astype(np.float32)
    res = beam_search(make_step(table), jnp.asarray([1, 2, 3], jnp.int32),
                      None, max_len=6, eos_id=EOS, num_beams=3)
    assert res.tokens.shape == (3, 3, 6)
    assert res.scores.shape == (3, 3)
    # best-first ordering
    s = np.asarray(res.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()
