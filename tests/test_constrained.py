"""Constrained beam search + retrieval eval tests."""

import numpy as np

import jax.numpy as jnp

from icka_tpu.evaluation.retrieval import itm_eval, recall_at_k
from icka_tpu.generation.constrained import (
    constrained_beam_search,
    fsm_from_constraints,
    select_best_beam_with_constraints,
)

V, EOS, PAD = 8, 7, 0


def test_fsm_single_token_constraints():
    fsm = fsm_from_constraints([[3], [5]], V)
    assert fsm.num_states == 4
    nxt = fsm.next_state
    assert nxt[0, 3] == 1          # emit 3 → constraint 0 satisfied
    assert nxt[0, 5] == 2
    assert nxt[1, 5] == 3
    assert nxt[3, 3] == 3          # both satisfied, absorbing
    assert fsm.state_bits.tolist() == [0, 1, 1, 2]


def test_fsm_multi_token_chain():
    fsm = fsm_from_constraints([[2, 4]], V)
    # states: 0 (none), 1 (done), chain (mask=0, pos=1)
    assert fsm.num_states == 3
    nxt = fsm.next_state
    chain = nxt[0, 2]
    assert chain == 2              # entering the chain sub-state
    assert nxt[chain, 4] == 1      # completing the phrase
    assert nxt[chain, 3] == 0      # mismatch resets


def make_step(table):
    table = jnp.asarray(table)

    def step(tokens_t, cache, t):
        return table[tokens_t], cache

    return step


def test_cbs_prefers_constrained_words():
    """LM strongly prefers token 1; constraint requires token 3. The
    unconstrained best beam (state 0) should be all 1s; the constrained
    winner (state 1) must contain token 3."""
    rng = np.random.default_rng(0)
    table = np.full((V, V), -4.0, np.float32)
    table[:, 1] = 4.0
    table[:, 3] = 1.0
    fsm = fsm_from_constraints([[3]], V)
    init = jnp.asarray([2], jnp.int32)
    res = constrained_beam_search(make_step(table), init, None, fsm,
                                  max_len=5, eos_id=EOS, beams_per_state=2)
    toks, scores = select_best_beam_with_constraints(res, fsm,
                                                     min_constraints=1)
    assert 3 in toks[0].tolist()
    # unconstrained state-0 best avoids 3
    state0_best = np.asarray(res.tokens)[0, 0, 0]
    assert 3 not in state0_best.tolist()


def test_cbs_scores_are_consistent():
    rng = np.random.default_rng(1)
    table = rng.standard_normal((V, V)).astype(np.float32)
    fsm = fsm_from_constraints([[3]], V)
    res = constrained_beam_search(make_step(table),
                                  jnp.asarray([1, 2], jnp.int32), None,
                                  fsm, max_len=4, eos_id=EOS,
                                  beams_per_state=2)
    assert res.tokens.shape == (2, 2, 2, 4)
    # verify the top state-0 beam's score equals its token log-probs
    import jax
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(table), axis=-1))
    toks = np.asarray(res.tokens)[0, 0, 0]
    want = 0.0
    for i in range(3):
        nxt = toks[i + 1]
        want += logp[toks[i], nxt]
        if nxt == EOS:  # finished beams emit free pads afterwards
            break
    np.testing.assert_allclose(float(res.logprobs[0, 0, 0]), want,
                               rtol=1e-5)


def test_recall_at_k():
    sim = np.array([[0.9, 0.1, 0.0],
                    [0.2, 0.8, 0.0],
                    [0.3, 0.4, 0.2]], np.float32)
    m = recall_at_k(sim, np.arange(3), ks=(1, 2))
    np.testing.assert_allclose(m["r1"], 2 / 3)
    np.testing.assert_allclose(m["r2"], 2 / 3)


def test_itm_eval_perfect_diagonal():
    sim = np.eye(6, dtype=np.float32) + 0.01
    m = itm_eval(sim)
    assert m["txt_r1"] == 1.0 and m["img_r1"] == 1.0
    assert m["r_mean"] == 1.0
