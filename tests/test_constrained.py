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


def test_constraint_filter():
    """ConstraintFilter port (`utils/cbs.py:477-630`): blacklist, zero-score
    padding removal, hierarchy NMS (fine suppresses coarse at IoU>=0.85),
    top-k by score, replacements, dedup."""
    from icka_tpu.generation.constrained import ConstraintFilter

    hierarchy = {
        "LabelName": "entity",
        "Subcategory": [
            {"LabelName": "animal",
             "Subcategory": [{"LabelName": "dog"}, {"LabelName": "cat"}]},
            {"LabelName": "furniture",
             "Subcategory": [
                 {"LabelName": "kitchen & dining room table"}]},
        ],
    }
    f = ConstraintFilter(hierarchy, nms_threshold=0.85,
                         max_given_constraints=3)

    boxes = np.array([
        [0, 0, 10, 10],      # dog
        [0, 0, 10, 10],      # animal — same box, coarser → suppressed
        [50, 50, 60, 60],    # kitchen & dining room table → replaced
        [0, 0, 5, 5],        # person — blacklisted
        [20, 20, 30, 30],    # cat, zero score → padding, dropped
    ], np.float32)
    names = ["dog", "animal", "kitchen & dining room table", "person",
             "cat"]
    scores = np.array([0.9, 0.8, 0.7, 0.99, 0.0])
    out = f(boxes, names, scores)
    assert sorted(out) == ["dog", "table"], out

    # non-overlapping coarse box survives NMS
    boxes2 = np.array([[0, 0, 10, 10], [100, 100, 120, 120]], np.float32)
    out2 = f(boxes2, ["dog", "animal"], np.array([0.9, 0.8]))
    assert sorted(out2) == ["animal", "dog"]

    # top-k limit: 4 distinct classes, keep the 3 best-scoring
    boxes3 = np.array([[0, 0, 1, 1], [10, 10, 12, 12], [20, 20, 22, 22],
                       [30, 30, 32, 32]], np.float32)
    out3 = f(boxes3, ["dog", "cat", "furniture", "animal"],
             np.array([0.9, 0.8, 0.7, 0.6]))
    assert sorted(out3) == ["cat", "dog", "furniture"]
