"""Beam/constrained rationale generation (the `_beam` decoder family,
`modeling_vcr_chunkalign_v10.py:1845-2827`) + KV-cached GPT-2 decoding.

Pins:
  - the KV-cached greedy path emits EXACTLY the full-recompute
    `ChunkAlignRationale.generate` tokens (the serving-path oracle);
  - forced (ragged) prompt prefixes are teacher-forced through every
    engine;
  - beam search finds a sequence at least as likely as greedy on a
    deterministic toy model, and the constraint score-bonus
    (`BeamSearchScorer_constrained` semantics) steers the beam;
  - the `_wo_chual` / `_wo_reasoning` variant flags change the graph
    (param sets) while keeping every head functional.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icka_tpu.generation.decoding import beam_search, greedy_decode
from icka_tpu.models.chunkalign import (
    ChunkAlignConfig,
    ChunkAlignRationale,
    generate_rationale,
    rationale_bonus_mask,
)
from icka_tpu.models.gpt2 import GPT2Config
from tests.test_chunkalign_rationale import _inputs


def _build(rng_seed=0, **cfg_kw):
    cfg = ChunkAlignConfig.tiny()
    if cfg_kw:
        import dataclasses
        cfg = dataclasses.replace(cfg, **cfg_kw)
    gcfg = GPT2Config.tiny()
    model = ChunkAlignRationale(cfg, gpt2_cfg=gcfg, pad_token_id=0)
    rng = np.random.default_rng(rng_seed)
    B, C = 2, cfg.num_choices
    ids, img, mask, chunk_mask, gather = _inputs(rng, cfg, B * C)
    Lg = 12
    expl = rng.integers(2, gcfg.vocab_size, (B * C, Lg)).astype(np.int32)
    attn = np.ones((B * C, Lg), np.int32)
    label = np.zeros((B * C,), np.int32)
    label[::C] = 1
    params = model.init(jax.random.PRNGKey(0), ids, img, mask, chunk_mask,
                        gather, 6, expl, attn, label, expl.copy())
    enc_inputs = dict(input_ids=ids, img_feats=img, input_mask=mask,
                      chunk_mask=chunk_mask, gather_index=gather,
                      num_chunks=6)
    return model, params, enc_inputs, rng


def test_cached_greedy_equals_full_recompute():
    model, params, enc, rng = _build()
    B = 2
    Lp = 4
    prompt = rng.integers(2, model.gpt2_cfg.vocab_size,
                          (B, Lp)).astype(np.int32)
    want, pred_w = model.apply(
        params, enc["input_ids"], enc["img_feats"], enc["input_mask"],
        enc["chunk_mask"], enc["gather_index"], 6, prompt,
        max_gen_len=6, eos_id=1,
        method=ChunkAlignRationale.generate)
    got, pred_g = generate_rationale(model, params, enc, prompt,
                                     prompt_len=Lp, max_gen_len=6,
                                     mode="greedy", eos_id=1)
    np.testing.assert_array_equal(np.asarray(pred_w), np.asarray(pred_g))
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_ragged_prompt_forced_through():
    model, params, enc, rng = _build()
    B, Lp = 2, 5
    prompt = rng.integers(2, model.gpt2_cfg.vocab_size,
                          (B, Lp)).astype(np.int32)
    plen = np.array([5, 3], np.int32)
    toks, _ = generate_rationale(model, params, enc, prompt,
                                 prompt_len=plen, max_gen_len=5,
                                 mode="greedy", eos_id=1)
    toks = np.asarray(toks)
    np.testing.assert_array_equal(toks[0, :5], prompt[0, :5])
    np.testing.assert_array_equal(toks[1, :3], prompt[1, :3])
    # row 1 starts generating right after its shorter prompt: position 3
    # is model-chosen, not the (ignored) prompt tail
    assert toks.shape == (2, 10)


def test_beam_and_constrained_modes_run():
    from icka_tpu.generation.constrained import fsm_from_constraints

    model, params, enc, rng = _build()
    B, Lp = 2, 3
    prompt = rng.integers(2, model.gpt2_cfg.vocab_size,
                          (B, Lp)).astype(np.int32)
    greedy, _ = generate_rationale(model, params, enc, prompt,
                                   prompt_len=Lp, max_gen_len=5,
                                   mode="greedy", eos_id=1)
    beam, pred = generate_rationale(model, params, enc, prompt,
                                    prompt_len=Lp, max_gen_len=5,
                                    mode="beam", num_beams=3, eos_id=1)
    beam = np.asarray(beam)
    assert beam.shape == np.asarray(greedy).shape
    np.testing.assert_array_equal(beam[:, :Lp], prompt)
    assert pred.shape == (B,)

    fsm = fsm_from_constraints([[5], [7, 8]], model.gpt2_cfg.vocab_size)
    cons, _ = generate_rationale(model, params, enc, prompt,
                                 prompt_len=Lp, max_gen_len=5,
                                 mode="constrained", fsm=fsm,
                                 beams_per_state=2, eos_id=1)
    cons = np.asarray(cons)
    np.testing.assert_array_equal(cons[:, :Lp], prompt)


# ---- engine-level properties on a deterministic toy model ----

_V = 8


def _toy_step(tok, cache, t):
    """Logits depend on the previous token through a fixed random matrix —
    deterministic, cache-free toy decoder."""
    table = cache["table"]                       # (V, V)
    return table[tok], cache


def _toy_cache(B):
    rng = np.random.default_rng(42)
    table = rng.standard_normal((_V, _V)).astype(np.float32) * 2.0
    return {"table": jnp.broadcast_to(jnp.asarray(table)[None],
                                      (B, _V, _V))[:, 0]}


def _seq_logprob(tokens, table):
    lp = jax.nn.log_softmax(jnp.asarray(table), -1)
    tot = 0.0
    for t in range(tokens.shape[0] - 1):
        tot += float(lp[tokens[t], tokens[t + 1]])
    return tot


def _toy(seed, scale=1.0):
    """Cache-free deterministic toy decoder: logits depend only on the
    previous token through a fixed (V, V) table."""
    table = jnp.asarray(
        np.random.default_rng(seed).standard_normal((_V, _V)) * scale,
        jnp.float32)

    def step(tok, c, t):
        return table[tok], c

    B = 1
    cache = {"dummy": jnp.zeros((B, 1), jnp.float32)}
    return step, cache, np.asarray(table), jnp.zeros((B,), jnp.int32)


def test_beam_at_least_as_good_as_greedy():
    L = 6
    step, cache, table, init = _toy(42, 2.0)
    g = greedy_decode(step, init, cache, L, eos_id=_V + 5)
    bm = beam_search(step, init, cache, L, eos_id=_V + 5, num_beams=4,
                     length_penalty=0.0)
    g_lp = _seq_logprob(np.asarray(g.tokens)[0], table)
    b_lp = _seq_logprob(np.asarray(bm.tokens)[0, 0], table)
    assert b_lp >= g_lp - 1e-5, (b_lp, g_lp)


def test_beam_bonus_steers_selection():
    L = 5
    step, cache, table, init = _toy(3)
    plain = beam_search(step, init, cache, L, eos_id=_V + 5, num_beams=3)
    # strongly boost one low-probability token: running scores of beams
    # that emit it are multiplied toward zero (reference `constrained`
    # semantics: negative score * factor < 1 → better)
    worst = int(np.argmin(table[0]))
    bonus = np.zeros((1, _V), bool)
    bonus[:, worst] = True
    boosted = beam_search(step, init, cache, L, eos_id=_V + 5, num_beams=3,
                          bonus_mask=jnp.asarray(bonus), bonus_factor=0.01)
    assert worst in np.asarray(boosted.tokens)[0, 0]
    assert not np.array_equal(np.asarray(plain.tokens)[0, 0],
                              np.asarray(boosted.tokens)[0, 0])


def test_variant_flags_change_graph():
    full, p_full, enc, rng = _build()
    woc, p_woc, enc_w, _ = _build(use_chunk_align=False)
    wor, p_wor, enc_r, _ = _build(use_reasoning=False)
    names_full = set(p_full["params"]["core"].keys())
    assert "seq_enc" in names_full and "cls_layer_0" in names_full
    assert "seq_enc" not in p_woc["params"]["core"]
    assert "cls_layer_0" not in p_wor["params"]["core"]

    # every variant still classifies + generates
    for model, params, e in ((woc, p_woc, enc_w), (wor, p_wor, enc_r)):
        prompt = rng.integers(2, model.gpt2_cfg.vocab_size,
                              (2, 3)).astype(np.int32)
        toks, pred = generate_rationale(model, params, e, prompt,
                                        prompt_len=3, max_gen_len=4,
                                        mode="beam", num_beams=2, eos_id=1)
        assert np.asarray(toks).shape == (2, 7)
        assert np.asarray(pred).shape == (2,)


def test_bonus_mask_builder():
    attn = np.array([[0.1, 0.5, 0.2, 0.05, 0.1, 0.05] * 3])  # k=3 copies
    ids = np.array([[9, 4, 5, 6, 7, 8, 3]])   # CLS + 6 words
    mapping = np.arange(16) + 100              # enc id -> dec id
    m = rationale_bonus_mask(attn, ids, dec_vocab_size=120,
                             enc_to_dec_ids=mapping, stop_ids=(5,),
                             top_frac=0.4)
    # top-2 attended words are ids 5 (stopworded) and 6 → only dec id 106
    assert m.shape == (1, 120)
    assert m[0, 106] and m.sum() == 1
