"""BaseLine / Base_freeze / ensemble-refiner classes
(`modeling_vcr_chunkalign_v10.py:376-659,874-1000`) — the ChunkAlign
family tail (reference component #20)."""

import numpy as np

import jax
import jax.numpy as jnp

from icka_tpu.models.chunkalign import ChunkAlignConfig
from icka_tpu.models.chunkalign_baselines import (
    BaselineCLS,
    BaselineRationale,
    EnsembleRefiner,
)
from icka_tpu.models.gpt2 import GPT2Config
from tests.test_chunkalign_rationale import _inputs


def _base_inputs(seed=0):
    cfg = ChunkAlignConfig.tiny()
    rng = np.random.default_rng(seed)
    B, C = 2, cfg.num_choices
    ids, img, mask, chunk_mask, gather = _inputs(rng, cfg, B * C)
    label = np.zeros((B * C,), np.int32)
    label[::C] = 1
    return cfg, rng, ids, img, mask, chunk_mask, gather, label


def test_baseline_cls_train_and_eval():
    cfg, rng, ids, img, mask, _, _, label = _base_inputs()
    model = BaselineCLS(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, img, mask, label)
    loss, matched = model.apply(params, ids, img, mask, label)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert np.asarray(matched).shape == (2,)
    pred, scores = model.apply(params, ids, img, mask)
    assert np.asarray(pred).shape == (2,)
    assert np.asarray(scores).shape == (2, cfg.num_choices)


def test_baseline_rationale_and_freeze():
    cfg, rng, ids, img, mask, _, _, label = _base_inputs()
    gcfg = GPT2Config.tiny()
    Lg = 10
    expl = rng.integers(2, gcfg.vocab_size, (ids.shape[0], Lg)) \
        .astype(np.int32)
    attn = np.ones((ids.shape[0], Lg), np.int32)

    for freeze in (False, True):
        model = BaselineRationale(cfg, gpt2_cfg=gcfg, pad_token_id=0,
                                  hypo_only_memory=freeze,
                                  freeze_encoder=freeze)
        params = model.init(jax.random.PRNGKey(0), ids, img, mask, expl,
                            attn, label)
        gen_loss, cls_loss, matched = model.apply(
            params, ids, img, mask, expl, attn, label)
        assert np.isfinite(float(gen_loss)) and float(gen_loss) > 0
        assert np.isfinite(float(cls_loss))
        # frozen encoder: grads wrt the oscar encoder must be exactly zero
        if freeze:
            def loss_fn(p):
                g, c, _ = model.apply(p, ids, img, mask, expl, attn, label)
                return g + c
            grads = jax.grad(loss_fn)(params)
            osc = jax.tree_util.tree_leaves(grads["params"]["oscar"])
            assert all(float(jnp.abs(g).max()) == 0.0 for g in osc)

        pred, mem, mem_mask = model.apply(
            params, ids, img, mask,
            method=BaselineRationale.encode_for_generation)
        Lh = ids.shape[1]
        exp_len = (Lh - 1) if freeze else (Lh + img.shape[1])
        assert np.asarray(mem).shape[1] == exp_len
        assert np.asarray(mem_mask).shape[1] == exp_len


def test_baseline_rationale_cached_generation():
    """The baseline family plugs into the same KV-cached engines."""
    from icka_tpu.generation.decoding import greedy_decode
    from icka_tpu.generation.gpt2_cache import (
        cached_gpt2_step,
        precompute_gpt2_cache,
    )

    cfg, rng, ids, img, mask, _, _, label = _base_inputs()
    gcfg = GPT2Config.tiny()
    expl = rng.integers(2, gcfg.vocab_size, (ids.shape[0], 10)) \
        .astype(np.int32)
    attn = np.ones((ids.shape[0], 10), np.int32)
    model = BaselineRationale(cfg, gpt2_cfg=gcfg, pad_token_id=0)
    params = model.init(jax.random.PRNGKey(0), ids, img, mask, expl, attn,
                        label)
    pred, mem, mem_mask = model.apply(
        params, ids, img, mask,
        method=BaselineRationale.encode_for_generation)
    prompt = rng.integers(2, gcfg.vocab_size, (2, 3)).astype(np.int32)
    total = 3 + 4
    cache = precompute_gpt2_cache(params["params"]["dec"], gcfg,
                                  mem, mem_mask, total)
    lm_k = params["params"]["lm_head"]["kernel"]

    def step(tok, c, t):
        return cached_gpt2_step(params["params"]["dec"], gcfg, lm_k,
                                tok, t, c)

    st = greedy_decode(step, jnp.asarray(prompt[:, 0]), cache, total,
                       eos_id=1, forced=jnp.asarray(prompt), forced_len=3)
    toks = np.asarray(st.tokens)
    np.testing.assert_array_equal(toks[:, :3], prompt)


def test_ensemble_refiner():
    cfg, rng, ids, img, mask, chunk_mask, gather, label = _base_inputs()
    Lh = ids.shape[1]
    align_pos = np.zeros((ids.shape[0], Lh), np.int32)
    align_pos[:, 1] = 1
    total_label = np.zeros((ids.shape[0], Lh), np.int32)
    model = EnsembleRefiner(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, img, mask, chunk_mask,
                        gather, 6, align_pos, total_label)
    cls, align_loss = model.apply(params, ids, img, mask, chunk_mask,
                                  gather, 6, align_pos, total_label)
    assert np.asarray(cls).shape == (ids.shape[0],
                                     cfg.encoder.hidden_size)
    assert np.isfinite(float(align_loss))
    # encoders are frozen: grads must not reach them
    def loss_fn(p):
        c, a = model.apply(p, ids, img, mask, chunk_mask, gather, 6,
                           align_pos, total_label)
        return jnp.sum(c ** 2) + a
    grads = jax.grad(loss_fn)(params)
    for enc in ("global_enc", "seq_enc"):
        leaves = jax.tree_util.tree_leaves(grads["params"][enc])
        assert all(float(jnp.abs(g).max()) == 0.0 for g in leaves)
    # but DO reach the refiner head
    head = jax.tree_util.tree_leaves(grads["params"]["cls_layer_lyx_0"])
    assert any(float(jnp.abs(g).max()) > 0.0 for g in head)
