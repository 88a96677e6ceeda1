"""Encoder parity: our JAX stack vs HuggingFace torch models with identical
weights (the reference's encoders are HF RoBERTa + an HF-equivalent legacy
BERT, so HF is the numerical ground truth)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from icka_tpu.core.config import EncoderConfig
from icka_tpu.models.convert import (
    encoder_params_from_torch,
    lstm_params_from_torch,
)
from icka_tpu.nn.bert import (
    PromptSpliceEncoder,
    TextEncoder,
    mask_position_ids,
    splice_prompt,
)
from icka_tpu.nn.lstm import BiLSTM

TINY = dict(vocab_size=99, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64)


def _inputs(rng, B=3, L=10, vocab=99, pad=0):
    ids = rng.integers(5, vocab, (B, L)).astype(np.int32)
    lens = rng.integers(3, L + 1, B)
    mask = (np.arange(L)[None] < lens[:, None]).astype(np.int32)
    ids = np.where(mask > 0, ids, pad)
    return ids, mask


def test_bert_matches_hf(rng):
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(**TINY, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0,
                        pad_token_id=0, type_vocab_size=2)
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()

    cfg = EncoderConfig(**TINY, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0,
                        layer_norm_eps=1e-12, position_offset=0,
                        pad_token_id=0, type_vocab_size=2)
    params = {"params": encoder_params_from_torch(
        hf.state_dict(), cfg.num_hidden_layers)}

    ids, mask = _inputs(rng)
    types = (rng.integers(0, 2, ids.shape) * mask).astype(np.int32)

    with torch.no_grad():
        want = hf(input_ids=torch.as_tensor(ids.astype(np.int64)),
                  attention_mask=torch.as_tensor(mask.astype(np.int64)),
                  token_type_ids=torch.as_tensor(types.astype(np.int64)))

    model = TextEncoder(cfg)
    got_seq, got_pool = model.apply(params, ids, mask, types)
    np.testing.assert_allclose(np.asarray(got_seq),
                               want.last_hidden_state.numpy(),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_pool),
                               want.pooler_output.numpy(), atol=5e-4)


def test_roberta_matches_hf(rng):
    from transformers import RobertaConfig, RobertaModel

    hf_cfg = RobertaConfig(**TINY, hidden_dropout_prob=0.0,
                           attention_probs_dropout_prob=0.0,
                           pad_token_id=1, type_vocab_size=1,
                           layer_norm_eps=1e-5)
    torch.manual_seed(1)
    hf = RobertaModel(hf_cfg).eval()

    cfg = EncoderConfig(**TINY, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0,
                        layer_norm_eps=1e-5, position_offset=2,
                        pad_token_id=1, type_vocab_size=1)
    params = {"params": encoder_params_from_torch(
        hf.state_dict(), cfg.num_hidden_layers)}

    ids, mask = _inputs(rng, pad=1)
    with torch.no_grad():
        want = hf(input_ids=torch.as_tensor(ids.astype(np.int64)),
                  attention_mask=torch.as_tensor(mask.astype(np.int64)))

    got_seq, _ = TextEncoder(cfg).apply(params, ids, mask)
    np.testing.assert_allclose(np.asarray(got_seq),
                               want.last_hidden_state.numpy(), atol=5e-4)


def test_bilstm_matches_torch(rng):
    B, L, D, H = 4, 12, 16, 24
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    torch.manual_seed(2)
    ref = torch.nn.LSTM(D, H, batch_first=True, bidirectional=True)
    with torch.no_grad():
        want, _ = ref(torch.as_tensor(x))

    params = {"params": lstm_params_from_torch(ref.state_dict())}
    got = BiLSTM(hidden=H).apply(params, x)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-5)


def test_splice_prompt_layout():
    B, L, D, P = 2, 12, 4, 3
    seq = np.arange(B * L * D, dtype=np.float32).reshape(B, L, D)
    prompt = -np.ones((B, 2 * P, D), np.float32)
    m1, m2 = 3, 7
    out = np.asarray(splice_prompt(jnp.asarray(seq), jnp.asarray(prompt),
                                   m1, m2))
    assert out.shape == (B, L - 2 + 2 * P, D)
    np.testing.assert_array_equal(out[:, :m1], seq[:, :m1])
    np.testing.assert_array_equal(out[:, m1:m1 + P], prompt[:, :P])
    np.testing.assert_array_equal(out[:, m1 + P:m1 + P + (m2 - m1 - 1)],
                                  seq[:, m1 + 1:m2])
    np.testing.assert_array_equal(
        out[:, m1 + P + m2 - m1 - 1:m1 + P + m2 - m1 - 1 + P], prompt[:, P:])
    np.testing.assert_array_equal(out[:, -(L - m2 - 1):], seq[:, m2 + 1:])


def test_prompt_splice_encoder_equals_manual_embed(rng):
    """Splicing inside the encoder == running the plain encoder on manually
    spliced input embeddings with matching position/type ids."""
    cfg = EncoderConfig(**TINY, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0,
                        layer_norm_eps=1e-5, position_offset=2,
                        pad_token_id=1, type_vocab_size=2)
    B, L, P = 2, 14, 5
    m1, m2 = 3, 9
    ids, mask = _inputs(rng, B=B, L=L, pad=1)
    types = np.zeros((B, L), np.int32)
    prompt = rng.standard_normal((B, 2 * P, cfg.hidden_size)).astype(np.float32)
    pmask = np.ones((B, 2 * P), np.int32)

    model = PromptSpliceEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, mask, types, prompt,
                        pmask, (m1, m2))
    got, got_mask = model.apply(params, ids, mask, types, prompt, pmask,
                                (m1, m2))
    assert got.shape == (B, L - 2 + 2 * P, cfg.hidden_size)

    # manual path through TextEncoder with inputs_embeds
    plain = TextEncoder(cfg, with_pooler=False)
    word = params["params"]["embeddings"]["word_embeddings"]
    tok = np.take(np.asarray(word), ids, axis=0)
    spliced = np.asarray(splice_prompt(jnp.asarray(tok), jnp.asarray(prompt),
                                       m1, m2))
    smask = np.asarray(splice_prompt(jnp.asarray(mask), jnp.asarray(pmask),
                                     m1, m2))
    stypes = np.zeros_like(smask)
    pos = mask_position_ids(jnp.asarray(smask), cfg.pad_token_id)
    want, _ = plain.apply(params, None, smask, stypes, pos, spliced)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_encoder_variable_batch_jit(rng):
    cfg = EncoderConfig.tiny()
    ids, mask = _inputs(rng, vocab=cfg.vocab_size, pad=1)
    model = TextEncoder(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, mask)
    f = jax.jit(lambda p, i, m: model.apply(p, i, m)[0])
    out = f(params, ids, mask)
    assert out.shape == (*ids.shape, cfg.hidden_size)


def test_int8_encoder_close_to_fp32(rng):
    """W8A8 serving quantization: the int8 encoder tracks the fp32 encoder
    closely (cosine > 0.995 per token) — the accuracy contract behind the
    2x-MXU inference mode."""
    import dataclasses

    from icka_tpu.models.convert import quantize_params_like

    cfg = EncoderConfig(**TINY, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0,
                        layer_norm_eps=1e-5, position_offset=2,
                        pad_token_id=1)
    qcfg = dataclasses.replace(cfg, quant="int8")
    ids, mask = _inputs(rng, pad=1)

    model = TextEncoder(cfg, with_pooler=False)
    qmodel = TextEncoder(qcfg, with_pooler=False)
    params = model.init(jax.random.PRNGKey(3), ids, mask)
    qinit = qmodel.init(jax.random.PRNGKey(3), ids, mask)
    qparams = {"params": quantize_params_like(qinit["params"],
                                              params["params"])}

    want, _ = model.apply(params, ids, mask)
    got, _ = qmodel.apply(qparams, ids, mask)
    want = np.asarray(want, np.float64)
    got = np.asarray(got, np.float64)
    cos = (want * got).sum(-1) / (
        np.linalg.norm(want, axis=-1) * np.linalg.norm(got, axis=-1))
    assert cos.min() > 0.995, cos.min()
    # and the quantized tree really is int8 where it matters
    leaves = jax.tree_util.tree_leaves_with_path(qparams)
    n_int8 = sum(1 for p, l in leaves if l.dtype == np.int8)
    assert n_int8 == cfg.num_hidden_layers * 6


def test_remat_policies_preserve_semantics(rng):
    """remat is a memory/recompute trade-off, never a numerics change:
    every policy must produce identical outputs AND gradients to the
    plain encoder (fp32, CPU-exact)."""
    import dataclasses

    import jax.numpy as jnp
    from icka_tpu.nn.attention import Encoder

    cfg = EncoderConfig(**TINY, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    x = rng.standard_normal((2, 6, cfg.hidden_size)).astype(np.float32)
    enc = Encoder(cfg)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def loss(p, model):
        return jnp.sum(model.apply(p, jnp.asarray(x)) ** 2)

    want = loss(params, enc)
    want_g = jax.grad(loss)(params, enc)
    for policy in ("full", "alternate", "dots", "dots_nb"):
        rcfg = dataclasses.replace(cfg, remat=True, remat_policy=policy)
        renc = Encoder(rcfg)
        got = loss(params, renc)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
        got_g = jax.grad(loss)(params, renc)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5),
            want_g, got_g)
