"""Checkpoint conversion CLI round-trip tests."""

import numpy as np
import torch

import jax

from icka_tpu.cli.convert import convert_resnet, convert_roberta
from icka_tpu.core.checkpoint import restore_pytree
from icka_tpu.core.config import EncoderConfig
from icka_tpu.nn.bert import TextEncoder


def test_convert_roberta_roundtrip(tmp_path, rng):
    from transformers import BertConfig, BertModel

    cfg_kw = dict(vocab_size=64, hidden_size=16, num_hidden_layers=2,
                  num_attention_heads=2, intermediate_size=32,
                  max_position_embeddings=32)
    torch.manual_seed(0)
    hf = BertModel(BertConfig(**cfg_kw))
    src = tmp_path / "hf"
    src.mkdir()
    torch.save(hf.state_dict(), src / "pytorch_model.bin")
    (src / "config.json").write_text('{"num_hidden_layers": 2}')

    dst = tmp_path / "enc.msgpack"
    convert_roberta(str(src), str(dst))

    cfg = EncoderConfig(**cfg_kw, layer_norm_eps=1e-12, position_offset=0,
                        pad_token_id=0, type_vocab_size=2,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    model = TextEncoder(cfg)
    ids = rng.integers(1, 64, (2, 8)).astype(np.int32)
    init = model.init(jax.random.PRNGKey(0), ids, np.ones_like(ids))
    params = {"params": restore_pytree(str(dst), init["params"])}
    seq, _ = model.apply(params, ids, np.ones_like(ids))
    with torch.no_grad():
        want = hf.eval()(torch.as_tensor(ids.astype(np.int64))) \
            .last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(seq), want, atol=5e-4)


def test_convert_resnet_writes(tmp_path):
    import torch.nn as tnn

    # minimal fake state dict with torchvision resnet152 key layout for
    # the stem; full-layout conversion is covered in test_resnet.py
    from tests.test_resnet import TorchResNet

    ref = TorchResNet((1, 1, 1, 1))
    src = tmp_path / "resnet.pth"
    torch.save(ref.state_dict(), src)
    dst = tmp_path / "resnet.msgpack"
    convert_resnet(str(src), str(dst))
    assert dst.exists() and dst.stat().st_size > 1000


def test_convert_tf_bert_roundtrip(tmp_path, rng):
    """TF checkpoint on disk → `tf_bert` CLI → msgpack → identical forward."""
    from icka_tpu.cli.convert import convert_tf_bert
    from icka_tpu.models.tf_convert import (
        encoder_params_to_tf,
        write_tf_checkpoint,
    )

    cfg = EncoderConfig(vocab_size=64, hidden_size=16, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=32,
                        max_position_embeddings=32, layer_norm_eps=1e-12,
                        position_offset=0, pad_token_id=0, type_vocab_size=2,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
    model = TextEncoder(cfg)
    ids = rng.integers(1, 64, (2, 8)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), ids, np.ones_like(ids))

    src = tmp_path / "tf" / "model.ckpt"
    write_tf_checkpoint(str(src), encoder_params_to_tf(params["params"]))
    dst = tmp_path / "enc.msgpack"
    convert_tf_bert(str(src) + ".index", str(dst))   # .index suffix accepted

    rebuilt = {"params": restore_pytree(str(dst), params["params"])}
    want_seq, _ = model.apply(params, ids, np.ones_like(ids))
    got_seq, _ = model.apply(rebuilt, ids, np.ones_like(ids))
    np.testing.assert_array_equal(np.asarray(got_seq), np.asarray(want_seq))
