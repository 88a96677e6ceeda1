"""Local `from_pretrained` resolution surface (component #9).

The reference resolves pretrained archives through a download+cache layer
(`my_bert/file_utils.py:97-262`) and loads them in `from_pretrained`
(`Cross_Modal_Interaction_Module.py:169-268`). The rebuild is zero-egress:
`icka_tpu.models.pretrained` resolves the SAME layouts (HF directory,
tar.gz archive, bare cache name) from local disk, with one call returning
(config, params).
"""

import json
import os
import tarfile

import numpy as np
import pytest
import torch

import jax

from icka_tpu.models.pretrained import (
    cache_root,
    encoder_config_from_hf,
    load_backbone,
    load_text_encoder,
    resolve,
    save_text_encoder,
)
from icka_tpu.nn.bert import TextEncoder

CFG_KW = dict(vocab_size=64, hidden_size=16, num_hidden_layers=2,
              num_attention_heads=2, intermediate_size=32,
              max_position_embeddings=32)


def _hf_dir(tmp_path, name="hf", safetensors=False):
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    hf = BertModel(BertConfig(**CFG_KW))
    src = tmp_path / name
    src.mkdir(parents=True, exist_ok=True)
    if safetensors:
        from safetensors.numpy import save_file

        save_file({k: v.numpy() for k, v in hf.state_dict().items()},
                  src / "model.safetensors")
    else:
        torch.save(hf.state_dict(), src / "pytorch_model.bin")
    cfg = dict(CFG_KW, model_type="bert", pad_token_id=0,
               layer_norm_eps=1e-12, type_vocab_size=2,
               hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    (src / "config.json").write_text(json.dumps(cfg))
    return src, hf


def _assert_matches_torch(cfg, params, hf, rng):
    model = TextEncoder(cfg)
    ids = rng.integers(1, 64, (2, 8)).astype(np.int32)
    seq, _ = model.apply({"params": params}, ids, np.ones_like(ids))
    with torch.no_grad():
        want = hf.eval()(torch.as_tensor(ids.astype(np.int64))) \
            .last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(seq), want, atol=5e-4)


def test_load_hf_directory(tmp_path, rng):
    src, hf = _hf_dir(tmp_path)
    cfg, params = load_text_encoder(str(src))
    assert cfg.num_hidden_layers == 2 and cfg.position_offset == 0
    _assert_matches_torch(cfg, params, hf, rng)


def test_load_hf_safetensors(tmp_path, rng):
    src, hf = _hf_dir(tmp_path, safetensors=True)
    cfg, params = load_text_encoder(str(src))
    _assert_matches_torch(cfg, params, hf, rng)


def test_native_roundtrip_loads_without_torch_dialect(tmp_path, rng):
    src, hf = _hf_dir(tmp_path)
    cfg, params = load_text_encoder(str(src))
    dst = tmp_path / "native"
    save_text_encoder(str(dst), cfg, params)
    cfg2, params2 = load_text_encoder(str(dst))
    assert cfg2 == cfg
    _assert_matches_torch(cfg2, params2, hf, rng)


def test_config_overrides_are_applied(tmp_path):
    src, _ = _hf_dir(tmp_path)
    cfg, _ = load_text_encoder(str(src), quant="int8_static",
                               use_pallas=True)
    assert cfg.quant == "int8_static" and cfg.use_pallas


def test_tarball_resolution_and_cache_reuse(tmp_path, rng, monkeypatch):
    monkeypatch.setenv("ICKA_PRETRAINED_DIR", str(tmp_path / "cache"))
    src, hf = _hf_dir(tmp_path)
    tgz = tmp_path / "model.tar.gz"
    with tarfile.open(tgz, "w:gz") as tf:
        tf.add(src, arcname="model")

    d1 = resolve(str(tgz))
    d2 = resolve(str(tgz))          # second resolve reuses the extraction
    assert d1 == d2 and os.path.exists(os.path.join(d1, "config.json"))
    cfg, params = load_text_encoder(str(tgz))
    _assert_matches_torch(cfg, params, hf, rng)


def test_bare_name_resolves_under_cache_root(tmp_path, monkeypatch):
    monkeypatch.setenv("ICKA_PRETRAINED_DIR", str(tmp_path / "cache"))
    assert cache_root() == str(tmp_path / "cache")
    _hf_dir(tmp_path / "cache", name="roberta-tiny")
    assert resolve("roberta-tiny") == str(tmp_path / "cache" /
                                          "roberta-tiny")
    with pytest.raises(FileNotFoundError, match="not found"):
        resolve("no-such-model")


def test_encoder_config_from_hf_roberta_offset():
    cfg = encoder_config_from_hf(
        {"model_type": "roberta", "pad_token_id": 1, "vocab_size": 50265})
    assert cfg.position_offset == 2 and cfg.pad_token_id == 1
    cfg = encoder_config_from_hf(
        {"model_type": "bert", "pad_token_id": 0, "vocab_size": 30522})
    assert cfg.position_offset == 0


def test_load_backbone_pth(tmp_path):
    from tests.test_resnet import TorchResNet

    ref = TorchResNet((1, 1, 1, 1))
    src = tmp_path / "resnet152.pth"
    torch.save(ref.state_dict(), src)
    variables = load_backbone(str(src))
    assert "params" in variables and "batch_stats" in variables
    # directory resolution finds the conventional filename too
    variables2 = load_backbone(str(tmp_path))
    assert jax.tree.structure(variables) == jax.tree.structure(variables2)
