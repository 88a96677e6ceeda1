"""TF-checkpoint converter (component #14, `my_bert/convert_tf_checkpoint_to_
pytorch.py` + `load_tf_weights_in_bert`, reimplemented without TensorFlow).

The reader/writer speak the TensorBundle on-disk format (LevelDB-table
index + raw data shards); tests cover the binary format round-trip, crc
integrity, the reference loader's skip rules, and that a checkpoint pushed
through TF-name mapping drives `TextEncoder` bit-identically."""

import numpy as np
import pytest

from icka_tpu.core.config import EncoderConfig
from icka_tpu.models.tf_convert import (
    crc32c,
    encoder_params_from_tf,
    encoder_params_to_tf,
    list_tf_variables,
    read_tf_checkpoint,
    write_tf_checkpoint,
)
from icka_tpu.nn.bert import TextEncoder

TINY = dict(vocab_size=99, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64)


def test_crc32c_known_vectors():
    # RFC 3720 / leveldb crc32c test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(b"123456789") == 0xE3069283


def _fake_bert_vars(rng, n_layers=3):
    """BERT-style names (long shared prefixes exercise the block builder's
    prefix compression) + mixed dtypes + optimizer slots."""
    v = {}
    v["bert/embeddings/word_embeddings"] = rng.standard_normal(
        (50, 8)).astype(np.float32)
    for i in range(n_layers):
        p = f"bert/encoder/layer_{i}/attention/self"
        v[f"{p}/query/kernel"] = rng.standard_normal((8, 8)).astype(
            np.float32)
        v[f"{p}/query/bias"] = rng.standard_normal(8).astype(np.float32)
        v[f"{p}/query/kernel/adam_m"] = np.zeros((8, 8), np.float32)
        v[f"{p}/query/kernel/adam_v"] = np.zeros((8, 8), np.float32)
    v["global_step"] = np.asarray(1234, np.int64)
    v["counts/int32"] = rng.integers(0, 100, (7,)).astype(np.int32)
    v["flags/bool"] = np.asarray([True, False, True])
    v["half/f16"] = rng.standard_normal((3, 5)).astype(np.float16)
    v["wide/f64"] = rng.standard_normal((2, 2, 2))
    return v


def test_bundle_roundtrip(tmp_path, rng):
    variables = _fake_bert_vars(rng)
    prefix = str(tmp_path / "model.ckpt")
    # tiny block size forces several data blocks + a multi-entry index
    write_tf_checkpoint(prefix, variables, block_bytes=256)

    listed = list_tf_variables(prefix)
    assert [n for n, _ in listed] == sorted(variables)
    for name, shape in listed:
        assert shape == list(variables[name].shape)

    back = read_tf_checkpoint(prefix)
    assert set(back) == set(variables)
    for name, arr in variables.items():
        assert back[name].dtype == arr.dtype, name
        np.testing.assert_array_equal(back[name], arr)


def test_bundle_roundtrip_single_block(tmp_path, rng):
    variables = {"a": rng.standard_normal(4).astype(np.float32),
                 "scalar": np.float32(3.5)}
    prefix = str(tmp_path / "m.ckpt")
    write_tf_checkpoint(prefix, variables)      # default: one data block
    back = read_tf_checkpoint(prefix)
    np.testing.assert_array_equal(back["a"], variables["a"])
    assert back["scalar"].shape == ()
    assert float(back["scalar"]) == 3.5


def test_data_corruption_detected(tmp_path, rng):
    prefix = str(tmp_path / "m.ckpt")
    write_tf_checkpoint(prefix, {"w": rng.standard_normal(16).astype(
        np.float32)})
    data_path = prefix + ".data-00000-of-00001"
    raw = bytearray(open(data_path, "rb").read())
    raw[5] ^= 0xFF
    open(data_path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="crc mismatch"):
        read_tf_checkpoint(prefix)
    read_tf_checkpoint(prefix, verify=False)    # opt-out still reads


def test_index_corruption_detected(tmp_path, rng):
    prefix = str(tmp_path / "m.ckpt")
    write_tf_checkpoint(prefix, {"w": np.ones(4, np.float32)})
    idx_path = prefix + ".index"
    raw = bytearray(open(idx_path, "rb").read())
    raw[-1] ^= 0xFF                              # clobber the table magic
    open(idx_path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="magic"):
        read_tf_checkpoint(prefix)


def test_tf_name_mapping_drives_encoder_bitwise(tmp_path, rng):
    """init params → TF names → bundle on disk → back → identical forward."""
    import jax

    cfg = EncoderConfig(**TINY, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0,
                        layer_norm_eps=1e-12, position_offset=0,
                        pad_token_id=0, type_vocab_size=2)
    model = TextEncoder(cfg)
    ids = rng.integers(5, TINY["vocab_size"], (2, 9)).astype(np.int32)
    mask = np.ones_like(ids)
    params = model.init(jax.random.PRNGKey(0), ids, mask)

    tfvars = encoder_params_to_tf(params["params"])
    # the reference loader skips optimizer slots (gate_cl_modeling.py:81-84)
    tfvars["bert/embeddings/word_embeddings/adam_m"] = np.zeros(
        (TINY["vocab_size"], TINY["hidden_size"]), np.float32)
    tfvars["bert/embeddings/word_embeddings/adam_v"] = np.ones(
        (TINY["vocab_size"], TINY["hidden_size"]), np.float32)
    tfvars["global_step"] = np.asarray(77, np.int64)

    prefix = str(tmp_path / "bert" / "model.ckpt")
    write_tf_checkpoint(prefix, tfvars, block_bytes=512)
    back = read_tf_checkpoint(prefix)
    rebuilt = {"params": encoder_params_from_tf(
        back, cfg.num_hidden_layers)}

    want_seq, want_pool = model.apply(params, ids, mask)
    got_seq, got_pool = model.apply(rebuilt, ids, mask)
    np.testing.assert_array_equal(np.asarray(got_seq), np.asarray(want_seq))
    np.testing.assert_array_equal(np.asarray(got_pool),
                                  np.asarray(want_pool))


def test_reader_matches_tensorflow_if_available(tmp_path, rng):
    """Cross-validate the binary format against real TF when present (it is
    not in this image; the test self-skips rather than stubs)."""
    tf = pytest.importorskip("tensorflow")
    prefix = str(tmp_path / "m.ckpt")
    write_tf_checkpoint(prefix, {"w": rng.standard_normal(
        (3, 4)).astype(np.float32)})
    got = tf.train.load_checkpoint(prefix).get_tensor("w")
    np.testing.assert_array_equal(got, read_tf_checkpoint(prefix)["w"])
