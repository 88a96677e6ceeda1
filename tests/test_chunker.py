"""CoNLL-2000 chunk tagger (component #27): adapter model parity vs a
torch-side Pfeiffer implementation, converter mapping, and the faithful
BIO→chunk-mask grouping port (`utils/GetChunk_v4_vcr.py:104-146`)."""

import types

import numpy as np
import pytest
import torch

from icka_tpu.core.config import EncoderConfig
from icka_tpu.data.chunking import bio_spans, chunk_arrays, chunk_mask_v4
from icka_tpu.models.chunker import (
    CONLL2000_ID2LABEL,
    CONLL2000_LABELS,
    ChunkTagger,
    ModelChunker,
    chunker_config,
    chunker_params_from_torch,
)

TINY = dict(vocab_size=61, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=40)
ADAPTER = 8
NUM_LABELS = len(CONLL2000_LABELS)


def _pfeiffer_patch(output_mod, down_w, down_b, up_w, up_b):
    """Replace a torch BertOutput.forward with the Pfeiffer composition
    (adapter-transformers: original_ln_before/after=True,
    residual_before_ln=True; LN weights shared)."""
    def fwd(self, hidden_states, input_tensor):
        h = self.dropout(self.dense(hidden_states))
        pre = h + input_tensor
        x = self.LayerNorm(pre)
        a = torch.relu(x @ down_w.T + down_b) @ up_w.T + up_b
        return self.LayerNorm(a + pre)

    output_mod.forward = types.MethodType(fwd, output_mod)


def _adapter_tensors(gen, hidden, size):
    down_w = torch.randn(size, hidden, generator=gen) * 0.2
    down_b = torch.randn(size, generator=gen) * 0.1
    up_w = torch.randn(hidden, size, generator=gen) * 0.2
    up_b = torch.randn(hidden, generator=gen) * 0.1
    return down_w, down_b, up_w, up_b


def test_chunk_tagger_matches_torch_pfeiffer(rng):
    from transformers import BertConfig, BertModel

    hf_cfg = BertConfig(**TINY, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0,
                        pad_token_id=0, type_vocab_size=2)
    torch.manual_seed(7)
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()
    gen = torch.Generator().manual_seed(11)

    sd = {f"bert.{k}": v for k, v in hf.state_dict().items()}
    for i, layer in enumerate(hf.encoder.layer):
        dw, db, uw, ub = _adapter_tensors(gen, TINY["hidden_size"], ADAPTER)
        _pfeiffer_patch(layer.output, dw, db, uw, ub)
        base = f"bert.encoder.layer.{i}.output.adapters.conll2000"
        sd[f"{base}.adapter_down.0.weight"] = dw
        sd[f"{base}.adapter_down.0.bias"] = db
        sd[f"{base}.adapter_up.weight"] = uw
        sd[f"{base}.adapter_up.bias"] = ub
    head_w = torch.randn(NUM_LABELS, TINY["hidden_size"], generator=gen) * 0.1
    head_b = torch.randn(NUM_LABELS, generator=gen) * 0.1
    sd["heads.conll2000.1.weight"] = head_w
    sd["heads.conll2000.1.bias"] = head_b

    ids = rng.integers(3, TINY["vocab_size"], (2, 12)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[1, 9:] = 0
    ids[1, 9:] = 0

    with torch.no_grad():
        seq = hf(input_ids=torch.as_tensor(ids.astype(np.int64)),
                 attention_mask=torch.as_tensor(mask.astype(np.int64))
                 ).last_hidden_state
        want = (seq @ head_w.T + head_b).numpy()

    cfg = EncoderConfig(**TINY, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0,
                        layer_norm_eps=1e-12, position_offset=0,
                        pad_token_id=0, type_vocab_size=2,
                        adapter_size=ADAPTER)
    params = chunker_params_from_torch(sd, cfg.num_hidden_layers)
    got = ChunkTagger(cfg).apply({"params": params}, ids, mask)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)


def test_model_chunker_partitions(rng):
    """Random-weight end-to-end: spans returned by the trained-chunker
    interface cover positions without overlap (same contract
    `chunk_arrays` relies on for `heuristic_chunks`)."""
    cfg = EncoderConfig(**TINY, layer_norm_eps=1e-12, position_offset=0,
                        pad_token_id=0, adapter_size=ADAPTER)
    import jax

    model = ChunkTagger(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 8), np.int32))["params"]
    chunker = ModelChunker(params, cfg, bucket=16)
    seq = [2] + rng.integers(3, TINY["vocab_size"], 9).tolist() + [3]
    spans = chunker(seq)
    covered = sorted(t for s, e in spans for t in range(s, e))
    # Non-contiguous reference groups (see chunk_mask_v4) may overlap a
    # singleton's slot in span form; chunk_arrays resolves by order. Here
    # only require full coverage of the 9 interior tokens.
    assert set(covered) == set(range(9))
    labels = chunker.tag([seq])[0]
    assert len(labels) == 9 and all(l in CONLL2000_LABELS for l in labels)


def test_chunk_mask_v4_reference_semantics():
    # positions:        1      2      3    4    5      6
    labels = ["B-NP", "I-NP", "O", "O", "I-NP", "O"]
    total, offsets = chunk_mask_v4(labels, mask_len=8)
    # CLS + SEP rows fully visible
    assert total[0].sum() == 8 and total[7].sum() == 8
    # i=3: O with next O -> singleton; i=4: O with next I -> absorbed
    # across the gap into the open B..I chunk (ref :129-133, tmp not
    # cleared on singleton O) -> non-contiguous group {1,2,4,5}
    assert offsets == [[1, 2, 4, 5], [3], [6]]
    for grp in offsets:
        for a in grp:
            for b in grp:
                assert total[a][b] == 1
    assert total[3][1] == 0 and total[1][3] == 0
    # symmetric in the interior block
    inner = total[1:7, 1:7]
    assert (inner == inner.T).all()


def test_chunk_mask_v4_trailing_o_and_plain_runs():
    labels = ["B-NP", "I-NP", "I-NP", "B-VP", "O"]
    total, offsets = chunk_mask_v4(labels, mask_len=7)
    assert offsets == [[1, 2, 3], [4], [5]]
    # B-VP never got an I: row 4 is a singleton
    assert total[4][3] == 0 and total[4][5] == 0


def test_bio_spans_contract():
    assert bio_spans(["B-NP", "I-NP", "O", "B-VP"]) == [(0, 2), (2, 3),
                                                        (3, 4)]
    assert bio_spans([]) == []
    # composes with chunk_arrays
    gather, mask = chunk_arrays(bio_spans(["B-NP", "I-NP", "O"]),
                                hypo_len=6, max_chunks=4)
    assert gather[1] == gather[2] == 0 and gather[3] == 1


def test_load_chunker_from_local_dir(tmp_path, rng):
    """`pretrained.load_chunker` one-call surface: torch checkpoint dir →
    ready ModelChunker (reference GetChunk_v4_vcr.py:20-23 equivalent)."""
    import json

    from transformers import BertConfig, BertModel

    from icka_tpu.models.pretrained import load_chunker

    hf_cfg = BertConfig(**TINY, hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0,
                        pad_token_id=0, type_vocab_size=2)
    torch.manual_seed(3)
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()
    gen = torch.Generator().manual_seed(5)
    sd = {f"bert.{k}": v for k, v in hf.state_dict().items()}
    for i in range(TINY["num_hidden_layers"]):
        dw, db, uw, ub = _adapter_tensors(gen, TINY["hidden_size"], ADAPTER)
        base = f"bert.encoder.layer.{i}.output.adapters.conll2000"
        sd[f"{base}.adapter_down.0.weight"] = dw
        sd[f"{base}.adapter_down.0.bias"] = db
        sd[f"{base}.adapter_up.weight"] = uw
        sd[f"{base}.adapter_up.bias"] = ub
    sd["heads.conll2000.1.weight"] = torch.randn(
        NUM_LABELS, TINY["hidden_size"], generator=gen) * 0.1
    sd["heads.conll2000.1.bias"] = torch.randn(NUM_LABELS, generator=gen)
    torch.save(sd, tmp_path / "pytorch_model.bin")
    (tmp_path / "config.json").write_text(json.dumps(TINY))

    # tiny config: hidden 32 / adapter 48 mismatch would fail conversion,
    # so load_chunker must pick the checkpoint's own dims up from the
    # state dict shapes rather than assume bert-base
    chunker = load_chunker(str(tmp_path))
    seq = [2] + rng.integers(3, TINY["vocab_size"], 6).tolist() + [3]
    spans = chunker(seq)
    assert sorted(t for s, e in spans for t in range(s, e)) == list(range(6))


def test_labels_match_reference_id2label():
    # `utils/GetChunk_v4_vcr.py:40-43`
    assert CONLL2000_ID2LABEL[0] == "O"
    assert CONLL2000_ID2LABEL[11] == "B-NP"
    assert CONLL2000_ID2LABEL[12] == "I-NP"
    assert CONLL2000_ID2LABEL[21] == "B-VP"
    assert CONLL2000_ID2LABEL[22] == "I-VP"
    assert len(CONLL2000_ID2LABEL) == 23
