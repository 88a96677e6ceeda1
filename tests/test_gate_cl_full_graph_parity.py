"""Full-graph fp32 parity for the gate_cl family: the COMPOSED reference
forward (`my_bert/gate_cl_modeling.py:1319-1400`) replicated in torch at
tiny dims, sharing weights with `GateCLModel`, asserting:

  - inference emissions match (<1e-4) and Viterbi decode matches;
  - the full TRAINING loss matches: negative-pair swap of the batch tail
    (:1348-1356), relation classifier over the flattened concat (:1364-1365),
    P-weighting (:1369-1373), gate (:1375-1377), CRF 'mean' loss, crs CE,
    per-sample-loop InfoNCE (:1276-1316), and the α-mix (:1384-1395).

Component-level parity (encoder vs HF, CRF vs torchcrf semantics, InfoNCE
vs the loops) is covered elsewhere; this pins the COMPOSITION — the
flagship has `test_full_graph_parity.py`, this is the gate_cl counterpart
(VERDICT r02 next #10).
"""

import dataclasses
import math

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax

# full torch-composite + fp32 HIGHEST-precision compiles: the slow
# proof tier. Component parity (encoders/CRF/InfoNCE/splice) stays in
# the fast tier.
pytestmark = pytest.mark.slow

from icka_tpu.core.config import EncoderConfig, GateCLConfig
from icka_tpu.models.convert import (
    cross_encoder_params_from_torch,
    encoder_params_from_torch,
)
from icka_tpu.models.gate_cl import GateCLModel
from tests.test_crf import torch_crf_llh, torch_crf_decode
from tests.test_full_graph_parity import (
    EPS,
    H,
    TorchCrossEncoder,
    _lin,
    _ln,
)

L = 16                 # sentence length (reference: 128)
B = 8
NEG = 4                # negative_rate (reference default 16 at batch 32+)
REGION_DIM = 24        # stands in for 2048
NUM_LABELS = 7
LAYER_NUM1 = 2
TEMP, TEMP_LAMB, ALPHA = 0.179, 0.7, 0.62
VOCAB = 99


class TorchGateCL(tnn.Module):
    """`MTCCMBertForMMTokenClassificationCRF` (gate_cl_modeling.py:1248)
    composed from HF BertModel (≙ the in-file legacy BertModel) + the
    torch cross-encoder replica shared with the flagship parity test."""

    def __init__(self, hf_cfg):
        super().__init__()
        from transformers import BertModel

        self.bert = BertModel(hf_cfg)                    # with pooler
        self.vismap2text = tnn.Linear(REGION_DIM, H)
        self.txt2img_attention = TorchCrossEncoder(LAYER_NUM1)
        self.crs_classifier = tnn.Linear(H * 2 * L, 2)
        self.classifier = tnn.Linear(H * 2, NUM_LABELS)
        self.Gate_text = tnn.Linear(H, H)
        self.Gate_image = tnn.Linear(H, H)
        self.text_dense_cl = tnn.Linear(H, H)
        self.text_ouput_cl = tnn.Linear(H, H)
        self.image_dense_cl = tnn.Linear(REGION_DIM, H)
        self.image_output_cl = tnn.Linear(H, H)

    # the reference's per-sample InfoNCE loops (:1276-1316), verbatim math
    def text_toimage_loss(self, t, v, temp):
        loss = 0
        for i in range(t.shape[0]):
            up = torch.exp((t[i] @ v[i] / (t[i].norm() * v[i].norm()))
                           / temp)
            down = torch.sum(torch.exp(
                ((t[i] * v).sum(-1) / (t[i].norm() * v.norm(dim=1)))
                / temp))
            loss += -torch.log(up / down)
        return loss

    def image_totext_loss(self, t, v, temp):
        loss = 0
        for i in range(t.shape[0]):
            up = torch.exp((v[i] @ t[i] / (v[i].norm() * t[i].norm()))
                           / temp)
            down = torch.sum(torch.exp(
                ((v[i] * t).sum(-1) / (v[i].norm() * t.norm(dim=1)))
                / temp))
            loss += -torch.log(up / down)
        return loss

    def forward(self, input_ids, segment_ids, input_mask, img_mask,
                vis_mean, vis_grid, labels=None, crf=None):
        out = self.bert(input_ids=input_ids,
                        token_type_ids=segment_ids,
                        attention_mask=input_mask)
        seq, pooled = out.last_hidden_state, out.pooler_output

        grid = self.vismap2text(vis_grid)                # (B, 49, H)
        img_bias = ((1.0 - img_mask.float())
                    * -10000.0)[:, None, None, :]
        cross = self.txt2img_attention(seq, grid, img_bias)

        cross_crs = cross.clone()
        labels_crs = torch.ones(seq.shape[0], dtype=torch.long)
        if labels is not None and seq.shape[0] > NEG:
            # the reference's in-place half-swap of the last NEG rows
            allneg = cross_crs[seq.shape[0] - NEG:]
            half = NEG // 2
            front = allneg[:half].clone()
            allneg[:half] = allneg[half:].clone()
            allneg[half:] = front
            labels_crs[seq.shape[0] - NEG:] = 0
        cross_used = cross_crs if labels is not None else cross

        crs_result = self.crs_classifier(
            torch.cat((seq, cross_used), dim=-1).view(seq.shape[0], -1))
        P = torch.softmax(crs_result, dim=-1)[:, -1][:, None, None]
        new_cross = P * cross_used
        gate = torch.sigmoid(self.Gate_text(seq)
                             + self.Gate_image(new_cross))
        gated = gate * new_cross
        feats = self.classifier(torch.cat((seq, gated), dim=-1))

        if labels is None:
            return feats
        crs_loss = tnn.CrossEntropyLoss()(crs_result.view(-1, 2),
                                          labels_crs.view(-1))
        t_cl = self.text_ouput_cl(torch.relu(self.text_dense_cl(pooled)))
        v_cl = self.image_output_cl(torch.relu(
            self.image_dense_cl(vis_mean)))
        bsz = t_cl.shape[0]
        cl_loss = (1 / bsz) * (
            TEMP_LAMB * self.text_toimage_loss(t_cl, v_cl, TEMP)
            + (1 - TEMP_LAMB) * self.image_totext_loss(t_cl, v_cl, TEMP))
        start, end, trans = crf
        main_loss = -torch_crf_llh(
            feats.detach().double().numpy(), np.asarray(labels),
            np.asarray(input_mask), start, end, trans, "mean")
        return (ALPHA * main_loss
                + (1 - ALPHA) * (float(crs_loss) + float(cl_loss)),
                feats)


def _jax_params(tm: TorchGateCL, crf):
    sd = {k: v for k, v in tm.bert.state_dict().items()}
    bert = encoder_params_from_torch(sd, 2)
    start, end, trans = crf
    p = {
        "bert": bert,
        "vismap2text": _lin(tm.vismap2text),
        "txt2img": cross_encoder_params_from_torch(
            {k: v.detach().numpy()
             for k, v in tm.txt2img_attention.state_dict().items()},
            LAYER_NUM1),
        "crs_classifier": _lin(tm.crs_classifier),
        "classifier": _lin(tm.classifier),
        "gate_text": _lin(tm.Gate_text),
        "gate_image": _lin(tm.Gate_image),
        "text_dense_cl": _lin(tm.text_dense_cl),
        "text_output_cl": _lin(tm.text_ouput_cl),
        "image_dense_cl": _lin(tm.image_dense_cl),
        "image_output_cl": _lin(tm.image_output_cl),
        "crf": {"start_transitions": start.astype(np.float32),
                "end_transitions": end.astype(np.float32),
                "transitions": trans.astype(np.float32)},
    }
    return {"params": p}


@pytest.fixture(scope="module")
def bundle():
    from transformers import BertConfig

    torch.manual_seed(7)
    hf_cfg = BertConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=EPS, pad_token_id=0, hidden_act="gelu")
    tm = TorchGateCL(hf_cfg).eval()

    rng = np.random.default_rng(11)
    crf = (rng.standard_normal(NUM_LABELS),
           rng.standard_normal(NUM_LABELS),
           rng.standard_normal((NUM_LABELS, NUM_LABELS)))

    enc = EncoderConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=EPS, position_offset=0, pad_token_id=0)
    cfg = GateCLConfig(encoder=enc, num_labels=NUM_LABELS,
                       layer_num1=LAYER_NUM1, region_dim=REGION_DIM,
                       max_seq_length=L, negative_rate=NEG,
                       alpha=ALPHA, temp=TEMP, temp_lamb=TEMP_LAMB)
    jm = GateCLModel(cfg)   # fp32 default dtype

    ids = rng.integers(2, VOCAB, (B, L)).astype(np.int32)
    seg = np.zeros((B, L), np.int32)
    mask = np.ones((B, L), np.int32)
    img_mask = (rng.random((B, 49)) > 0.2).astype(np.int32)
    img_mask[:, 0] = 1
    vis_mean = rng.standard_normal((B, REGION_DIM)).astype(np.float32)
    vis_grid49 = rng.standard_normal((B, 49, REGION_DIM)) \
        .astype(np.float32)
    labels = rng.integers(0, NUM_LABELS, (B, L)).astype(np.int32)

    params = _jax_params(tm, crf)
    return (tm, jm, params, crf,
            dict(ids=ids, seg=seg, mask=mask, img_mask=img_mask,
                 vis_mean=vis_mean, vis_grid=vis_grid49, labels=labels))


def _torch_args(d):
    return (torch.tensor(d["ids"], dtype=torch.long),
            torch.tensor(d["seg"], dtype=torch.long),
            torch.tensor(d["mask"], dtype=torch.long),
            torch.tensor(d["img_mask"], dtype=torch.long),
            torch.tensor(d["vis_mean"]),
            torch.tensor(d["vis_grid"]))


def _jax_args(d):
    # GateCLModel takes the grid as NHWC (B, 7, 7, R); the 49-region order
    # is row-major on both sides
    return (d["ids"], d["seg"], d["mask"], d["img_mask"], d["vis_mean"],
            d["vis_grid"].reshape(B, 7, 7, REGION_DIM))


def test_gate_cl_full_graph_emissions_and_decode(bundle):
    tm, jm, params, crf, d = bundle
    with torch.no_grad():
        want = tm(*_torch_args(d)).numpy()
    got = np.asarray(jm.apply(params, *_jax_args(d),
                              return_emissions=True))
    np.testing.assert_allclose(got, want, atol=1e-4)

    start, end, trans = crf
    want_tags = torch_crf_decode(want.astype(np.float64), d["mask"],
                                 start, end, trans)
    got_tags = np.asarray(jm.apply(params, *_jax_args(d)))
    np.testing.assert_array_equal(got_tags, np.asarray(want_tags))


def test_gate_cl_full_graph_train_loss_matches(bundle):
    tm, jm, params, crf, d = bundle
    with torch.no_grad():
        want_loss, _ = tm(*_torch_args(d), labels=d["labels"], crf=crf)
    got_loss = float(jm.apply(params, *_jax_args(d), labels=d["labels"],
                              deterministic=True))
    np.testing.assert_allclose(got_loss, float(want_loss), rtol=2e-5)
