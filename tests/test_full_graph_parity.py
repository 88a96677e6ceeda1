"""Full-graph fp32 parity: the composed ICKA flagship forward vs a torch
replica built from the reference's module semantics.

Component-level parity (encoders, CrossEncoder, BiLSTM, CRF,
cross_attention_Y, InfoNCE) is covered elsewhere; this test composes the
ENTIRE reference forward (`Cross_Modal_Interaction_Module.py:941-1057`) in
torch at tiny dims — dual HF RoBERTa encoders, txt2img fusion, cls_layer_Y
knowledge alignment, mapping networks, prompt splice with the
`offset − 2 + 2P` arithmetic (:1014-1024), relevance gate (:1029-1036),
BiLSTM and CRF — loads identical weights into `ICKAModel`, and asserts:

  - emissions match at fp32 (<1e-4),
  - CRF token_mean loss matches an independent torch forward algorithm,
  - Viterbi decode matches an independent torch Viterbi.

The prompt-splice encoder replicates the missing `roberta_ner` fork from
its call site (`My_cross_attention.py:1010-1012`): embeddings at the two
`<mask>` positions replaced by the learned prefix, RoBERTa position ids
assigned over the *spliced* layout (pad-aware cumsum) — this test pins that
reconstruction as the specification on both sides of the comparison.
"""

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

from icka_tpu.core.config import EncoderConfig, ICKAConfig
from icka_tpu.models.convert import (
    cross_encoder_params_from_torch,
    encoder_params_from_torch,
    lstm_params_from_torch,
)
from icka_tpu.models.icka import ICKAModel

H, HEADS, INTER, VOCAB, LAYERS = 32, 4, 64, 99, 2
LAYER_NUM1 = 2
P_LEN = 5
PROMPT_HIDDEN = 24
NUM_LABELS = 7
L = 16            # sentence length (reference: 128)
OFFSET = 12       # sentence start in the prompted input
MASKS = (3, 9)    # the two <mask> positions
LP = OFFSET + L   # prompted input length
REGION_DIM = 64
CLIP_DIM = 48
EPS = 1e-5
B = 3


# ---------------------------------------------------------------- torch side

class TorchCoAttention(tnn.Module):
    """BertCoAttention semantics (:568-624): Q from s1, K/V from s2."""

    def __init__(self):
        super().__init__()
        self.query = tnn.Linear(H, H)
        self.key = tnn.Linear(H, H)
        self.value = tnn.Linear(H, H)

    def forward(self, s1, s2, bias):
        d = H // HEADS

        def split(x):
            b, s, _ = x.shape
            return x.view(b, s, HEADS, d).permute(0, 2, 1, 3)

        q, k, v = split(self.query(s1)), split(self.key(s2)), \
            split(self.value(s2))
        scores = q @ k.transpose(-1, -2) / math.sqrt(d) + bias
        probs = torch.softmax(scores, dim=-1)
        ctx = (probs @ v).permute(0, 2, 1, 3).contiguous()
        return ctx.view(s1.shape[0], s1.shape[1], H)


class TorchSelfOutput(tnn.Module):
    def __init__(self):
        super().__init__()
        self.dense = tnn.Linear(H, H)
        self.LayerNorm = tnn.LayerNorm(H, eps=EPS)

    def forward(self, x, residual):
        return self.LayerNorm(self.dense(x) + residual)


class TorchCrossLayer(tnn.Module):
    """BertCrossAttentionLayer (:639-651): cross-attn + FFN, post-LN."""

    class _Att(tnn.Module):
        def __init__(self):
            super().__init__()
            self.self = TorchCoAttention()
            self.output = TorchSelfOutput()

        def forward(self, s1, s2, bias):
            return self.output(self.self(s1, s2, bias), s1)

    class _Inter(tnn.Module):
        def __init__(self):
            super().__init__()
            self.dense = tnn.Linear(H, INTER)

        def forward(self, x):
            return torch.nn.functional.gelu(self.dense(x))

    class _Out(tnn.Module):
        def __init__(self):
            super().__init__()
            self.dense = tnn.Linear(INTER, H)
            self.LayerNorm = tnn.LayerNorm(H, eps=EPS)

        def forward(self, x, residual):
            return self.LayerNorm(self.dense(x) + residual)

    def __init__(self):
        super().__init__()
        self.attention = self._Att()
        self.intermediate = self._Inter()
        self.output = self._Out()

    def forward(self, s1, s2, bias):
        a = self.attention(s1, s2, bias)
        return self.output(self.intermediate(a), a)


class TorchCrossEncoder(tnn.Module):
    """BertCrossEncoder (:653-667)."""

    def __init__(self, n):
        super().__init__()
        self.layer = tnn.ModuleList([TorchCrossLayer() for _ in range(n)])

    def forward(self, s1, s2, bias):
        for m in self.layer:
            s1 = m(s1, s2, bias)
        return s1


def torch_crf_nll_token_mean(em, tags, mask, start, end, trans):
    """Independent torchcrf-semantics forward algorithm (fp64 torch)."""
    em, start, end, trans = (x.double() for x in (em, start, end, trans))
    Bx, Lx, T = em.shape
    num = start[tags[:, 0]] + em[torch.arange(Bx), 0, tags[:, 0]]
    prev = tags[:, 0]
    for t in range(1, Lx):
        m = mask[:, t].double()
        step = trans[prev, tags[:, t]] + em[torch.arange(Bx), t, tags[:, t]]
        num = num + step * m
        prev = torch.where(mask[:, t] > 0, tags[:, t], prev)
    num = num + end[prev]

    alpha = start[None] + em[:, 0]
    for t in range(1, Lx):
        nxt = torch.logsumexp(
            alpha[:, :, None] + trans[None] + em[:, t, None, :], dim=1)
        alpha = torch.where(mask[:, t, None] > 0, nxt, alpha)
    den = torch.logsumexp(alpha + end[None], dim=1)
    return -((num - den).sum() / mask.double().sum())


def torch_viterbi(em, mask, start, end, trans):
    """Independent masked Viterbi; returns (B, L) with positions past each
    sequence end repeating its last tag (our CRF's padding convention)."""
    em = em.double()
    Bx, Lx, T = em.shape
    out = np.zeros((Bx, Lx), np.int32)
    for b in range(Bx):
        n = int(mask[b].sum())
        score = (start + em[b, 0]).clone()
        bps = []
        for t in range(1, n):
            cand = score[:, None] + trans.double() + em[b, t][None]
            best = cand.max(dim=0)
            bps.append(best.indices)
            score = best.values
        last = int((score + end.double()).argmax())
        path = [last]
        for bp in reversed(bps):
            path.append(int(bp[path[-1]]))
        path.reverse()
        out[b, :n] = path
        out[b, n:] = path[-1]
    return out


class TorchICKA(tnn.Module):
    """The reference flagship forward (:941-1057) composed from HF RoBERTa +
    reference-semantics modules, at tiny dims."""

    def __init__(self, hf_cfg):
        super().__init__()
        from transformers import RobertaModel

        self.bert = RobertaModel(hf_cfg, add_pooling_layer=False)
        self.last_encoder = RobertaModel(hf_cfg, add_pooling_layer=False)
        self.vismap2text = tnn.Linear(REGION_DIM, H)
        self.vismapping = tnn.Linear(CLIP_DIM, H)
        self.txt2img_attention = TorchCrossEncoder(LAYER_NUM1)
        self.cls_layer_Y = tnn.ModuleList(
            [TorchCrossEncoder(LAYER_NUM1) for _ in range(2)])
        self.mapping_network_alignment = tnn.Sequential(
            tnn.Dropout(0.3), tnn.Linear(H, PROMPT_HIDDEN * P_LEN),
            tnn.Tanh(), tnn.Dropout(0.3),
            tnn.Linear(PROMPT_HIDDEN * P_LEN, H * P_LEN))
        self.mapping_network_vision = tnn.Sequential(
            tnn.Dropout(0.3), tnn.Linear(REGION_DIM, PROMPT_HIDDEN * P_LEN),
            tnn.Tanh(), tnn.Dropout(0.3),
            tnn.Linear(PROMPT_HIDDEN * P_LEN, H * P_LEN))
        self.cls_norm = tnn.LayerNorm(H, eps=EPS)   # cls_layer_both LN
        self.cls_proj = tnn.Linear(H, H)
        self.aux_head = tnn.Linear(H, 1)
        self.lstm = tnn.LSTM(input_size=H, hidden_size=H, batch_first=True,
                             bidirectional=True)
        self.classifier = tnn.Linear(2 * H, NUM_LABELS)

    def _splice_last_encoder(self, input_ids, input_mask, segment_ids,
                             prefix_emb, prompt_mask):
        """The missing roberta_ner fork, reconstructed: embedding-level
        splice + RoBERTa position ids over the spliced layout."""
        m1, m2 = MASKS
        tok = self.last_encoder.embeddings.word_embeddings(input_ids)

        def splice(seq, pro):
            return torch.cat([seq[:, :m1], pro[:, :P_LEN],
                              seq[:, m1 + 1:m2], pro[:, P_LEN:],
                              seq[:, m2 + 1:]], dim=1)

        spliced = splice(tok, prefix_emb)
        sp_mask = splice(input_mask,
                         prompt_mask.to(input_mask.dtype))
        t1 = segment_ids[:, m1:m1 + 1].repeat(1, P_LEN)
        t2 = segment_ids[:, m2:m2 + 1].repeat(1, P_LEN)
        sp_types = torch.cat(
            [segment_ids[:, :m1], t1, segment_ids[:, m1 + 1:m2], t2,
             segment_ids[:, m2 + 1:]], dim=1)
        pad = 1  # RoBERTa pad_token_id
        pos = torch.cumsum(sp_mask, dim=1) * sp_mask + pad
        out = self.last_encoder(
            inputs_embeds=spliced, attention_mask=sp_mask,
            token_type_ids=sp_types, position_ids=pos)
        return out.last_hidden_state

    def forward(self, input_ids, segment_ids, input_mask, ori_input_ids,
                ori_input_mask, ori_segment_ids, img_mask, clip_features,
                visual_embeds_mean, visual_embeds_att):
        seq = self.bert(ori_input_ids, attention_mask=ori_input_mask,
                        token_type_ids=ori_segment_ids).last_hidden_state
        clip = self.vismapping(clip_features.squeeze(1))

        # NCHW (B, C, 7, 7) → (B, 49, C), reference :956-958
        vis = visual_embeds_att.view(-1, REGION_DIM, 49).permute(0, 2, 1)
        vis = self.vismap2text(vis)
        img_bias = ((1.0 - img_mask[:, None, None, :].float()) * -10000.0)
        cross = self.txt2img_attention(seq, vis, img_bias)

        text_bias = ((1.0 - ori_input_mask[:, None, None, :].float())
                     * -10000.0)
        clip = clip.unsqueeze(1)
        for m in self.cls_layer_Y:
            clip = m(clip, cross, text_bias)

        align_prompt = self.mapping_network_alignment(clip).view(
            ori_input_ids.size(0), P_LEN, -1)
        vision_prompt = self.mapping_network_vision(
            visual_embeds_mean).reshape(input_ids.size(0), P_LEN, -1)
        prefix_emb = torch.cat([vision_prompt, align_prompt], dim=1)
        prompt_mask = input_mask[:, :1].repeat(1, 2 * P_LEN)

        out = self._splice_last_encoder(input_ids, input_mask, segment_ids,
                                        prefix_emb, prompt_mask)
        tok_start = OFFSET - 2 + 2 * P_LEN
        token_embedding = out[:, tok_start:tok_start + L, :]

        related = self.cls_proj(self.cls_norm(
            cross[:, 0, :] + token_embedding[:, 0, :]))
        gate = torch.sigmoid(self.aux_head(related)).view(-1, 1, 1)
        result = gate * token_embedding + (1 - gate) * cross

        x, _ = self.lstm(result)
        return self.classifier(x)


# ------------------------------------------------------------- weight wiring

def _lin(mod):
    return {"kernel": mod.weight.detach().numpy().T.astype(np.float32),
            "bias": mod.bias.detach().numpy().astype(np.float32)}


def _ln(mod):
    return {"scale": mod.weight.detach().numpy().astype(np.float32),
            "bias": mod.bias.detach().numpy().astype(np.float32)}


def jax_params_from_torch(tm: TorchICKA, crf_params):
    return {"params": {
        "embedding": encoder_params_from_torch(
            tm.bert.state_dict(), LAYERS),
        "last_encoder": encoder_params_from_torch(
            tm.last_encoder.state_dict(), LAYERS),
        "vismapping": _lin(tm.vismapping),
        "vismap2text": _lin(tm.vismap2text),
        "txt2img": cross_encoder_params_from_torch(
            tm.txt2img_attention.state_dict(), LAYER_NUM1),
        "align_0": cross_encoder_params_from_torch(
            tm.cls_layer_Y[0].state_dict(), LAYER_NUM1),
        "align_1": cross_encoder_params_from_torch(
            tm.cls_layer_Y[1].state_dict(), LAYER_NUM1),
        "map_alignment": {
            "wi": _lin(tm.mapping_network_alignment[1]),
            "wo": _lin(tm.mapping_network_alignment[4]),
        },
        "map_vision": {
            "wi": _lin(tm.mapping_network_vision[1]),
            "wo": _lin(tm.mapping_network_vision[4]),
        },
        "gate": {"norm": _ln(tm.cls_norm), "proj": _lin(tm.cls_proj),
                 "aux_head": _lin(tm.aux_head)},
        "lstm": lstm_params_from_torch(tm.lstm.state_dict()),
        "classifier": _lin(tm.classifier),
        "crf": crf_params,
    }}


@pytest.fixture(scope="module")
def bundle():
    from transformers import RobertaConfig

    torch.manual_seed(7)
    hf_cfg = RobertaConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=EPS, pad_token_id=1)
    tm = TorchICKA(hf_cfg).eval()

    rng = np.random.default_rng(0)
    crf_params = {
        "start_transitions": rng.uniform(-0.1, 0.1, NUM_LABELS)
        .astype(np.float32),
        "end_transitions": rng.uniform(-0.1, 0.1, NUM_LABELS)
        .astype(np.float32),
        "transitions": rng.uniform(-0.1, 0.1, (NUM_LABELS, NUM_LABELS))
        .astype(np.float32),
    }

    enc = EncoderConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=64, type_vocab_size=2,
        layer_norm_eps=EPS, position_offset=2, pad_token_id=1)
    cfg = ICKAConfig(embedding=enc, last_encoder=enc, num_labels=NUM_LABELS,
                     layer_num1=LAYER_NUM1, region_dim=REGION_DIM,
                     clip_dim=CLIP_DIM, prompt_len=P_LEN,
                     prompt_hidden=PROMPT_HIDDEN, last_hidden=H,
                     max_seq_length=L)
    model = ICKAModel(cfg)
    params = jax_params_from_torch(tm, crf_params)

    # inputs: ragged sentences, full-length prompt region
    ids = rng.integers(5, VOCAB, (B, LP)).astype(np.int32)
    lens = np.asarray([L, L - 3, L - 6])
    ori_mask = (np.arange(L)[None] < lens[:, None]).astype(np.int32)
    ori_ids = np.where(ori_mask > 0, rng.integers(5, VOCAB, (B, L)), 1) \
        .astype(np.int32)
    input_mask = np.concatenate([np.ones((B, OFFSET), np.int32), ori_mask],
                                axis=1)
    ids = np.where(input_mask > 0, ids, 1).astype(np.int32)
    segs = np.concatenate([np.zeros((B, OFFSET), np.int32),
                           np.ones((B, L), np.int32)], axis=1)
    batch = {
        "input_ids": ids,
        "segment_ids": segs,
        "input_mask": input_mask,
        "ori_input_ids": ori_ids,
        "ori_input_mask": ori_mask,
        "ori_segment_ids": np.zeros((B, L), np.int32),
        "img_mask": np.ones((B, 49), np.int32),
        "clip_features": rng.standard_normal((B, 1, CLIP_DIM))
        .astype(np.float32),
        "visual_mean": rng.standard_normal((B, REGION_DIM))
        .astype(np.float32),
        "visual_grid": rng.standard_normal((B, 7, 7, REGION_DIM))
        .astype(np.float32),
        "output_mask": ori_mask,
        "label_ids": (rng.integers(0, NUM_LABELS, (B, L)) * ori_mask)
        .astype(np.int32),
    }
    return tm, model, params, batch, crf_params


def _torch_emissions(tm, batch):
    t = {k: torch.as_tensor(v.astype(np.int64))
         for k, v in batch.items()
         if k not in ("clip_features", "visual_mean", "visual_grid")}
    att_nchw = np.moveaxis(
        batch["visual_grid"].reshape(B, 49, REGION_DIM), -1, 1) \
        .reshape(B, REGION_DIM, 7, 7)
    with torch.no_grad():
        return tm(t["input_ids"], t["segment_ids"], t["input_mask"],
                  t["ori_input_ids"], t["ori_input_mask"],
                  t["ori_segment_ids"], t["img_mask"],
                  torch.as_tensor(batch["clip_features"]),
                  torch.as_tensor(batch["visual_mean"]),
                  torch.as_tensor(att_nchw))


def test_full_graph_emissions_match(bundle):
    tm, model, params, batch, _ = bundle
    want = _torch_emissions(tm, batch).numpy()

    got, _ = model.apply(
        params, method=lambda m, **kw: m.emissions(**kw),
        input_ids=batch["input_ids"], segment_ids=batch["segment_ids"],
        input_mask=batch["input_mask"],
        ori_input_ids=batch["ori_input_ids"],
        ori_input_mask=batch["ori_input_mask"],
        ori_segment_ids=batch["ori_segment_ids"],
        img_mask=batch["img_mask"], clip_features=batch["clip_features"],
        visual_mean=batch["visual_mean"], visual_grid=batch["visual_grid"],
        mask_positions=MASKS, offset=OFFSET)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_full_graph_loss_and_decode_match(bundle):
    tm, model, params, batch, crf = bundle
    em = _torch_emissions(tm, batch)
    mask = torch.as_tensor(batch["output_mask"].astype(np.int64))
    tags = torch.as_tensor(batch["label_ids"].astype(np.int64))
    start = torch.as_tensor(crf["start_transitions"])
    end = torch.as_tensor(crf["end_transitions"])
    trans = torch.as_tensor(crf["transitions"])

    want_loss = float(torch_crf_nll_token_mean(em, tags, mask, start, end,
                                               trans))
    want_tags = torch_viterbi(em, mask, start, end, trans)

    got_loss = model.apply(params, batch, MASKS, OFFSET, mode="train",
                           labels=batch["label_ids"], deterministic=True)
    np.testing.assert_allclose(float(got_loss), want_loss, atol=1e-4)

    got_tags, got_dev_loss = model.apply(params, batch, MASKS, OFFSET,
                                         mode="dev",
                                         labels=batch["label_ids"])
    np.testing.assert_allclose(float(got_dev_loss), want_loss, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_tags), want_tags)
