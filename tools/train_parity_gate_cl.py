"""Trained-parity A/B for the gate_cl composite: torch reference vs
`GateCLModel` (VERDICT r04 next #3).

The flagship has a 576-step training-dynamics proof
(tools/train_parity_ab.py → PARITY_TRAIN.md); this extends it to the
trickiest loss in the repo — the gate_cl composite objective
(`my_bert/gate_cl_modeling.py:1276-1395`):

    α · CRF_NLL(mean)  +  (1 − α) · (CE(crs) + InfoNCE)

with the negative-pair half-swap of the batch tail (:1348-1356), the
relation-gate CE over the flattened (L, 2H) concat (:1364-1365), the
P-weighted gate (:1369-1377), and the bidirectional per-sample InfoNCE
loops (:1276-1316) — all DIFFERENTIABLE on the torch side here (the
full-graph parity test computes them with numpy detours; training parity
needs real gradients).

Both sides train from IDENTICAL initialization on the SAME learnable
synthetic MNER dataset with the SAME optimizer semantics (AdamW +
warmup-linear + decay mask + global clip — the GateCLTrainer recipe),
dropout 0: the same deterministic dynamical system up to float
accumulation order. Appends a gate_cl section to PARITY_TRAIN.md.

Run (CPU, ~5-15 min on one core):  python tools/train_parity_gate_cl.py
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import torch  # noqa: E402

from tests.test_gate_cl_full_graph_parity import (  # noqa: E402
    ALPHA,
    B,
    L,
    LAYER_NUM1,
    NEG,
    NUM_LABELS,
    REGION_DIM,
    TEMP,
    TEMP_LAMB,
    TorchGateCL,
    VOCAB,
    _jax_params,
)
from tests.test_full_graph_parity import EPS, H  # noqa: E402

LABELS = ["O", "B-PER", "I-PER", "B-LOC", "I-LOC", "B-ORG", "I-ORG"]
assert len(LABELS) == NUM_LABELS
N_TRAIN, N_DEV = 192, 32
EPOCHS = int(os.environ.get("PARITY_EPOCHS", 32))
LR, WARMUP, WD, CLIP = 1e-3, 0.1, 0.01, 1.0


def torch_crf_nll_mean(emissions, tags, mask, start, end, trans):
    """torchcrf log-likelihood with reduction='mean' (per-sequence mean,
    the gate_cl reference reduction), differentiable."""
    emissions = emissions.double()
    Bb, Ll, T = emissions.shape
    maskf = mask.double()
    first = tags[:, 0]
    num = start[first] + emissions[:, 0].gather(1, first[:, None])[:, 0]
    prev = first
    for t in range(1, Ll):
        m = maskf[:, t]
        s = trans[prev, tags[:, t]] \
            + emissions[:, t].gather(1, tags[:, t][:, None])[:, 0]
        num = num + s * m
        prev = torch.where(mask[:, t] > 0, tags[:, t], prev)
    num = num + end[prev]
    alpha = start[None, :] + emissions[:, 0]
    for t in range(1, Ll):
        nxt = torch.logsumexp(
            alpha[:, :, None] + trans[None] + emissions[:, t][:, None, :],
            dim=1)
        alpha = torch.where(mask[:, t][:, None] > 0, nxt, alpha)
    den = torch.logsumexp(alpha + end[None, :], dim=1)
    return -(num - den).mean()


def torch_composite_loss(tm, crf_params, b):
    """The differentiable gate_cl training objective, reference math."""
    ids = torch.as_tensor(b["ids"].astype(np.int64))
    seg = torch.as_tensor(b["seg"].astype(np.int64))
    mask = torch.as_tensor(b["mask"].astype(np.int64))
    img_mask = torch.as_tensor(b["img_mask"].astype(np.int64))
    vis_mean = torch.as_tensor(b["vis_mean"])
    vis_grid = torch.as_tensor(b["vis_grid"])
    labels = torch.as_tensor(b["labels"].astype(np.int64))

    out = tm.bert(input_ids=ids, token_type_ids=seg, attention_mask=mask)
    seq, pooled = out.last_hidden_state, out.pooler_output
    grid = tm.vismap2text(vis_grid)
    img_bias = ((1.0 - img_mask.float()) * -10000.0)[:, None, None, :]
    cross = tm.txt2img_attention(seq, grid, img_bias)

    # negative-pair half-swap of the batch tail (:1348-1356) — NOT
    # in-place on a leaf of the autograd graph: build via cat so
    # gradients route through the swapped positions exactly as the
    # reference's in-place clone dance does
    labels_crs = torch.ones(B, dtype=torch.long)
    if B > NEG:
        half = NEG // 2
        lo = B - NEG
        cross_used = torch.cat([cross[:lo], cross[lo + half:B],
                                cross[lo:lo + half]], dim=0)
        labels_crs[lo:] = 0
    else:
        cross_used = cross

    crs_result = tm.crs_classifier(
        torch.cat((seq, cross_used), dim=-1).view(B, -1))
    P = torch.softmax(crs_result, dim=-1)[:, -1][:, None, None]
    new_cross = P * cross_used
    gate = torch.sigmoid(tm.Gate_text(seq) + tm.Gate_image(new_cross))
    gated = gate * new_cross
    feats = tm.classifier(torch.cat((seq, gated), dim=-1))

    crs_loss = torch.nn.CrossEntropyLoss()(crs_result.view(-1, 2),
                                           labels_crs.view(-1))
    t_cl = tm.text_ouput_cl(torch.relu(tm.text_dense_cl(pooled)))
    v_cl = tm.image_output_cl(torch.relu(tm.image_dense_cl(vis_mean)))
    cl_loss = (1 / B) * (
        TEMP_LAMB * tm.text_toimage_loss(t_cl, v_cl, TEMP)
        + (1 - TEMP_LAMB) * tm.image_totext_loss(t_cl, v_cl, TEMP))
    start, end, trans = crf_params
    main_loss = torch_crf_nll_mean(feats, labels, mask, start, end, trans)
    return ALPHA * main_loss + (1 - ALPHA) * (crs_loss + cl_loss), feats


def build_dataset(seed=0):
    from icka_tpu.data.synthetic import FILLER, ORGS, PEOPLE, PLACES

    words = sorted(set(PEOPLE + PLACES + ORGS + FILLER))
    vocab = {w: i + 5 for i, w in enumerate(words)}
    assert len(vocab) + 5 <= VOCAB
    rng = random.Random(seed)
    nprng = np.random.default_rng(seed)

    def sentence():
        toks, labs = [], []
        for _ in range(rng.randint(1, 3)):
            toks.append(rng.choice(FILLER)); labs.append("O")
        kind = rng.choice(["PER", "LOC", "ORG"])
        pool = {"PER": PEOPLE, "LOC": PLACES, "ORG": ORGS}[kind]
        span = rng.sample(pool, rng.randint(1, 2))
        toks.append(span[0]); labs.append(f"B-{kind}")
        for w in span[1:]:
            toks.append(w); labs.append(f"I-{kind}")
        for _ in range(rng.randint(1, 4)):
            toks.append(rng.choice(FILLER)); labs.append("O")
        return toks[:L], labs[:L]

    def example():
        toks, labs = sentence()
        n = len(toks)
        ids = np.zeros(L, np.int32)
        ids[:n] = [vocab[w] for w in toks]
        mask = np.zeros(L, np.int32); mask[:n] = 1
        label_ids = np.zeros(L, np.int32)
        label_ids[:n] = [LABELS.index(lb) for lb in labs]
        return {
            "ids": ids, "seg": np.zeros(L, np.int32), "mask": mask,
            "img_mask": np.ones(49, np.int32),
            "vis_mean": nprng.standard_normal(REGION_DIM)
            .astype(np.float32),
            "vis_grid": nprng.standard_normal((49, REGION_DIM))
            .astype(np.float32),
            "labels": label_ids,
        }

    def stack(exs):
        return {k: np.stack([e[k] for e in exs]) for k in exs[0]}

    train = [stack([example() for _ in range(B)])
             for _ in range(N_TRAIN // B)]
    dev = [stack([example() for _ in range(B)])
           for _ in range(N_DEV // B)]
    return train, dev


def chunk_f1(pred_rows, gold_rows):
    from icka_tpu.evaluation.chunk_f1 import evaluate_chunk_f1
    tag_to_id = {lb: i for i, lb in enumerate(LABELS)}
    return evaluate_chunk_f1(pred_rows, gold_rows, tag_to_id).f1


def main():
    from transformers import BertConfig

    from icka_tpu.core.config import EncoderConfig, GateCLConfig, TrainConfig
    from icka_tpu.models.gate_cl import GateCLModel
    from icka_tpu.train.optimizer import make_optimizer

    torch.manual_seed(7)
    hf_cfg = BertConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=EPS, pad_token_id=0, hidden_act="gelu")
    tm = TorchGateCL(hf_cfg)
    for m in tm.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    crf_start = torch.nn.Parameter(
        torch.empty(NUM_LABELS, dtype=torch.double).uniform_(-0.1, 0.1))
    crf_end = torch.nn.Parameter(
        torch.empty(NUM_LABELS, dtype=torch.double).uniform_(-0.1, 0.1))
    crf_trans = torch.nn.Parameter(
        torch.empty(NUM_LABELS, NUM_LABELS,
                    dtype=torch.double).uniform_(-0.1, 0.1))

    crf_np = (crf_start.detach().numpy(), crf_end.detach().numpy(),
              crf_trans.detach().numpy())
    params = _jax_params(tm, crf_np)["params"]

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
    model = GateCLModel(cfg)

    train, dev = build_dataset()
    total_steps = len(train) * EPOCHS

    tcfg = TrainConfig(learning_rate=LR, warmup_proportion=WARMUP,
                       weight_decay=WD, max_grad_norm=CLIP)
    tx = make_optimizer(tcfg, total_steps, params=params)
    opt_state = tx.init(params)

    import jax.numpy as jnp

    def jargs(b):
        return (b["ids"], b["seg"], b["mask"], b["img_mask"],
                b["vis_mean"], b["vis_grid"].reshape(B, 7, 7, REGION_DIM))

    @jax.jit
    def jstep(params, opt_state, batch):
        def loss_fn(p):
            return model.apply({"params": p}, *jargs(batch),
                               labels=batch["labels"], deterministic=True)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params,
                              jax.tree.map(jnp.asarray, updates))
        return params, opt_state, loss

    decay, no_decay = [], []
    for name, p in tm.named_parameters():
        (no_decay if ("bias" in name or "LayerNorm" in name
                      or "layer_norm" in name or "norm" in name.lower())
         else decay).append(p)
    topt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": WD},
         {"params": no_decay + [crf_start, crf_end, crf_trans],
          "weight_decay": 0.0}],
        lr=LR, betas=(0.9, 0.999), eps=1e-8)
    warm = int(WARMUP * total_steps)
    sched = torch.optim.lr_scheduler.LambdaLR(
        topt, lambda s: (s + 1) / max(1, warm) if s + 1 < warm
        else max(0.0, (total_steps - s - 1) / max(1, total_steps - warm)))

    # chaos-floor control (shadow run): a SECOND jax training whose init
    # differs by a single 1e-6 bias nudge. The composite objective is
    # chaotic (InfoNCE at temp 0.179 exponentiates cosine similarities),
    # so mid-training torch-vs-jax loss deltas must be read against the
    # divergence this epsilon produces BETWEEN TWO JAX RUNS — anything
    # within that band is float-accumulation sensitivity, not semantics.
    params2 = jax.tree.map(lambda x: x, params)
    params2["classifier"]["bias"] = (
        params2["classifier"]["bias"] + np.float32(1e-6))
    opt_state2 = tx.init(params2)

    tm.train()
    t_losses, j_losses, j2_losses = [], [], []
    t0 = time.time()
    for epoch in range(EPOCHS):
        for b in train:
            topt.zero_grad()
            tl, _ = torch_composite_loss(
                tm, (crf_start, crf_end, crf_trans), b)
            tl.backward()
            torch.nn.utils.clip_grad_norm_(
                [p for g in topt.param_groups for p in g["params"]], CLIP)
            topt.step()
            sched.step()
            t_losses.append(float(tl))
            params, opt_state, jl = jstep(params, opt_state, b)
            j_losses.append(float(jl))
            params2, opt_state2, jl2 = jstep(params2, opt_state2, b)
            j2_losses.append(float(jl2))
        print(f"epoch {epoch}: torch {t_losses[-1]:.4f} "
              f"jax {j_losses[-1]:.4f}", flush=True)

    # converged dev chunk-F1, each side decoded with its own weights
    from icka_tpu.nn.crf import crf_decode

    tm.eval()
    crf_t = (crf_start.detach().numpy(), crf_end.detach().numpy(),
             crf_trans.detach().numpy())
    pt, pj, gold = [], [], []
    for b in dev:
        with torch.no_grad():
            _, em_t = torch_composite_loss(
                tm, (crf_start, crf_end, crf_trans), b)
        tags_t = np.asarray(crf_decode(em_t.numpy(), b["mask"], *crf_t))
        tags_j = np.asarray(model.apply({"params": params}, *jargs(b)))
        for r in range(B):
            n = int(b["mask"][r].sum())
            pt.append(tags_t[r, :n].tolist())
            pj.append(tags_j[r, :n].tolist())
            gold.append(b["labels"][r, :n].tolist())

    f1_t = chunk_f1(pt, gold)
    f1_j = chunk_f1(pj, gold)
    dl = np.abs(np.asarray(t_losses) - np.asarray(j_losses))
    dchaos = np.abs(np.asarray(j_losses) - np.asarray(j2_losses))
    section = f"""

# Trained-parity A/B: torch gate_cl composite vs GateCLModel

Generated by tools/train_parity_gate_cl.py ({time.strftime('%Y-%m-%d')},
{time.time() - t0:.0f}s on this host). Both sides: identical init,
identical batches ({N_TRAIN} train / {N_DEV} dev synthetic MNER
examples, {EPOCHS} epochs, batch {B}), the FULL gate_cl composite
objective — α·CRF(mean) + (1−α)·(CE(crs) + InfoNCE) with the
negative-pair half-swap of the last {NEG} rows — identical optimizer
semantics (AdamW lr {LR}, warmup-linear {WARMUP}, weight decay {WD}
with bias/LayerNorm mask, global-norm clip {CLIP}), dropout 0.

| metric | torch reference | icka_tpu | delta |
|---|---|---|---|
| final train loss | {t_losses[-1]:.4f} | {j_losses[-1]:.4f} | {abs(t_losses[-1] - j_losses[-1]):.4f} |
| dev chunk-F1 (converged) | {f1_t:.4f} | {f1_j:.4f} | {abs(f1_t - f1_j):.4f} |
| max step-wise loss delta | | | {dl.max():.4f} |
| mean step-wise loss delta | | | {dl.mean():.4f} |

Chaos floor (shadow run: the SAME jax training re-run from an init that
differs by one 1e-6 bias nudge — the composite's InfoNCE at temp
{TEMP} is a chaotic dynamical system, so torch-vs-jax deltas must be
read against the divergence a single-float perturbation produces
between two *identical-semantics* runs):

| metric | jax vs jax+1e-6 | torch vs jax |
|---|---|---|
| max step-wise loss delta | {dchaos.max():.4f} | {dl.max():.4f} |
| mean step-wise loss delta | {dchaos.mean():.4f} | {dl.mean():.4f} |

Loss curves (every 4th step):
step, torch, jax, jax_shadow
""" + "\n".join(
        f"{i}, {t_losses[i]:.4f}, {j_losses[i]:.4f}, {j2_losses[i]:.4f}"
        for i in range(0, len(t_losses), 4)) + "\n"
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY_TRAIN.md")
    text = open(path).read() if os.path.exists(path) else ""
    marker = "# Trained-parity A/B: torch gate_cl composite"
    if marker in text:
        text = text[:text.index(marker)].rstrip() + "\n"
    with open(path, "w") as f:
        f.write(text + section)
    print(f"torch F1 {f1_t:.4f}  jax F1 {f1_j:.4f}  "
          f"|dF1| {abs(f1_t - f1_j):.4f}")
    print(f"max |dloss| {dl.max():.4f}  mean {dl.mean():.4f}  "
          f"chaos-floor max {dchaos.max():.4f}  mean {dchaos.mean():.4f}")
    print("appended gate_cl section to PARITY_TRAIN.md")


if __name__ == "__main__":
    main()
