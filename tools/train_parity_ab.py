"""Trained-parity A/B: torch reference composite vs the JAX flagship.

VERDICT r03 "what's missing" #1: forward parity cannot catch optimizer,
schedule, or loss-composition drift. This script trains BOTH sides from
IDENTICAL initialization on the SAME learnable synthetic MNER dataset with
the SAME optimizer semantics and compares loss curves step by step and
converged dev chunk-F1:

  - torch side: `TorchICKA` (the reference-semantics full-graph composite
    from tests/test_full_graph_parity.py, matching
    `My_cross_attention.py:941-1057`) + a differentiable torch CRF NLL
    (token_mean, torchcrf semantics) + torch AdamW with the decay mask and
    warmup-linear schedule of `My_cross_attention.py:741-760`;
  - jax side: `ICKAModel` mode="train" + `make_optimizer` (the exact
    optimizer `ICKATrainer` uses).

Dropout is 0 on both sides, so with matched init + matched batches the two
trainings are the SAME deterministic dynamical system up to float
accumulation order — step-wise loss deltas and the final F1 delta measure
exactly the training-semantics gap the north star's accuracy half asks
about. Results are written to PARITY_TRAIN.md.

Run (CPU, ~10-20 min on one core):  python tools/train_parity_ab.py
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

from tests.test_full_graph_parity import (  # noqa: E402
    CLIP_DIM,
    L,
    LP,
    MASKS,
    NUM_LABELS,
    OFFSET,
    REGION_DIM,
    TorchICKA,
    jax_params_from_torch,
)

LABELS = ["O", "B-PER", "I-PER", "B-LOC", "I-LOC", "B-ORG", "I-ORG"]
assert len(LABELS) == NUM_LABELS
B = 8
N_TRAIN, N_DEV = 192, 32
EPOCHS = 24
LR, WARMUP, WD, CLIP = 1e-3, 0.1, 0.01, 1.0


# ---------------------------------------------------------------- dataset

def build_dataset(seed=0):
    """Learnable synthetic MNER batches in the parity-test tensor layout
    (entity identity is determined by token identity, so embeddings
    suffice to learn it; visual features are fixed random context)."""
    from icka_tpu.data.synthetic import FILLER, ORGS, PEOPLE, PLACES

    words = sorted(set(PEOPLE + PLACES + ORGS + FILLER))
    vocab = {w: i + 5 for i, w in enumerate(words)}
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
        ori_ids = np.full(L, 1, np.int32)
        ori_ids[:n] = [vocab[w] for w in toks]
        ori_mask = np.zeros(L, np.int32); ori_mask[:n] = 1
        label_ids = np.zeros(L, np.int32)
        label_ids[:n] = [LABELS.index(lb) for lb in labs]
        # prompted layout: OFFSET fixed prompt tokens (MASKS positions are
        # spliced over, content arbitrary) + the sentence
        ids = np.full(LP, 1, np.int32)
        ids[:OFFSET] = [0, 5, 6, 3, 7, 8, 9, 10, 11, 3, 12, 2][:OFFSET]
        ids[OFFSET:OFFSET + n] = ori_ids[:n]
        input_mask = np.concatenate([np.ones(OFFSET, np.int32), ori_mask])
        ids = np.where(input_mask > 0, ids, 1).astype(np.int32)
        return {
            "input_ids": ids,
            "segment_ids": np.concatenate(
                [np.zeros(OFFSET, np.int32), np.ones(L, np.int32)]),
            "input_mask": input_mask,
            "ori_input_ids": ori_ids,
            "ori_input_mask": ori_mask,
            "ori_segment_ids": np.zeros(L, np.int32),
            "img_mask": np.ones(49, np.int32),
            "clip_features": nprng.standard_normal((1, CLIP_DIM))
            .astype(np.float32),
            "visual_mean": nprng.standard_normal(REGION_DIM)
            .astype(np.float32),
            "visual_grid": nprng.standard_normal((7, 7, REGION_DIM))
            .astype(np.float32),
            "output_mask": ori_mask,
            "label_ids": label_ids,
        }

    def stack(exs):
        return {k: np.stack([e[k] for e in exs]) for k in exs[0]}

    train = [stack([example() for _ in range(B)])
             for _ in range(N_TRAIN // B)]
    dev = [stack([example() for _ in range(B)])
           for _ in range(N_DEV // B)]
    return train, dev


# ------------------------------------------------- differentiable torch CRF

def torch_crf_nll_token_mean(emissions, tags, mask, start, end, trans):
    """torchcrf log-likelihood with reduction='token_mean', differentiable
    (semantics of `nn/crf.py::crf_log_likelihood`, itself bit-compatible
    with torchcrf — see tests/test_crf.py)."""
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
    # end transitions at each sequence's last unmasked position
    num = num + end[prev]

    alpha = start[None, :] + emissions[:, 0]
    for t in range(1, Ll):
        nxt = torch.logsumexp(
            alpha[:, :, None] + trans[None] + emissions[:, t][:, None, :],
            dim=1)
        alpha = torch.where(mask[:, t][:, None] > 0, nxt, alpha)
    den = torch.logsumexp(alpha + end[None, :], dim=1)
    return -(num - den).sum() / maskf.sum()


def torch_batch(b):
    att_nchw = np.moveaxis(
        b["visual_grid"].reshape(B, 49, REGION_DIM), -1, 1) \
        .reshape(B, REGION_DIM, 7, 7)
    t = {k: torch.as_tensor(b[k].astype(np.int64))
         for k in ("input_ids", "segment_ids", "input_mask",
                   "ori_input_ids", "ori_input_mask", "ori_segment_ids",
                   "img_mask", "output_mask", "label_ids")}
    t["clip_features"] = torch.as_tensor(b["clip_features"])
    t["visual_mean"] = torch.as_tensor(b["visual_mean"])
    t["visual_grid"] = torch.as_tensor(att_nchw)
    return t


def chunk_f1(pred_rows, gold_rows):
    from icka_tpu.evaluation.chunk_f1 import evaluate_chunk_f1
    tag_to_id = {lb: i for i, lb in enumerate(LABELS)}
    return evaluate_chunk_f1(pred_rows, gold_rows, tag_to_id).f1


def decode_rows(emissions, mask, crf_np):
    """Viterbi via the repo CRF math (pure function of emissions+params —
    usable for both sides), returns per-row tag-id lists."""
    from icka_tpu.nn.crf import crf_decode
    tags = np.asarray(crf_decode(emissions, mask, *crf_np))
    rows = []
    for r in range(tags.shape[0]):
        n = int(mask[r].sum())
        rows.append(tags[r, :n].tolist())
    return rows


def main():
    from transformers import RobertaConfig

    from tests.test_full_graph_parity import (
        EPS, H, HEADS, INTER, LAYERS, VOCAB,
    )

    torch.manual_seed(7)
    hf_cfg = RobertaConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=EPS, pad_token_id=1)
    tm = TorchICKA(hf_cfg)
    # zero the composite's own dropouts (mapping networks)
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

    # ---- matched init: torch weights -> jax params
    from icka_tpu.core.config import EncoderConfig, ICKAConfig, TrainConfig
    from icka_tpu.models.icka import ICKAModel
    from icka_tpu.train.optimizer import make_optimizer

    crf_params = {
        "start_transitions": crf_start.detach().numpy().astype(np.float32),
        "end_transitions": crf_end.detach().numpy().astype(np.float32),
        "transitions": crf_trans.detach().numpy().astype(np.float32),
    }
    enc = EncoderConfig(
        vocab_size=VOCAB, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=EPS, position_offset=2, pad_token_id=1)
    from tests.test_full_graph_parity import (
        LAYER_NUM1, P_LEN, PROMPT_HIDDEN,
    )
    cfg = ICKAConfig(embedding=enc, last_encoder=enc,
                     num_labels=NUM_LABELS, layer_num1=LAYER_NUM1,
                     region_dim=REGION_DIM, clip_dim=CLIP_DIM,
                     prompt_len=P_LEN, prompt_hidden=PROMPT_HIDDEN,
                     last_hidden=H, max_seq_length=L)
    model = ICKAModel(cfg)
    params = jax_params_from_torch(tm, crf_params)["params"]

    train, dev = build_dataset()
    total_steps = len(train) * EPOCHS

    # ---- jax side: ICKATrainer's optimizer on ICKAModel's train loss
    tcfg = TrainConfig(learning_rate=LR, warmup_proportion=WARMUP,
                       weight_decay=WD, max_grad_norm=CLIP)
    tx = make_optimizer(tcfg, total_steps, params=params)
    opt_state = tx.init(params)

    import jax.numpy as jnp

    @jax.jit
    def jstep(params, opt_state, batch):
        def loss_fn(p):
            mb = {k: v for k, v in batch.items() if k != "label_ids"}
            return model.apply({"params": p}, mb, MASKS, OFFSET,
                               mode="train", labels=batch["label_ids"],
                               deterministic=True)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params,
                              jax.tree.map(jnp.asarray, updates))
        return params, opt_state, loss

    # ---- torch side: AdamW + warmup-linear + global clip + decay mask
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

    tm.train()
    t_losses, j_losses = [], []
    t0 = time.time()
    for epoch in range(EPOCHS):
        for b in train:
            # torch step
            tb = torch_batch(b)
            topt.zero_grad()
            em = tm(tb["input_ids"], tb["segment_ids"], tb["input_mask"],
                    tb["ori_input_ids"], tb["ori_input_mask"],
                    tb["ori_segment_ids"], tb["img_mask"],
                    tb["clip_features"], tb["visual_mean"],
                    tb["visual_grid"])
            tl = torch_crf_nll_token_mean(
                em, tb["label_ids"], tb["output_mask"],
                crf_start, crf_end, crf_trans)
            tl.backward()
            torch.nn.utils.clip_grad_norm_(
                [p for g in topt.param_groups for p in g["params"]], CLIP)
            topt.step()
            sched.step()
            t_losses.append(float(tl))
            # jax step
            params, opt_state, jl = jstep(params, opt_state, b)
            j_losses.append(float(jl))
        print(f"epoch {epoch}: torch {t_losses[-1]:.4f} "
              f"jax {j_losses[-1]:.4f}", flush=True)

    # ---- converged dev chunk-F1, each side decoded with its own weights
    tm.eval()
    crf_t = (crf_start.detach().numpy(), crf_end.detach().numpy(),
             crf_trans.detach().numpy())
    pt, pj, gold = [], [], []
    for b in dev:
        tb = torch_batch(b)
        with torch.no_grad():
            em_t = tm(tb["input_ids"], tb["segment_ids"],
                      tb["input_mask"], tb["ori_input_ids"],
                      tb["ori_input_mask"], tb["ori_segment_ids"],
                      tb["img_mask"], tb["clip_features"],
                      tb["visual_mean"], tb["visual_grid"]).numpy()
        mb = {k: v for k, v in b.items() if k != "label_ids"}
        tags_j = np.asarray(model.apply({"params": params}, mb, MASKS,
                                        OFFSET, mode="test"))
        pt += decode_rows(em_t, b["output_mask"], crf_t)
        for r in range(B):
            n = int(b["output_mask"][r].sum())
            pj.append(tags_j[r, :n].tolist())
            gold.append(b["label_ids"][r, :n].tolist())

    f1_t = chunk_f1(pt, gold)
    f1_j = chunk_f1(pj, gold)
    dl = np.abs(np.asarray(t_losses) - np.asarray(j_losses))
    report = f"""# Trained-parity A/B: torch reference vs ICKAModel

Generated by tools/train_parity_ab.py ({time.strftime('%Y-%m-%d')},
{time.time() - t0:.0f}s on this host). Both sides: identical init
(torch weights converted), identical batches ({N_TRAIN} train /
{N_DEV} dev synthetic MNER examples, {EPOCHS} epochs, batch {B}),
identical optimizer semantics (AdamW lr {LR}, warmup-linear {WARMUP},
weight decay {WD} with bias/LayerNorm mask, global-norm clip {CLIP}),
dropout 0 — the same deterministic dynamical system up to float
accumulation order.

| metric | torch reference | icka_tpu | delta |
|---|---|---|---|
| final train loss | {t_losses[-1]:.4f} | {j_losses[-1]:.4f} | {abs(t_losses[-1] - j_losses[-1]):.4f} |
| dev chunk-F1 (converged) | {f1_t:.4f} | {f1_j:.4f} | {abs(f1_t - f1_j):.4f} |
| max step-wise loss delta | | | {dl.max():.4f} |
| mean step-wise loss delta | | | {dl.mean():.4f} |

Loss curves (every 4th step):
step, torch, jax
""" + "\n".join(f"{i}, {t_losses[i]:.4f}, {j_losses[i]:.4f}"
                for i in range(0, len(t_losses), 4)) + "\n"
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PARITY_TRAIN.md"), "w") as f:
        f.write(report)
    print(f"torch F1 {f1_t:.4f}  jax F1 {f1_j:.4f}  "
          f"|dF1| {abs(f1_t - f1_j):.4f}")
    print(f"max |dloss| {dl.max():.4f}  mean {dl.mean():.4f}")
    print("wrote PARITY_TRAIN.md")


if __name__ == "__main__":
    main()
