"""Training/eval driver: the TPU-native `train_and_dev` / `test`.

Replaces the reference driver loop (`My_cross_attention.py:625-1089`) with:

  - ONE jitted train step containing image preprocessing, the (frozen)
    ResNet encode, the full ICKA forward, CRF loss, gradient accumulation
    (`lax.scan` over microbatches — the reference's accumulate-5-then-step,
    :587-590,821-844), AdamW update and implicit cross-device `psum` from
    sharded inputs — no Python between microbatches, no host sync;
  - a jitted eval step (forward + Viterbi decode);
  - driver-exact label filtering for evaluation (:882-903) feeding the
    chunk-F1 evaluator;
  - best-dev-F1 checkpointing (:917-943) via `icka_tpu.core.checkpoint`.
"""

from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass
from functools import partial
from typing import Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from icka_tpu.core.config import ICKAConfig, TrainConfig
from icka_tpu.core.dtypes import DTypePolicy
from icka_tpu.core.mesh import (
    MeshSpec,
    make_mesh,
    shard_accum_batch,
    shard_batch,
)
from icka_tpu.data.features import MMFeatures, PromptSpec
from icka_tpu.data.images import preprocess_images
from icka_tpu.data.labels import FILTERED_LABELS, MNER_LABELS, id_to_label
from icka_tpu.evaluation import (
    classification_report,
    evaluate_chunk_f1,
    evaluate_class_f1,
)
from icka_tpu.models.icka import ICKAModel
from icka_tpu.models.resnet import VisualBackbone
from icka_tpu.train.optimizer import make_optimizer


class ICKATrainState(train_state.TrainState):
    backbone_variables: dict = None


def filter_predictions(pred_ids, label_ids, output_mask, label_list=None):
    """Driver-exact eval filtering (:882-903): walk each row until the first
    masked position, dropping X/<s>/</s>/[CLS]/[SEP] gold positions.
    Returns (y_true_tags, y_pred_tags, y_true_ids, y_pred_ids)."""
    id2lab = id_to_label(label_list)
    y_true, y_pred, y_true_idx, y_pred_idx = [], [], [], []
    for row in range(len(pred_ids)):
        t_tags, p_tags, t_idx, p_idx = [], [], [], []
        for j in range(len(output_mask[row])):
            if not output_mask[row][j]:
                break
            gold = id2lab[int(label_ids[row][j])]
            if gold in FILTERED_LABELS:
                continue
            t_tags.append(gold)
            t_idx.append(int(label_ids[row][j]))
            p_tags.append(id2lab[int(pred_ids[row][j])])
            p_idx.append(int(pred_ids[row][j]))
        y_true.append(t_tags)
        y_pred.append(p_tags)
        y_true_idx.append(t_idx)
        y_pred_idx.append(p_idx)
    return y_true, y_pred, y_true_idx, y_pred_idx


@dataclass
class EvalResult:
    f1: float
    precision: float
    recall: float
    acc: float
    loss: float
    report: str = ""
    per_class: dict = None  # {class: (f1, p, r)} — ner_evaluate
    #                         `evaluate_each_class` parity


class ICKATrainer:
    """Builds, jits and drives the flagship model end to end."""

    def __init__(self, model_cfg: ICKAConfig, train_cfg: TrainConfig,
                 spec: PromptSpec, label_list=None,
                 mesh=None, policy: Optional[DTypePolicy] = None,
                 resnet_layers=(3, 8, 36, 3)):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.spec = spec
        self.label_list = label_list
        self.policy = policy or DTypePolicy.from_str(train_cfg.compute_dtype)
        self.mesh = mesh or make_mesh(
            MeshSpec(data=train_cfg.data_axis, model=train_cfg.model_axis))
        self.model = ICKAModel(model_cfg, dtype=self.policy.compute_dtype)
        self.backbone = VisualBackbone(
            layers=resnet_layers, fine_tune=train_cfg.fine_tune_cnn,
            dtype=self.policy.compute_dtype)
        self._train_step = None
        self._eval_step = None

    # -- initialization ----------------------------------------------------

    def init_state(self, rng, sample_batch, total_steps: int,
                   backbone_variables=None) -> ICKATrainState:
        k1, k2 = jax.random.split(rng)
        variables = self.model.init(
            k1, sample_batch, self.spec.mask_positions, self.spec.offset,
            mode="test")
        if backbone_variables is None:
            crop = 224
            dummy = jnp.zeros((1, crop, crop, 3), jnp.float32)
            backbone_variables = self.backbone.init(k2, dummy)
        tx = make_optimizer(self.train_cfg, total_steps,
                            params=variables["params"])
        return ICKATrainState.create(
            apply_fn=self.model.apply, params=variables["params"], tx=tx,
            backbone_variables=backbone_variables)

    # -- compiled steps ----------------------------------------------------

    def _encode_images(self, backbone_variables, images, rng, train: bool):
        pixels = preprocess_images(images, rng, train=train)
        pooled, mean, att = self.backbone.apply(backbone_variables, pixels)
        return mean.astype(jnp.float32), att

    def _loss(self, params, backbone_variables, batch, rng, train: bool):
        img_rng, drop_rng = jax.random.split(rng)
        visual_mean, visual_grid = self._encode_images(
            backbone_variables, batch["images"], img_rng, train)
        model_batch = dict(batch)
        model_batch.pop("images")
        labels = model_batch.pop("label_ids")
        model_batch["visual_mean"] = visual_mean
        model_batch["visual_grid"] = visual_grid
        loss = self.model.apply(
            {"params": params}, model_batch, self.spec.mask_positions,
            self.spec.offset, mode="train", labels=labels,
            deterministic=not train,
            rngs={"dropout": drop_rng} if train else None)
        return loss

    def make_train_step(self):
        """jit once; batch layout (accum, micro_batch, ...)."""
        accum = self.train_cfg.gradient_accumulation_steps
        zero1 = getattr(self.train_cfg, "zero1", False)

        def constrain_zero1(state):
            """Pin Adam moments to the ZeRO-1 layout inside the program so
            XLA keeps the moment update on each device's 1/N shard (and
            all-gathers only the parameter delta) instead of resolving the
            replicated-grads × sharded-moments mismatch the other way."""
            from jax.sharding import NamedSharding
            from icka_tpu.parallel.partitioning import (
                _map_moments,
                zero1_moment_specs,
            )

            specs = zero1_moment_specs(state.params, self.mesh)
            pin = lambda t: jax.tree.map(  # noqa: E731
                lambda x, s: jax.lax.with_sharding_constraint(
                    x, NamedSharding(self.mesh, s)),
                t, specs)
            return state.replace(
                opt_state=_map_moments(state.opt_state, pin))

        @partial(jax.jit, donate_argnums=(0,))
        def step(state: ICKATrainState, batch, rng):
            def micro(carry, xs):
                grads_acc, loss_acc = carry
                mb, r = xs
                loss, grads = jax.value_and_grad(self._loss)(
                    state.params, state.backbone_variables, mb, r, True)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            rngs = jax.random.split(rng, accum)
            (grads, loss_sum), _ = jax.lax.scan(
                micro, (zeros, 0.0), (batch, rngs))
            grads = jax.tree.map(lambda g: g / accum, grads)
            # failure detection (SURVEY §5: the reference has none): a
            # non-finite loss/grad step is a TRUE step-skip — params,
            # optimizer moments, step count and therefore the LR schedule
            # all stay put (torch semantics), so loss curves reproduce
            # across NaN-event histories.
            finite = jnp.isfinite(loss_sum)
            for leaf in jax.tree.leaves(grads):
                finite = jnp.logical_and(
                    finite, jnp.all(jnp.isfinite(leaf)))
            grads = jax.tree.map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
            new_state = state.apply_gradients(grads=grads)
            keep = lambda n, o: jnp.where(finite, n, o)  # noqa: E731
            new_state = new_state.replace(
                step=keep(new_state.step, state.step),
                params=jax.tree.map(keep, new_state.params, state.params),
                opt_state=jax.tree.map(keep, new_state.opt_state,
                                       state.opt_state))
            if zero1:
                new_state = constrain_zero1(new_state)
            return new_state, loss_sum / accum

        return step

    def make_eval_step(self):
        @jax.jit
        def step(state: ICKATrainState, batch):
            visual_mean, visual_grid = self._encode_images(
                state.backbone_variables, batch["images"],
                jax.random.PRNGKey(0), False)
            model_batch = dict(batch)
            model_batch.pop("images")
            labels = model_batch.pop("label_ids")
            model_batch["visual_mean"] = visual_mean
            model_batch["visual_grid"] = visual_grid
            # loss_reduction="none": per-row NLL, so the eval loop can
            # aggregate an EXACT token-mean over the unpadded dataset —
            # duplicated tail rows never contaminate the denominator
            pred, row_nll = self.model.apply(
                {"params": state.params}, model_batch,
                self.spec.mask_positions, self.spec.offset,
                mode="dev", labels=labels, loss_reduction="none")
            return pred, row_nll

        return step

    # -- loops -------------------------------------------------------------

    def fit(self, train_loader, dev_loader=None, epochs=None, rng=None,
            state=None, total_steps=None, checkpointer=None, log=print,
            preemption_guard=None):
        cfg = self.train_cfg
        epochs = epochs or cfg.num_train_epochs
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        steps_per_epoch = len(train_loader)
        total_steps = total_steps or steps_per_epoch * epochs
        if state is None:
            sample = next(iter(train_loader.eval_view()))
            model_sample = dict(sample)
            model_sample.pop("images", None)
            model_sample.pop("label_ids", None)
            model_sample["visual_mean"] = np.zeros(
                (sample["ori_input_ids"].shape[0], self.model_cfg.region_dim),
                np.float32)
            model_sample["visual_grid"] = np.zeros(
                (sample["ori_input_ids"].shape[0], 7, 7,
                 self.model_cfg.region_dim), np.float32)
            rng, k = jax.random.split(rng)
            state = self.init_state(k, model_sample, total_steps)
        if self._train_step is None:
            self._train_step = self.make_train_step()

        # mid-run resume (reference cannot: SURVEY §5): any step snapshot
        # in the checkpointer (periodic or preemption) restores params,
        # optimizer moments AND the global step; the loop then continues
        # at the right epoch/batch. All snapshots are numbered by the
        # GLOBAL optimizer step (one namespace — an epoch-end save and a
        # preemption save can never collide).
        start_epoch, skip_batches = 0, 0
        if checkpointer is not None and checkpointer.manifest["steps"]:
            state, ck_step = checkpointer.resume(state)
            start_epoch = ck_step // steps_per_epoch
            skip_batches = ck_step % steps_per_epoch
            log(f"resumed from step {ck_step} "
                f"(epoch {start_epoch}, batch {skip_batches})")

        best_f1 = (checkpointer.manifest["best_metric"]
                   if checkpointer is not None
                   and checkpointer.manifest["best_metric"] is not None
                   else -1.0)
        history = []
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            losses = []
            for i, batch in enumerate(train_loader):
                rng, k = jax.random.split(rng)   # keep the stream aligned
                if epoch == start_epoch and i < skip_batches:
                    continue                      # already trained pre-resume
                if preemption_guard is not None and \
                        preemption_guard.requested:
                    # preemption: snapshot the last COMPLETED step and
                    # return cleanly so Checkpointer.resume() continues
                    # the run (SURVEY §5 — reference loses the run here)
                    step_no = int(jax.device_get(state.step))
                    if checkpointer is not None:
                        checkpointer.save(state, step=step_no)
                    log(f"preempted: saved step {step_no}, exiting fit")
                    return state, history
                batch = shard_accum_batch(self.mesh, batch)
                state, loss = self._train_step(state, batch, k)
                losses.append(loss)
            train_loss = float(jnp.mean(jnp.stack(losses))) \
                if losses else float("nan")
            msg = (f"epoch {epoch}: train_loss={train_loss:.4f} "
                   f"({time.time() - t0:.1f}s)")
            if dev_loader is not None:
                result = self.evaluate(state, dev_loader)
                msg += (f" dev_loss={result.loss:.4f} f1={result.f1:.4f} "
                        f"p={result.precision:.4f} r={result.recall:.4f}")
                if result.f1 > best_f1:
                    best_f1 = result.f1
                    if checkpointer is not None:
                        checkpointer.save(
                            state, step=int(jax.device_get(state.step)),
                            metric=result.f1)
            log(msg)
            history.append(train_loss)
        return state, history

    def evaluate(self, state, loader) -> EvalResult:
        if self._eval_step is None:
            self._eval_step = self.make_eval_step()
        y_true_all, y_pred_all = [], []
        yt_idx_all, yp_idx_all = [], []
        nll_sum = 0.0
        token_sum = 0.0
        label_map = {l: i for i, l in enumerate(
            self.label_list or MNER_LABELS, 1)}
        label_map["PAD"] = 0
        for batch in loader:
            batch = dict(batch)
            # padded-tail duplicates (loader pads the last eval batch by
            # repeating the final row) are dropped before metrics AND the
            # loss: per-row NLLs + token counts aggregate to the exact
            # token-mean loss of the unpadded dataset
            row_valid = batch.pop("row_valid", None)
            n = (int(np.sum(row_valid)) if row_valid is not None
                 else len(batch["label_ids"]))
            batch = shard_batch(self.mesh, batch)
            pred, row_nll = self._eval_step(state, batch)
            nll_sum += float(np.sum(np.asarray(row_nll)[:n]))
            token_sum += float(
                np.sum(np.asarray(batch["output_mask"])[:n]))
            yt, yp, yt_idx, yp_idx = filter_predictions(
                np.asarray(pred)[:n], np.asarray(batch["label_ids"])[:n],
                np.asarray(batch["output_mask"])[:n], self.label_list)
            y_true_all += yt
            y_pred_all += yp
            yt_idx_all += yt_idx
            yp_idx_all += yp_idx
        m = evaluate_chunk_f1(yp_idx_all, yt_idx_all, label_map)
        report = classification_report(y_true_all, y_pred_all)
        per_class = {
            cls: evaluate_class_f1(yp_idx_all, yt_idx_all, label_map, cls)
            for cls in ("PER", "LOC", "ORG", "MISC")}
        return EvalResult(f1=m.f1, precision=m.precision, recall=m.recall,
                          acc=m.acc,
                          loss=nll_sum / max(token_sum, 1.0),
                          report=report, per_class=per_class)
