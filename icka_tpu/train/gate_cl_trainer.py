"""Trainer for the my_bert gate_cl/cl/ip family (BASELINE config 4).

Mirrors the reference's BERT-variant training recipe: the model consumes
the non-prompted inputs (`input_ids = ori sentence`, `gate_cl_modeling.py
:1319`), trains on `alpha·CRF + (1−alpha)(crs+InfoNCE)` and evaluates with
CRF decode + the same chunk-F1 pipeline as the flagship. Shares the
optimizer, mesh, loader and evaluation machinery with `ICKATrainer`.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax.training import train_state

from icka_tpu.core.config import GateCLConfig, TrainConfig
from icka_tpu.core.dtypes import DTypePolicy
from icka_tpu.core.mesh import (
    MeshSpec,
    make_mesh,
    shard_accum_batch,
    shard_batch,
)
from icka_tpu.data.images import preprocess_images
from icka_tpu.data.labels import MNER_LABELS
from icka_tpu.evaluation import classification_report, evaluate_chunk_f1
from icka_tpu.models.gate_cl import GateCLModel
from icka_tpu.models.resnet import VisualBackbone
from icka_tpu.train.optimizer import make_optimizer
from icka_tpu.train.trainer import EvalResult, ICKATrainState, \
    filter_predictions


class GateCLTrainer:
    def __init__(self, model_cfg: GateCLConfig, train_cfg: TrainConfig,
                 label_list=None, mesh=None,
                 policy: Optional[DTypePolicy] = None,
                 resnet_layers=(3, 8, 36, 3)):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.label_list = label_list or MNER_LABELS
        self.policy = policy or DTypePolicy.from_str(train_cfg.compute_dtype)
        self.mesh = mesh or make_mesh(
            MeshSpec(data=train_cfg.data_axis, model=train_cfg.model_axis))
        self.model = GateCLModel(model_cfg, dtype=self.policy.compute_dtype)
        self.backbone = VisualBackbone(
            layers=resnet_layers, fine_tune=train_cfg.fine_tune_cnn,
            dtype=self.policy.compute_dtype)
        self._train_step = None
        self._eval_step = None

    def init_state(self, rng, sample, total_steps: int) -> ICKATrainState:
        k1, k2 = jax.random.split(rng)
        variables = self.model.init(
            k1, sample["ori_input_ids"], sample["ori_segment_ids"],
            sample["ori_input_mask"], sample["img_mask"],
            sample["visual_mean"], sample["visual_grid"],
            labels=sample.get("label_ids"))
        bvars = self.backbone.init(
            k2, jnp.zeros((1, 224, 224, 3), jnp.float32))
        tx = make_optimizer(self.train_cfg, total_steps,
                            params=variables["params"])
        return ICKATrainState.create(
            apply_fn=self.model.apply, params=variables["params"], tx=tx,
            backbone_variables=bvars)

    def _encode(self, bvars, images, rng, train):
        pixels = preprocess_images(images, rng, train=train)
        _, mean, att = self.backbone.apply(bvars, pixels)
        return mean.astype(jnp.float32), att

    def _loss(self, params, bvars, batch, rng, train: bool):
        img_rng, drop_rng = jax.random.split(rng)
        mean, att = self._encode(bvars, batch["images"], img_rng, train)
        return self.model.apply(
            {"params": params},
            batch["ori_input_ids"], batch["ori_segment_ids"],
            batch["ori_input_mask"], batch["img_mask"], mean, att,
            labels=batch["label_ids"], deterministic=not train,
            rngs={"dropout": drop_rng} if train else None)

    def make_train_step(self):
        accum = self.train_cfg.gradient_accumulation_steps

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, batch, rng):
            def micro(carry, xs):
                acc, loss_acc = carry
                mb, r = xs
                loss, grads = jax.value_and_grad(self._loss)(
                    state.params, state.backbone_variables, mb, r, True)
                return (jax.tree.map(jnp.add, acc, grads),
                        loss_acc + loss), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            rngs = jax.random.split(rng, accum)
            (grads, loss_sum), _ = jax.lax.scan(
                micro, (zeros, 0.0), (batch, rngs))
            grads = jax.tree.map(lambda g: g / accum, grads)
            # true step-skip on non-finite loss/grads (see ICKATrainer)
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
            return new_state, loss_sum / accum

        return step

    def make_eval_step(self):
        @jax.jit
        def step(state, batch):
            mean, att = self._encode(state.backbone_variables,
                                     batch["images"],
                                     jax.random.PRNGKey(0), False)
            return self.model.apply(
                {"params": state.params},
                batch["ori_input_ids"], batch["ori_segment_ids"],
                batch["ori_input_mask"], batch["img_mask"], mean, att)

        return step

    def fit(self, train_loader, dev_loader=None, epochs=1, rng=None,
            state=None, checkpointer=None, log=print,
            preemption_guard=None):
        rng = rng if rng is not None else jax.random.PRNGKey(
            self.train_cfg.seed)
        if self._train_step is None:
            self._train_step = self.make_train_step()
        steps_per_epoch = len(train_loader)
        if state is None:
            sample = next(iter(train_loader.eval_view()))
            sample = dict(sample)
            B = sample["ori_input_ids"].shape[0]
            sample["visual_mean"] = np.zeros(
                (B, self.model_cfg.region_dim), np.float32)
            sample["visual_grid"] = np.zeros(
                (B, 7, 7, self.model_cfg.region_dim), np.float32)
            rng, k = jax.random.split(rng)
            state = self.init_state(k, sample,
                                    total_steps=steps_per_epoch * epochs)
        # mid-run resume + preemption snapshots, same semantics as
        # ICKATrainer.fit (global-step-numbered snapshots, one namespace)
        start_epoch, skip_batches = 0, 0
        if checkpointer is not None and checkpointer.manifest["steps"]:
            state, ck_step = checkpointer.resume(state)
            start_epoch = ck_step // steps_per_epoch
            skip_batches = ck_step % steps_per_epoch
            log(f"resumed from step {ck_step} "
                f"(epoch {start_epoch}, batch {skip_batches})")
        best = (checkpointer.manifest["best_metric"]
                if checkpointer is not None
                and checkpointer.manifest["best_metric"] is not None
                else -1.0)
        history = []
        for epoch in range(start_epoch, epochs):
            losses = []
            for i, batch in enumerate(train_loader):
                rng, k = jax.random.split(rng)
                if epoch == start_epoch and i < skip_batches:
                    continue
                if preemption_guard is not None and \
                        preemption_guard.requested:
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
            history.append(train_loss)
            msg = f"epoch {epoch}: train_loss={train_loss:.4f}"
            if dev_loader is not None:
                res = self.evaluate(state, dev_loader)
                msg += f" dev f1={res.f1:.4f}"
                if res.f1 > best:
                    best = res.f1
                    if checkpointer is not None:
                        checkpointer.save(
                            state, step=int(jax.device_get(state.step)),
                            metric=res.f1)
            log(msg)
        return state, history

    def evaluate(self, state, loader) -> EvalResult:
        if self._eval_step is None:
            self._eval_step = self.make_eval_step()
        yt_all, yp_all, yti, ypi, losses = [], [], [], [], [0.0]
        label_map = {l: i for i, l in enumerate(self.label_list, 1)}
        label_map["PAD"] = 0
        for batch in loader:
            batch = dict(batch)
            # drop padded-tail duplicate rows (see ICKATrainer.evaluate)
            row_valid = batch.pop("row_valid", None)
            n = (int(np.sum(row_valid)) if row_valid is not None
                 else len(batch["label_ids"]))
            batch = shard_batch(self.mesh, batch)
            pred = self._eval_step(state, batch)
            yt, yp, ti, pi = filter_predictions(
                np.asarray(pred)[:n], np.asarray(batch["label_ids"])[:n],
                np.asarray(batch["output_mask"])[:n], self.label_list)
            yt_all += yt
            yp_all += yp
            yti += ti
            ypi += pi
        m = evaluate_chunk_f1(ypi, yti, label_map)
        return EvalResult(f1=m.f1, precision=m.precision, recall=m.recall,
                          acc=m.acc, loss=float(np.mean(losses)),
                          report=classification_report(yt_all, yp_all))
