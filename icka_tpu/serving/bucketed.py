"""Length-bucketed serving engine.

The reference driver pads EVERY sentence to ``max_seq_length`` = 128
(`My_cross_attention.py:375-427`) and pays the full 128-token encoder cost
for every pair, although Twitter-2015/2017 tweets average ~17 tokens. On
GPU/PyTorch with dynamic shapes that padding is a convenience; under XLA it
is a compiled-in 4-8x FLOP tax.

TPU-first answer: XLA needs *static* shapes per program, but nothing forces
ONE program. This engine compiles the model once per length bucket, routes
each request to the smallest bucket that fits, and packs bucket queues into
fixed-size batches. Short tweets then run through a 16- or 24-token encoder
instead of a 128-token one. The default bucket set (16, 24, 32, 48, 64,
128) was chosen by measurement on the documented tweet-length distribution
(bench.py --model gate_cl_bucketed --buckets ...): finer buckets beat the
coarse (32, 64, 128) set by ~17% weighted throughput because ~54% of
requests fit in ≤24 tokens; going finer than 6 buckets only adds compile
time for sub-1% shares.

Exactness contract (tested in tests/test_serving.py):

  - Encoder/fusion outputs at VALID token positions are exactly the values
    the 128-padded model produces — additive `-10000` key masks make padding
    keys invisible, and padding QUERIES only affect padding outputs, which
    the CRF decode masks out. For the "ip"/"cl" gate_cl variants bucketed
    decode is therefore bit-identical to 128-padded decode, unconditionally.
  - The "gate_cl" variant's relation gate flattens all 128 positions —
    including padding-position activations — into one feature vector
    (`gate_cl_modeling.py:1258`; a padding-artifact quirk of the reference).
    With `GateCLConfig.masked_crs=True` (the serving-exactness mode) the
    masked positions are zeroed before the flatten and bucketed decode is
    bit-identical too; with the reference-quirk default (False) the scalar
    relevance gate P shifts slightly and the contract is statistical
    (asserted ≥0.9 tag agreement on random tiny models).
  - The flagship's only inexact path was the unmasked BiLSTM backward scan
    (torch parity: the reference scans the padding tail). With
    `ICKAConfig.masked_lstm=True` padding timesteps hold the recurrent
    state and bucketed flagship decode is bit-identical at valid positions;
    the default (False) carries the same statistical contract.

Throughput accounting for benchmarks lives in bench.py (per-bucket chained
device timing, weighted by the bucket shares of the length distribution).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def _dp_shardings(mesh, axis: str | None = None):
    """(replicated, batch-sharded) NamedShardings for DP serving: params
    replicate, every batch input shards its leading dim over `axis`
    (default: the mesh's FIRST axis — serving meshes are 1-D DP meshes,
    whatever the user named that axis). XLA then runs each replica's
    bucket program independently — serving throughput scales linearly
    with mesh size (no collectives in the forward graph; decode output
    gathers back to the host)."""
    if axis is None:
        if not mesh.axis_names:
            raise ValueError("serving mesh has no axes; build it as e.g. "
                             "Mesh(devices, ('data',))")
        axis = mesh.axis_names[0]
    elif axis not in mesh.axis_names:
        raise ValueError(f"axis {axis!r} not in mesh axes "
                         f"{mesh.axis_names}")
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))
    return repl, data


def pick_bucket(length: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= length; sequences longer than the largest bucket
    are truncated to it (the reference truncates to max_seq_length too,
    `My_cross_attention.py:311-315`)."""
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


@dataclasses.dataclass
class ServingStats:
    """Per-request accounting: how many pairs ran in each bucket and how
    many device batches were dispatched."""

    pairs_per_bucket: dict
    batches_per_bucket: dict

    @property
    def total_pairs(self) -> int:
        return sum(self.pairs_per_bucket.values())


class BucketedGateCLServer:
    """Bucketed inference for the gate_cl/cl/ip model family.

    Parameters
    ----------
    model: a `GateCLModel` (flax module) built at max_seq_length = the
        largest bucket.
    params: model variables (fp32, int8 or int8_static trees all work —
        `GateCLModel` keeps its parameter shapes independent of the padded
        sequence length).
    buckets: ascending padded lengths to compile. The largest must equal
        `model.cfg.max_seq_length` (that bucket IS the reference layout).
    max_batch: rows per device batch; partial batches are padded with
        duplicated rows whose outputs are dropped. Either one int for all
        buckets, a {bucket: batch} mapping, or None for the measured
        per-bucket optima (`RECOMMENDED_BATCH`): short buckets need larger
        batches to keep the MXU fed — at L16, batch 512 measures +28% over
        128 on v5e, while L>=48 regresses past 128.
    """

    #: measured per-bucket serving batches (v5e, int8_static, r03 sweep);
    #: buckets not listed saturate at 128. These optimize THROUGHPUT —
    #: an L16 batch of 512 runs ~21 ms but a low-traffic deployment waits
    #: longer to fill it; latency-sensitive callers should pass a smaller
    #: int/map for max_batch (128 costs ~22% L16 throughput).
    RECOMMENDED_BATCH = {16: 512, 24: 256, 32: 256}

    def __init__(self, model, params,
                 buckets: Sequence[int] = (16, 24, 32, 48, 64, 128),
                 max_batch=None, mesh=None):
        buckets = tuple(sorted(buckets))
        if buckets[-1] != model.cfg.max_seq_length:
            raise ValueError(
                f"largest bucket {buckets[-1]} must equal "
                f"max_seq_length {model.cfg.max_seq_length}")
        self.model = model
        self.params = params
        self.buckets = buckets
        self.max_batch = max_batch
        self.mesh = mesh
        if mesh is not None:
            n = mesh.devices.size
            for b in buckets:
                if self._batch_of(b) % n:
                    raise ValueError(
                        f"bucket {b} batch {self._batch_of(b)} not "
                        f"divisible by mesh size {n}")
            repl, _ = _dp_shardings(mesh)
            self.params = jax.device_put(params, repl)
        self._fns: dict[int, Callable] = {}

    def _batch_of(self, bucket: int) -> int:
        if self.max_batch is None:
            return self.RECOMMENDED_BATCH.get(bucket, 128)
        if isinstance(self.max_batch, dict):
            return self.max_batch.get(bucket, 128)
        return self.max_batch

    def _apply_fn(self, bucket: int) -> Callable:
        if bucket not in self._fns:
            model = self.model

            def fn(params, input_ids, segment_ids, input_mask, img_mask,
                   visual_mean, visual_grid):
                return model.apply(params, input_ids, segment_ids,
                                   input_mask, img_mask, visual_mean,
                                   visual_grid)

            if self.mesh is None:
                fn = jax.jit(fn)
            else:
                repl, data = _dp_shardings(self.mesh)
                fn = jax.jit(fn, in_shardings=(repl,) + (data,) * 6)
            self._fns[bucket] = fn
        return self._fns[bucket]

    def warmup(self) -> None:
        """Compile every bucket's program up front (serving should not pay
        compile latency on the first real request)."""
        cfg = self.model.cfg
        for b in self.buckets:
            B = self._batch_of(b)
            ids = np.full((B, b), cfg.encoder.pad_token_id, np.int32)
            ids[:, 0] = 0
            seg = np.zeros((B, b), np.int32)
            mask = np.zeros((B, b), np.int32)
            mask[:, 0] = 1
            imask = np.ones((B, cfg.num_regions), np.int32)
            vm = np.zeros((B, cfg.region_dim), np.float32)
            vg = np.zeros((B, 7, 7, cfg.region_dim), np.float32)
            jax.block_until_ready(self._apply_fn(b)(
                self.params, ids, seg, mask, imask, vm, vg))

    def predict(self, examples: Sequence[dict]):
        """examples: dicts with variable-length 1-D `input_ids` (+ optional
        `segment_ids`) and per-example `visual_mean` (R,), `visual_grid`
        (7, 7, R), optional `img_mask` (49,).

        Returns (tags, stats): `tags[i]` is a 1-D int32 array of decoded
        labels with the example's true (possibly truncated) length.
        """
        cfg = self.model.cfg
        pad_id = cfg.encoder.pad_token_id
        order: dict[int, list[int]] = {b: [] for b in self.buckets}
        for i, ex in enumerate(examples):
            L = min(len(ex["input_ids"]), self.buckets[-1])
            order[pick_bucket(L, self.buckets)].append(i)

        results: list = [None] * len(examples)
        pairs: dict[int, int] = {}
        batches: dict[int, int] = {}
        for b, idxs in order.items():
            if not idxs:
                continue
            pairs[b] = len(idxs)
            batches[b] = 0
            fn = self._apply_fn(b)
            B = self._batch_of(b)
            for lo in range(0, len(idxs), B):
                chunk = idxs[lo:lo + B]
                n = len(chunk)
                rows = chunk + [chunk[0]] * (B - n)
                ids = np.full((B, b), pad_id, np.int32)
                seg = np.zeros((B, b), np.int32)
                mask = np.zeros((B, b), np.int32)
                imask = np.ones((B, cfg.num_regions), np.int32)
                vm = np.zeros((B, cfg.region_dim), np.float32)
                vg = np.zeros((B, 7, 7, cfg.region_dim),
                              np.float32)
                lens = []
                for r, i in enumerate(rows):
                    ex = examples[i]
                    L = min(len(ex["input_ids"]), b)
                    lens.append(L)
                    ids[r, :L] = np.asarray(ex["input_ids"][:L], np.int32)
                    if "segment_ids" in ex:
                        seg[r, :L] = np.asarray(
                            ex["segment_ids"][:L], np.int32)
                    mask[r, :L] = 1
                    if "img_mask" in ex:
                        imask[r] = np.asarray(ex["img_mask"], np.int32)
                    vm[r] = np.asarray(ex["visual_mean"], np.float32)
                    vg[r] = np.asarray(ex["visual_grid"], np.float32)
                tags = np.asarray(fn(self.params, ids, seg, mask, imask,
                                     vm, vg))
                batches[b] += 1
                for r in range(n):
                    results[chunk[r]] = tags[r, :lens[r]].astype(np.int32)
        return results, ServingStats(pairs, batches)


class BucketedICKAServer:
    """Bucketed request-level inference for the flagship ICKA model
    (`Cross_Modal_Interaction_Module.py:887-1057` at serving time — the
    reference driver's eval loop pads every sentence to max_seq_length).

    Examples are featurized dicts at their TRUE sentence length L:

      - ``ori_input_ids`` (L,) — bare-sentence wordpiece ids
      - ``input_ids`` (offset + L,) — prompted layout (prompt head of
        ``offset`` tokens followed by the sentence; `data/features.py`)
      - optional ``ori_segment_ids`` (L,), ``img_mask`` (49,)
      - ``visual_mean`` (R,), ``visual_grid`` (7, 7, R),
        ``clip_features`` (C,) or (1, C)

    One parameter tree (init'd at any padded length) serves every bucket:
    `ICKAModel` parameter shapes are length-independent. Decode contract:
    BIT-EXACT valid-prefix tags vs the 128-padded layout when the model is
    built with `masked_lstm=True` (the serving-exactness mode); with the
    torch-parity default the contract is statistical (the BiLSTM backward
    scan enters the valid region through a shorter padding tail). Both
    asserted in tests/test_serving.py.
    """

    def __init__(self, model, params,
                 buckets: Sequence[int] = (16, 24, 32, 48, 64, 128),
                 max_batch: int = 128, offset: int = 14,
                 mask_positions: tuple = (3, 11), mesh=None):
        buckets = tuple(sorted(buckets))
        if buckets[-1] != model.cfg.max_seq_length:
            raise ValueError(
                f"largest bucket {buckets[-1]} must equal "
                f"max_seq_length {model.cfg.max_seq_length}")
        self.model = model
        self.params = params
        self.buckets = buckets
        self.max_batch = max_batch
        self.offset = offset
        self.mask_positions = tuple(mask_positions)
        self.mesh = mesh
        if mesh is not None:
            if max_batch % mesh.devices.size:
                raise ValueError(
                    f"max_batch {max_batch} not divisible by mesh size "
                    f"{mesh.devices.size}")
            repl, _ = _dp_shardings(mesh)
            self.params = jax.device_put(params, repl)
        self._fns: dict[int, Callable] = {}

    def _apply_fn(self, bucket: int) -> Callable:
        if bucket not in self._fns:
            model, mp, off = self.model, self.mask_positions, self.offset

            def fn(params, batch):
                return model.apply(params, batch, mp, off, mode="test")

            if self.mesh is None:
                fn = jax.jit(fn)
            else:
                repl, data = _dp_shardings(self.mesh)
                # `data` is a pytree prefix: every leaf of the batch dict
                # shards its leading (batch) dim over the data axis.
                fn = jax.jit(fn, in_shardings=(repl, data))
            self._fns[bucket] = fn
        return self._fns[bucket]

    def _empty_batch(self, b: int):
        cfg = self.model.cfg
        B, off = self.max_batch, self.offset
        pad = cfg.embedding.pad_token_id
        return {
            "input_ids": np.full((B, off + b), pad, np.int32),
            "segment_ids": np.concatenate(
                [np.zeros((B, off), np.int32),
                 np.ones((B, b), np.int32)], 1),
            "input_mask": np.zeros((B, off + b), np.int32),
            "ori_input_ids": np.full((B, b), pad, np.int32),
            "ori_input_mask": np.zeros((B, b), np.int32),
            "ori_segment_ids": np.zeros((B, b), np.int32),
            "img_mask": np.ones((B, cfg.num_regions), np.int32),
            "clip_features": np.zeros((B, 1, cfg.clip_dim), np.float32),
            "visual_mean": np.zeros((B, cfg.region_dim), np.float32),
            "visual_grid": np.zeros((B, 7, 7, cfg.region_dim), np.float32),
            "output_mask": np.zeros((B, b), np.int32),
        }

    def warmup(self) -> None:
        for b in self.buckets:
            batch = self._empty_batch(b)
            batch["input_mask"][:, :self.offset + 1] = 1
            batch["ori_input_mask"][:, 0] = 1
            batch["output_mask"][:, 0] = 1
            jax.block_until_ready(self._apply_fn(b)(self.params, batch))

    def predict(self, examples: Sequence[dict]):
        """Returns (tags, stats): ``tags[i]`` is a 1-D int32 array of
        decoded labels at the example's true (possibly truncated) length.
        """
        off = self.offset
        order: dict[int, list[int]] = {b: [] for b in self.buckets}
        for i, ex in enumerate(examples):
            L = min(len(ex["ori_input_ids"]), self.buckets[-1])
            order[pick_bucket(L, self.buckets)].append(i)

        results: list = [None] * len(examples)
        pairs: dict[int, int] = {}
        batches: dict[int, int] = {}
        for b, idxs in order.items():
            if not idxs:
                continue
            pairs[b] = len(idxs)
            batches[b] = 0
            fn = self._apply_fn(b)
            for lo in range(0, len(idxs), self.max_batch):
                chunk = idxs[lo:lo + self.max_batch]
                n = len(chunk)
                rows = chunk + [chunk[0]] * (self.max_batch - n)
                batch = self._empty_batch(b)
                lens = []
                for r, i in enumerate(rows):
                    ex = examples[i]
                    L = min(len(ex["ori_input_ids"]), b)
                    lens.append(L)
                    batch["ori_input_ids"][r, :L] = np.asarray(
                        ex["ori_input_ids"][:L], np.int32)
                    batch["ori_input_mask"][r, :L] = 1
                    batch["output_mask"][r, :L] = 1
                    if "ori_segment_ids" in ex:
                        batch["ori_segment_ids"][r, :L] = np.asarray(
                            ex["ori_segment_ids"][:L], np.int32)
                    pl = min(len(ex["input_ids"]), off + L)
                    batch["input_ids"][r, :pl] = np.asarray(
                        ex["input_ids"][:pl], np.int32)
                    batch["input_mask"][r, :pl] = 1
                    if "img_mask" in ex:
                        batch["img_mask"][r] = np.asarray(
                            ex["img_mask"], np.int32)
                    batch["clip_features"][r] = np.asarray(
                        ex["clip_features"], np.float32).reshape(1, -1)
                    batch["visual_mean"][r] = np.asarray(
                        ex["visual_mean"], np.float32)
                    batch["visual_grid"][r] = np.asarray(
                        ex["visual_grid"], np.float32)
                tags = np.asarray(fn(self.params, batch))
                batches[b] += 1
                for r in range(n):
                    results[chunk[r]] = tags[r, :lens[r]].astype(np.int32)
        return results, ServingStats(pairs, batches)


def sample_tweet_lengths(n: int, rng: np.random.Generator,
                         max_len: int = 128,
                         median: float = 22.0) -> np.ndarray:
    """Synthetic stand-in for the Twitter-2015 subtoken-length distribution.

    The real datasets are not distributed with the reference (SURVEY §6);
    published statistics put the mean tweet at ~16-17 tokens. After
    byte-level BPE (~1.3 subtokens/token) plus <s>/</s> that is ~24
    subtokens. This samples a clipped lognormal with that mean (p50 ≈ 22,
    p95 ≈ 52) so bucketed-serving benchmarks run against a realistic, fully
    documented length mix rather than the all-128 worst case. Because the
    distribution is assumed rather than measured, benchmarks that use it
    must record the distribution alongside the number AND a sensitivity
    band — the `median` parameter shifts the location (±20% covers the
    plausible range of real tweet corpora) while keeping the shape.
    """
    lens = np.exp(rng.normal(np.log(median), 0.45, n)) + 2
    return np.clip(lens.astype(np.int64), 5, max_len)
