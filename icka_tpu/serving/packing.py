"""Sequence-packed serving engine for the gate_cl model family.

Length-bucketed serving (`icka_tpu.serving.bucketed`) stops paying
128-token cost for 17-token tweets, but still pays bucket-granularity
padding: a 17-token tweet runs in a 24-token program (~30% pad), and each
request occupies a full batch row. PACKING removes the residual tax by
concatenating several short requests into one row of a single fixed-shape
program, with exact isolation between them:

  - block-diagonal self-attention — a token's keys are exactly its own
    sentence's tokens (`GateCLModel.forward_packed`);
  - per-slot visual keys — every sentence cross-attends ONLY to its own
    image's 49 regions;
  - per-segment position ids, host-computed in the encoder's dialect;
  - the Viterbi lattice is cut at segment starts
    (`icka_tpu.nn.crf.crf_decode(reset=...)`), so one (B, L) decode
    yields every packed sentence's independent best path — no per-segment
    gather, no extra decode cost.

The relation gate of the "gate_cl" variant runs with the
`masked_crs=True` exactness semantics (missing positions contribute exact
zeros to its flatten); the reference-quirk padding-tail flatten has no
packed analogue. "cl"/"ip" variants are exact against the same semantics
they always had.

The reference has no serving engine at all (`My_cross_attention.py:375-427`
pads everything to 128); this file's comparison target is the bucketed
engine, which it beats by filling rows to ~95% instead of ~75%
(bench.py --model gate_cl_packed).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class PackedStats:
    """Packing efficiency accounting for one predict() call."""

    pairs: int
    rows: int
    batches: int
    token_fill: float      # valid tokens / (rows * row_len)
    slot_fill: float       # segments / (rows * max_slots)


def pack_first_fit(lengths: Sequence[int], row_len: int,
                   max_slots: int) -> list:
    """First-fit-decreasing bin packing of segment lengths into rows.

    Returns a list of rows, each a list of request indices. Rows hold at
    most `max_slots` segments and at most `row_len` total tokens. FFD is
    within ~2% of optimal fill for lognormal tweet lengths and is O(n·rows)
    with a trivial constant — sub-millisecond for serving-sized batches.
    """
    order = sorted(range(len(lengths)), key=lambda i: -lengths[i])
    rows: list = []
    space: list = []
    slots: list = []
    for i in order:
        ln = lengths[i]
        for r in range(len(rows)):
            if space[r] >= ln and slots[r] < max_slots:
                rows[r].append(i)
                space[r] -= ln
                slots[r] += 1
                break
        else:
            rows.append([i])
            space.append(row_len - ln)
            slots.append(1)
    return rows


class PackedGateCLServer:
    """Packed inference for `GateCLModel` (gate_cl/cl/ip variants).

    Parameters
    ----------
    model: `GateCLModel` built at the deployment max_seq_length (the crs
        flatten width for the "gate_cl" variant).
    params: model variables (fp32 / int8 / int8_static trees all work).
    tiers: ((row_len, max_slots), ...) ascending — each request routes to
        the first tier whose row length fits it, so short tweets pack into
        short rows (quadratic attention cost scales with the ROW length,
        not the tweet length) while the long tail still gets a full-length
        tier instead of being truncated. The measured v5e optimum for the
        documented tweet-length distribution is ((48, 2), (128, 6)):
        48-token rows beat 64/96/128-token rows by 8-15% weighted
        (bench.py --model gate_cl_packed --row_len sweep, r04), and the
        128 tier serves the ~3% of requests longer than 48 exactly.
        Requests longer than the LAST tier are truncated to it (the
        reference truncates to max_seq_length the same way,
        `My_cross_attention.py:311-315`).
    max_batch: rows per device batch.
    row_len/max_slots: single-tier shorthand, overrides `tiers`.
    """

    def __init__(self, model, params,
                 tiers: Sequence = ((48, 2), (128, 2)),
                 max_batch: int = 128,
                 row_len: int | None = None, max_slots: int = 6):
        self.model = model
        self.params = params
        if row_len is not None:
            tiers = ((int(row_len), int(max_slots)),)
        self.tiers = tuple((int(a), int(b)) for a, b in tiers)
        self.max_batch = int(max_batch)
        self._fn: Callable | None = None

    # -- device program ----------------------------------------------------

    def _apply_fn(self) -> Callable:
        """One jitted callable serves every tier (jax retraces per input
        shape; each tier is one compiled specialization)."""
        if self._fn is None:
            model = self.model

            @jax.jit
            def fn(params, ids, pos, types, slot, valid, seg_start,
                   img_mask, visual_grid, seg_gather):
                return model.apply(params, ids, pos, types, slot, valid,
                                   seg_start, img_mask, visual_grid,
                                   seg_gather,
                                   method=model.forward_packed)

            self._fn = fn
        return self._fn

    def _tier_of(self, length: int) -> int:
        for t, (L, _) in enumerate(self.tiers):
            if length <= L:
                return t
        return len(self.tiers) - 1

    def _position_ids(self, length: int) -> np.ndarray:
        """The positions this segment would see if it ran alone: RoBERTa
        dialect counts non-pad tokens offset by the padding index
        (`nn/bert.py:27-39`), legacy BERT uses 0-based arange."""
        cfg = self.model.cfg.encoder
        if cfg.position_offset > 0:
            return np.arange(1, length + 1, dtype=np.int32) \
                + cfg.pad_token_id
        return np.arange(length, dtype=np.int32)

    def _empty_batch(self, B: int, row_len: int, max_slots: int):
        cfg = self.model.cfg
        L, S = row_len, max_slots
        return {
            "ids": np.full((B, L), cfg.encoder.pad_token_id, np.int32),
            "pos": np.zeros((B, L), np.int32),
            "types": np.zeros((B, L), np.int32),
            "slot": np.full((B, L), S, np.int32),      # sentinel slot
            "valid": np.zeros((B, L), np.int32),
            "seg_start": np.zeros((B, L), np.int32),
            "img_mask": np.ones((B, S, cfg.num_regions), np.int32),
            "visual_grid": np.zeros((B, S, 7, 7, cfg.region_dim),
                                    np.float32),
            "seg_gather": np.full((B, S, cfg.max_seq_length), L, np.int32),
        }

    def warmup(self) -> None:
        for L, S in self.tiers:
            b = self._empty_batch(self.max_batch, L, S)
            b["valid"][:, 0] = 1
            b["seg_start"][:, 0] = 1
            b["slot"][:, 0] = 0
            jax.block_until_ready(self._apply_fn()(
                self.params, b["ids"], b["pos"], b["types"], b["slot"],
                b["valid"], b["seg_start"], b["img_mask"],
                b["visual_grid"], b["seg_gather"]))

    # -- host packing ------------------------------------------------------

    def build_batch(self, examples, lengths, chunk_rows, row_len=None,
                    max_slots=None):
        """Materialize one device batch from packed rows.

        `chunk_rows`: list (<= max_batch) of rows from `pack_first_fit`,
        each a list of example indices; `row_len`/`max_slots` select the
        tier layout (default: the last = longest tier). Returns (arrays
        dict, spans list of (row, example idx, start, length), valid
        token count).
        """
        if row_len is None:
            row_len, max_slots = self.tiers[-1]
        b = self._empty_batch(self.max_batch, row_len, max_slots)
        spans: list = []
        valid_tokens = 0
        for r, segs in enumerate(chunk_rows):
            cursor = 0
            for s, i in enumerate(segs):
                ex = examples[i]
                ln = lengths[i]
                a = cursor
                b["ids"][r, a:a + ln] = np.asarray(
                    ex["input_ids"][:ln], np.int32)
                b["pos"][r, a:a + ln] = self._position_ids(ln)
                if "segment_ids" in ex:
                    b["types"][r, a:a + ln] = np.asarray(
                        ex["segment_ids"][:ln], np.int32)
                b["slot"][r, a:a + ln] = s
                b["valid"][r, a:a + ln] = 1
                b["seg_start"][r, a] = 1
                if "img_mask" in ex:
                    b["img_mask"][r, s] = np.asarray(
                        ex["img_mask"], np.int32)
                b["visual_grid"][r, s] = np.asarray(
                    ex["visual_grid"], np.float32)
                b["seg_gather"][r, s, :ln] = np.arange(
                    a, a + ln, dtype=np.int32)
                spans.append((r, i, a, ln))
                cursor += ln
            valid_tokens += cursor
        return b, spans, valid_tokens

    def predict(self, examples: Sequence[dict]):
        """examples: same schema as `BucketedGateCLServer.predict`
        (variable-length `input_ids`, optional `segment_ids`/`img_mask`,
        per-example `visual_grid` (7, 7, R); `visual_mean` is accepted and
        ignored — it only feeds the training-time contrastive heads).

        Returns (tags, stats): `tags[i]` is 1-D int32 at the example's
        true (possibly truncated) length.
        """
        fn = self._apply_fn()
        Lmax = self.tiers[-1][0]
        lengths = [min(len(ex["input_ids"]), Lmax) for ex in examples]
        by_tier: dict[int, list[int]] = {t: [] for t in
                                         range(len(self.tiers))}
        for i, ln in enumerate(lengths):
            by_tier[self._tier_of(ln)].append(i)

        results: list = [None] * len(examples)
        batches = 0
        total_rows = 0
        valid_tokens = 0
        cap_tokens = 0
        total_slots = 0
        for t, idxs in by_tier.items():
            if not idxs:
                continue
            L, S = self.tiers[t]
            rows = pack_first_fit([lengths[i] for i in idxs], L, S)
            rows = [[idxs[j] for j in row] for row in rows]
            total_rows += len(rows)
            cap_tokens += len(rows) * L
            total_slots += len(rows) * S
            for lo in range(0, len(rows), self.max_batch):
                chunk = rows[lo:lo + self.max_batch]
                b, spans, toks = self.build_batch(examples, lengths,
                                                  chunk, L, S)
                valid_tokens += toks
                tags = np.asarray(fn(
                    self.params, b["ids"], b["pos"], b["types"],
                    b["slot"], b["valid"], b["seg_start"], b["img_mask"],
                    b["visual_grid"], b["seg_gather"]))
                batches += 1
                for r, i, a, ln in spans:
                    results[i] = tags[r, a:a + ln].astype(np.int32)
        stats = PackedStats(
            pairs=len(examples), rows=total_rows, batches=batches,
            token_fill=valid_tokens / max(1, cap_tokens),
            slot_fill=len(examples) / max(1, total_slots))
        return results, stats


class PackedICKAServer:
    """Packed inference for the flagship `ICKAModel`
    (`ICKAModel.forward_packed` — see its docstring for the two-layout
    design; reference scope `Cross_Modal_Interaction_Module.py:941-1057`).

    Parameters mirror `PackedGateCLServer`; additionally `offset` /
    `mask_positions` describe the prompted layout exactly as
    `BucketedICKAServer` takes them. Each tier (row_len, max_slots)
    materializes TWO packed token axes: layout A of length row_len (bare
    sentences) and layout B of length row_len + max_slots·(offset − 2 +
    2·prompt_len) (spliced prompted sequences).

    Examples use the `BucketedICKAServer.predict` schema: per-example
    variable-length ``ori_input_ids`` (L,), ``input_ids`` (offset + L,),
    optional ``ori_segment_ids``/``segment_ids``/``img_mask``, and
    ``visual_mean`` (R,), ``visual_grid`` (7, 7, R), ``clip_features``
    (C,) or (1, C).

    Decode contract: BIT-exact against the one-example-padded reference
    layout when the solo model runs `masked_lstm=True` (the
    serving-exactness semantics — packed rows have no padding tail for
    the torch-parity BiLSTM quirk to scan); statistical (≥0.9 tag
    agreement) against the torch-parity default. Both asserted in
    tests/test_packing.py.
    """

    def __init__(self, model, params, mask_positions=(3, 11),
                 offset: int = 14, tiers: Sequence = ((48, 2), (128, 2)),
                 max_batch: int = 128,
                 row_len: int | None = None, max_slots: int = 6):
        self.model = model
        self.params = params
        self.offset = int(offset)
        self.mask_positions = tuple(mask_positions)
        if row_len is not None:
            tiers = ((int(row_len), int(max_slots)),)
        self.tiers = tuple((int(a), int(b)) for a, b in tiers)
        self.max_batch = int(max_batch)
        self._fn: Callable | None = None

    # layout-B length overhead per packed segment: the spliced prompt head
    def _seg_overhead(self) -> int:
        return self.offset - 2 + 2 * self.model.cfg.prompt_len

    def _row_len_b(self, row_len: int, max_slots: int) -> int:
        return row_len + max_slots * self._seg_overhead()

    def _apply_fn(self) -> Callable:
        if self._fn is None:
            model = self.model

            @jax.jit
            def fn(params, batch):
                return model.apply(params, batch,
                                   method=model.forward_packed)

            self._fn = fn
        return self._fn

    def apply_packed(self, params, batch):
        """Unjitted packed forward (benchmarks jit their own loops)."""
        return self.model.apply(params, batch,
                                method=self.model.forward_packed)

    def _tier_of(self, length: int) -> int:
        for t, (L, _) in enumerate(self.tiers):
            if length <= L:
                return t
        return len(self.tiers) - 1

    def _position_ids(self, cfg, length: int) -> np.ndarray:
        if cfg.position_offset > 0:
            return np.arange(1, length + 1, dtype=np.int32) \
                + cfg.pad_token_id
        return np.arange(length, dtype=np.int32)

    def _empty_batch(self, B: int, row_len: int, max_slots: int):
        cfg = self.model.cfg
        L1, S = row_len, max_slots
        L2 = self._row_len_b(row_len, max_slots)
        K = S * 2 * cfg.prompt_len
        pad_a = cfg.embedding.pad_token_id
        pad_b = cfg.last_encoder.pad_token_id
        return {
            "ids_a": np.full((B, L1), pad_a, np.int32),
            "pos_a": np.full((B, L1), pad_a, np.int32),
            "types_a": np.zeros((B, L1), np.int32),
            "slot_a": np.full((B, L1), S, np.int32),
            "valid_a": np.zeros((B, L1), np.int32),
            "seg_start": np.zeros((B, L1), np.int32),
            "seg_end": np.zeros((B, L1), np.int32),
            "ids_b": np.full((B, L2), pad_b, np.int32),
            "pos_b": np.full((B, L2), pad_b, np.int32),
            "types_b": np.zeros((B, L2), np.int32),
            "slot_b": np.full((B, L2), S, np.int32),
            "valid_b": np.zeros((B, L2), np.int32),
            "prompt_gather": np.full((B, L2), K, np.int32),
            "sent_gather": np.full((B, L1), L2, np.int32),
            "seg_first": np.full((B, S), L1, np.int32),
            "img_mask": np.ones((B, S, cfg.num_regions), np.int32),
            "visual_grid": np.zeros((B, S, 7, 7, cfg.region_dim),
                                    np.float32),
            "visual_mean": np.zeros((B, S, cfg.region_dim), np.float32),
            "clip_features": np.zeros((B, S, cfg.clip_dim), np.float32),
        }

    def warmup(self) -> None:
        for L, S in self.tiers:
            b = self._empty_batch(self.max_batch, L, S)
            b["valid_a"][:, 0] = 1
            b["seg_start"][:, 0] = 1
            b["seg_end"][:, 0] = 1
            b["slot_a"][:, 0] = 0
            b["seg_first"][:, 0] = 0
            jax.block_until_ready(self._apply_fn()(self.params, b))

    def build_batch(self, examples, lengths, chunk_rows, row_len=None,
                    max_slots=None):
        """Materialize one device batch from packed rows (see
        `PackedGateCLServer.build_batch`). Returns (arrays dict, spans
        list of (row, example idx, layout-A start, length), valid
        layout-A token count)."""
        cfg = self.model.cfg
        off = self.offset
        m1, m2 = self.mask_positions
        P = cfg.prompt_len
        if row_len is None:
            row_len, max_slots = self.tiers[-1]
        ovh = self._seg_overhead()
        b = self._empty_batch(self.max_batch, row_len, max_slots)
        placeholder = np.full(P, cfg.last_encoder.pad_token_id, np.int32)
        spans: list = []
        valid_tokens = 0
        for r, segs in enumerate(chunk_rows):
            ca = cb = 0
            for s, i in enumerate(segs):
                ex = examples[i]
                ln = lengths[i]
                a = ca
                # -- layout A: the bare sentence --------------------------
                b["ids_a"][r, a:a + ln] = np.asarray(
                    ex["ori_input_ids"][:ln], np.int32)
                b["pos_a"][r, a:a + ln] = self._position_ids(
                    cfg.embedding, ln)
                if "ori_segment_ids" in ex:
                    b["types_a"][r, a:a + ln] = np.asarray(
                        ex["ori_segment_ids"][:ln], np.int32)
                b["slot_a"][r, a:a + ln] = s
                b["valid_a"][r, a:a + ln] = 1
                b["seg_start"][r, a] = 1
                b["seg_end"][r, a + ln - 1] = 1
                b["seg_first"][r, s] = a
                # -- layout B: the spliced prompted sequence --------------
                prompted = np.asarray(ex["input_ids"][:off + ln], np.int32)
                sp = np.concatenate([
                    prompted[:m1], placeholder, prompted[m1 + 1:m2],
                    placeholder, prompted[m2 + 1:]])
                lb = ln + ovh
                assert sp.shape[0] == lb, (sp.shape, lb)
                bb = cb
                b["ids_b"][r, bb:bb + lb] = sp
                b["pos_b"][r, bb:bb + lb] = self._position_ids(
                    cfg.last_encoder, lb)
                if "segment_ids" in ex:
                    ty = np.asarray(ex["segment_ids"][:off + ln], np.int32)
                else:
                    ty = np.concatenate([np.zeros(off, np.int32),
                                         np.ones(ln, np.int32)])
                # splice types exactly like the solo path: the prompt
                # slots inherit the type at their mask position
                b["types_b"][r, bb:bb + lb] = np.concatenate([
                    ty[:m1], np.full(P, ty[m1], np.int32), ty[m1 + 1:m2],
                    np.full(P, ty[m2], np.int32), ty[m2 + 1:]])
                b["slot_b"][r, bb:bb + lb] = s
                b["valid_b"][r, bb:bb + lb] = 1
                k0 = s * 2 * P
                p1 = bb + m1
                b["prompt_gather"][r, p1:p1 + P] = np.arange(
                    k0, k0 + P, dtype=np.int32)
                p2 = bb + m2 - 1 + P
                b["prompt_gather"][r, p2:p2 + P] = np.arange(
                    k0 + P, k0 + 2 * P, dtype=np.int32)
                b["sent_gather"][r, a:a + ln] = np.arange(
                    bb + ovh, bb + ovh + ln, dtype=np.int32)
                # -- per-slot visual/CLIP features ------------------------
                if "img_mask" in ex:
                    b["img_mask"][r, s] = np.asarray(
                        ex["img_mask"], np.int32)
                b["visual_grid"][r, s] = np.asarray(
                    ex["visual_grid"], np.float32)
                b["visual_mean"][r, s] = np.asarray(
                    ex["visual_mean"], np.float32)
                b["clip_features"][r, s] = np.asarray(
                    ex["clip_features"], np.float32).reshape(-1)
                spans.append((r, i, a, ln))
                ca += ln
                cb += lb
            valid_tokens += ca
        return b, spans, valid_tokens

    def predict(self, examples: Sequence[dict]):
        """Returns (tags, stats): `tags[i]` is 1-D int32 at the example's
        true (possibly truncated) length."""
        fn = self._apply_fn()
        Lmax = self.tiers[-1][0]
        lengths = [min(len(ex["ori_input_ids"]), Lmax) for ex in examples]
        by_tier: dict[int, list[int]] = {t: [] for t in
                                         range(len(self.tiers))}
        for i, ln in enumerate(lengths):
            by_tier[self._tier_of(ln)].append(i)

        results: list = [None] * len(examples)
        batches = 0
        total_rows = 0
        valid_tokens = 0
        cap_tokens = 0
        total_slots = 0
        for t, idxs in by_tier.items():
            if not idxs:
                continue
            L, S = self.tiers[t]
            rows = pack_first_fit([lengths[i] for i in idxs], L, S)
            rows = [[idxs[j] for j in row] for row in rows]
            total_rows += len(rows)
            cap_tokens += len(rows) * L
            total_slots += len(rows) * S
            for lo in range(0, len(rows), self.max_batch):
                chunk = rows[lo:lo + self.max_batch]
                b, spans, toks = self.build_batch(examples, lengths,
                                                  chunk, L, S)
                valid_tokens += toks
                tags = np.asarray(fn(self.params, b))
                batches += 1
                for r, i, a, ln in spans:
                    results[i] = tags[r, a:a + ln].astype(np.int32)
        stats = PackedStats(
            pairs=len(examples), rows=total_rows, batches=batches,
            token_fill=valid_tokens / max(1, cap_tokens),
            slot_fill=len(examples) / max(1, total_slots))
        return results, stats
