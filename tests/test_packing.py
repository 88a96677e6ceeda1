"""Sequence-packed serving contracts (icka_tpu.serving.packing).

Packing is exactness-by-construction: block-diagonal self-attention,
per-slot visual keys, per-segment position ids, and a Viterbi lattice cut
at segment starts. Every test here asserts BIT-equality against the
one-example-padded-to-max reference layout (for "gate_cl" under the
masked_crs exactness semantics — the packed path has no padding tail for
the reference quirk to flatten).
"""

import numpy as np
import pytest

import jax

from icka_tpu.core.config import EncoderConfig, GateCLConfig
from icka_tpu.models.gate_cl import GateCLModel
from icka_tpu.nn.crf import crf_decode
from icka_tpu.serving.packing import PackedGateCLServer, pack_first_fit

MAXL = 16


def _model(variant: str, masked_crs: bool = False):
    enc = EncoderConfig.tiny()
    cfg = GateCLConfig(encoder=enc, num_labels=5, layer_num1=1,
                       region_dim=32, max_seq_length=MAXL, variant=variant,
                       negative_rate=2, masked_crs=masked_crs)
    model = GateCLModel(cfg)
    B = 2
    ids = np.ones((B, MAXL), np.int32)
    params = model.init(jax.random.PRNGKey(0), ids,
                        np.zeros((B, MAXL), np.int32),
                        np.ones((B, MAXL), np.int32),
                        np.ones((B, cfg.num_regions), np.int32),
                        np.zeros((B, cfg.region_dim), np.float32),
                        np.zeros((B, 7, 7, cfg.region_dim), np.float32))
    return model, params


def _examples(n, rng, vocab=120, region_dim=32, max_len=MAXL):
    exs = []
    for _ in range(n):
        L = int(rng.integers(3, max_len + 5))  # some exceed row_len
        exs.append({
            "input_ids": rng.integers(2, vocab, L).astype(np.int32),
            "visual_mean": rng.standard_normal(region_dim)
            .astype(np.float32),
            "visual_grid": rng.standard_normal((7, 7, region_dim))
            .astype(np.float32),
        })
    return exs


def _full_pad_reference(model, params, ex, pad_id):
    L = min(len(ex["input_ids"]), MAXL)
    ids = np.full((1, MAXL), pad_id, np.int32)
    ids[0, :L] = ex["input_ids"][:L]
    mask = np.zeros((1, MAXL), np.int32)
    mask[0, :L] = 1
    tags = model.apply(params, ids, np.zeros((1, MAXL), np.int32), mask,
                       np.ones((1, model.cfg.num_regions), np.int32),
                       ex["visual_mean"][None], ex["visual_grid"][None])
    return np.asarray(tags)[0, :L]


def test_pack_first_fit_respects_limits():
    rng = np.random.default_rng(0)
    lengths = rng.integers(3, 40, 100).tolist()
    rows = pack_first_fit(lengths, row_len=64, max_slots=4)
    seen = sorted(i for row in rows for i in row)
    assert seen == list(range(100))           # every request placed once
    for row in rows:
        assert len(row) <= 4
        assert sum(lengths[i] for i in row) <= 64


def test_crf_decode_reset_matches_solo_decode():
    """The packed Viterbi (reset-cut lattice) must reproduce each
    segment's standalone decode bitwise."""
    rng = np.random.default_rng(1)
    T, L = 5, 20
    start = rng.standard_normal(T).astype(np.float32)
    end = rng.standard_normal(T).astype(np.float32)
    trans = rng.standard_normal((T, T)).astype(np.float32)
    em = rng.standard_normal((1, L, T)).astype(np.float32)
    # one row packing segments of lengths 7, 5, 4 + 4 pad
    seg_lens = [7, 5, 4]
    mask = np.zeros((1, L), np.int32)
    reset = np.zeros((1, L), np.int32)
    a = 0
    for ln in seg_lens:
        mask[0, a:a + ln] = 1
        reset[0, a] = 1
        a += ln
    packed = np.asarray(crf_decode(em, mask, start, end, trans,
                                   reset=reset))
    a = 0
    for ln in seg_lens:
        solo = np.asarray(crf_decode(
            em[:, a:a + ln], np.ones((1, ln), np.int32),
            start, end, trans))
        np.testing.assert_array_equal(packed[0, a:a + ln], solo[0])
        a += ln


@pytest.mark.parametrize("variant,masked_crs",
                         [("ip", False), ("cl", False),
                          ("gate_cl", True)])
def test_packed_exact_vs_full_pad(variant, masked_crs):
    """Packed decode == one-example-padded decode, bitwise, for every
    request — across packing arrangements, lengths, and slot counts."""
    model, params = _model(variant, masked_crs=masked_crs)
    rng = np.random.default_rng(2)
    exs = _examples(13, rng)
    srv = PackedGateCLServer(model, params, row_len=MAXL, max_slots=3,
                             max_batch=4)
    tags, stats = srv.predict(exs)
    assert stats.pairs == len(exs)
    assert stats.rows >= len(exs) / 3
    pad_id = model.cfg.encoder.pad_token_id
    for ex, t in zip(exs, tags):
        ref = _full_pad_reference(model, params, ex, pad_id)
        assert len(t) == len(ref)
        np.testing.assert_array_equal(t, ref)


def test_packed_gate_cl_quirk_default_agreement():
    """With the reference-quirk default (masked_crs=False) the solo
    reference's gate flattens its padding tail while the packed gate
    cannot — the contract drops to statistical tag agreement, like the
    bucketed engine's."""
    model, params = _model("gate_cl", masked_crs=False)
    rng = np.random.default_rng(3)
    exs = _examples(12, rng)
    srv = PackedGateCLServer(model, params, row_len=MAXL, max_slots=3,
                             max_batch=4)
    tags, _ = srv.predict(exs)
    pad_id = model.cfg.encoder.pad_token_id
    agree = total = 0
    for ex, t in zip(exs, tags):
        ref = _full_pad_reference(model, params, ex, pad_id)
        agree += int((t == ref).sum())
        total += len(ref)
    assert agree / total >= 0.9, f"tag agreement {agree}/{total}"


def test_packed_fill_beats_solo_rows():
    """Packing must actually pack: for short requests the row count is
    well below the request count and token fill is high."""
    model, params = _model("ip")
    rng = np.random.default_rng(4)
    exs = []
    for _ in range(24):
        L = int(rng.integers(3, 6))
        exs.append({
            "input_ids": rng.integers(2, 100, L).astype(np.int32),
            "visual_mean": np.zeros(32, np.float32),
            "visual_grid": np.zeros((7, 7, 32), np.float32),
        })
    srv = PackedGateCLServer(model, params, row_len=MAXL, max_slots=3,
                             max_batch=4)
    tags, stats = srv.predict(exs)
    assert stats.rows <= len(exs) // 2
    assert stats.token_fill > 0.5
    assert all(t is not None for t in tags)


def test_packed_tiers_route_and_stay_exact():
    """Two-tier layout: short requests pack into the short tier, long
    ones into the full-length tier, every decode still exact."""
    model, params = _model("ip")
    rng = np.random.default_rng(6)
    exs = _examples(14, rng)
    srv = PackedGateCLServer(model, params, tiers=((8, 2), (MAXL, 3)),
                             max_batch=4)
    tags, stats = srv.predict(exs)
    assert stats.pairs == len(exs)
    pad_id = model.cfg.encoder.pad_token_id
    for ex, t in zip(exs, tags):
        ref = _full_pad_reference(model, params, ex, pad_id)
        np.testing.assert_array_equal(t, ref)


# ---------------------------------------------------------------------------
# Flagship (ICKAModel) packed serving
# ---------------------------------------------------------------------------

from icka_tpu.core.config import ICKAConfig            # noqa: E402
from icka_tpu.models.icka import ICKAModel             # noqa: E402
from icka_tpu.serving.packing import PackedICKAServer  # noqa: E402

OFFSET, MASKS = 8, (2, 5)


def _icka_model(masked_lstm: bool):
    cfg = ICKAConfig.tiny()
    import dataclasses
    cfg = dataclasses.replace(cfg, max_seq_length=MAXL,
                              masked_lstm=masked_lstm)
    model = ICKAModel(cfg)
    B = 2
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": rng.integers(
            2, cfg.embedding.vocab_size, (B, OFFSET + MAXL))
        .astype(np.int32),
        "segment_ids": np.concatenate(
            [np.zeros((B, OFFSET), np.int32),
             np.ones((B, MAXL), np.int32)], 1),
        "input_mask": np.ones((B, OFFSET + MAXL), np.int32),
        "ori_input_ids": rng.integers(
            2, cfg.embedding.vocab_size, (B, MAXL)).astype(np.int32),
        "ori_input_mask": np.ones((B, MAXL), np.int32),
        "ori_segment_ids": np.zeros((B, MAXL), np.int32),
        "img_mask": np.ones((B, cfg.num_regions), np.int32),
        "clip_features": np.zeros((B, 1, cfg.clip_dim), np.float32),
        "visual_mean": np.zeros((B, cfg.region_dim), np.float32),
        "visual_grid": np.zeros((B, 7, 7, cfg.region_dim), np.float32),
        "output_mask": np.ones((B, MAXL), np.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch, MASKS, OFFSET,
                        mode="test")
    return model, params


def _icka_examples(n, rng, cfg, max_len=MAXL):
    exs = []
    for _ in range(n):
        L = int(rng.integers(3, max_len + 5))  # some exceed row_len
        exs.append({
            "ori_input_ids": rng.integers(
                2, cfg.embedding.vocab_size, L).astype(np.int32),
            "input_ids": rng.integers(
                2, cfg.embedding.vocab_size, OFFSET + L).astype(np.int32),
            "visual_mean": rng.standard_normal(cfg.region_dim)
            .astype(np.float32),
            "visual_grid": rng.standard_normal((7, 7, cfg.region_dim))
            .astype(np.float32),
            "clip_features": rng.standard_normal(cfg.clip_dim)
            .astype(np.float32),
        })
    return exs


def _icka_full_pad_reference(model, params, ex):
    """One example, padded to max_seq_length — the reference layout
    (`BucketedICKAServer._empty_batch` semantics at the largest bucket)."""
    cfg = model.cfg
    pad = cfg.embedding.pad_token_id
    L = min(len(ex["ori_input_ids"]), MAXL)
    batch = {
        "input_ids": np.full((1, OFFSET + MAXL), pad, np.int32),
        "segment_ids": np.concatenate(
            [np.zeros((1, OFFSET), np.int32),
             np.ones((1, MAXL), np.int32)], 1),
        "input_mask": np.zeros((1, OFFSET + MAXL), np.int32),
        "ori_input_ids": np.full((1, MAXL), pad, np.int32),
        "ori_input_mask": np.zeros((1, MAXL), np.int32),
        "ori_segment_ids": np.zeros((1, MAXL), np.int32),
        "img_mask": np.ones((1, cfg.num_regions), np.int32),
        "clip_features": ex["clip_features"].reshape(1, 1, -1),
        "visual_mean": ex["visual_mean"][None],
        "visual_grid": ex["visual_grid"][None],
        "output_mask": np.zeros((1, MAXL), np.int32),
    }
    batch["ori_input_ids"][0, :L] = ex["ori_input_ids"][:L]
    batch["ori_input_mask"][0, :L] = 1
    batch["output_mask"][0, :L] = 1
    pl = OFFSET + L
    batch["input_ids"][0, :pl] = ex["input_ids"][:pl]
    batch["input_mask"][0, :pl] = 1
    tags = model.apply(params, batch, MASKS, OFFSET, mode="test")
    return np.asarray(tags)[0, :L]


def test_icka_packed_exact_vs_full_pad():
    """Flagship packed decode == one-example-padded decode, bitwise,
    under the masked_lstm exactness semantics (VERDICT r04 next #4)."""
    model, params = _icka_model(masked_lstm=True)
    rng = np.random.default_rng(7)
    exs = _icka_examples(11, rng, model.cfg)
    srv = PackedICKAServer(model, params, MASKS, OFFSET,
                           row_len=MAXL, max_slots=3, max_batch=4)
    tags, stats = srv.predict(exs)
    assert stats.pairs == len(exs)
    for ex, t in zip(exs, tags):
        ref = _icka_full_pad_reference(model, params, ex)
        assert len(t) == len(ref)
        np.testing.assert_array_equal(t, ref)


def test_icka_packed_quirk_default_agreement():
    """Against the torch-parity default (the solo BiLSTM scans the padding
    tail) the packed contract is statistical tag agreement."""
    model, params = _icka_model(masked_lstm=False)
    rng = np.random.default_rng(8)
    exs = _icka_examples(10, rng, model.cfg)
    srv = PackedICKAServer(model, params, MASKS, OFFSET,
                           row_len=MAXL, max_slots=3, max_batch=4)
    tags, _ = srv.predict(exs)
    agree = total = 0
    for ex, t in zip(exs, tags):
        ref = _icka_full_pad_reference(model, params, ex)
        agree += int((t == ref).sum())
        total += len(ref)
    assert agree / total >= 0.9, f"tag agreement {agree}/{total}"


def test_icka_packed_tiers_route_and_stay_exact():
    model, params = _icka_model(masked_lstm=True)
    rng = np.random.default_rng(9)
    exs = _icka_examples(12, rng, model.cfg)
    srv = PackedICKAServer(model, params, MASKS, OFFSET,
                           tiers=((8, 2), (MAXL, 3)), max_batch=4)
    tags, stats = srv.predict(exs)
    assert stats.pairs == len(exs)
    for ex, t in zip(exs, tags):
        ref = _icka_full_pad_reference(model, params, ex)
        np.testing.assert_array_equal(t, ref)


def test_icka_packed_fill_beats_solo_rows():
    model, params = _icka_model(masked_lstm=True)
    rng = np.random.default_rng(10)
    cfg = model.cfg
    exs = []
    for _ in range(24):
        L = int(rng.integers(3, 6))
        exs.append({
            "ori_input_ids": rng.integers(
                2, cfg.embedding.vocab_size, L).astype(np.int32),
            "input_ids": rng.integers(
                2, cfg.embedding.vocab_size, OFFSET + L).astype(np.int32),
            "visual_mean": np.zeros(cfg.region_dim, np.float32),
            "visual_grid": np.zeros((7, 7, cfg.region_dim), np.float32),
            "clip_features": np.zeros(cfg.clip_dim, np.float32),
        })
    srv = PackedICKAServer(model, params, MASKS, OFFSET,
                           row_len=MAXL, max_slots=3, max_batch=4)
    tags, stats = srv.predict(exs)
    assert stats.rows <= len(exs) // 2
    assert stats.token_fill > 0.5
    assert all(t is not None for t in tags)
