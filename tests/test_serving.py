"""Length-bucketed serving engine contracts (icka_tpu.serving.bucketed).

The exactness argument (masked attention makes bucketed valid-token outputs
identical to 128-padded outputs) is asserted bitwise for the "ip"/"cl"
gate_cl variants; the "gate_cl" variant's relation gate consumes
padding-position activations in the reference layout (a quirk —
`my_bert/gate_cl_modeling.py:1258`), so its contract is high decoded-tag
agreement instead.
"""

import numpy as np
import pytest

import jax

from icka_tpu.core.config import EncoderConfig, GateCLConfig
from icka_tpu.models.gate_cl import GateCLModel
from icka_tpu.serving.bucketed import (
    BucketedGateCLServer,
    pick_bucket,
    sample_tweet_lengths,
)

MAXL = 16


def _model(variant: str):
    enc = EncoderConfig.tiny()
    cfg = GateCLConfig(encoder=enc, num_labels=5, layer_num1=1,
                       region_dim=32, max_seq_length=MAXL, variant=variant,
                       negative_rate=2)
    model = GateCLModel(cfg)
    B = 2
    ids = np.ones((B, MAXL), np.int32)
    seg = np.zeros((B, MAXL), np.int32)
    mask = np.ones((B, MAXL), np.int32)
    imask = np.ones((B, cfg.num_regions), np.int32)
    vm = np.zeros((B, cfg.region_dim), np.float32)
    vg = np.zeros((B, 7, 7, cfg.region_dim), np.float32)
    params = model.init(jax.random.PRNGKey(0), ids, seg, mask, imask,
                        vm, vg)
    return model, params


def _examples(n, rng, vocab=120, region_dim=32, max_len=MAXL):
    exs = []
    for _ in range(n):
        L = int(rng.integers(3, max_len + 5))  # some exceed the top bucket
        exs.append({
            "input_ids": rng.integers(2, vocab, L).astype(np.int32),
            "visual_mean": rng.standard_normal(region_dim)
            .astype(np.float32),
            "visual_grid": rng.standard_normal((7, 7, region_dim))
            .astype(np.float32),
        })
    return exs


def _full_pad_reference(model, params, ex, pad_id):
    """The reference layout: one example padded to max_seq_length."""
    L = min(len(ex["input_ids"]), MAXL)
    ids = np.full((1, MAXL), pad_id, np.int32)
    ids[0, :L] = ex["input_ids"][:L]
    seg = np.zeros((1, MAXL), np.int32)
    mask = np.zeros((1, MAXL), np.int32)
    mask[0, :L] = 1
    imask = np.ones((1, model.cfg.num_regions), np.int32)
    vm = ex["visual_mean"][None]
    vg = ex["visual_grid"][None]
    tags = model.apply(params, ids, seg, mask, imask, vm, vg)
    return np.asarray(tags)[0, :L]


def test_pick_bucket():
    assert pick_bucket(1, (8, 16)) == 8
    assert pick_bucket(8, (8, 16)) == 8
    assert pick_bucket(9, (8, 16)) == 16
    assert pick_bucket(99, (8, 16)) == 16  # truncation bucket


@pytest.mark.parametrize("variant", ["ip", "cl"])
def test_bucketed_exact_for_mask_clean_variants(variant):
    """ip/cl have no position-flattening head: bucketed decode must equal
    the 128-padded (here 16-padded) reference decode bitwise."""
    model, params = _model(variant)
    rng = np.random.default_rng(1)
    exs = _examples(12, rng)
    srv = BucketedGateCLServer(model, params, buckets=(8, MAXL),
                               max_batch=4)
    tags, stats = srv.predict(exs)
    assert stats.total_pairs == len(exs)
    pad_id = model.cfg.encoder.pad_token_id
    for ex, t in zip(exs, tags):
        ref = _full_pad_reference(model, params, ex, pad_id)
        np.testing.assert_array_equal(t, ref)


def test_bucketed_gate_cl_agreement():
    """gate_cl's relation gate sees zero-filled instead of padding-token
    activations under bucketing; decoded tags must still agree almost
    everywhere (fixed seed -> deterministic)."""
    model, params = _model("gate_cl")
    rng = np.random.default_rng(2)
    exs = _examples(16, rng)
    srv = BucketedGateCLServer(model, params, buckets=(8, MAXL),
                               max_batch=4)
    tags, _ = srv.predict(exs)
    pad_id = model.cfg.encoder.pad_token_id
    agree = total = 0
    for ex, t in zip(exs, tags):
        ref = _full_pad_reference(model, params, ex, pad_id)
        agree += int((t == ref).sum())
        total += len(ref)
    assert agree / total >= 0.9, f"tag agreement {agree}/{total}"


def test_bucketed_gate_cl_exact_with_masked_crs():
    """Serving-exactness mode (`GateCLConfig.masked_crs`): zeroing the
    masked positions of the relation-classifier input makes the gate_cl
    variant's bucketed decode BIT-IDENTICAL to the full-pad layout — the
    quirky flatten was the only inexact path (VERDICT r03 next #5)."""
    import dataclasses

    enc = EncoderConfig.tiny()
    cfg = GateCLConfig(encoder=enc, num_labels=5, layer_num1=1,
                       region_dim=32, max_seq_length=MAXL,
                       variant="gate_cl", negative_rate=2, masked_crs=True)
    model = GateCLModel(cfg)
    B = 2
    ids = np.ones((B, MAXL), np.int32)
    params = model.init(jax.random.PRNGKey(0), ids,
                        np.zeros((B, MAXL), np.int32),
                        np.ones((B, MAXL), np.int32),
                        np.ones((B, cfg.num_regions), np.int32),
                        np.zeros((B, cfg.region_dim), np.float32),
                        np.zeros((B, 7, 7, cfg.region_dim), np.float32))
    rng = np.random.default_rng(2)
    exs = _examples(16, rng)
    srv = BucketedGateCLServer(model, params, buckets=(8, MAXL),
                               max_batch=4)
    tags, _ = srv.predict(exs)
    pad_id = cfg.encoder.pad_token_id
    for ex, t in zip(exs, tags):
        ref = _full_pad_reference(model, params, ex, pad_id)
        np.testing.assert_array_equal(t, ref)


def test_truncation_and_lengths():
    model, params = _model("ip")
    rng = np.random.default_rng(3)
    exs = _examples(6, rng, max_len=MAXL)
    exs[0]["input_ids"] = rng.integers(2, 100, MAXL + 9).astype(np.int32)
    srv = BucketedGateCLServer(model, params, buckets=(8, MAXL),
                               max_batch=4)
    tags, _ = srv.predict(exs)
    assert len(tags[0]) == MAXL  # truncated to the largest bucket
    for ex, t in zip(exs[1:], tags[1:]):
        assert len(t) == min(len(ex["input_ids"]), MAXL)


def test_stats_accounting():
    model, params = _model("ip")
    rng = np.random.default_rng(4)
    exs = _examples(10, rng)
    srv = BucketedGateCLServer(model, params, buckets=(8, MAXL),
                               max_batch=4)
    _, stats = srv.predict(exs)
    assert stats.total_pairs == 10
    for b, n in stats.pairs_per_bucket.items():
        assert stats.batches_per_bucket[b] == -(-n // 4)


def test_per_bucket_batch_sizes():
    """max_batch accepts one int, a {bucket: batch} map, or None (the
    measured RECOMMENDED_BATCH defaults: short buckets serve at larger
    batches to keep the MXU fed)."""
    model, params = _model("ip")
    rng = np.random.default_rng(6)
    exs = _examples(9, rng)
    srv = BucketedGateCLServer(model, params, buckets=(8, MAXL),
                               max_batch={8: 2, MAXL: 4})
    tags, stats = srv.predict(exs)
    assert stats.total_pairs == 9
    for b, n in stats.pairs_per_bucket.items():
        bb = {8: 2, MAXL: 4}[b]
        assert stats.batches_per_bucket[b] == -(-n // bb)
    for ex, t in zip(exs, tags):
        assert len(t) == min(len(ex["input_ids"]), MAXL)

    default = BucketedGateCLServer(model, params, buckets=(8, MAXL))
    assert default._batch_of(16) == 512      # RECOMMENDED_BATCH
    assert default._batch_of(48) == 128      # fallback


def test_largest_bucket_must_match_config():
    model, params = _model("ip")
    with pytest.raises(ValueError):
        BucketedGateCLServer(model, params, buckets=(8,))


def _icka_batch(cfg, B, offset, L, rng, true_len=None):
    """Flagship batch at padded sentence length L; tokens beyond true_len
    are padding (mask 0)."""
    Lp = offset + L
    vocab = cfg.embedding.vocab_size
    tl = true_len or L
    ids = np.full((B, L), cfg.embedding.pad_token_id, np.int32)
    ids[:, :tl] = rng.integers(2, vocab, (B, tl))
    mask = np.zeros((B, L), np.int32)
    mask[:, :tl] = 1
    pids = np.full((B, Lp), cfg.embedding.pad_token_id, np.int32)
    pids[:, :offset + tl] = rng.integers(2, vocab, (B, offset + tl))
    pmask = np.zeros((B, Lp), np.int32)
    pmask[:, :offset + tl] = 1
    return {
        "input_ids": pids,
        "segment_ids": np.concatenate(
            [np.zeros((B, offset), np.int32), np.ones((B, L), np.int32)], 1),
        "input_mask": pmask,
        "ori_input_ids": ids,
        "ori_input_mask": mask,
        "ori_segment_ids": np.zeros((B, L), np.int32),
        "img_mask": np.ones((B, cfg.num_regions), np.int32),
        "clip_features": rng.standard_normal((B, 1, cfg.clip_dim))
        .astype(np.float32),
        "visual_mean": rng.standard_normal((B, cfg.region_dim))
        .astype(np.float32),
        "visual_grid": rng.standard_normal((B, 7, 7, cfg.region_dim))
        .astype(np.float32),
        "output_mask": mask,
    }


def test_icka_length_flexible():
    """The flagship shares ONE parameter tree across padded lengths
    (bucketed serving): apply at L=16 with params init'd at L=32 must run,
    produce (B, 16) tags, and those tags must agree with the 32-padded
    reference on the valid prefix almost everywhere (the BiLSTM backward
    scan enters the valid region through a shorter padding tail, so the
    contract is statistical, not bitwise — see icka_tpu.serving docs)."""
    from icka_tpu.core.config import ICKAConfig
    from icka_tpu.models.icka import ICKAModel

    cfg = ICKAConfig.tiny()  # max_seq_length = 32
    model = ICKAModel(cfg)
    offset, mask_positions = 14, (3, 11)
    rng = np.random.default_rng(5)
    B, TL = 4, 12

    full = _icka_batch(cfg, B, offset, 32, rng, true_len=TL)
    params = model.init(jax.random.PRNGKey(0), full, mask_positions,
                        offset, mode="test")
    tags_full = np.asarray(model.apply(params, full, mask_positions,
                                       offset, mode="test"))

    # same examples re-padded to the 16 bucket
    short = {k: (v[:, :offset + 16] if k in ("input_ids", "segment_ids",
                                             "input_mask")
                 else v[:, :16] if k in ("ori_input_ids", "ori_input_mask",
                                         "ori_segment_ids", "output_mask")
                 else v)
             for k, v in full.items()}
    tags_short = np.asarray(model.apply(params, short, mask_positions,
                                        offset, mode="test"))
    assert tags_short.shape == (B, 16)
    agree = (tags_short[:, :TL] == tags_full[:, :TL]).mean()
    assert agree >= 0.9, f"valid-prefix tag agreement {agree}"


def test_icka_bucketed_exact_with_masked_lstm():
    """Serving-exactness mode (`ICKAConfig.masked_lstm`): with the BiLSTM
    holding state at padding timesteps, bucketed flagship decode is
    BIT-IDENTICAL to the full-pad layout at valid positions — the backward
    scan was the only inexact path (the gate reads position 0, attention
    masks are additive, CRF decode carries identity backpointers through
    padding). VERDICT r03 next #5."""
    import dataclasses

    from icka_tpu.core.config import ICKAConfig
    from icka_tpu.models.icka import ICKAModel

    cfg = dataclasses.replace(ICKAConfig.tiny(), masked_lstm=True)
    model = ICKAModel(cfg)
    offset, mask_positions = 14, (3, 11)
    rng = np.random.default_rng(5)
    B, TL = 4, 12

    full = _icka_batch(cfg, B, offset, 32, rng, true_len=TL)
    params = model.init(jax.random.PRNGKey(0), full, mask_positions,
                        offset, mode="test")
    tags_full = np.asarray(model.apply(params, full, mask_positions,
                                       offset, mode="test"))

    short = {k: (v[:, :offset + 16] if k in ("input_ids", "segment_ids",
                                             "input_mask")
                 else v[:, :16] if k in ("ori_input_ids", "ori_input_mask",
                                         "ori_segment_ids", "output_mask")
                 else v)
             for k, v in full.items()}
    tags_short = np.asarray(model.apply(params, short, mask_positions,
                                        offset, mode="test"))
    np.testing.assert_array_equal(tags_short[:, :TL], tags_full[:, :TL])


def test_bilstm_mask_holds_state():
    """Masked BiLSTM contract: outputs at valid positions of a padded
    sequence equal the unmasked BiLSTM run on the exact-length slice."""
    from icka_tpu.nn.lstm import BiLSTM

    rng = np.random.default_rng(9)
    B, L, TL, D, H = 3, 10, 6, 8, 4
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    mask = np.zeros((B, L), np.int32)
    mask[:, :TL] = 1
    m = BiLSTM(hidden=H)
    params = m.init(jax.random.PRNGKey(0), x)
    padded = np.asarray(m.apply(params, x, mask))
    exact = np.asarray(m.apply(params, x[:, :TL]))
    np.testing.assert_allclose(padded[:, :TL], exact, rtol=1e-6, atol=1e-6)


def _icka_examples(n, cfg, offset, rng, max_len=32):
    vocab = cfg.embedding.vocab_size
    exs = []
    for _ in range(n):
        L = int(rng.integers(3, max_len + 5))  # some exceed the top bucket
        exs.append({
            "ori_input_ids": rng.integers(2, vocab, L).astype(np.int32),
            "input_ids": rng.integers(2, vocab, offset + L)
            .astype(np.int32),
            "clip_features": rng.standard_normal(cfg.clip_dim)
            .astype(np.float32),
            "visual_mean": rng.standard_normal(cfg.region_dim)
            .astype(np.float32),
            "visual_grid": rng.standard_normal((7, 7, cfg.region_dim))
            .astype(np.float32),
        })
    return exs


def test_icka_server_agreement_and_lengths():
    """Request-level flagship serving: decoded tags come back at each
    example's true (possibly truncated) length, and agree with the
    reference full-pad layout on the valid prefix almost everywhere (the
    BiLSTM/gate see a shorter padding tail — same statistical contract as
    test_icka_length_flexible)."""
    from icka_tpu.core.config import ICKAConfig
    from icka_tpu.models.icka import ICKAModel
    from icka_tpu.serving.bucketed import BucketedICKAServer

    cfg = ICKAConfig.tiny()  # max_seq_length = 32
    model = ICKAModel(cfg)
    offset, mp = 14, (3, 11)
    rng = np.random.default_rng(7)
    init_b = _icka_batch(cfg, 2, offset, 32, rng)
    params = model.init(jax.random.PRNGKey(0), init_b, mp, offset,
                        mode="test")

    exs = _icka_examples(10, cfg, offset, rng)
    srv = BucketedICKAServer(model, params, buckets=(16, 32), max_batch=4,
                             offset=offset, mask_positions=mp)
    tags, stats = srv.predict(exs)
    assert stats.total_pairs == len(exs)

    pad = cfg.embedding.pad_token_id
    agree = total = 0
    for ex, t in zip(exs, tags):
        L = min(len(ex["ori_input_ids"]), 32)
        assert len(t) == L
        # reference layout: the same example padded to max_seq_length
        full = _icka_batch(cfg, 1, offset, 32, rng, true_len=L)
        full["ori_input_ids"][0, :L] = ex["ori_input_ids"][:L]
        full["input_ids"][0] = pad
        pl = min(len(ex["input_ids"]), offset + L)
        full["input_ids"][0, :pl] = ex["input_ids"][:pl]
        full["input_mask"][0] = 0
        full["input_mask"][0, :pl] = 1
        full["clip_features"][0] = ex["clip_features"].reshape(1, -1)
        full["visual_mean"][0] = ex["visual_mean"]
        full["visual_grid"][0] = ex["visual_grid"]
        ref = np.asarray(model.apply(params, full, mp, offset,
                                     mode="test"))[0, :L]
        agree += int((t == ref).sum())
        total += L
    assert agree / total >= 0.9, f"tag agreement {agree}/{total}"


def test_icka_server_bucket_validation():
    from icka_tpu.core.config import ICKAConfig
    from icka_tpu.models.icka import ICKAModel
    from icka_tpu.serving.bucketed import BucketedICKAServer

    cfg = ICKAConfig.tiny()
    model = ICKAModel(cfg)
    with pytest.raises(ValueError):
        BucketedICKAServer(model, params=None, buckets=(16,))


def test_length_sampler_shape():
    rng = np.random.default_rng(0)
    lens = sample_tweet_lengths(1000, rng)
    assert lens.min() >= 5 and lens.max() <= 128
    assert 18 < lens.mean() < 32  # documented distribution (p50 ~ 22+2)
