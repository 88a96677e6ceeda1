"""Golden regression pins: fixed-seed tiny-model outputs must not drift
across refactors (the numerical contract the parity tests established).

If an intentional change shifts these values, re-record with:
    python tests/test_golden.py record
"""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden.json")


def _compute():
    from icka_tpu.core.config import ICKAConfig
    from icka_tpu.models.icka import ICKAModel
    from icka_tpu.nn.crf import crf_decode, crf_log_likelihood
    from tests.test_models import make_icka_batch

    out = {}
    rng = np.random.default_rng(1234)

    # CRF scalar
    em = rng.standard_normal((2, 6, 5)).astype(np.float32)
    tags = rng.integers(0, 5, (2, 6)).astype(np.int32)
    mask = np.ones((2, 6), np.int32)
    start = rng.standard_normal(5).astype(np.float32)
    end = rng.standard_normal(5).astype(np.float32)
    trans = rng.standard_normal((5, 5)).astype(np.float32)
    out["crf_llh"] = float(crf_log_likelihood(em, tags, mask, start, end,
                                              trans, "token_mean"))
    out["crf_decode"] = np.asarray(
        crf_decode(em, mask, start, end, trans)).tolist()

    # flagship tiny forward loss
    cfg = ICKAConfig.tiny()
    batch, labels, mask_pos, offset = make_icka_batch(rng, cfg)
    model = ICKAModel(cfg)
    params = model.init(jax.random.PRNGKey(42), batch, mask_pos, offset,
                        mode="test")
    loss = model.apply(params, batch, mask_pos, offset, mode="train",
                       labels=labels, deterministic=True)
    out["icka_tiny_loss"] = float(loss)
    return out


def _compute_cli_f1(tmp_root):
    """Reported-metric path regression (VERDICT r01 #9): train-on-synthetic
    → checkpoint → `cli.evaluate` round-trip. Pins the CLI-reported F1 so
    the metric PIPELINE (loader tail handling, filtering, chunk-F1), not
    just the library internals, is regression-guarded."""
    from icka_tpu.cli import evaluate as eval_cli
    from icka_tpu.cli import train as train_cli

    ds = os.path.join(tmp_root, "ds")
    out = os.path.join(tmp_root, "out")
    train_cli.main([
        "--synthetic", ds, "--tiny", "--output_dir", out,
        "--train_batch_size", "4", "--gradient_accumulation_steps", "1",
        "--eval_batch_size", "3", "--learning_rate", "8e-3",
        "--epochs_override", "16", "--compute_dtype", "float32",
        "--data_axis", "1", "--seed", "7",
    ])
    result = eval_cli.main([
        "--synthetic", ds, "--tiny", "--output_dir", out,
        "--split", "valid", "--eval_batch_size", "3",
    ])
    return {"cli_valid_f1": round(result.f1, 6),
            "cli_valid_precision": round(result.precision, 6),
            "cli_valid_recall": round(result.recall, 6)}


def test_cli_roundtrip_f1_golden(tmp_path):
    got = _compute_cli_f1(str(tmp_path))
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    if "cli_valid_f1" not in want:
        want.update(got)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(want, f, indent=2)
        return  # first run records
    for k, v in got.items():
        np.testing.assert_allclose(v, want[k], atol=1e-6, err_msg=k)


def test_golden_values():
    if not os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH, "w") as f:
            json.dump(_compute(), f, indent=2)
        return  # first run records
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    got = _compute()
    missing = {k: v for k, v in got.items() if k not in want}
    if missing:   # record keys cleared after an intentional numeric change
        want.update(missing)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(want, f, indent=2)
    np.testing.assert_allclose(got["crf_llh"], want["crf_llh"], rtol=1e-5)
    np.testing.assert_array_equal(got["crf_decode"], want["crf_decode"])
    np.testing.assert_allclose(got["icka_tiny_loss"],
                               want["icka_tiny_loss"], rtol=1e-4)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "record":
        with open(GOLDEN_PATH, "w") as f:
            json.dump(_compute(), f, indent=2)
        print("recorded", GOLDEN_PATH)
