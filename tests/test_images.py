"""Device-side image preprocessing tests."""

import numpy as np

import jax
import jax.numpy as jnp

from icka_tpu.data.images import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    decode_image,
    preprocess_images,
)


def test_eval_center_crop_and_normalize(rng):
    B, S, C = 2, 256, 224
    imgs = rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)
    out = np.asarray(preprocess_images(jnp.asarray(imgs),
                                       jax.random.PRNGKey(0),
                                       crop_size=C, train=False))
    assert out.shape == (B, C, C, 3)
    o = (S - C) // 2
    want = imgs[:, o:o + C, o:o + C].astype(np.float32) / 255.0
    want = (want - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_train_crop_is_within_bounds_and_normalized(rng):
    B, S, C = 4, 64, 48
    imgs = rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)
    out = np.asarray(preprocess_images(jnp.asarray(imgs),
                                       jax.random.PRNGKey(1),
                                       crop_size=C, train=True))
    assert out.shape == (B, C, C, 3)
    # normalized range sanity
    lo = (0 - max(IMAGENET_MEAN)) / min(IMAGENET_STD)
    hi = (1 - min(IMAGENET_MEAN)) / min(IMAGENET_STD)
    assert out.min() >= lo - 1e-4 and out.max() <= hi + 1e-4
    # different keys → different crops/flips (almost surely)
    out2 = np.asarray(preprocess_images(jnp.asarray(imgs),
                                        jax.random.PRNGKey(2),
                                        crop_size=C, train=True))
    assert not np.allclose(out, out2)


def test_train_crop_deterministic_per_key(rng):
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    a = preprocess_images(jnp.asarray(imgs), jax.random.PRNGKey(3),
                          crop_size=48, train=True)
    b = preprocess_images(jnp.asarray(imgs), jax.random.PRNGKey(3),
                          crop_size=48, train=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_decode_image_fallbacks(tmp_path):
    missing = str(tmp_path / "nope.jpg")
    out = decode_image(missing, 32)
    assert out.shape == (32, 32, 3) and (out == 0).all()
    # fallback image used when primary fails
    from PIL import Image
    fb = tmp_path / "fb.jpg"
    Image.fromarray(np.full((20, 20, 3), 128, np.uint8)).save(fb)
    out = decode_image(missing, 16, fallback=str(fb))
    assert out.shape == (16, 16, 3)
    assert out.mean() > 100
