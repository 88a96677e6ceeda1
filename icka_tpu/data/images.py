"""Image pipeline: host-side decode, device-side preprocessing.

The reference decodes AND transforms every image on the CPU up front with
torchvision (`My_cross_attention.py:276-281,440-446`), materializing the
whole dataset in RAM. The TPU-native split (BASELINE.json north star):

  host   : JPEG decode (PIL) → uint8 RGB resized to `decode_size`²
           (256 by default), with the reference's corrupt-image fallback;
  device : crop (random at train / center at eval) + horizontal flip +
           ImageNet normalize, compiled into the same XLA program as the
           ResNet so pixels stream HBM → MXU without host round-trips.

Device transforms use `jax.random` with a per-batch key; crops are
implemented with `dynamic_slice` (static sizes) so shapes stay static.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def decode_image(path: str, decode_size: int = 256,
                 fallback: Optional[str] = None) -> np.ndarray:
    """Host decode → (decode_size, decode_size, 3) uint8. On failure, falls
    back to `fallback` (the reference substitutes a known-good image,
    :440-446) or a zero image."""
    from PIL import Image

    def _load(p):
        with Image.open(p) as im:
            im = im.convert("RGB").resize((decode_size, decode_size))
            return np.asarray(im, dtype=np.uint8)

    try:
        return _load(path)
    except Exception:
        if fallback is not None:
            try:
                return _load(fallback)
            except Exception:
                pass
        return np.zeros((decode_size, decode_size, 3), np.uint8)


@functools.partial(jax.jit, static_argnames=("crop_size", "train"))
def preprocess_images(images: jnp.ndarray, rng: jax.Array,
                      crop_size: int = 224, train: bool = True):
    """uint8 (B, S, S, 3) → normalized float32 (B, crop, crop, 3).

    Train: random crop + random horizontal flip (the reference's
    RandomCrop(224) + RandomHorizontalFlip). Eval: center crop.
    """
    B, S, _, _ = images.shape
    x = images.astype(jnp.float32) / 255.0
    margin = S - crop_size
    if train and margin > 0:
        k1, k2, k3 = jax.random.split(rng, 3)
        offs = jax.random.randint(k1, (B, 2), 0, margin + 1)
        flip = jax.random.bernoulli(k3, 0.5, (B,))

        def crop_one(img, off, fl):
            c = jax.lax.dynamic_slice(
                img, (off[0], off[1], 0), (crop_size, crop_size, 3))
            return jnp.where(fl, c[:, ::-1, :], c)

        x = jax.vmap(crop_one)(x, offs, flip)
    else:
        o = margin // 2
        x = x[:, o:o + crop_size, o:o + crop_size, :]
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std
