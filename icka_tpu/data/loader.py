"""Streaming batch loader with host decode cache and background prefetch.

Replaces the reference's whole-dataset-in-RAM `TensorDataset` + DataLoader
(`My_cross_attention.py:685-708`): features stay columnar (numpy), images
are decoded once to a compact uint8 cache and assembled per batch; a
prefetch thread keeps the next batch ready while the device computes.

Sharding: `process_index/process_count` stride-partition the dataset per
host (the `DistributedSampler` equivalent, :707); within a host the batch's
leading dimension is sharded over the mesh data axis by the trainer.

Train batches carry a leading gradient-accumulation axis:
(accum, micro_batch, ...) — consumed by `lax.scan` inside the jitted step.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from icka_tpu.data.features import MMFeatures
from icka_tpu.data.images import decode_image


class MNERLoader:
    def __init__(self, features: MMFeatures, image_dir: str,
                 batch_size: int, accum_steps: int = 1, train: bool = True,
                 decode_size: int = 256, seed: int = 0,
                 fallback_image: Optional[str] = None,
                 cache_images: bool = True,
                 process_index: int = 0, process_count: int = 1,
                 prefetch: int = 2, decode_threads: int = 4):
        self.features = features
        self.image_dir = image_dir
        self.batch_size = batch_size
        self.accum_steps = accum_steps if train else 1
        self.train = train
        self.decode_size = decode_size
        self.seed = seed
        self.fallback_image = fallback_image
        self.prefetch = prefetch
        self.decode_threads = decode_threads
        self._tmp: dict = {}
        self._epoch = 0
        self._cache: Optional[dict[int, np.ndarray]] = (
            {} if cache_images else None)

        idx = np.arange(len(features))
        self.indices = idx[process_index::process_count]

    def __len__(self) -> int:
        per_step = self.batch_size * self.accum_steps
        if self.train:
            return max(1, len(self.indices) // per_step)
        return (len(self.indices) + per_step - 1) // per_step

    def eval_view(self) -> "MNERLoader":
        return MNERLoader(
            self.features, self.image_dir, self.batch_size, 1, train=False,
            decode_size=self.decode_size, seed=self.seed,
            fallback_image=self.fallback_image,
            cache_images=self._cache is not None,
            decode_threads=self.decode_threads)

    def _image(self, row: int) -> np.ndarray:
        if self._cache is not None and row in self._cache:
            return self._cache[row]
        if row in self._tmp:
            return self._tmp[row]
        img_id = self.features.img_ids[row]
        path = os.path.join(self.image_dir, img_id) if img_id else ""
        arr = None
        if path.endswith((".jpg", ".jpeg")):
            from icka_tpu.data import native
            arr = native.decode_jpeg(path, self.decode_size)
        if arr is None:
            arr = decode_image(path, self.decode_size, self.fallback_image)
        if self._cache is not None:
            self._cache[row] = arr
        return arr

    def _decode_uncached(self, rows) -> None:
        """Decode `rows` not yet in the cache using the native threaded
        batch decoder when available (single-image fallback otherwise).
        Cached mode fills `self._cache`; uncached (serving) mode fills the
        transient per-batch `self._tmp` so every request still rides the
        pthread pool instead of the one-image-at-a-time path."""
        sink = self._cache if self._cache is not None else self._tmp
        if self._cache is None:
            self._tmp = sink = {}
        todo = [int(r) for r in rows if int(r) not in sink]
        if not todo:
            return
        paths = [os.path.join(self.image_dir, self.features.img_ids[r])
                 if self.features.img_ids[r] else "" for r in todo]
        if all(p.endswith((".jpg", ".jpeg")) for p in paths):
            from icka_tpu.data import native
            res = native.decode_jpeg_batch(paths, self.decode_size,
                                           num_threads=self.decode_threads)
            if res is not None:
                arrs, failures = res
                for i, r in enumerate(todo):
                    arr = arrs[i]
                    if arr.any() or failures == 0:
                        sink[r] = arr
                        continue
                    # zeroed row = native failure → PIL/fallback path
                    sink[r] = decode_image(
                        paths[i], self.decode_size, self.fallback_image)
                return
        # fallback: per-image decode fills the cache/_tmp via _image()

    def _assemble(self, rows: np.ndarray) -> Dict[str, np.ndarray]:
        batch = self.features.batch_dict(rows)
        batch["label_ids"] = self.features.label_ids[rows]
        self._decode_uncached(rows)
        batch["images"] = np.stack([self._image(int(r)) for r in rows])
        return batch

    def _batches(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self.indices.copy()
        if self.train:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
            self._epoch += 1
        per_step = self.batch_size * self.accum_steps
        n = len(self)
        for i in range(n):
            rows = idx[i * per_step:(i + 1) * per_step]
            n_valid = len(rows)
            if len(rows) < per_step:
                if self.train:
                    break
                # pad the tail eval batch by repeating the last row; the
                # duplicates are flagged in row_valid so evaluators drop
                # them before metrics (the reference evaluates ragged
                # tails exactly, `My_cross_attention.py:1022-1077`)
                pad = per_step - len(rows)
                rows = np.concatenate([rows, np.repeat(rows[-1:], pad)])
            batch = self._assemble(rows)
            if not self.train:
                valid = np.zeros(per_step, np.int32)
                valid[:n_valid] = 1
                batch["row_valid"] = valid
            if self.train and self.accum_steps > 1:
                batch = {
                    k: v.reshape(self.accum_steps, self.batch_size,
                                 *v.shape[1:])
                    for k, v in batch.items()}
            elif self.train:
                batch = {k: v[None] for k, v in batch.items()}
            yield batch

    def __iter__(self):
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []

        def worker():
            try:
                for b in self._batches():
                    q.put(b)
            except Exception as e:  # surface in consumer thread
                err.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        if err:
            raise err[0]
