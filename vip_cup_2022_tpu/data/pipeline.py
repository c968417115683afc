"""Inference/training input pipeline.

Reference pipeline (dataset/dataset.py:22-102): per element —
path -> decode_jpeg -> f32 -> resize(bicubic, only if size != 200x200)
-> /255 -> reshape -> [TTA augment] -> batch -> prefetch.

TPU-native redesign: the host does decode only (uint8), a background thread
pipelines decode of batch N+1 while the device runs batch N, and everything
from dtype-cast through resize/normalize/TTA runs on device inside the model's
jitted program (resize is two MXU matmuls — ops/resize.py). This keeps HBM
traffic minimal: one uint8 H2D copy per image.

Images whose native size differs from the batch's canonical decode size are
unified on host with the same TF-bicubic numerics (resize_matrix) so batches
stay static-shaped for XLA.
"""
from __future__ import annotations

import os
import queue
import random
import threading
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.resize import resize_matrix
from .decode import ImageDecoder


def seeding(cfg) -> None:
    """Seed numpy/python hashes (parity: dataset/dataset.py:12-17; TF's
    global graph seed maps to the explicit jax.random keys threaded through
    the pipeline)."""
    seed = cfg.seed if hasattr(cfg, "seed") else int(cfg)
    np.random.seed(seed)
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def _host_resize_uint8(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Bicubic resize with TF-v2 numerics on host (numpy matmuls), used only
    for the rare images whose decoded size differs from the canonical size.

    Accepted numerical drift (round-1 advisor note): an off-size input bound
    for a non-200 member is resized here to 200x200 and re-quantized to
    uint8, then resized again on device to the member dim — the reference
    resizes once, native->dim, in float. The eval set is all-200x200 (the
    competition spec, README.md:69), so the double resample affects only
    out-of-spec inputs; keeping the uint8 canonical buffer is what lets one
    decode feed every member."""
    h, w = img.shape[:2]
    oh, ow = size
    if (h, w) == (oh, ow):
        return img
    x = img.astype(np.float32)
    if h != oh:
        x = np.einsum("oh,hwc->owc", resize_matrix(h, oh, "bicubic"), x)
    if w != ow:
        x = np.einsum("ow,hwc->hoc", resize_matrix(w, ow, "bicubic"), x)
    return np.clip(np.rint(x), 0, 255).astype(np.uint8)


class BatchLoader:
    """Iterates uint8 NHWC batches with background prefetch.

    - ``native_size``: canonical decoded size (the eval contract is 200x200 —
      README.md:69); per-model resizing to e.g. 224 happens on device.
    - final partial batch is zero-padded to ``batch_size``; ``n_valid`` marks
      real rows (the reference instead repeats the dataset and truncates —
      main.py:109-110 — which wastes forward passes).
    """

    def __init__(
        self,
        paths: Sequence[str],
        batch_size: int,
        native_size: Tuple[int, int] = (200, 200),
        num_threads: int = 16,
        prefetch: int = 2,
        drop_remainder: bool = False,
    ):
        self.paths = list(paths)
        self.batch_size = batch_size
        self.native_size = tuple(native_size)
        self.drop_remainder = drop_remainder
        self._decoder = ImageDecoder(num_threads=num_threads)
        self._prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.paths)
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    def _make_batch(self, chunk: Sequence[str]) -> Tuple[np.ndarray, int]:
        imgs = self._decoder.decode_batch(chunk)
        h, w = self.native_size
        out = np.zeros((self.batch_size, h, w, 3), dtype=np.uint8)
        for i, im in enumerate(imgs):
            out[i] = _host_resize_uint8(im, self.native_size)
        return out, len(chunk)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, int]]:
        chunks = [
            self.paths[i : i + self.batch_size]
            for i in range(0, len(self.paths), self.batch_size)
        ]
        if self.drop_remainder and chunks and len(chunks[-1]) < self.batch_size:
            chunks.pop()

        q: "queue.Queue" = queue.Queue(maxsize=self._prefetch)
        stop = object()

        def producer():
            try:
                for chunk in chunks:
                    q.put(self._make_batch(chunk))
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item

    def close(self):
        self._decoder.close()


def build_dataset(
    paths: Sequence[str],
    labels: Optional[Sequence[int]] = None,
    batch_size: int = 32,
    img_size: Tuple[int, int] = (200, 200),
    shuffle: int = 0,
    seed: int = 42,
    drop_remainder: bool = False,
    num_threads: int = 16,
):
    """CSV-manifest-level dataset builder (reference build_dataset
    dataset/dataset.py:64-102 surface). Returns a BatchLoader (+labels array);
    augmentation/normalization live on device in the inference engine or the
    training step."""
    paths = list(paths)
    labels_arr = None if labels is None else np.asarray(labels)
    if shuffle:
        rng = np.random.RandomState(seed)
        order = rng.permutation(len(paths))
        paths = [paths[i] for i in order]
        if labels_arr is not None:
            labels_arr = labels_arr[order]
    loader = BatchLoader(
        paths,
        batch_size=batch_size,
        native_size=img_size,
        num_threads=num_threads,
        drop_remainder=drop_remainder,
    )
    return (loader, labels_arr) if labels is not None else loader
