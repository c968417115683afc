"""Host-side image decode.

The reference decodes with tf.data (``tf.io.read_file`` + ``decode_jpeg`` —
dataset/dataset.py:24-28) on the host CPU. The TPU-native equivalent keeps
decode on host too (TPUs have no JPEG engine) but uses an OpenCV
(libjpeg-turbo) thread pool that releases the GIL, producing fixed-size
uint8 NHWC batches that are fed straight to device memory.
"""
from __future__ import annotations

import concurrent.futures as _fut
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2

    cv2.setNumThreads(0)  # we parallelize at the image level
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from PIL import Image


def decode_image(path: str, channels: int = 3) -> np.ndarray:
    """Decode one image file to uint8 HWC RGB."""
    if _HAS_CV2:
        buf = np.fromfile(path, dtype=np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)  # BGR
        if img is not None:
            return img[:, :, ::-1]  # -> RGB
    with Image.open(path) as im:  # fallback / non-jpeg exotic formats
        return np.asarray(im.convert("RGB"))


class ImageDecoder:
    """Threaded decoder producing images resized on host ONLY when their
    native size differs from ``native_size`` (the reference skips resize for
    200x200 inputs — dataset/dataset.py:33-34; mixed-size batches must be
    unified before batching, so odd-sized images are bicubic-resized here
    with the same TF numerics via the device path later).
    """

    def __init__(self, num_threads: int = 16):
        self._pool = _fut.ThreadPoolExecutor(max_workers=num_threads)

    def decode_batch(self, paths: Sequence[str]) -> List[np.ndarray]:
        return list(self._pool.map(decode_image, paths))

    def submit_batch(self, paths: Sequence[str], postprocess=None):
        """Asynchronously decode a chunk: one pool task per image, returning
        the list of futures (the double-buffering hook for the streaming
        inference path — the reference's tf.data prefetch analogue,
        dataset/dataset.py:100-101). ``postprocess`` (e.g. host resize) runs
        inside the worker so the consumer only gathers finished arrays."""
        if postprocess is None:
            return [self._pool.submit(decode_image, p) for p in paths]
        return [
            self._pool.submit(lambda p=p: postprocess(decode_image(p)))
            for p in paths
        ]

    def close(self):
        self._pool.shutdown(wait=False)
